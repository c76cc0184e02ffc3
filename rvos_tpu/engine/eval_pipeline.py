"""Host-side streaming-eval pipeline machinery (module-level seams).

Extracted from ``Evaluator.evaluate_sequence``'s closures (VERDICT r3
weak #6): the MEM_EVERY-aligned frame ``Chunker``, the batched-D2H
stacker (``D2HBatcher``) and the async PNG saver (``MaskSaver``) are
plain classes with direct unit tests (``tests/test_eval_pipeline.py``);
the chunked-vs-per-frame equivalence suite in
``tests/test_eval_semantics.py`` remains the integration seam.

Design constraints these encode (measured, ROUND_NOTES r3):
* one 0.4 MB mask D2H costs ~37 ms of tunnel latency — masks ship as
  ONE stacked transfer per ``TEST_D2H_GROUP`` frames, started with
  ``copy_to_host_async()`` at flush so the saver's ``np.asarray`` only
  finalizes it;
* PNG writes run on a single saver thread so they overlap device
  compute (reference analogue: DataLoader workers,
  ``eval_manager_mm.py:180``);
* chunks cut at MEM_EVERY boundaries and on any loop-invariant context
  change, so RPA memory-update timing matches the per-frame path
  exactly.
"""

from __future__ import annotations

import os
import time
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..utils.image import save_mask


class MaskSaver:
    """Single-thread async mask writer + D2H finalizer.

    ``submit_blocks`` takes ``[(names, device_block [K,H,W]), ...]``;
    the worker materializes each block with ONE ``np.asarray`` (the
    transfer was already started via ``copy_to_host_async``) and writes
    palette PNGs when ``save_dir`` is set.  ``drain()`` joins
    everything and returns {frame_name: host mask}.
    """

    def __init__(self, save_dir: Optional[str] = None,
                 remap: Optional[np.ndarray] = None):
        self.save_dir = save_dir
        # 256-entry uint8 LUT mapping model channel -> raw GT id
        # (VOSTestSeq.label_backward); applied to device blocks only —
        # the slow path remaps host-side before submit_single
        self.remap = remap
        self._pool = ThreadPoolExecutor(max_workers=1)
        self._pending: List = []

    def submit_blocks(self, blocks: List[Tuple[Tuple[str, ...], object]]):
        self._pending.append(self._pool.submit(self._job, blocks))

    def submit_single(self, pred: np.ndarray, name: str):
        """Host-side mask (slow path): async PNG write only."""
        if self.save_dir is not None:
            png = os.path.splitext(name)[0] + ".png"
            self._pending.append(self._pool.submit(
                save_mask, pred, os.path.join(self.save_dir, png)))

    def _job(self, blocks) -> Dict[str, np.ndarray]:
        out = {}
        for names, dev in blocks:
            host = np.asarray(dev)
            if self.remap is not None:
                host = self.remap[host]
            for i, nm in enumerate(names):
                arr = host[i]
                if self.save_dir is not None:
                    png = os.path.splitext(nm)[0] + ".png"
                    save_mask(arr, os.path.join(self.save_dir, png))
                out[nm] = arr
        return out

    def drain(self) -> Dict[str, np.ndarray]:
        results: Dict[str, np.ndarray] = {}
        for f in self._pending:
            out = f.result()
            if isinstance(out, dict):
                results.update(out)
        self._pending.clear()
        self._pool.shutdown(wait=True)
        return results


class D2HBatcher:
    """Accumulates device-side prediction blocks and ships them as few
    stacked D2H transfers.

    Entries are ``(names_tuple, device block [K, H, W])`` — chunked
    steps contribute their whole stacked prediction as one block; loose
    single frames are concatenated per RESOLUTION at flush time (a
    mid-sequence frame-size change may mix shapes here — ADVICE r3
    integration fix, covered by ``test_d2h_mixed_resolutions``).
    """

    def __init__(self, saver: MaskSaver, group: int):
        self.saver = saver
        self.group = max(1, group)
        self._batch: List[Tuple[Tuple[str, ...], object]] = []

    def append(self, names: Tuple[str, ...], block):
        self._batch.append((names, block))

    def frames(self) -> int:
        return sum(len(n) for n, _ in self._batch)

    def flush(self):
        if not self._batch:
            return
        singles = [(n, b) for n, b in self._batch if len(n) == 1]
        blocks = [(n, b) for n, b in self._batch if len(n) > 1]
        self._batch.clear()
        by_shape: Dict = {}
        for (n,), b in singles:
            by_shape.setdefault(tuple(b.shape[1:]), []).append((n, b))
        for same in by_shape.values():
            blocks.append((tuple(n for n, _ in same),
                           jnp.concatenate([b for _, b in same])))
        for _, b in blocks:   # start the D2H now; the saver's
            try:              # np.asarray then only finalizes it
                b.copy_to_host_async()
            except Exception:
                pass
        self.saver.submit_blocks(blocks)

    def maybe_flush(self, timing: Optional[Dict[str, float]] = None):
        if self.frames() >= self.group:
            t0 = time.time()
            self.flush()
            if timing is not None:
                timing["flush"] += time.time() - t0


class Chunker:
    """MEM_EVERY-aligned frame buffer shared by the fused and ensemble
    fast paths.  Cuts on any context change (shape signature / ori_hw /
    obj_valid / exist_mask — the inputs a chunk holds loop-invariant),
    at the chunk size, and right after memory-update frames (so
    ``add_ref`` timing matches the per-frame path exactly).  Full
    chunks run one scan graph; ragged cuts replay the per-frame graphs
    (a tail-length scan would be a fresh compile per distinct K).
    """

    def __init__(self, chunk_n: int,
                 run_full: Callable, run_ragged: Callable,
                 mem_boundary: Callable[[int], bool],
                 d2h: Optional[D2HBatcher] = None,
                 timing: Optional[Dict[str, float]] = None):
        self.chunk_n = max(1, chunk_n)
        self.buf: List = []
        self.ctx: Dict = {}
        self.run_full = run_full
        self.run_ragged = run_ragged
        self.mem_boundary = mem_boundary
        self.d2h = d2h
        self.timing = timing

    def push(self, f: int, name: str, payload, sig, ov_np, em_np, o_hw,
             extra=None):
        if self.buf and (
                self.ctx["sig"] != sig
                or self.ctx["ori_hw"] != o_hw
                or not np.array_equal(self.ctx["ov"], ov_np)
                or not np.array_equal(self.ctx["em"], em_np)):
            self.flush()
        if not self.buf:
            self.ctx.update(sig=sig, ov=ov_np, em=em_np,
                            ori_hw=o_hw, **(extra or {}))
        self.buf.append((f, name, payload))
        if len(self.buf) >= self.chunk_n or self.mem_boundary(f):
            self.flush()

    def flush(self):
        if not self.buf:
            return
        t1 = time.time()
        if len(self.buf) == self.chunk_n and self.chunk_n > 1:
            self.run_full(self.buf, self.ctx)
        else:
            self.run_ragged(self.buf, self.ctx)
        if self.timing is not None:
            self.timing["step_dispatch"] += time.time() - t1
        self.buf.clear()
        if self.d2h is not None:
            self.d2h.maybe_flush(self.timing)
