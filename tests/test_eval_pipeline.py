"""Direct unit tests for the module-level eval pipeline machinery
(VERDICT r3 weak #6: Chunker / D2HBatcher / MaskSaver were closures
inside evaluate_sequence with only integration-level coverage)."""

import os

import numpy as np
import pytest

from rvos_tpu.engine.eval_pipeline import Chunker, D2HBatcher, MaskSaver


class _Rec:
    """Records (kind, frames, ctx-snapshot) for every dispatched run."""

    def __init__(self):
        self.calls = []

    def full(self, buf, ctx):
        self.calls.append(("full", [f for f, _, _ in buf], dict(ctx)))

    def ragged(self, buf, ctx):
        self.calls.append(("ragged", [f for f, _, _ in buf], dict(ctx)))


def _push(ch, f, sig="s", ov=(1, 1), em=(1, 0), hw=(8, 8), extra=None):
    ch.push(f, f"{f:05d}.jpg", f, sig, np.array(ov, np.float32),
            np.array(em, np.float32), hw, extra)


def test_chunker_full_and_ragged_cuts():
    rec = _Rec()
    ch = Chunker(3, rec.full, rec.ragged, mem_boundary=lambda f: False)
    for f in range(7):
        _push(ch, f)
    ch.flush()
    assert [c[:2] for c in rec.calls] == [
        ("full", [0, 1, 2]), ("full", [3, 4, 5]), ("ragged", [6])]


def test_chunker_cuts_on_mem_boundary():
    rec = _Rec()
    ch = Chunker(4, rec.full, rec.ragged,
                 mem_boundary=lambda f: f % 5 == 0)
    for f in range(1, 12):
        _push(ch, f)
    ch.flush()
    # cut after 5 and 10 (memory-update frames), full chunks elsewhere
    assert [c[1] for c in rec.calls] == [[1, 2, 3, 4], [5], [6, 7, 8, 9],
                                         [10], [11]]
    kinds = [c[0] for c in rec.calls]
    assert kinds == ["full", "ragged", "full", "ragged", "ragged"]


@pytest.mark.parametrize("change", ["sig", "ov", "em", "hw"])
def test_chunker_cuts_on_context_change(change):
    rec = _Rec()
    ch = Chunker(8, rec.full, rec.ragged, mem_boundary=lambda f: False)
    _push(ch, 0)
    _push(ch, 1)
    kw = {"sig": {"sig": "other"}, "ov": {"ov": (1, 0)},
          "em": {"em": (1, 1)}, "hw": {"hw": (4, 4)}}[change]
    _push(ch, 2, **kw)
    ch.flush()
    assert [c[:2] for c in rec.calls] == [("ragged", [0, 1]),
                                          ("ragged", [2])]


def test_chunker_ctx_extra_survives_until_cut():
    rec = _Rec()
    ch = Chunker(2, rec.full, rec.ragged, mem_boundary=lambda f: False)
    _push(ch, 0, extra={"idxs": [0, 1]})
    _push(ch, 1, extra={"idxs": "IGNORED"})   # only first frame sets ctx
    assert rec.calls[0][2]["idxs"] == [0, 1]


def test_d2h_batcher_groups_singles_by_resolution(tmp_path):
    saver = MaskSaver(str(tmp_path))
    d2h = D2HBatcher(saver, group=4)
    a = np.arange(2 * 4 * 4, dtype=np.uint8).reshape(2, 4, 4)
    d2h.append(("a0.jpg", "a1.jpg"), a)                       # block
    d2h.append(("b0.jpg",), np.full((1, 4, 4), 7, np.uint8))  # single 4x4
    d2h.append(("c0.jpg",), np.full((1, 8, 8), 9, np.uint8))  # single 8x8
    d2h.append(("b1.jpg",), np.full((1, 4, 4), 8, np.uint8))  # single 4x4
    assert d2h.frames() == 5
    d2h.flush()
    out = saver.drain()
    assert set(out) == {"a0.jpg", "a1.jpg", "b0.jpg", "c0.jpg", "b1.jpg"}
    np.testing.assert_array_equal(out["a1.jpg"], a[1])
    assert out["c0.jpg"].shape == (8, 8) and out["c0.jpg"][0, 0] == 9
    assert out["b1.jpg"][0, 0] == 8
    # PNGs written for every frame
    assert sorted(os.listdir(tmp_path)) == [
        "a0.png", "a1.png", "b0.png", "b1.png", "c0.png"]


def test_d2h_maybe_flush_threshold():
    saver = MaskSaver(None)
    d2h = D2HBatcher(saver, group=3)
    d2h.append(("x.jpg",), np.zeros((1, 2, 2), np.uint8))
    d2h.maybe_flush()
    assert d2h.frames() == 1          # below threshold: kept
    d2h.append(("y.jpg", "z.jpg"), np.zeros((2, 2, 2), np.uint8))
    d2h.maybe_flush()
    assert d2h.frames() == 0          # reached 3: flushed
    out = saver.drain()
    assert set(out) == {"x.jpg", "y.jpg", "z.jpg"}


def test_mask_saver_single_writes_png(tmp_path):
    saver = MaskSaver(str(tmp_path))
    saver.submit_single(np.ones((4, 4), np.uint8), "frame7.jpg")
    out = saver.drain()
    assert out == {}                  # host-path masks aren't returned
    assert os.listdir(tmp_path) == ["frame7.png"]
