"""Multi-host (multi-process) SPMD initialization + batch assembly.

The reference trains one process per GPU with a TCP rendezvous
(``tools/train_net_mm.py:72`` ``mp.spawn``, DDP init in
``networks/engine/train_manager_mm.py:47-57``, coordinator URL in
``configs/resnet101_aocnet.py:133-136``).  The TPU-native equivalent is
one process per *host*: ``jax.distributed.initialize()`` joins the
processes into one JAX runtime whose ``jax.devices()`` is the global
device list; a single ``Mesh`` spans all hosts, gradients all-reduce
over ICI (intra-slice) / DCN (inter-slice) via the shardings — no
NCCL-style explicit collectives.

Per-process data feeding: every process loads only its slice of each
global batch (``process_batch_slice``) and the slices are stitched into
global ``jax.Array``s with ``jax.make_array_from_process_local_data``
(``make_global_batch``) — the jitted train step is oblivious.

Enable with ``RVOS_MULTIHOST=1``; on TPU pods
``jax.distributed.initialize()`` auto-discovers the topology, elsewhere
set ``RVOS_COORDINATOR`` (host:port), ``RVOS_NUM_PROCESSES`` and
``RVOS_PROCESS_ID``.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence, Tuple

import numpy as np


def maybe_initialize(env: Optional[Dict[str, str]] = None) -> bool:
    """Join the multi-process runtime when ``RVOS_MULTIHOST=1``.

    MUST run before any JAX backend use (the CLIs call it first).
    Returns True when distributed mode was initialized.  On TPU pods
    all arguments auto-detect; for CPU/GPU or manual setups the
    coordinator/process env vars are forwarded.
    """
    env = os.environ if env is None else env
    if env.get("RVOS_MULTIHOST", "0").lower() not in ("1", "true", "yes"):
        return False
    import jax

    kwargs = {}
    if env.get("RVOS_COORDINATOR"):
        kwargs["coordinator_address"] = env["RVOS_COORDINATOR"]
    if env.get("RVOS_NUM_PROCESSES"):
        kwargs["num_processes"] = int(env["RVOS_NUM_PROCESSES"])
    if env.get("RVOS_PROCESS_ID"):
        kwargs["process_id"] = int(env["RVOS_PROCESS_ID"])
    if env.get("RVOS_LOCAL_DEVICE_IDS"):
        kwargs["local_device_ids"] = [
            int(x) for x in env["RVOS_LOCAL_DEVICE_IDS"].split(",")]
    jax.distributed.initialize(**kwargs)
    return True


def process_batch_slice(global_batch: int,
                        process_index: Optional[int] = None,
                        process_count: Optional[int] = None
                        ) -> Tuple[int, int]:
    """(start, size) of this process's contiguous slice of a global
    batch.  The global batch must divide evenly (static shapes)."""
    import jax

    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    if global_batch % pc:
        raise ValueError(
            f"global batch {global_batch} not divisible by "
            f"{pc} processes")
    local = global_batch // pc
    return pi * local, local


def make_global_batch(mesh, local_batch: Dict[str, np.ndarray],
                      time_major_keys: Sequence[str] = (
                          "curr_img", "curr_label")) -> Dict:
    """Stitch per-process local batch slices into global ``jax.Array``s
    sharded over the mesh's 'data' axis.

    Single-process this is exactly ``shard_batch`` (the arrays are
    fully addressable); multi-process each host contributes only its
    slice and XLA sees one global array.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    out = {}
    for k, v in local_batch.items():
        spec = P(None, "data") if k in time_major_keys else P("data")
        out[k] = jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), np.asarray(v))
    return out


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs."""
    import jax
    try:
        return jax.process_index() == 0
    except Exception:          # backend not initialized yet
        return True
