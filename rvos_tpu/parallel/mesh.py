"""Device-mesh helpers for SPMD training/eval.

The reference scales with one-process-per-GPU DDP + NCCL all-reduce
(``tools/train_net_mm.py:72``, ``train_manager_mm.py:47-57``).  The TPU
equivalent is declarative: build a ``jax.sharding.Mesh``, annotate the
batch with ``PartitionSpec('data', ...)``, and XLA emits the gradient
all-reduce over ICI (intra-slice) / DCN (multi-slice).  A second
``model`` axis is reserved for context-parallel matching (sharding the
query-pixel rows of global matching — see SURVEY.md §2.10) when a
single video's bank outgrows one chip.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: Optional[int] = None, model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model <= n, (data, model, n)
    arr = np.array(devices[: data * model]).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def cp_mesh(cfg, devices=None) -> Optional[Mesh]:
    """(data, model) mesh for context-parallel matching, or None.

    When ``cfg.MESH_MODEL_AXIS > 1`` the matching ops in
    ``segment_frame`` carry GSPMD constraints sharding query-pixel rows
    over the "model" axis; this builds the mesh the engines run under.
    """
    if getattr(cfg, "MESH_MODEL_AXIS", 1) <= 1:
        return None
    devices = devices if devices is not None else jax.devices()
    model = cfg.MESH_MODEL_AXIS
    if len(devices) < model:
        return None
    data = max(1, min(cfg.MESH_DATA_AXIS, len(devices) // model))
    return make_mesh(data=data, model=model, devices=devices)


def resolved_cp_axis(cfg) -> Optional[str]:
    """The context-parallel mesh axis name, or None.

    Gates on the *resolved ambient mesh* rather than the config alone:
    ``cp_mesh`` returns None when there are fewer devices than
    ``MESH_MODEL_AXIS`` (and engines then fall back to a data-only
    mesh), so a cfg-only gate would emit
    ``with_sharding_constraint(P("model"))`` with no ambient mesh and
    crash every fallback path at trace time.  Here cp_mesh's None
    genuinely degrades to the unsharded path.
    """
    if getattr(cfg, "MESH_MODEL_AXIS", 1) <= 1:
        return None
    try:
        m = jax.sharding.get_abstract_mesh()
        if (m is not None and not m.empty and "model" in m.axis_names
                and m.shape["model"] > 1):
            return "model"
    except Exception:
        pass
    return None


def ambient_mesh_ctx(mesh: Optional[Mesh]):
    """Context manager making ``mesh`` ambient (``jax.set_mesh``) so the
    bare ``PartitionSpec("model")`` constraints inside the matching ops
    resolve; a no-op for data-only meshes."""
    import contextlib
    if (mesh is None or "model" not in mesh.axis_names
            or mesh.shape["model"] == 1):
        return contextlib.nullcontext()
    return jax.set_mesh(mesh)


def data_sharding(mesh: Mesh, leading_batch: bool = True) -> NamedSharding:
    spec = P("data") if leading_batch else P(None, "data")
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict, time_major_keys: Sequence[str] = (
        "curr_img", "curr_label")) -> dict:
    """Device-put a numpy batch with batch-dim sharding over 'data'."""
    out = {}
    for k, v in batch.items():
        spec = P(None, "data") if k in time_major_keys else P("data")
        out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return out
