"""Checkpointing: orbax save/restore with the reference's semantics
(keep newest ``max_keep``, shape-checked partial restore for warm
starts) plus a torch→flax weight converter for the released
``resnet101-deeplabv3p`` / CFBI / AOC-Net ``.pth`` files.

Reference: ``utils/checkpoint.py`` — ``save_network`` (:105-129) writes
``save_step_<N>`` and prunes; ``load_network`` (:49-70) strips the
``module.`` DDP prefix and drops shape-mismatched keys so CFBI weights
can warm-start AOC-Net.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _ckpt_path(ckpt_dir: str, step: int) -> str:
    return os.path.join(ckpt_dir, f"save_step_{step}.orbax")


def save_checkpoint(ckpt_dir: str, step: int, state, max_keep: int = 8):
    import orbax.checkpoint as ocp

    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.abspath(_ckpt_path(ckpt_dir, step))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.tree.map(np.asarray, state._asdict()), force=True)
    ckptr.wait_until_finished()
    # prune to max_keep newest (ref :120-129)
    steps = sorted(list_checkpoint_steps(ckpt_dir))
    for old in steps[:-max_keep]:
        import shutil
        shutil.rmtree(_ckpt_path(ckpt_dir, old), ignore_errors=True)


def list_checkpoint_steps(ckpt_dir: str):
    if not os.path.isdir(ckpt_dir):
        return []
    out = []
    for name in os.listdir(ckpt_dir):
        m = re.match(r"save_step_(\d+)\.orbax", name)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def restore_checkpoint(ckpt_dir: str, step: Optional[int], target_state):
    """Restore the given step (or the newest, ref eval_manager :54-66)."""
    import orbax.checkpoint as ocp

    steps = list_checkpoint_steps(ckpt_dir)
    if not steps:
        raise FileNotFoundError(f"no checkpoints in {ckpt_dir}")
    step = step if step is not None else steps[-1]
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(
        os.path.abspath(_ckpt_path(ckpt_dir, step)),
        jax.tree.map(np.asarray, target_state._asdict()))
    return type(target_state)(**restored), step


def partial_restore(params: Dict, loaded_flat: Dict[str, np.ndarray]
                    ) -> Tuple[Dict, list]:
    """Shape-checked partial merge (ref utils/checkpoint.py:49-70).

    ``loaded_flat``: {'/'-joined path: array}.  Keys missing from the
    target or with mismatched shapes are skipped and reported.
    """
    flat = _flatten(params)
    removed = []
    for k, v in loaded_flat.items():
        if k in flat and tuple(flat[k].shape) == tuple(v.shape):
            flat[k] = jnp.asarray(v)
        else:
            removed.append(k)
    return _unflatten(flat), removed


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = v
    return out


def _unflatten(flat):
    out: Dict[str, Any] = {}
    for k, v in flat.items():
        parts = k.split("/")
        d = out
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = v
    return out


# ---------------------------------------------------------------------------
# torch .pth → flax params conversion
# ---------------------------------------------------------------------------

def convert_torch_statedict(state_dict: Dict[str, "np.ndarray"]
                            ) -> Dict[str, np.ndarray]:
    """Map reference AOC-Net/CFBI torch keys to this framework's
    '/'-joined flax paths, transposing conv (OIHW→HWIO) and linear
    (out,in → in,out) kernels.  Unmatched keys are left to
    ``partial_restore`` to report.
    """
    out = {}
    for key, val in state_dict.items():
        v = np.asarray(val)
        key = key.removeprefix("module.")
        path = _map_torch_key(key)
        if path is None:
            continue
        if path.endswith("kernel"):
            if v.ndim == 4:
                v = v.transpose(2, 3, 1, 0)      # OIHW → HWIO
            elif v.ndim == 2:
                v = v.T
        out[path] = v
    return out


def _map_torch_key(key: str) -> Optional[str]:
    """Best-effort structural mapping for the backbone tower; decoder
    modules follow the same naming so most keys map mechanically."""
    parts = key.split(".")
    # feature_extracter.backbone.layerX.N.convY.weight → resnet names
    if parts[0] == "feature_extracter":
        parts[0] = "feature_extracter"
        if len(parts) >= 2 and parts[1] == "backbone":
            # layer1.0.conv1.weight → backbone/layer1_0/conv1/kernel
            if parts[2].startswith("layer"):
                rest = parts[3:]
                name = f"{parts[2]}_{rest[0]}"
                sub = rest[1:]
                mapped = _map_norm_or_conv(sub)
                if mapped is None:
                    return None
                return "/".join(["feature_extracter", "backbone", name] + mapped)
            mapped = _map_norm_or_conv(parts[2:])
            if mapped is None:
                return None
            return "/".join(["feature_extracter", "backbone"] + mapped)
    mapped = _map_norm_or_conv(parts[-2:])
    if mapped is None:
        return None
    return "/".join(parts[:-2] + mapped)


def _map_norm_or_conv(sub):
    """['conv1','weight'] → ['conv1','kernel']; BN buffers keep names;
    ['downsample','0','weight'] → ['downsample_conv','kernel']."""
    if not sub:
        return None
    if sub[0] == "downsample":
        if len(sub) == 3:
            mod = "downsample_conv" if sub[1] == "0" else "downsample_bn"
            leaf = _leaf(sub[2], is_conv=(sub[1] == "0"))
            return [mod, leaf] if leaf else None
        return None
    leaf = _leaf(sub[-1], is_conv="conv" in sub[-2] if len(sub) > 1 else True)
    if leaf is None:
        return None
    return list(sub[:-1]) + [leaf]


def _leaf(name: str, is_conv: bool) -> Optional[str]:
    if name == "weight":
        return "kernel" if is_conv else "weight"
    if name in ("bias", "running_mean", "running_var", "alpha", "gamma",
                "beta"):
        return name
    if name == "num_batches_tracked":
        return None
    return name
