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
    steps = list_checkpoint_steps(ckpt_dir)
    if not steps:
        raise FileNotFoundError(f"no checkpoints in {ckpt_dir}")
    step = step if step is not None else steps[-1]
    return restore_checkpoint_path(
        _ckpt_path(ckpt_dir, step), target_state), step


def restore_checkpoint_path(path: str, target_state):
    """Restore a checkpoint from an explicit directory path (the
    reference's named-checkpoint resume, ``train_manager_mm.py:97-99``)."""
    import orbax.checkpoint as ocp

    if not os.path.isdir(path):
        raise FileNotFoundError(f"no checkpoint at {path}")
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(
        os.path.abspath(path),
        jax.tree.map(np.asarray, target_state._asdict()))
    return type(target_state)(**restored)


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


def load_torch_statedict(path: str) -> Dict[str, np.ndarray]:
    """Load a reference ``.pth``/``.pth.tar`` file into numpy arrays.

    Accepts both raw state_dicts and the reference's
    ``{'state_dict', 'optimizer'}`` wrapper (``utils/checkpoint.py:105``).
    """
    import torch

    try:
        obj = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        obj = torch.load(path, map_location="cpu")
    if isinstance(obj, dict) and isinstance(obj.get("state_dict"), dict):
        obj = obj["state_dict"]
    out = {}
    for k, v in obj.items():
        if hasattr(v, "numpy"):
            out[k] = v.detach().cpu().numpy()
        else:
            out[k] = np.asarray(v)
    return out


def _restore_orbax_params(path: str) -> Dict[str, np.ndarray]:
    """Read the params subtree out of an orbax checkpoint: either a
    ``save_step_<N>.orbax`` dir or a ckpt dir containing several (newest
    wins)."""
    import orbax.checkpoint as ocp

    if os.path.isdir(path) and not path.endswith(".orbax"):
        steps = list_checkpoint_steps(path)
        if not steps:
            raise FileNotFoundError(f"no checkpoints in {path}")
        path = _ckpt_path(path, steps[-1])
    tree = ocp.PyTreeCheckpointer().restore(os.path.abspath(path))
    params = tree["params"] if isinstance(tree, dict) and "params" in tree \
        else tree
    return _flatten(params)


def load_pretrained(params: Dict, path: str, full: bool = True
                    ) -> Tuple[Dict, list, int]:
    """Warm-start ``params`` from a pretrained checkpoint — the
    ``process_pretrained_model`` equivalent
    (``train_manager_mm.py:114-124``).

    * torch ``.pth``/``.pth.tar`` → ``convert_torch_statedict`` then
      shape-checked partial merge;
    * orbax dir (this framework's own checkpoints, e.g. stage 1 →
      stage 2 chaining) → params subtree, partial merge.

    ``full=False`` (reference ``PRETRAIN_FULL=False``) targets the
    backbone only: keys are interpreted relative to the feature
    extractor (the reference loads into ``self.feature_extracter``).
    Returns (merged params, removed keys, number of loaded keys).
    """
    if os.path.isdir(path) or path.endswith(".orbax"):
        # this framework's own checkpoints are always full TrainStates
        # (stage chaining); PRETRAIN_FULL only disambiguates torch files
        loaded = _restore_orbax_params(path)
    else:
        loaded = convert_torch_statedict(load_torch_statedict(path))
        if not full:
            loaded = {
                k if k.startswith("feature_extracter/")
                else f"feature_extracter/{k}": v
                for k, v in loaded.items()}
    merged, removed = partial_restore(params, loaded)
    return merged, removed, len(loaded)


# ---------------------------------------------------------------------------
# torch .pth → flax params conversion
# ---------------------------------------------------------------------------

def convert_torch_statedict(state_dict: Dict[str, "np.ndarray"]
                            ) -> Dict[str, np.ndarray]:
    """Map reference AOC-Net/CFBI torch keys to this framework's
    '/'-joined flax paths — rank-aware:

    * 4-D ``weight`` → conv ``kernel`` (OIHW→HWIO);
    * 2-D ``weight`` → dense ``kernel`` (transposed);
    * 1-D ``weight`` → FrozenBatchNorm ``weight`` inside the feature
      extractor, GroupNorm ``scale`` elsewhere;
    * GCT ``alpha``/``gamma``/``beta`` (1,C,1,1) → (1,1,1,C);
    * ``layerX.N.…`` ResNet indices → ``layerX_N`` flax names;
    * ``downsample.{0,1}`` → ``downsample_conv`` / ``downsample_bn``;
    * ``num_batches_tracked`` dropped.

    Unmatched/mismatched keys are left to ``partial_restore`` to report.
    """
    out = {}
    for key, val in state_dict.items():
        v = np.asarray(val)
        key = key.removeprefix("module.")
        parts = key.split(".")
        if parts[-1] == "num_batches_tracked":
            continue
        # ResNet layer indices and downsample naming
        mapped = []
        i = 0
        while i < len(parts):
            p = parts[i]
            if (p.startswith("layer") and i + 1 < len(parts)
                    and parts[i + 1].isdigit()
                    and "backbone" in parts[:i]):
                mapped.append(f"{p}_{parts[i + 1]}")
                i += 2
            elif p == "downsample" and i + 1 < len(parts):
                mapped.append("downsample_conv" if parts[i + 1] == "0"
                              else "downsample_bn")
                i += 2
            else:
                mapped.append(p)
                i += 1
        leaf = mapped[-1]
        in_extractor = mapped[0] == "feature_extracter"
        if leaf == "weight":
            if v.ndim == 4:
                v = v.transpose(2, 3, 1, 0)        # OIHW → HWIO
                leaf = "kernel"
            elif v.ndim == 2:
                v = v.T
                leaf = "kernel"
            elif v.ndim == 1 and not in_extractor:
                leaf = "scale"                     # flax GroupNorm
        elif leaf in ("alpha", "gamma", "beta") and v.ndim == 4:
            v = v.transpose(0, 2, 3, 1)            # GCT (1,C,1,1) → (1,1,1,C)
        out["/".join(mapped[:-1] + [leaf])] = v
    return out
