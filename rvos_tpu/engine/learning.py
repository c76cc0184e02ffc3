"""LR schedule + optimizer assembly.

Reference: ``utils/learning.py`` (warmup → poly(0.9)/cosine, floor
1e-5) and ``train_manager_mm.py:61-72`` (SGD nesterov, per-param weight
decay with the GCT-beta exemption).  TPU-native: one optax chain —
clip-by-global-norm → coupled weight decay → nesterov SGD — with
FrozenBatchNorm buffers masked out entirely (the reference keeps them
as non-parameter buffers; here they live in the param tree for
checkpoint-conversion parity and are frozen by the mask +
``stop_gradient`` in the module).
"""

from __future__ import annotations

import math
from typing import Callable

import jax.numpy as jnp
import optax

from ..configs import Config


def lr_schedule(cfg: Config) -> Callable:
    base = cfg.TRAIN_LR
    warm = cfg.TRAIN_WARM_UP_STEPS
    total = cfg.TRAIN_TOTAL_STEPS
    power = cfg.TRAIN_POWER
    cosine = cfg.TRAIN_COSINE_DECAY

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm_lr = base * step / max(1, warm)
        t = step - warm
        mx = total - warm
        if cosine:
            decay_lr = base * (jnp.cos(math.pi * t / (mx + 1)) + 1.0) * 0.5
        else:
            decay_lr = base * (1.0 - t / (mx + 1)) ** power
        lr = jnp.where(step < warm, warm_lr, decay_lr)
        return jnp.maximum(lr, 1e-5)

    return fn


def param_labels(params, freeze_backbone: bool = False) -> dict:
    """'frozen' for FrozenBatchNorm leaves, 'train' for everything else.

    ``freeze_backbone`` (cfg.MODEL_FREEZE_BACKBONE): freeze the whole
    ``feature_extracter`` subtree — the reference sets
    ``requires_grad=False`` on every DeepLab parameter
    (``train_manager_mm.py:36-38``); the semantic embedding stays
    trainable (it lives outside the extractor there too).

    FrozenBatchNorm modules are identified *structurally*: they are the
    only modules carrying ``running_mean``/``running_var`` params
    (``models/resnet.py::FrozenBatchNorm``) — every leaf sharing that
    module subtree (weight/bias/stats) is frozen.  Name-prefix matching
    is NOT safe here: trainable GroupNorm layers reuse the reference's
    ``bn*`` module names (semantic embedding, GCT bottlenecks,
    DynamicPreHead, decoder) and must stay in the 'train' group — the
    reference trains GroupNorm affine params
    (``train_manager_mm.py:61-72``)."""
    import jax

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    frozen_modules = set()
    for path, _ in flat:
        keys = tuple(getattr(k, "key", str(k)) for k in path)
        if keys and keys[-1] in ("running_mean", "running_var"):
            frozen_modules.add(keys[:-1])

    def label_of(path, _):
        keys = tuple(getattr(k, "key", str(k)) for k in path)
        if freeze_backbone and keys and keys[0] == "feature_extracter":
            return "frozen"
        return "frozen" if keys[:-1] in frozen_modules else "train"

    return jax.tree_util.tree_map_with_path(label_of, params)


def build_optimizer(cfg: Config, params) -> optax.GradientTransformation:
    import jax

    labels = param_labels(params, freeze_backbone=cfg.MODEL_FREEZE_BACKBONE)
    schedule = lr_schedule(cfg)

    def wd_mask(p):
        # GCT beta exemption (train_manager_mm.py:66-69 via learning.py:24-34)
        def leaf_mask(path, _):
            keys = tuple(getattr(k, "key", str(k)) for k in path)
            if not cfg.MODEL_GCT_BETA_WD and keys[-1] == "beta":
                return False
            return True
        return jax.tree_util.tree_map_with_path(leaf_mask, p)

    train_tx = optax.chain(
        optax.clip_by_global_norm(cfg.TRAIN_CLIP_GRAD_NORM),
        optax.add_decayed_weights(cfg.TRAIN_WEIGHT_DECAY, mask=wd_mask),
        optax.sgd(learning_rate=schedule, momentum=cfg.TRAIN_MOMENTUM,
                  nesterov=True),
    )
    return optax.multi_transform(
        {"train": train_tx, "frozen": optax.set_to_zero()}, labels)
