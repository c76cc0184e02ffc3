"""Hard-mining cross-entropy loss.

Reference ``Concat_CrossEntropyLoss`` (``networks/layers/loss.py:52-97``):
per-sample CE (ignore 255), top-k% hard pixel mining with k annealed
from 100% → 15% over ``TRAIN_HARD_MINING_STEP``.  The dynamic k becomes
a sort + prefix mask (XLA needs static shapes; a sort is one fused op).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def hard_mining_ce(
    logits: jnp.ndarray,      # [O, H, W] (invalid objects pre-masked to -1e9)
    labels: jnp.ndarray,      # [H, W] int (255 = ignore)
    step: jnp.ndarray,        # scalar
    top_k_percent: float = 0.15,
    hard_mining_step: int = 50_000,
) -> jnp.ndarray:
    o, h, w = logits.shape
    logp = jax.nn.log_softmax(logits, axis=0)             # [O, H, W]
    ignore = labels == 255
    lab = jnp.where(ignore, 0, labels)
    # one-hot contraction instead of take_along_axis: XLA:TPU lowers the
    # per-pixel gather to a serialized loop (millions of tiny ops)
    onehot = jax.nn.one_hot(lab, o, axis=0, dtype=logp.dtype)
    pix_loss = -jnp.sum(logp * onehot, axis=0)
    pix_loss = jnp.where(ignore, 0.0, pix_loss)           # ref: ignored → no loss
    flat = pix_loss.reshape(-1)
    n = flat.shape[0]

    if hard_mining_step == 0:
        k = jnp.asarray(int(top_k_percent * n), jnp.float32)
    else:
        ratio = jnp.minimum(1.0, step.astype(jnp.float32) / hard_mining_step)
        k = jnp.floor((ratio * top_k_percent + (1.0 - ratio)) * n)
    k = jnp.maximum(k, 1.0)

    # top-k mean via a stop-gradient threshold: differentiating through
    # jnp.sort emits a 216k-element scatter in the backward pass, which
    # XLA:TPU serializes into a per-element loop (~40s/step observed).
    # Ignored pixels are pushed below any real loss (CE >= 0) so they can
    # never be selected when k exceeds the hard-pixel count — otherwise
    # ties at zero dilute the mined mean vs the reference's exact top-k.
    valid = (~ignore).reshape(-1)
    flat_sg = jnp.where(valid, jax.lax.stop_gradient(flat), -1.0)
    sorted_desc = jnp.sort(flat_sg)[::-1]
    kth = jnp.take(sorted_desc, (k - 1.0).astype(jnp.int32))
    sel = ((flat_sg >= kth) & valid).astype(flat.dtype)
    count = jnp.maximum(jnp.sum(sel), 1.0)
    return jnp.sum(flat * sel) / count


def hard_mining_bce(
    logits: jnp.ndarray,      # [O, H, W]
    onehot_target: jnp.ndarray,  # [O, H, W] {0,1}
    step: jnp.ndarray,
    top_k_percent: float = 0.15,
    hard_mining_step: int = 50_000,
) -> jnp.ndarray:
    """Per-object BCE analogue (``Concat_BCEWithLogitsLoss``,
    ``networks/layers/loss.py:5-49``).  The release's top-k path abuses
    indices as weights (§2.9); here the mined mean over the top-k pixel
    losses, mirroring the (correct) CE path."""
    pix = jnp.maximum(logits, 0) - logits * onehot_target + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))
    flat = jnp.mean(pix, axis=0).reshape(-1)       # mean over objects per px
    n = flat.shape[0]
    if hard_mining_step == 0:
        k = jnp.asarray(int(top_k_percent * n), jnp.float32)
    else:
        ratio = jnp.minimum(1.0, step.astype(jnp.float32) / hard_mining_step)
        k = jnp.floor((ratio * top_k_percent + (1.0 - ratio)) * n)
    k = jnp.maximum(k, 1.0)
    # same stop-gradient-threshold selection as the CE path: sorting the
    # differentiated losses would reintroduce the serialized
    # sort-backward scatter on XLA:TPU (~40s/step)
    flat_sg = jax.lax.stop_gradient(flat)
    sorted_desc = jnp.sort(flat_sg)[::-1]
    kth = jnp.take(sorted_desc, (k - 1.0).astype(jnp.int32))
    sel = (flat_sg >= kth).astype(flat.dtype)
    count = jnp.maximum(jnp.sum(sel), 1.0)
    return jnp.sum(flat * sel) / count


def batched_iou(pred: jnp.ndarray, target: jnp.ndarray, obj_num: jnp.ndarray,
                max_obj: int, epsilon: float = 1e-6) -> jnp.ndarray:
    """Mean foreground IoU for train logging (``utils/metric.py:3-34``)."""
    def one(p, t, n):
        ids = jnp.arange(1, max_obj)
        valid = ids <= n
        pm = p[None] == ids[:, None, None]
        tm = t[None] == ids[:, None, None]
        inter = jnp.sum(pm & tm, axis=(1, 2)).astype(jnp.float32)
        union = jnp.sum(pm | tm, axis=(1, 2)).astype(jnp.float32)
        iou = (inter + epsilon) / (union + epsilon)
        iou = jnp.where(valid, iou, 0.0)
        cnt = jnp.maximum(jnp.sum(valid), 1)
        return jnp.where(n > 0, jnp.sum(iou) / cnt, 1.0)

    return jnp.mean(jax.vmap(one)(pred, target, obj_num))
