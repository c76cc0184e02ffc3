"""Instance-level object representations (masked global-average pools).

Reference: ``calculate_attention_head{,_for_eval,_p_m,_for_eval_p_m}``
(``networks/layers/attention.py:79-189``).  The eval variants sum
numerators/denominators across the whole reference bank before dividing
— identical to a masked GAP over the concatenated (slot-padded) bank, so
train (bank of one) and eval share one implementation here.

Outputs: the 400-d attention head [ref_pos | ref_neg | prev_pos |
prev_neg] per object, plus the four component proxies (the pos ones
drive proxy matching, ``aocnet.py:305-337``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class AttentionHeads(NamedTuple):
    total_head: jnp.ndarray   # [O, 4C]
    ref_pos: jnp.ndarray      # [O, C]
    ref_neg: jnp.ndarray      # [O, C]
    prev_pos: jnp.ndarray     # [O, C]
    prev_neg: jnp.ndarray     # [O, C]


def _masked_pos_neg(emb, onehot, valid_px, epsilon):
    """emb: [N, C]; onehot: [N, O]; valid_px: [N] → pos/neg means [O, C]."""
    lab = onehot * valid_px[:, None]
    pos_sum = jnp.einsum("nc,no->oc", emb, lab)
    pos_num = jnp.sum(lab, axis=0)[:, None]
    tot_sum = jnp.sum(emb * valid_px[:, None], axis=0)[None, :]
    tot_num = jnp.sum(valid_px)
    neg_sum = tot_sum - pos_sum
    neg_num = tot_num - pos_num
    pos = pos_sum / (pos_num + epsilon)
    neg = neg_sum / (neg_num + epsilon)
    return pos, neg


def attention_heads(
    ref_emb: jnp.ndarray,       # [S, H, W, C]
    ref_onehot: jnp.ndarray,    # [S, H, W, O]
    slot_valid: jnp.ndarray,    # [S]
    prev_emb: jnp.ndarray,      # [H, W, C]
    prev_onehot: jnp.ndarray,   # [H, W, O]
    epsilon: float = 1e-5,
) -> AttentionHeads:
    s, h, w, c = ref_emb.shape
    o = ref_onehot.shape[-1]
    r_emb = ref_emb.reshape(s * h * w, c).astype(jnp.float32)
    r_lab = ref_onehot.reshape(s * h * w, o).astype(jnp.float32)
    r_val = jnp.repeat(slot_valid.astype(jnp.float32), h * w)
    ref_pos, ref_neg = _masked_pos_neg(r_emb, r_lab, r_val, epsilon)

    p_emb = prev_emb.reshape(h * w, c).astype(jnp.float32)
    p_lab = prev_onehot.reshape(h * w, o).astype(jnp.float32)
    p_val = jnp.ones((h * w,), jnp.float32)
    prev_pos, prev_neg = _masked_pos_neg(p_emb, p_lab, p_val, epsilon)

    total = jnp.concatenate([ref_pos, ref_neg, prev_pos, prev_neg], axis=1)
    return AttentionHeads(total, ref_pos, ref_neg, prev_pos, prev_neg)


def proxy_reconstructed_embedding(prev_onehot: jnp.ndarray,
                                  prev_pos: jnp.ndarray) -> jnp.ndarray:
    """Replace each previous-frame pixel's embedding by its object proxy.

    Reference ``aocnet.py:325``: ``matmul(prev_label[H,W,O], prev_head_pos
    [O,C])`` — background pixels get the background proxy.
    """
    return jnp.einsum("hwo,oc->hwc", prev_onehot.astype(jnp.float32), prev_pos)
