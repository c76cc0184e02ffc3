"""CalibrationDecoding — the proxy-conditioned mask-calibration decoder.

Reference: ``networks/aoc/decoding_module.py:10-225`` with the §2.9
release fixes (conditioning-block wiring, ``beta_percentage`` plumbed,
``GCT_sc``/``conv_sc`` sized to the actual low-level channel count).

Structure (embed_dim=256):
  IA1 gate → Bottleneck(in→256) → CLB2 → Bottleneck(256→256,d2) → CLB3
  → Bottleneck(256→512,s2) → CLB4 → Bottleneck(512→512,d2) → CLB5
  → Bottleneck(512→512,d4) → inter-object-delta-augmented IA9 → GN-ASPP
  → Modulator_1(feature memory slot 0) → Modulator_2(slot 1)
  → decoder_final (bicubic ↑ to low-level, GCT shortcut, 2×conv)
  → per-object dynamic 1×1 FG/BG logits → background augmentation.

Feature memory: the reference threads a 2-slot per-video list, slot 0
refreshed every frame with the post-ASPP features, slot 1 sticky from
its first assignment, detached and shuttled through CPU RAM
(``decoding_module.py:133-148``).  Here the memory is a pair of HBM
arrays + validity flags threaded functionally — no host round-trip.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .deeplab import _batched_resize
from .layers import (GCT, GN, ConditioningBlock, GNASPP, GNBottleneck,
                     IAGate, ShiftConv3x3)


class DecoderMemory(NamedTuple):
    """2-slot feature memory (cfg.BLOCK_NUM slots of post-ASPP features)."""
    slots: jnp.ndarray     # [2, O, h8, w8, 256]
    valid: jnp.ndarray     # [2] bool

    @staticmethod
    def empty(n_obj: int, h8: int, w8: int, channels: int = 256,
              dtype=jnp.float32) -> "DecoderMemory":
        return DecoderMemory(
            slots=jnp.zeros((2, n_obj, h8, w8, channels), dtype),
            valid=jnp.zeros((2,), bool),
        )


def _inter_object_delta(x, obj_valid):
    """GAP sum-minus-self over valid objects (decoding_module.py:126-129)."""
    px = jnp.mean(x, axis=(1, 2)) * obj_valid[:, None]        # [O, C]
    return jnp.sum(px, axis=0, keepdims=True) - px


class CalibrationDecoding(nn.Module):
    in_dim: int = 164            # semantic emb (100) + prehead emb (64)
    attention_dim: int = 400
    embed_dim: int = 256
    refine_dim: int = 64
    low_level_dim: int = 256
    beta_percentage: float = 0.3

    @nn.compact
    def __call__(self, x, head, memory: DecoderMemory, low_level, obj_valid
                 ) -> Tuple[jnp.ndarray, DecoderMemory]:
        """x: [O, h4, w4, in_dim]; head: [O, 400]; low_level: [O?|1 broadcast]
        → (logits [O, 2→1?], new memory).  Returns per-object fused logits
        [O, h4, w4] (channel-last squeezed) after background augmentation.
        """
        E = self.embed_dim
        A = self.attention_dim

        x = IAGate(self.in_dim, name="IA1")(x, head)
        x = GNBottleneck(self.in_dim, E, name="layer1")(x)
        x = ConditioningBlock(E, A, self.beta_percentage, name="CLB2")(
            x, head, obj_valid)
        x = GNBottleneck(E, E, 1, 2, name="layer2")(x)
        x = ConditioningBlock(E, A, self.beta_percentage, name="CLB3")(
            x, head, obj_valid)
        x = GNBottleneck(E, E * 2, 2, name="layer3")(x)
        x = ConditioningBlock(E * 2, A, self.beta_percentage, name="CLB4")(
            x, head, obj_valid)
        x = GNBottleneck(E * 2, E * 2, 1, 2, name="layer4")(x)
        x = ConditioningBlock(E * 2, A, self.beta_percentage, name="CLB5")(
            x, head, obj_valid)
        x = GNBottleneck(E * 2, E * 2, 1, 4, name="layer5")(x)

        delta = _inter_object_delta(x, obj_valid)
        x = IAGate(E * 2, name="IA9")(x, jnp.concatenate([head, delta], axis=1))
        x = GNASPP(E * 2, name="ASPP")(x)

        # ---- 2-slot feature memory (decoding_module.py:133-148)
        x_cur_1 = jax.lax.stop_gradient(x)
        mem0 = jnp.where(memory.valid[0], memory.slots[0], x_cur_1)
        x = self._modulator(x, mem0, head, "M1")
        x_cur_2 = jax.lax.stop_gradient(x)
        mem1 = jnp.where(memory.valid[1], memory.slots[1], x_cur_2)
        x = self._modulator(x, mem1, head, "M2")
        new_memory = DecoderMemory(
            slots=jnp.stack([x_cur_1, mem1]),
            valid=jnp.ones((2,), bool),
        )

        x = self._decoder_final(x, low_level, head, obj_valid)

        fg = self._ia_logit(x, head, "IA_final_fg")
        bg = self._ia_logit(x, head, "IA_final_bg")
        pred = self._augment_background_logit(fg, bg, obj_valid)
        return pred, new_memory

    def _modulator(self, x, x_memory, head, prefix):
        E = self.embed_dim
        x = jnp.concatenate([x, x_memory], axis=-1)
        x = IAGate(E * 2, name=f"{prefix}_Reweight_Layer_1")(x, head)
        x = GNBottleneck(E * 2, E * 2, 1, name=f"{prefix}_Bottleneck_1")(x)
        x = IAGate(E * 2, name=f"{prefix}_Reweight_Layer_2")(x, head)
        x = GNBottleneck(E * 2, E, 1, name=f"{prefix}_Bottleneck_2")(x)
        x = IAGate(E, name=f"{prefix}_Reweight_Layer_3")(x, head)
        x = GNBottleneck(E, E, 1, name=f"{prefix}_Bottleneck_3")(x)
        return x

    def _decoder_final(self, x, low_level, head, obj_valid):
        """decoding_module.py:162-190 (bicubic upsample, GCT shortcut)."""
        x = _batched_resize(x, low_level.shape[-3:-1], "bicubic")

        ll = GCT(self.low_level_dim, name="GCT_sc")(low_level)
        ll = nn.Conv(self.refine_dim, (1, 1), use_bias=False,
                     kernel_init=nn.initializers.kaiming_normal(),
                     name="conv_sc")(ll)
        ll = GN(num_groups=self.refine_dim // 4, epsilon=1e-5,
                name="bn_sc")(ll)
        ll = nn.relu(ll)
        if ll.shape[0] == 1 and x.shape[0] != 1:
            ll = jnp.broadcast_to(ll, (x.shape[0],) + ll.shape[1:])
        x = jnp.concatenate([x, ll], axis=-1)

        delta = _inter_object_delta(x, obj_valid)
        x = IAGate(self.embed_dim + self.refine_dim, name="IA10")(
            x, jnp.concatenate([head, delta], axis=1))
        x = ShiftConv3x3(self.embed_dim // 2,
                         kernel_init=nn.initializers.kaiming_normal(),
                         name="conv1")(x)
        x = GN(num_groups=32, epsilon=1e-5, name="bn1")(x)
        x = nn.relu(x)

        delta = _inter_object_delta(x, obj_valid)
        x = IAGate(self.embed_dim // 2, name="IA11")(
            x, jnp.concatenate([head, delta], axis=1))
        x = ShiftConv3x3(self.embed_dim // 2,
                         kernel_init=nn.initializers.kaiming_normal(),
                         name="conv2")(x)
        x = GN(num_groups=32, epsilon=1e-5, name="bn2")(x)
        return nn.relu(x)

    def _ia_logit(self, x, head, name):
        """Per-object dynamic 1×1 conv (decoding_module.py:151-160)."""
        c = x.shape[-1]
        out = nn.Dense(c + 1, name=name)(head)                # [O, C+1]
        weight, bias = out[:, :c], out[:, -1]
        return jnp.einsum("ohwc,oc->ohw", x, weight) + bias[:, None, None]

    @staticmethod
    def _augment_background_logit(fg, bg, obj_valid):
        """decoding_module.py:213-225: add min of the foreground objects'
        relative-background logits to the absolute-background channel."""
        bg_masked = jnp.where(obj_valid[1:, None, None].astype(bool),
                              bg[1:], jnp.inf)
        aug = jnp.min(bg_masked, axis=0)                       # [h, w]
        n_fg = jnp.sum(obj_valid[1:].astype(jnp.int32))
        aug = jnp.where(n_fg > 0, aug, 0.0)
        pred = fg.at[0].add(aug)
        return pred
