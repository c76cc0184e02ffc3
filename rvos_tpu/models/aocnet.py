"""AOC-Net — adaptive object proxies + conditional mask calibration.

Reference: ``networks/aoc/aocnet.py``.  The reference runs a Python loop
over batch items and dynamic object counts (``aocnet.py:140``); here a
single static-shape ``segment_frame`` handles one (frame, object-set)
with a padded ``MAX_OBJ`` axis + validity mask, and the engine vmaps it
over the batch.  Train (one reference frame) and eval (RPA bank) share
the same code path: the bank is [S, h, w, ·] with per-slot validity —
train passes S=1.

Matching-map concat order (``aocnet.py:355-358``):
  global_fg(1) | global_cluster(2) | global_proxy(1) | local_fg(6) |
  local_proxy(6) | prev_mask(1) | [local_bg(6) | global_bg(1)]
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..configs import Config
from ..ops import (
    attention_heads,
    cluster_matching,
    cluster_objects,
    foreground2background,
    local_matching_bank_stacked,
    proxy_matching,
    proxy_reconstructed_embedding,
)
from ..ops.matching import (compact_reference_bank,
                            compact_reference_bank_segmented,
                            global_matching_flat,
                            global_matching_flat_segmented)
from .decoder import CalibrationDecoding, DecoderMemory
from .deeplab import DeepLab
from .layers import GN, DynamicPreHead


class SemanticEmbedding(nn.Module):
    """Depthwise 3×3 + GN + 1×1 (256→emb) + GN (aocnet.py:19-25)."""
    aspp_dim: int = 256
    embedding_dim: int = 100
    gn_groups: int = 32
    gn_emb_groups: int = 25

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.aspp_dim, (3, 3), padding=1,
                    feature_group_count=self.aspp_dim,
                    kernel_init=nn.initializers.kaiming_normal(),
                    name="seperate_conv")(x)
        x = GN(num_groups=self.gn_groups, epsilon=1e-5, name="bn1")(x)
        x = nn.relu(x)
        x = nn.Conv(self.embedding_dim, (1, 1),
                    kernel_init=nn.initializers.kaiming_normal(),
                    name="embedding_conv")(x)
        x = GN(num_groups=self.gn_emb_groups, epsilon=1e-5, name="bn2")(x)
        return nn.relu(x)


class AOCNet(nn.Module):
    cfg: Config

    def setup(self):
        c = self.cfg
        self.feature_extracter = DeepLab(c.MODEL_OUTPUT_STRIDE,
                                         c.MODEL_BACKBONE,
                                         c.MODEL_ASPP_DROPOUT,
                                         name="feature_extracter")
        self.semantic_embedding = SemanticEmbedding(
            c.MODEL_ASPP_OUTDIM, c.MODEL_SEMANTIC_EMBEDDING_DIM,
            c.MODEL_GN_GROUPS, c.MODEL_GN_EMB_GROUPS,
            name="semantic_embedding")
        self.bg_bias = self.param("bg_bias", nn.initializers.zeros, (1,))
        self.fg_bias = self.param("fg_bias", nn.initializers.zeros, (1,))
        self.dynamic_prehead = DynamicPreHead(
            c.MODEL_PRE_HEAD_EMBEDDING_DIM, name="dynamic_prehead")
        if (c.MODEL_BACKBONE == "mobilenet"
                and c.MODEL_LOW_LEVEL_INPLANES not in (256, 24)):
            raise ValueError(
                "MODEL_LOW_LEVEL_INPLANES is derived from the backbone "
                "(mobilenet low-level features are 24-wide, "
                "deeplab/decoder.py:9-12); the config override "
                f"{c.MODEL_LOW_LEVEL_INPLANES} would be silently ignored")
        self.dynamic_seghead = CalibrationDecoding(
            in_dim=c.MODEL_SEMANTIC_EMBEDDING_DIM + c.MODEL_PRE_HEAD_EMBEDDING_DIM,
            attention_dim=c.attention_head_dim,
            embed_dim=c.MODEL_HEAD_EMBEDDING_DIM,
            refine_dim=c.MODEL_REFINE_CHANNELS,
            # the reference derives low-level width from the backbone
            # (deeplab/decoder.py:9-12: resnet 256, mobilenet 24); the
            # config field only overrides the resnet default
            low_level_dim=(24 if c.MODEL_BACKBONE == "mobilenet"
                           else c.MODEL_LOW_LEVEL_INPLANES),
            beta_percentage=c.MODEL_BETA_PERCENTAGE,
            name="dynamic_seghead")

    # ------------------------------------------------------------------
    def extract_feature(self, imgs, deterministic: bool = True):
        """[N, H, W, 3] → (embedding [N, h4, w4, emb], low-level [N, h4, w4, 256])."""
        feats, low_level = self.feature_extracter(imgs, deterministic)
        emb = self.semantic_embedding(feats)
        return emb, low_level

    # ------------------------------------------------------------------
    def dis_bias(self, n_obj: int) -> jnp.ndarray:
        """[O] distance bias: background slot 0, foreground elsewhere
        (aocnet.py:143-146)."""
        return jnp.concatenate(
            [self.bg_bias, jnp.broadcast_to(self.fg_bias, (n_obj - 1,))])

    # ------------------------------------------------------------------
    def segment_frame(
        self,
        current_emb: jnp.ndarray,     # [h, w, C]
        current_low: jnp.ndarray,     # [h, w, 256]
        ref_emb_bank: jnp.ndarray,    # [S, h, w, C]
        ref_onehot: jnp.ndarray,      # [S, h, w, O]
        slot_valid: jnp.ndarray,      # [S]
        prev_emb: jnp.ndarray,        # [h, w, C]
        prev_onehot: jnp.ndarray,     # [h, w, O]
        obj_valid: jnp.ndarray,       # [O]
        memory: DecoderMemory,
        kmeans_key: jax.Array,
        train: bool = False,
        flat_emb: jnp.ndarray = None,   # [P, C] precompacted bank (eval)
        flat_lab: jnp.ndarray = None,   # [P, O]
        flat_obj: jnp.ndarray = None,   # [n_tiles] occupancy tile→object map
    ) -> Tuple[jnp.ndarray, DecoderMemory]:
        """One frame's matching + calibration decode → logits [O, h4, w4].

        ``flat_emb``/``flat_lab``: optional precompacted flat reference
        bank (see ``precompact_bank``) — the streaming evaluator's bank
        changes only every MEM_EVERY frames, so hoisting the flatten +
        fg-ranked top_k compaction out of the per-frame step removes a
        per-frame sort/gather (~1 ms at 480p)."""
        c = self.cfg
        h, w, _ = current_emb.shape
        o = ref_onehot.shape[-1]
        bias = self.dis_bias(o)
        mdt = c.matching_dtype   # MODEL_FLOAT16_MATCHING-aware resolution
        dtype = jnp.bfloat16 if mdt == "bfloat16" else jnp.float32
        mixed = mdt in ("mixed", "bfloat16")
        # in mixed mode the elementwise/dot datapath follows the
        # embedding compute dtype (bf16 at eval) with f32 norms inside
        op_dtype = current_emb.dtype if mixed else dtype
        g_atrous = c.TRAIN_GLOBAL_ATROUS_RATE if train else c.TEST_GLOBAL_ATROUS_RATE
        l_atrous = c.TRAIN_LOCAL_ATROUS_RATE if train else c.TEST_LOCAL_ATROUS_RATE
        # Pallas kernels are inference-only (no custom VJP — the train
        # path differentiates through the XLA online-min formulation)
        use_pallas = (c.USE_PALLAS and not train
                      and jax.default_backend() == "tpu")
        use_pallas_local = use_pallas and c.USE_PALLAS_LOCAL
        # context-parallel matching: shard query-pixel rows over the
        # mesh "model" axis (GSPMD constraint inside the matching ops).
        # Gated on the resolved ambient mesh (jax.set_mesh), not cfg
        # alone — when cp_mesh degrades to a data-only mesh (too few
        # devices) this must degrade to the unsharded path with it.
        from ..parallel.mesh import resolved_cp_axis
        cp_axis = resolved_cp_axis(c)

        # masked slots/objects never contribute
        ref_onehot = ref_onehot * obj_valid[None, None, None, :]
        prev_onehot = prev_onehot * obj_valid[None, None, :]

        # flatten the bank once; compact to foreground-union pixels
        # (static-shape masked_select, matching.py:2352-2358)
        seg_bank = False
        if flat_emb is None:
            ref_bank_g = ref_emb_bank
            ref_onehot_g = ref_onehot
            if g_atrous > 1:
                ref_bank_g = ref_bank_g[:, ::g_atrous, ::g_atrous]
                ref_onehot_g = ref_onehot_g[:, ::g_atrous, ::g_atrous]
            flat_emb = ref_bank_g.reshape(-1, ref_bank_g.shape[-1])
            flat_lab = (ref_onehot_g * slot_valid[:, None, None, None]
                        ).reshape(-1, o)
            if c.MATCHING_MAX_REF_PIXELS:
                flat_emb, flat_lab = compact_reference_bank(
                    flat_emb, flat_lab, c.MATCHING_MAX_REF_PIXELS)
        else:
            # precompacted upstream; re-mask in case obj_valid grew
            # since the last refresh (cheap [P, O])
            flat_lab = flat_lab * obj_valid[None, :]
            seg_bank = (c.MATCHING_SEGMENTED_BANK
                        and bool(c.MATCHING_MAX_REF_PIXELS))

        # 1. global pixel matching (aocnet.py:161-205).  A precompacted
        # label-segmented bank + TPU inference routes to the segmented
        # kernel (one min per label-pure tile); every other path — train,
        # CPU, context-parallel — runs the XLA online-min, which treats
        # the segmented layout exactly like any flat bank.
        if flat_emb is not None and seg_bank and use_pallas and cp_axis is None:
            global_fg = global_matching_flat_segmented(
                current_emb, flat_emb.astype(dtype), flat_lab.astype(dtype),
                bias, dtype=dtype, mixed=mixed, tile_obj=flat_obj)
        else:
            global_fg = global_matching_flat(
                current_emb, flat_emb.astype(dtype), flat_lab.astype(dtype),
                bias, dtype=dtype, use_pallas=use_pallas, mixed=mixed,
                cp_axis=cp_axis)

        # 2. AOP cluster matching (aocnet.py:207-251).  The reference
        # clusters DETACHED embeddings (matching.py:289 .detach().cpu())
        # — no gradient flows into the banks; stop_gradient both matches
        # that and avoids differentiating 20 Lloyd iterations.
        banks = cluster_objects(jax.lax.stop_gradient(flat_emb),
                                jax.lax.stop_gradient(flat_lab), kmeans_key,
                                k=c.MODEL_CLUSTER_NUM,
                                iters=c.MODEL_KMEANS_ITERS, mixed=mixed)
        global_cluster = cluster_matching(current_emb, banks, bias,
                                          dtype=dtype, cp_axis=cp_axis)

        # 3+4. instance proxies (aocnet.py:270-337), then BOTH local
        # matchings (pixel prev, aocnet.py:253-264, and the proxy-
        # reconstructed prev, :330-337) fused into one scan — they share
        # the query and the label map, so stacking halves the number of
        # sequential window-row steps (the eval profile's two `while`
        # loops at ~2.9 ms each).
        heads = attention_heads(ref_emb_bank, ref_onehot, slot_valid,
                                prev_emb, prev_onehot, c.MODEL_EPSILON)
        global_proxy = proxy_matching(current_emb, heads.ref_pos, bias,
                                      dtype=dtype, cp_axis=cp_axis)
        prev_emb_inst = proxy_reconstructed_embedding(prev_onehot,
                                                      heads.prev_pos)
        local_pair = local_matching_bank_stacked(
            current_emb,
            jnp.stack([prev_emb, prev_emb_inst.astype(prev_emb.dtype)]),
            prev_onehot, bias,
            c.MODEL_MULTI_LOCAL_DISTANCE, atrous_rate=l_atrous,
            allow_downsample=c.MODEL_LOCAL_DOWNSAMPLE, dtype=op_dtype,
            use_pallas=use_pallas_local)
        local_fg, local_proxy = local_pair[0], local_pair[1]

        # 5. concat in reference channel order (aocnet.py:349-358)
        parts = [global_fg, global_cluster, global_proxy, local_fg,
                 local_proxy, prev_onehot[..., None]]
        if c.MODEL_MATCHING_BACKGROUND:
            parts.append(foreground2background(local_fg, obj_valid))
            parts.append(foreground2background(global_fg, obj_valid))
        maps = jnp.concatenate(parts, axis=-1)        # [h, w, O, n_ch]
        maps = jnp.transpose(maps, (2, 0, 1, 3))      # [O, h, w, n_ch]
        # distance maps are f32 (sigmoid-squashed); run the decoder in
        # the embedding compute dtype (bf16 at eval) — otherwise one f32
        # activation re-promotes every decoder tower to f32.
        maps = maps.astype(current_emb.dtype)

        # 6. prehead + decoder (aocnet.py:360-367)
        pre = self.dynamic_prehead(maps)
        cur = jnp.broadcast_to(current_emb[None], (o,) + current_emb.shape)
        x = jnp.concatenate([cur, pre], axis=-1)
        # heads/validity are f32; cast so they don't re-promote the
        # decoder towers when running bf16
        head = heads.total_head.astype(current_emb.dtype)
        logits, new_memory = self.dynamic_seghead(
            x, head, memory, current_low[None],
            obj_valid.astype(current_emb.dtype))

        # invalid object channels can never win the softmax/argmax
        logits = jnp.where(obj_valid[:, None, None].astype(bool), logits, -1e9)
        return logits, new_memory

    # convenience entry for jit/compile checks --------------------------------
    def __call__(self, imgs, deterministic: bool = True):
        return self.extract_feature(imgs, deterministic)

    def full_forward(self, imgs, labels, deterministic: bool = True):
        """Touch every submodule once (init / compile-check path).

        imgs: [3, H, W, 3] (ref, prev, cur); labels: [H4, W4] int at the
        embedding resolution.  Returns logits [O, h4, w4].
        """
        o = self.cfg.MODEL_MAX_OBJ_NUM
        emb, low = self.extract_feature(imgs, deterministic)
        h, w = emb.shape[1], emb.shape[2]
        onehot = jax.nn.one_hot(labels, o, dtype=emb.dtype)
        memory = DecoderMemory.empty(o, (h + 1) // 2, (w + 1) // 2,
                                     self.cfg.MODEL_HEAD_EMBEDDING_DIM,
                                     emb.dtype)
        logits, _ = self.segment_frame(
            emb[2], low[2], emb[0][None], onehot[None],
            jnp.ones((1,), emb.dtype), emb[1], onehot,
            jnp.ones((o,), emb.dtype), memory, jax.random.PRNGKey(0), False)
        return logits


def precompact_bank(cfg: Config, ref_emb_bank, ref_onehot, slot_valid):
    """Flatten + compaction of the eval reference bank — the same
    transform ``segment_frame`` applies inline, hoisted so the evaluator
    runs it only when the bank (or object set) changes instead of every
    frame.  Returns (flat_emb [P, C], flat_lab [P, O], tile_obj) —
    ``tile_obj`` is the occupancy layout's tile→object map (None for the
    uniform-quota / unsegmented layouts)."""
    from ..ops.matching import compact_reference_bank_occupancy

    o = ref_onehot.shape[-1]
    g = cfg.TEST_GLOBAL_ATROUS_RATE
    if g > 1:
        ref_emb_bank = ref_emb_bank[:, ::g, ::g]
        ref_onehot = ref_onehot[:, ::g, ::g]
    flat_emb = ref_emb_bank.reshape(-1, ref_emb_bank.shape[-1])
    flat_lab = (ref_onehot * slot_valid[:, None, None, None]).reshape(-1, o)
    tile_obj = None
    if cfg.MATCHING_MAX_REF_PIXELS:
        if cfg.MATCHING_SEGMENTED_BANK and cfg.MATCHING_OCCUPANCY_BANK:
            flat_emb, flat_lab, tile_obj = compact_reference_bank_occupancy(
                flat_emb, flat_lab, cfg.MATCHING_MAX_REF_PIXELS)
        elif cfg.MATCHING_SEGMENTED_BANK:
            flat_emb, flat_lab = compact_reference_bank_segmented(
                flat_emb, flat_lab, cfg.MATCHING_MAX_REF_PIXELS)
        else:
            flat_emb, flat_lab = compact_reference_bank(
                flat_emb, flat_lab, cfg.MATCHING_MAX_REF_PIXELS)
    return flat_emb, flat_lab, tile_obj


def init_model(cfg: Config, rng: jax.Array, spatial: Tuple[int, int] = (65, 65)):
    """Initialize a complete AOCNet variable tree (all submodules)."""
    if cfg.MESH_MODEL_AXIS > 1:
        # full_forward traces the context-parallel sharding constraints,
        # which need the ambient mesh set during init as well
        from ..parallel.mesh import ambient_mesh_ctx, cp_mesh
        with ambient_mesh_ctx(cp_mesh(cfg)):
            return _init_model_inner(cfg, rng, spatial)
    return _init_model_inner(cfg, rng, spatial)


def _init_model_inner(cfg: Config, rng: jax.Array, spatial: Tuple[int, int]):
    model = AOCNet(cfg)
    h, w = spatial
    imgs = jnp.zeros((3, h, w, 3), jnp.float32)
    # probe the true embedding resolution without running any math
    emb_shape = jax.eval_shape(
        lambda v, x: model.apply(v, x, method=AOCNet.extract_feature),
        jax.eval_shape(lambda r: model.init({"params": r}, imgs,
                                            method=AOCNet.extract_feature),
                       rng),
        imgs)[0]
    labels = jnp.zeros(emb_shape.shape[1:3], jnp.int32)
    variables = jax.jit(
        lambda r: model.init({"params": r}, imgs, labels,
                             method=AOCNet.full_forward))(rng)
    return model, variables
