"""Training engine — data-parallel jitted sequence training.

Reference: ``Trainer.sequential_training``
(``networks/engine/train_manager_mm.py:182-317``): per step, a 5-frame
rollout where each frame runs the model against (ref, prev) and
accumulates gradients; after ``TRAIN_START_SEQ_TRAINING_STEPS`` the
predicted previous mask replaces ground truth (burn-in); grads are
clipped and one SGD step applied.

TPU-native re-design:

* the whole rollout is a ``lax.scan`` inside ONE jitted step — loss is
  the rollout mean, so the gradient equals the reference's 5-backward
  accumulation (÷T each) without host round-trips;
* the previous-frame embedding is *carried* between rollout steps
  instead of re-extracted (the reference reruns the backbone on
  cat(ref, prev, cur) every substep — 15 passes; here 1 ref + 1 prev +
  T cur = 7).  ``TRAIN_SEQ_GRADIENT``: "carry" lets gradient flow
  through the recurrence (a superset of the reference's paths),
  "detach" stops it at the carry;
* data parallelism via a 1-D ``data`` mesh: batch sharded, params
  replicated; XLA emits the gradient all-reduce over ICI — the NCCL/DDP
  analogue (``train_manager_mm.py:47-57``) with no comm code;
* burn-in is a ``jnp.where`` on the step counter — one compiled graph
  serves both phases.
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..configs import Config
from ..models import AOCNet, DecoderMemory
from ..models.aocnet import init_model
from ..ops.resize import resize_hw
from .learning import build_optimizer, lr_schedule
from .loss import batched_iou, hard_mining_ce


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def _downscale_labels(labels, hw):
    """Full-res int labels [B, H, W] → nearest at embedding res [B, h, w]."""
    def one(lab):
        return resize_hw(lab[..., None].astype(jnp.int32), hw, "nearest")[..., 0]
    return jax.vmap(one)(labels)


def _maybe_normalize(imgs):
    """In-graph ImageNet normalize for raw uint8 batches (ref ToTensor,
    custom_transforms.py:352-385).  The uint8 host feed skips the host
    normalize pass and ships 4x less over the tunnel; float inputs are
    assumed already normalized (legacy path, numerically identical)."""
    if imgs.dtype != jnp.uint8:
        return imgs
    from ..data.transforms import IMAGENET_MEAN, IMAGENET_STD
    x = imgs.astype(jnp.float32) / 255.0
    return (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)


def make_train_step(cfg: Config, model: AOCNet, tx):
    """Build the jitted train step: (state, batch, rng) → (state, metrics).

    The training object axis is DATA_MAX_OBJ_NUM+1 (BalancedRandomCrop
    caps at 5 objects, custom_transforms.py:67) — params are object-
    count agnostic, so eval can use the wider MODEL_MAX_OBJ_NUM axis.
    """
    o = min(cfg.DATA_MAX_OBJ_NUM + 1, cfg.MODEL_MAX_OBJ_NUM)
    t_len = cfg.DATA_CURR_SEQ_LEN

    def loss_fn(params, batch, step, rng):
        if cfg.TRAIN_COMPUTE_DTYPE == "bfloat16":
            # mixed precision: bf16 forward activations, f32 master
            # params and grads (the cast is differentiated) — halves
            # activation HBM, the lever that lifts the 465² train step
            # off the 16GB cliff (see ROUND_NOTES.md)
            fwd_params = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
                params)
        else:
            fwd_params = params
        variables = {"params": fwd_params}

        in_dtype = (jnp.bfloat16 if cfg.TRAIN_COMPUTE_DTYPE == "bfloat16"
                    else jnp.float32)

        def extract(imgs, drop_rng):
            imgs = _maybe_normalize(imgs)
            emb, low = model.apply(variables, imgs.astype(in_dtype), False,
                                   rngs={"dropout": drop_rng},
                                   method=AOCNet.extract_feature)
            # flax norm layers can emit f32 from bf16 inputs; keep the
            # activation dtype stable across the scan carry
            return emb.astype(in_dtype), low.astype(in_dtype)

        if cfg.TRAIN_REMAT:
            extract = jax.checkpoint(
                extract, policy=jax.checkpoint_policies.nothing_saveable)

        rngs = jax.random.split(rng, t_len + 2)
        ref_emb, _ = extract(batch["ref_img"], rngs[0])
        prev_emb, _ = extract(batch["prev_img"], rngs[1])
        b, h, w, _ = ref_emb.shape
        hw = (h, w)
        full_hw = batch["ref_img"].shape[1:3]

        ref_lab = _downscale_labels(batch["ref_label"], hw)       # [B, h, w]
        prev_lab = _downscale_labels(batch["prev_label"], hw)
        obj_valid = (jnp.arange(o)[None, :]
                     <= batch["obj_num"][:, None]).astype(jnp.float32)

        ref_onehot = jax.nn.one_hot(ref_lab, o,
                                    dtype=ref_emb.dtype)          # [B, h, w, O]

        mem_h = (h + 1) // 2
        mem_w = (w + 1) // 2
        mem0 = DecoderMemory(
            slots=jnp.zeros((b, 2, o, mem_h, mem_w,
                             cfg.MODEL_HEAD_EMBEDDING_DIM), ref_emb.dtype),
            valid=jnp.zeros((b, 2), bool))

        # extract ALL rollout frames in one conv-batch-(T*B) call:
        # feature extraction has no temporal recurrence (only matching
        # does), and XLA:TPU schedules conv weight-gradients poorly at
        # batch 1 (row-sliced backward — see ROUND_NOTES.md)
        t_, b_ = batch["curr_img"].shape[:2]
        flat_imgs = batch["curr_img"].reshape((t_ * b_,)
                                              + batch["curr_img"].shape[2:])
        curr_embs, curr_lows = extract(flat_imgs, rngs[2])
        curr_embs = curr_embs.reshape((t_, b_) + curr_embs.shape[1:])
        curr_lows = curr_lows.reshape((t_, b_) + curr_lows.shape[1:])

        def scan_body(carry, xs):
            prev_e, prev_l_gt, prev_l_pred, mem, _ = carry
            cur_emb, cur_low, cur_lab_full, seg_rng = xs
            if cfg.TRAIN_SEQ_GRADIENT == "detach":
                prev_e = jax.lax.stop_gradient(prev_e)
            # burn-in: predicted prev mask after the threshold step
            use_pred = step > cfg.TRAIN_START_SEQ_TRAINING_STEPS
            prev_l = jnp.where(use_pred, prev_l_pred, prev_l_gt)

            logits, new_mem = jax.vmap(
                lambda ce, cl, re_, ro_, pe, pl, ov, ms, mv, k:
                model.apply(
                    variables, ce, cl, re_[None], ro_[None], jnp.ones((1,)),
                    pe, jax.nn.one_hot(pl, o, dtype=ce.dtype), ov,
                    DecoderMemory(ms, mv), k, True,
                    method=AOCNet.segment_frame))(
                cur_emb, cur_low, ref_emb, ref_onehot, prev_e, prev_l,
                obj_valid, mem.slots, mem.valid,
                jax.random.split(seg_rng, b))
            new_mem = DecoderMemory(new_mem.slots.astype(in_dtype),
                                    new_mem.valid)

            # upsample to input resolution for the loss (aocnet.py:73)
            def up(lg):
                x = jnp.transpose(lg, (1, 2, 0)).astype(jnp.float32)
                x = resize_hw(x, full_hw, "bilinear")
                return jnp.transpose(x, (2, 0, 1))
            logits_full = jax.vmap(up)(logits)                    # [B, O, H, W]

            losses = jax.vmap(
                lambda lg, lb: hard_mining_ce(
                    lg, lb, step, cfg.TRAIN_TOP_K_PERCENT_PIXELS,
                    cfg.TRAIN_HARD_MINING_STEP))(
                logits_full, cur_lab_full)
            pred_full = jnp.argmax(logits_full, axis=1)           # [B, H, W]
            pred_small = _downscale_labels(pred_full, hw)
            cur_lab_small = _downscale_labels(cur_lab_full, hw)
            iou = batched_iou(pred_full, cur_lab_full, batch["obj_num"], o)

            # full-res pred rides the carry (not the stacked ys) so only
            # the LAST frame's mask is kept — for TRAIN_IMG_LOG dumps.
            # Gated on the (static) flag: without image logging the int32
            # full-res carry is pure HBM traffic through the remat'd scan
            # (ADVICE r3)
            new_carry = (cur_emb, cur_lab_small, pred_small, new_mem,
                         pred_full.astype(jnp.int32) if cfg.TRAIN_IMG_LOG
                         else jnp.zeros((), jnp.int32))
            return new_carry, (jnp.mean(losses), iou)

        seg_rngs = jax.random.split(jax.random.fold_in(rng, 1), t_len)
        carry0 = (prev_emb, prev_lab, prev_lab, mem0,
                  jnp.zeros((b,) + tuple(full_hw), jnp.int32)
                  if cfg.TRAIN_IMG_LOG else jnp.zeros((), jnp.int32))
        body = scan_body
        if cfg.TRAIN_REMAT:
            # whole-rollout AD would hold every frame's activations —
            # ~5x peak HBM; remat keeps only the carries and recomputes
            # the frame forward during the backward pass
            # (jax.checkpoint, SURVEY.md §7 / HBM-bandwidth tradeoff)
            body = jax.checkpoint(
                scan_body, policy=jax.checkpoint_policies.nothing_saveable)
        carry_f, (losses, ious) = jax.lax.scan(
            body, carry0,
            (curr_embs, curr_lows, batch["curr_label"], seg_rngs))
        return jnp.mean(losses), (losses, ious, carry_f[-1])

    def train_step(state: TrainState, batch, rng):
        (loss, (losses, ious, last_pred)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, batch, state.step, rng)
        grad_norm = optax.global_norm(grads)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        if cfg.TRAIN_SKIP_NONFINITE:
            # One inf/nan batch (e.g. an eps-normalized zero-pixel
            # object in a degenerate crop) must not poison the params
            # forever: clip-by-global-norm scales by a NONFINITE norm,
            # so without this guard a single bad step turns every
            # parameter NaN and the run silently flatlines (observed:
            # workdir/genab_train.log step 158).  The reference's
            # analogue is torch.cuda.amp.GradScaler's skip-on-inf
            # (train_manager_mm.py fp16 path); here the guard is
            # dtype-independent and costs one select per tensor.
            ok = jnp.isfinite(grad_norm)
            new_params = jax.tree.map(
                lambda n, old: jnp.where(ok, n, old), new_params,
                state.params)
            new_opt = jax.tree.map(
                lambda n, old: jnp.where(ok, n, old)
                if hasattr(n, "dtype") else n, new_opt, state.opt_state)
        metrics = {"loss": loss, "seq_losses": losses,
                   "iou": jnp.mean(ious),
                   "grad_norm": grad_norm,
                   "pred": last_pred}
        return TrainState(new_params, new_opt, state.step + 1), metrics

    train_step.loss_fn = loss_fn   # exposed for profiling / tests
    return train_step


def _train_log_images(batch, pred_full: np.ndarray) -> dict:
    """Assemble the TRAIN_IMG_LOG dump set for batch item 0 — the
    reference's mask-overlaid ref/prev image, current ground truth and
    current prediction (``train_manager_mm.py:339-355``)."""
    from ..data.transforms import IMAGENET_MEAN, IMAGENET_STD
    from ..utils.image import label2colormap, masked_image

    def denorm(img):
        if np.asarray(img).dtype == np.uint8:    # raw uint8 feed
            return np.asarray(img, np.float32)
        x = np.asarray(img, np.float32) * IMAGENET_STD + IMAGENET_MEAN
        return np.clip(x * 255.0, 0, 255)

    def overlay(img_hwc, lab):
        lab = np.asarray(lab).astype(np.uint8)
        cm = label2colormap(lab).transpose(2, 0, 1).astype(np.float32)
        out = masked_image(denorm(img_hwc).transpose(2, 0, 1), cm, lab)
        return out.transpose(1, 2, 0)

    curr_img = np.asarray(batch["curr_img"])[-1][0]
    curr_lab = np.asarray(batch["curr_label"])[-1][0]
    return {
        "ref_img": overlay(np.asarray(batch["ref_img"])[0],
                           np.asarray(batch["ref_label"])[0]),
        "prev_img": overlay(np.asarray(batch["prev_img"])[0],
                            np.asarray(batch["prev_label"])[0]),
        "groundtruth": overlay(curr_img, curr_lab),
        "prediction": overlay(curr_img, pred_full),
    }


class Trainer:
    """Data-parallel trainer (the reference ``Trainer``, re-architected).

    Reference responsibilities covered: model build + init
    (:23-79), optimizer with per-param wd (:61-72), auto-resume
    (:87-96), dataset assembly (:126-178), the sequential training loop
    (:182-317) with LR schedule, burn-in, grad clipping, periodic
    checkpointing and rank-0 logging.
    """

    def __init__(self, cfg: Config, mesh: Optional[Mesh] = None,
                 init_spatial: Tuple[int, int] = None):
        self.cfg = cfg
        if mesh is None:
            from ..parallel.mesh import cp_mesh
            mesh = cp_mesh(cfg)          # (data, model) when CP enabled
            if mesh is None:
                n = min(cfg.MESH_DATA_AXIS, len(jax.devices()))
                mesh = Mesh(np.array(jax.devices()[:n]), ("data",))
        self.mesh = mesh
        spatial = init_spatial or cfg.DATA_RANDOMCROP
        self.model, variables = init_model(cfg, jax.random.PRNGKey(0), spatial)
        params = variables["params"]
        self.tx = build_optimizer(cfg, params)
        opt_state = self.tx.init(params)
        self.state = TrainState(params, opt_state,
                                jnp.asarray(cfg.TRAIN_START_STEP))
        self._step_fn = None
        self.lr_fn = lr_schedule(cfg)
        self._process_pretrained_model()

    def _process_pretrained_model(self):
        """Auto-resume, else pretrained warm-start — the reference's
        ``process_pretrained_model`` (``train_manager_mm.py:81-124``):
        resume from the newest own checkpoint if one exists; otherwise,
        when ``PRETRAIN`` is set, partial-restore ``PRETRAIN_MODEL``
        (full model when ``PRETRAIN_FULL``, backbone-only otherwise)."""
        cfg = self.cfg
        if cfg.TRAIN_AUTO_RESUME and self._auto_resume():
            return
        if cfg.TRAIN_RESUME:
            self._explicit_resume()
            return
        if cfg.PRETRAIN and cfg.PRETRAIN_MODEL:
            from .checkpoint import load_pretrained
            params, removed, n_loaded = load_pretrained(
                self.state.params, cfg.PRETRAIN_MODEL,
                full=cfg.PRETRAIN_FULL)
            self.state = self.state._replace(params=params)
            kind = "VOS model" if cfg.PRETRAIN_FULL else "backbone model"
            print(f"Load pretrained {kind} from {cfg.PRETRAIN_MODEL} "
                  f"({n_loaded - len(removed)}/{n_loaded} keys merged).")
            if removed:
                print(f"Remove {removed} from pretrained model.")

    def _auto_resume(self) -> bool:
        """Resume from the newest checkpoint in the result dir
        (reference ``train_manager_mm.py:87-96``)."""
        from .checkpoint import list_checkpoint_steps, restore_checkpoint
        ckpt_dir = self.cfg.result_dirs()["ckpt"]
        steps = list_checkpoint_steps(ckpt_dir)
        if steps:
            self.state, step = restore_checkpoint(ckpt_dir, None, self.state)
            print(f"Auto-resumed from step {step} ({ckpt_dir})")
            return True
        return False

    def _explicit_resume(self):
        """Resume from a named checkpoint — the reference's
        ``TRAIN_RESUME``/``TRAIN_RESUME_CKPT``/``TRAIN_RESUME_STEP`` trio
        (``train_manager_mm.py:97-113``).  ``TRAIN_RESUME_CKPT`` is either
        an integer step in the result ckpt dir or an explicit checkpoint
        path; ``TRAIN_RESUME_STEP`` (when nonzero) overrides the step the
        run continues from (the reference defaults it to ckpt+1; here the
        saved state already carries the post-step counter)."""
        from .checkpoint import restore_checkpoint, restore_checkpoint_path
        cfg = self.cfg
        spec = cfg.TRAIN_RESUME_CKPT
        if spec is not None and os.path.isdir(str(spec)):
            self.state = restore_checkpoint_path(str(spec), self.state)
            step = int(self.state.step)
        else:
            ckpt_dir = cfg.result_dirs()["ckpt"]
            want = int(spec) if spec is not None else None
            self.state, step = restore_checkpoint(ckpt_dir, want, self.state)
        if cfg.TRAIN_RESUME_STEP:
            step = int(cfg.TRAIN_RESUME_STEP)
            self.state = self.state._replace(step=jnp.asarray(step))
        if cfg.TRAIN_TOTAL_STEPS <= step:
            print("Your training has finished!")
        print(f"Resume from step {step}")

    def _build_step(self):
        if self._step_fn is not None:
            return self._step_fn
        step = make_train_step(self.cfg, self.model, self.tx)
        repl = NamedSharding(self.mesh, P())
        data = NamedSharding(self.mesh, P("data"))
        data_t = NamedSharding(self.mesh, P(None, "data"))
        batch_shardings = {
            "ref_img": data, "prev_img": data, "curr_img": data_t,
            "ref_label": data, "prev_label": data, "curr_label": data_t,
            "obj_num": data,
        }
        self._step_fn = jax.jit(
            step,
            in_shardings=(None, batch_shardings, None),
            out_shardings=None,
            donate_argnums=(0,),
        )
        return self._step_fn

    def train_step(self, batch: Dict[str, np.ndarray], rng) -> Dict:
        fn = self._build_step()
        from ..parallel.mesh import ambient_mesh_ctx
        if jax.process_count() > 1:
            # multi-host SPMD: each process holds only its slice of the
            # global batch — stitch into global jax.Arrays (the jitted
            # step and its in_shardings are oblivious)
            from ..parallel.distributed import make_global_batch
            batch = make_global_batch(self.mesh, batch)
        with ambient_mesh_ctx(self.mesh):
            self.state, metrics = fn(self.state, batch, rng)
        return metrics

    def fit(self, batcher, log_every: int = 20, save_every: int = 0,
            ckpt_dir: str = "", max_steps: Optional[int] = None):
        cfg = self.cfg
        total = max_steps or cfg.TRAIN_TOTAL_STEPS
        rng = jax.random.PRNGKey(1234)
        epoch = 0
        t0 = time.time()
        from ..parallel.distributed import is_primary
        from ..utils.logging import MetricsLogger
        # rank-0 logging/checkpointing, like the reference's
        # ``self.rank == 0`` gates (train_manager_mm.py:285-317)
        primary = is_primary()
        logger = (MetricsLogger(cfg.result_dirs()["log"], tb=cfg.TRAIN_TBLOG)
                  if primary else None)
        while int(self.state.step) < total:
            for batch in batcher.epoch(epoch):
                rng, sub = jax.random.split(rng)
                metrics = self.train_step(batch, sub)
                step = int(self.state.step)
                if not primary:
                    if step >= total:
                        break
                    continue
                if step % log_every == 0 or step == 1 or step >= total:
                    loss = float(metrics["loss"])
                    iou = float(metrics["iou"])
                    lr = float(self.lr_fn(step))
                    dt = time.time() - t0
                    print(f"Itr:{step}, LR:{lr:.7f}, Time:{dt:.3f}, "
                          f"L:{loss:.3f} IoU:{iou:.3f}")
                    logger.log(step, {"loss": loss, "iou": iou, "lr": lr,
                                      "grad_norm": float(metrics["grad_norm"]),
                                      "step_time": dt / max(1, log_every)})
                    if cfg.TRAIN_IMG_LOG:
                        logger.log_images(step, _train_log_images(
                            batch, np.asarray(metrics["pred"][0])))
                    t0 = time.time()
                if save_every and ckpt_dir and step % save_every == 0 and step:
                    from .checkpoint import save_checkpoint
                    save_checkpoint(ckpt_dir, step, self.state,
                                    cfg.TRAIN_MAX_KEEP_CKPT)
                if step >= total:
                    break
            epoch += 1
        return self.state
