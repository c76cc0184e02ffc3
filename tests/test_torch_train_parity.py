"""Training-path parity vs the independent torch oracle (VERDICT r4 #4).

Two layers of evidence that ``make_train_step``'s loss is the reference's
training loss (``networks/engine/train_manager_mm.py:182-317`` +
``networks/layers/loss.py:52-97``):

* ``test_hard_mining_ce_oracle`` — the annealed top-k CE against an
  exact-reference-semantics torch implementation across the anneal
  (k=100% → 15%), including the documented ignore-pixel divergence;
* ``test_torch_train_parity`` (slow) — a full 2-frame rollout with the
  burn-in prev-mask substitution ACTIVE (step > START_SEQ_TRAINING),
  mid-anneal hard mining, decoder memory carried across frames: loss
  values ≤1e-3 rel AND parameter gradients (torch autograd vs jax.grad)
  agree for the matching bias, a backbone conv and a decoder head.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from rvos_tpu.configs import tiny_test
from rvos_tpu.engine.checkpoint import _flatten
from rvos_tpu.engine.loss import hard_mining_ce

from test_checkpoint import _torchify
from torch_oracle import reference_hard_mining_ce, torch_train_loss


def test_hard_mining_ce_oracle(rng):
    """hard_mining_ce == reference Concat_CrossEntropyLoss semantics
    (loss.py:52-97) across the anneal whenever k <= #valid pixels, and
    the early-step ignore-pixel divergence is exactly the documented
    n_all/n_valid dilution factor."""
    o, h, w = 4, 31, 29
    logits = rng.standard_normal((o, h, w)).astype(np.float32)
    labels = rng.integers(0, o, (h, w)).astype(np.int32)
    labels[:3] = 255                                # ~10% ignored rows
    hms = 10

    for step in (3, 7, 10, 25):                     # k = 74.5% ... 15%
        ours = float(hard_mining_ce(jnp.asarray(logits), jnp.asarray(labels),
                                    jnp.asarray(step), 0.15, hms))
        ref = float(reference_hard_mining_ce(
            torch.from_numpy(logits), torch.from_numpy(labels).long(),
            step, 0.15, hms))
        assert abs(ours - ref) <= 1e-5 * max(abs(ref), 1.0), \
            f"step={step}: ours={ours} ref={ref}"

    # step 0: k = 100% of pixels > #valid — the reference's top-k pool
    # includes the ignored pixels' 0-loss entries (mean diluted by
    # n_valid/n_all); the rebuild averages the selected valid pixels
    n_all = h * w
    n_valid = int((labels != 255).sum())
    ours0 = float(hard_mining_ce(jnp.asarray(logits), jnp.asarray(labels),
                                 jnp.asarray(0), 0.15, hms))
    ref0 = float(reference_hard_mining_ce(
        torch.from_numpy(logits), torch.from_numpy(labels).long(),
        0, 0.15, hms))
    np.testing.assert_allclose(ours0, ref0 * n_all / n_valid, rtol=1e-5)

    # no ignored pixels: exact at every step including 0
    lab2 = rng.integers(0, o, (h, w)).astype(np.int32)
    for step in (0, 5, 20):
        ours = float(hard_mining_ce(jnp.asarray(logits), jnp.asarray(lab2),
                                    jnp.asarray(step), 0.15, hms))
        ref = float(reference_hard_mining_ce(
            torch.from_numpy(logits), torch.from_numpy(lab2).long(),
            step, 0.15, hms))
        np.testing.assert_allclose(ours, ref, rtol=1e-5)


def _make_batch(rng, hw, t_len):
    h, w = hw
    lab = np.zeros((h, w), np.int32)
    lab[8:30, 6:28] = 1
    lab[36:58, 30:56] = 2

    def shift(a, dy, dx):
        return np.roll(np.roll(a, dy, axis=0), dx, axis=1)

    return {
        "ref_img": rng.standard_normal((1, h, w, 3)).astype(np.float32),
        "prev_img": rng.standard_normal((1, h, w, 3)).astype(np.float32),
        "curr_img": rng.standard_normal((t_len, 1, h, w, 3)
                                        ).astype(np.float32),
        "ref_label": lab[None],
        "prev_label": shift(lab, 2, 1)[None],
        "curr_label": np.stack([shift(lab, 4 + 2 * t, 2 + t)[None]
                                for t in range(t_len)]),
        "obj_num": np.array([2], np.int32),
    }


@pytest.mark.slow
def test_torch_train_parity(rng):
    """Full training rollout vs the torch oracle: loss values and
    parameter gradients.  Burn-in branch ACTIVE (step=5 >
    TRAIN_START_SEQ_TRAINING_STEPS=0 — frame 1 feeds frame 0's
    prediction, train_manager_mm.py:253-263); hard mining mid-anneal
    (step 5 of 10 → k=57.5%)."""
    t_len, hw = 2, (65, 65)
    cfg = tiny_test(DATA_RANDOMCROP=hw, DATA_CURR_SEQ_LEN=t_len,
                    MODEL_MULTI_LOCAL_DISTANCE=(2, 4), MODEL_MAX_OBJ_NUM=3,
                    USE_PALLAS=False, MATCHING_MAX_REF_PIXELS=0,
                    MATCHING_DTYPE="float32", MODEL_CLUSTER_NUM=4,
                    MODEL_KMEANS_ITERS=4, MODEL_ASPP_DROPOUT=0.0,
                    TRAIN_COMPUTE_DTYPE="float32", TRAIN_REMAT=False,
                    TRAIN_START_SEQ_TRAINING_STEPS=0,
                    TRAIN_HARD_MINING_STEP=10)
    step = 5

    from rvos_tpu.models.aocnet import init_model
    from rvos_tpu.engine.train import make_train_step
    import optax

    model, variables = init_model(cfg, jax.random.PRNGKey(0), hw)
    o = min(cfg.DATA_MAX_OBJ_NUM + 1, cfg.MODEL_MAX_OBJ_NUM)
    assert o == 3

    batch = _make_batch(rng, hw, t_len)
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}

    train_step = make_train_step(cfg, model, optax.sgd(0.1))
    loss_rng = jax.random.PRNGKey(42)

    def scalar_loss(params):
        loss, aux = train_step.loss_fn(params, jbatch, jnp.asarray(step),
                                       loss_rng)
        return loss, aux

    (jloss, (jlosses, _, _)), jgrads = jax.jit(
        jax.value_and_grad(scalar_loss, has_aux=True))(variables["params"])
    jloss = float(jloss)
    jlosses = np.asarray(jlosses)

    # shared PRNG draws: the per-frame k-means init scores, derived
    # exactly as loss_fn derives them (seg_rngs → per-item split →
    # cluster_objects' per-object split)
    emb_hw = jax.eval_shape(
        lambda v, x: model.apply(v, x, method=type(model).extract_feature),
        variables, jnp.zeros((1,) + hw + (3,)))[0].shape[1:3]
    r_rows = emb_hw[0] * emb_hw[1]
    seg_rngs = jax.random.split(jax.random.fold_in(loss_rng, 1), t_len)
    uniforms = np.zeros((t_len, o, r_rows), np.float32)
    for t in range(t_len):
        k0 = jax.random.split(seg_rngs[t], 1)[0]
        keys = jax.random.split(k0, o)
        for i in range(o):
            uniforms[t, i] = np.asarray(jax.random.uniform(
                keys[i], (r_rows,), minval=0.5, maxval=1.0))

    flat = _flatten(jax.device_get(variables["params"]))
    sd = {k: torch.tensor(np.asarray(v), requires_grad=True)
          for k, v in _torchify(flat).items()}
    tloss, tlosses = torch_train_loss(sd, batch, cfg, o, step, uniforms)
    tloss.backward()

    # per-frame and total loss parity (VERDICT bar: <=1e-3 rel)
    for t in range(t_len):
        rel = abs(jlosses[t] - float(tlosses[t])) / max(
            abs(float(tlosses[t])), 1e-6)
        assert rel <= 1e-3, (f"frame {t}: jax={jlosses[t]:.6f} "
                             f"torch={float(tlosses[t]):.6f} rel={rel:.2e}")
    assert abs(jloss - float(tloss)) / abs(float(tloss)) <= 1e-3

    # gradient parity on representative parameters: the matching bias
    # (feeds every stream), a backbone conv (flows through the carried
    # embedding recurrence), a decoder dynamic head
    grad_sd = _torchify(_flatten(jax.device_get(jgrads)))
    for name in ("bg_bias", "fg_bias",
                 "feature_extracter.backbone.conv1.weight",
                 "dynamic_seghead.IA_final_fg.weight"):
        jg = np.asarray(grad_sd[name])
        tg = sd[name].grad.numpy()
        scale = max(np.abs(tg).max(), 1e-8)
        rel = np.abs(jg - tg).max() / scale
        assert rel <= 2e-2, f"{name}: grad rel err {rel:.3e} (scale {scale:.3e})"
        # gradients actually flowed (not trivially-zero agreement)
        assert np.abs(tg).max() > 0, f"{name}: zero torch gradient"
