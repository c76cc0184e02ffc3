"""Checkpoint round-trip, pruning, partial restore, torch conversion."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rvos_tpu.engine.checkpoint import (
    _flatten,
    convert_torch_statedict,
    list_checkpoint_steps,
    partial_restore,
    restore_checkpoint,
    save_checkpoint,
)
from rvos_tpu.engine.train import TrainState


def _small_state(rng):
    params = {"a": {"w": rng.standard_normal((3, 4)).astype(np.float32)},
              "b": {"bias": rng.standard_normal((4,)).astype(np.float32)}}
    return TrainState(params=jax.tree.map(jnp.asarray, params),
                      opt_state={"mom": jnp.zeros((3, 4))},
                      step=jnp.asarray(7))


def test_save_restore_roundtrip(tmp_path, rng):
    st = _small_state(rng)
    save_checkpoint(str(tmp_path), 7, st, max_keep=2)
    assert list_checkpoint_steps(str(tmp_path)) == [7]
    restored, step = restore_checkpoint(str(tmp_path), None, st)
    assert step == 7
    np.testing.assert_allclose(np.asarray(restored.params["a"]["w"]),
                               np.asarray(st.params["a"]["w"]))


def test_prune_max_keep(tmp_path, rng):
    st = _small_state(rng)
    for s in (2, 4, 6, 8):
        save_checkpoint(str(tmp_path), s, st, max_keep=2)
    assert list_checkpoint_steps(str(tmp_path)) == [6, 8]


def test_partial_restore_shape_check(rng):
    params = {"m": {"kernel": jnp.zeros((3, 3)), "bias": jnp.zeros((3,))}}
    loaded = {"m/kernel": np.ones((3, 3), np.float32),
              "m/bias": np.ones((5,), np.float32),        # mismatched
              "ghost/x": np.ones((1,), np.float32)}       # missing
    merged, removed = partial_restore(params, loaded)
    np.testing.assert_allclose(np.asarray(merged["m"]["kernel"]), 1.0)
    np.testing.assert_allclose(np.asarray(merged["m"]["bias"]), 0.0)
    assert set(removed) == {"m/bias", "ghost/x"}


def test_torch_conversion_backbone_keys(rng):
    sd = {
        "module.feature_extracter.backbone.conv1.weight":
            rng.standard_normal((64, 3, 7, 7)).astype(np.float32),
        "feature_extracter.backbone.bn1.running_mean":
            rng.standard_normal((64,)).astype(np.float32),
        "feature_extracter.backbone.layer1.0.conv2.weight":
            rng.standard_normal((64, 64, 3, 3)).astype(np.float32),
        "feature_extracter.backbone.layer1.0.downsample.0.weight":
            rng.standard_normal((256, 64, 1, 1)).astype(np.float32),
        "feature_extracter.backbone.layer1.0.downsample.1.running_var":
            rng.standard_normal((256,)).astype(np.float32),
        "feature_extracter.backbone.bn1.num_batches_tracked": np.zeros(()),
    }
    sd["dynamic_seghead.layer1.GCT1.alpha"] = \
        rng.standard_normal((1, 164, 1, 1)).astype(np.float32)
    sd["dynamic_seghead.IA1.IA.weight"] = \
        rng.standard_normal((164, 400)).astype(np.float32)
    sd["dynamic_seghead.layer1.bn1.weight"] = \
        rng.standard_normal((64,)).astype(np.float32)
    out = convert_torch_statedict(sd)
    assert out["feature_extracter/backbone/conv1/kernel"].shape == (7, 7, 3, 64)
    assert "feature_extracter/backbone/bn1/running_mean" in out
    assert out["feature_extracter/backbone/layer1_0/conv2/kernel"
               ].shape == (3, 3, 64, 64)
    assert out["feature_extracter/backbone/layer1_0/downsample_conv/kernel"
               ].shape == (1, 1, 64, 256)
    assert "feature_extracter/backbone/layer1_0/downsample_bn/running_var" in out
    assert not any("num_batches" in k for k in out)
    # GCT params transposed to NHWC
    assert out["dynamic_seghead/layer1/GCT1/alpha"].shape == (1, 1, 1, 164)
    # dense kernels transposed
    assert out["dynamic_seghead/IA1/IA/kernel"].shape == (400, 164)
    # GroupNorm weight outside the extractor becomes flax 'scale'
    assert "dynamic_seghead/layer1/bn1/scale" in out


def _torchify(flat):
    """Inverse of convert_torch_statedict: flax '/'-paths → reference
    torch state_dict keys/layouts (test oracle)."""
    import re
    sd = {}
    for k, v in flat.items():
        v = np.asarray(v)
        parts = k.split("/")
        leaf = parts[-1]
        tparts = []
        for p in parts[:-1]:
            m = re.fullmatch(r"(layer\d+)_(\d+)", p)
            if m and "backbone" in parts:
                tparts += [m.group(1), m.group(2)]
            elif p == "downsample_conv":
                tparts += ["downsample", "0"]
            elif p == "downsample_bn":
                tparts += ["downsample", "1"]
            else:
                tparts.append(p)
        if leaf == "kernel":
            v = v.transpose(3, 2, 0, 1) if v.ndim == 4 else v.T
            leaf = "weight"
        elif leaf == "scale":
            leaf = "weight"
        elif leaf in ("alpha", "gamma", "beta") and v.ndim == 4:
            v = v.transpose(0, 3, 1, 2)
        sd[".".join(tparts + [leaf])] = v
    return sd


@pytest.mark.slow
def test_full_model_torch_roundtrip():
    """A reference-style torch state_dict covering the whole AOCNet tree
    round-trips through the converter into a live model with >=99% of
    keys merged (VERDICT r1 item 1 'done' criterion)."""
    from rvos_tpu.configs import tiny_test
    from rvos_tpu.engine.checkpoint import load_pretrained
    from rvos_tpu.models.aocnet import init_model

    cfg = tiny_test()
    _, variables = init_model(cfg, jax.random.PRNGKey(0), (33, 33))
    params = variables["params"]
    flat = _flatten(jax.tree.map(np.asarray, params))
    rng = np.random.default_rng(3)
    fake = {f"module.{k}": rng.standard_normal(v.shape).astype(np.float32)
            for k, v in _torchify(flat).items()}

    import torch, tempfile, os
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "fake_cfbi.pth")
        torch.save({"state_dict": {k: torch.from_numpy(v)
                                   for k, v in fake.items()}}, path)
        merged, removed, n_loaded = load_pretrained(params, path, full=True)

    assert n_loaded == len(flat)
    frac = (n_loaded - len(removed)) / n_loaded
    assert frac >= 0.99, f"only {frac:.1%} merged; removed={removed[:20]}"
    # values actually landed (not just key-matched)
    merged_flat = _flatten(jax.tree.map(np.asarray, merged))
    n_changed = sum(
        not np.allclose(merged_flat[k], flat[k]) for k in flat)
    assert n_changed > 0.95 * len(flat)


def test_load_pretrained_orbax_chaining(tmp_path, rng):
    """Stage-2 chaining: an orbax ckpt dir warm-starts params fully,
    regardless of PRETRAIN_FULL (scripts/train.sh stage 2)."""
    from rvos_tpu.engine.checkpoint import load_pretrained

    st = _small_state(rng)
    save_checkpoint(str(tmp_path), 50_000, st, max_keep=2)
    target = jax.tree.map(jnp.zeros_like, st.params)
    merged, removed, n_loaded = load_pretrained(target, str(tmp_path),
                                                full=False)
    assert removed == [] and n_loaded == 2
    np.testing.assert_allclose(np.asarray(merged["a"]["w"]),
                               np.asarray(st.params["a"]["w"]))


@pytest.mark.slow
def test_trainer_pretrain_flag_changes_init(tmp_path):
    """--pretrained_path → cfg.PRETRAIN_MODEL → Trainer actually loads
    the weights (the round-1 gap: converter existed, nothing called it)."""
    import torch
    from rvos_tpu.configs import tiny_test
    from rvos_tpu.engine.train import Trainer

    pth = tmp_path / "warm.pth"
    w = np.full((64, 3, 7, 7), 0.123, np.float32)
    torch.save({"feature_extracter.backbone.conv1.weight":
                torch.from_numpy(w)}, str(pth))
    cfg = tiny_test(PRETRAIN=True, PRETRAIN_FULL=True,
                    PRETRAIN_MODEL=str(pth), TRAIN_AUTO_RESUME=False,
                    DIR_ROOT=str(tmp_path))
    tr = Trainer(cfg, init_spatial=(33, 33))
    got = np.asarray(
        tr.state.params["feature_extracter"]["backbone"]["conv1"]["kernel"])
    np.testing.assert_allclose(got, w.transpose(2, 3, 1, 0))


@pytest.mark.slow
def test_trainer_explicit_resume(tmp_path):
    """VERDICT r4 missing #2: named-checkpoint resume — the reference's
    ``TRAIN_RESUME``/``TRAIN_RESUME_CKPT``/``TRAIN_RESUME_STEP`` trio
    (``train_manager_mm.py:87-113``).  Trains 2 real steps, saves, then
    resumes (a) by integer step in the result ckpt dir and (b) from an
    explicit checkpoint path with a ``TRAIN_RESUME_STEP`` override."""
    import os
    from rvos_tpu.configs import tiny_test
    from rvos_tpu.data.datasets import SyntheticTrain
    from rvos_tpu.data.loader import TrainBatcher
    from rvos_tpu.data.transforms import normalize
    from rvos_tpu.engine.train import Trainer
    from rvos_tpu.engine.checkpoint import save_checkpoint

    def tf(sample):
        out = dict(sample)
        out["ref_img"] = normalize(sample["ref_img"])
        out["prev_img"] = normalize(sample["prev_img"])
        out["curr_img"] = [normalize(x) for x in sample["curr_img"]]
        return out

    cfg = tiny_test(DATA_RANDOMCROP=(33, 33),
                    MODEL_MULTI_LOCAL_DISTANCE=(1,),
                    MODEL_MAX_OBJ_NUM=2, DATA_CURR_SEQ_LEN=1,
                    MODEL_BACKBONE="mobilenet",
                    DIR_ROOT=str(tmp_path),
                    TRAIN_AUTO_RESUME=False)
    tr = Trainer(cfg, init_spatial=(33, 33))
    ds = SyntheticTrain(size=(33, 33), curr_len=1, length=4, obj_num=2)
    batcher = TrainBatcher(ds, batch_size=1, transform=tf, num_workers=1)
    rng = jax.random.PRNGKey(0)
    for i, batch in enumerate(batcher.epoch(0)):
        rng, sub = jax.random.split(rng)
        tr.train_step(batch, sub)
        if i >= 1:
            break
    step = int(tr.state.step)
    assert step == 2
    ckpt_dir = cfg.result_dirs()["ckpt"]
    save_checkpoint(ckpt_dir, step, tr.state, max_keep=2)
    want = np.asarray(tr.state.params["bg_bias"])

    # (a) integer step in the result ckpt dir
    tr2 = Trainer(cfg.replace(TRAIN_RESUME=True, TRAIN_RESUME_CKPT="2"),
                  init_spatial=(33, 33))
    assert int(tr2.state.step) == 2
    np.testing.assert_allclose(np.asarray(tr2.state.params["bg_bias"]), want)

    # (b) explicit path + TRAIN_RESUME_STEP override
    path = os.path.join(ckpt_dir, "save_step_2.orbax")
    tr3 = Trainer(cfg.replace(TRAIN_RESUME=True, TRAIN_RESUME_CKPT=path,
                              TRAIN_RESUME_STEP=7),
                  init_spatial=(33, 33))
    assert int(tr3.state.step) == 7
    np.testing.assert_allclose(np.asarray(tr3.state.params["bg_bias"]), want)
