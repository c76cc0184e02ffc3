"""Multi-scale / flip ensemble path of the streaming evaluator
(reference TEST_FLIP / TEST_MULTISCALE averaging, eval_manager :318-320)
plus loss variants and the metrics logger."""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rvos_tpu.configs import tiny_test
from rvos_tpu.data.datasets import SyntheticEval


@pytest.mark.slow
def test_flip_ensemble_eval(tmp_path):
    from rvos_tpu.engine.eval import Evaluator
    from rvos_tpu.models.aocnet import init_model

    cfg = tiny_test(
        DATA_RANDOMCROP=(33, 33),
        MODEL_MULTI_LOCAL_DISTANCE=(1, 2),
        MODEL_MAX_OBJ_NUM=3,
        TEST_MAX_SIZE=None,
        TEST_FLIP=True,
    )
    model, variables = init_model(cfg, jax.random.PRNGKey(0), (33, 33))
    ev = Evaluator(cfg, model, variables)
    ds = SyntheticEval(size=(33, 33), n_seqs=1, n_frames=3, obj_num=2)
    out = ev.evaluate_sequence(ds[0], save_dir=str(tmp_path))
    assert out["frames"] == 2
    for mask in out["results"].values():
        assert mask.shape == (33, 33)


@pytest.mark.slow
def test_batched_ensemble_matches_loop_path(tmp_path):
    """VERDICT r2 next #4: the batched ensemble path (per-scale jitted
    group step + fused device postprocess) must reproduce the host loop
    path (per-variant step + numpy averaging) on a flip+multi-scale
    config."""
    from rvos_tpu.engine.eval import Evaluator
    from rvos_tpu.models.aocnet import init_model

    cfg = tiny_test(
        DATA_RANDOMCROP=(33, 33),
        MODEL_MULTI_LOCAL_DISTANCE=(1, 2),
        MODEL_MAX_OBJ_NUM=3,
        TEST_MAX_SIZE=None,
        TEST_FLIP=True,
        TEST_MULTISCALE=(1.0, 0.8),
    )
    model, variables = init_model(cfg, jax.random.PRNGKey(0), (33, 33))

    def run(use_fused):
        # TEST_ENSEMBLE_SHARD off: this test pins the SINGLE-device
        # batched path (the sharded path has its own equivalence suite,
        # test_ensemble_shard.py — with 8 virtual devices in conftest it
        # would otherwise take over and leave this path uncovered)
        ev = Evaluator(cfg.replace(TEST_FUSED_POSTPROCESS=use_fused,
                                   TEST_ENSEMBLE_SHARD=False),
                       model, variables)
        ds = SyntheticEval(size=(33, 33), n_seqs=1, n_frames=4, obj_num=2)
        return ev.evaluate_sequence(ds[0])["results"]

    loop = run(False)
    batched = run(True)
    assert set(loop) == set(batched)
    total = mismatch = 0
    for k in loop:
        a, b = np.asarray(loop[k]), np.asarray(batched[k])
        assert a.shape == b.shape
        total += a.size
        mismatch += int((a != b).sum())
    # fp association differs (device sum vs numpy mean): allow near-tie
    # argmax flips on a sliver of pixels only
    assert mismatch / total < 0.005, (mismatch, total)


def test_grouped_h2d_matches_per_frame():
    """TEST_H2D_GROUP batches K frames into one uint8 device_put block
    (tunnel RPC amortization); the eval loop consumes device-side
    slices, so results must be BIT-identical to per-frame uploads.
    group=3 over 5 frames also exercises the ragged last group."""
    from rvos_tpu.engine.eval import Evaluator
    from rvos_tpu.models.aocnet import init_model

    cfg = tiny_test(
        DATA_RANDOMCROP=(33, 33),
        MODEL_MULTI_LOCAL_DISTANCE=(1, 2),
        MODEL_MAX_OBJ_NUM=3,
        TEST_MAX_SIZE=None,
    )
    model, variables = init_model(cfg, jax.random.PRNGKey(0), (33, 33))

    def run(group):
        ev = Evaluator(cfg.replace(TEST_H2D_GROUP=group), model, variables)
        ds = SyntheticEval(size=(33, 33), n_seqs=1, n_frames=5, obj_num=2)
        return ev.evaluate_sequence(ds[0])["results"]

    per_frame = run(1)
    grouped = run(3)
    assert set(per_frame) == set(grouped)
    for k in per_frame:
        np.testing.assert_array_equal(np.asarray(per_frame[k]),
                                      np.asarray(grouped[k]))


@pytest.mark.slow
def test_chunked_fused_matches_per_frame():
    """TEST_FRAME_CHUNK batches K fused frames into one lax.scan
    dispatch, cutting chunks at MEM_EVERY boundaries (bank
    loop-invariant inside a chunk).  Against the per-frame path the
    carried state and outputs must agree; the scan body may fuse
    differently than the standalone graph, so allow near-tie argmax
    flips on a sliver of pixels.  8 frames with MEM_EVERY=3 and
    chunk=3 exercises steady chunks, the mem-update cut, AND the
    ragged tail."""
    from rvos_tpu.engine.eval import Evaluator
    from rvos_tpu.models.aocnet import init_model

    cfg = tiny_test(
        DATA_RANDOMCROP=(33, 33),
        MODEL_MULTI_LOCAL_DISTANCE=(1, 2),
        MODEL_MAX_OBJ_NUM=3,
        TEST_MAX_SIZE=None,
        MEM_EVERY=3,
    )
    model, variables = init_model(cfg, jax.random.PRNGKey(0), (33, 33))

    def run(chunk):
        ev = Evaluator(cfg.replace(TEST_FRAME_CHUNK=chunk),
                       model, variables)
        ds = SyntheticEval(size=(33, 33), n_seqs=1, n_frames=8, obj_num=2)
        return ev.evaluate_sequence(ds[0])["results"]

    per_frame = run(1)
    chunked = run(3)
    assert set(per_frame) == set(chunked)
    total = mismatch = 0
    for k in per_frame:
        a, b = np.asarray(per_frame[k]), np.asarray(chunked[k])
        assert a.shape == b.shape
        total += a.size
        mismatch += int((a != b).sum())
    assert mismatch / total < 0.005, (mismatch, total)


@pytest.mark.slow
def test_chunked_ensemble_matches_per_frame():
    """The ensemble chunk (_step_ensemble_chunk: K frames x all scale
    groups in one scan dispatch) must agree with the per-frame
    ensemble path; MEM_EVERY=2 + chunk=2 over 6 frames covers steady
    chunks, mem-update cuts and state carry across chunks."""
    from rvos_tpu.engine.eval import Evaluator
    from rvos_tpu.models.aocnet import init_model

    cfg = tiny_test(
        DATA_RANDOMCROP=(33, 33),
        MODEL_MULTI_LOCAL_DISTANCE=(1, 2),
        MODEL_MAX_OBJ_NUM=3,
        TEST_MAX_SIZE=None,
        TEST_FLIP=True,
        TEST_MULTISCALE=(1.0, 0.8),
        MEM_EVERY=2,
    )
    model, variables = init_model(cfg, jax.random.PRNGKey(0), (33, 33))

    def run(chunk):
        # shard off: keeps _step_ensemble_chunk under test (sharded
        # mode bypasses chunking; it has its own suite)
        ev = Evaluator(cfg.replace(TEST_FRAME_CHUNK=chunk,
                                   TEST_ENSEMBLE_SHARD=False),
                       model, variables)
        ds = SyntheticEval(size=(33, 33), n_seqs=1, n_frames=6, obj_num=2)
        return ev.evaluate_sequence(ds[0])["results"]

    per_frame = run(1)
    chunked = run(2)
    assert set(per_frame) == set(chunked)
    total = mismatch = 0
    for k in per_frame:
        a, b = np.asarray(per_frame[k]), np.asarray(chunked[k])
        assert a.shape == b.shape
        total += a.size
        mismatch += int((a != b).sum())
    assert mismatch / total < 0.005, (mismatch, total)


def test_bce_loss_values(rng):
    from rvos_tpu.engine.loss import hard_mining_bce
    o, h, w = 3, 8, 8
    logits = jnp.asarray(rng.standard_normal((o, h, w)).astype(np.float32))
    target = jnp.asarray((rng.uniform(size=(o, h, w)) > 0.5).astype(np.float32))
    loss = hard_mining_bce(logits, target, jnp.asarray(0), 0.5, 10)
    assert np.isfinite(float(loss)) and float(loss) > 0
    # perfect logits → tiny loss
    perfect = jnp.where(target > 0.5, 20.0, -20.0)
    assert float(hard_mining_bce(perfect, target, jnp.asarray(100), 0.5, 10)) < 1e-3


def test_metrics_logger(tmp_path):
    from rvos_tpu.utils.logging import MetricsLogger
    lg = MetricsLogger(str(tmp_path))
    lg.log(10, {"loss": 1.5, "iou": 0.7})
    lg.log(20, {"loss": 1.2, "iou": 0.8})
    lg.close()
    lines = [json.loads(x) for x in open(tmp_path / "metrics.jsonl")]
    assert lines[0]["step"] == 10 and lines[1]["iou"] == 0.8


def test_lr_schedule_reference_shape():
    from rvos_tpu.configs import Config
    from rvos_tpu.engine.learning import lr_schedule
    cfg = Config(TRAIN_LR=0.2, TRAIN_WARM_UP_STEPS=100,
                 TRAIN_TOTAL_STEPS=1000, TRAIN_POWER=0.9)
    fn = lr_schedule(cfg)
    # warmup ramps linearly
    assert abs(float(fn(50)) - 0.1) < 1e-6
    # poly decay after warmup, floored at 1e-5
    assert float(fn(100)) <= 0.2 + 1e-6
    assert float(fn(999)) >= 1e-5
    assert float(fn(500)) > float(fn(900))
