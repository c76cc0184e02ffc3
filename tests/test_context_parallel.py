"""Context-parallel global matching over the virtual 8-device mesh
(SURVEY.md §2.10 — query-pixel sharding, the CP analogue)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh


def test_context_parallel_matches_single_device(rng):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from rvos_tpu.parallel.context import global_matching_context_parallel
    from rvos_tpu.ops.matching import global_matching_flat

    mesh = Mesh(np.array(jax.devices()[:8]), ("model",))
    h, w, c, o, r = 9, 11, 8, 3, 50
    q = jnp.asarray(rng.standard_normal((h, w, c)).astype(np.float32))
    re = jnp.asarray(rng.standard_normal((r, c)).astype(np.float32))
    lab = jnp.asarray(np.eye(o, dtype=np.float32)[rng.integers(0, o, size=(r,))])
    bias = jnp.asarray(rng.standard_normal((o,)).astype(np.float32) * 0.1)

    got = np.asarray(global_matching_context_parallel(q, re, lab, bias, mesh))
    want = np.asarray(global_matching_flat(q, re, lab, bias))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_bank_sharded_matches_single_device(rng):
    """Bank tiles sharded over the mesh axis + one pmin == the
    single-device online-min scan (associative reduction)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from rvos_tpu.parallel.context import global_matching_bank_sharded
    from rvos_tpu.ops.matching import global_matching_flat

    mesh = Mesh(np.array(jax.devices()[:8]), ("model",))
    h, w, c, o, r = 7, 9, 8, 3, 53          # r not divisible by 8 → padding
    q = jnp.asarray(rng.standard_normal((h, w, c)).astype(np.float32))
    re = jnp.asarray(rng.standard_normal((r, c)).astype(np.float32))
    lab = jnp.asarray(np.eye(o, dtype=np.float32)[rng.integers(0, o, size=(r,))])
    bias = jnp.asarray(rng.standard_normal((o,)).astype(np.float32) * 0.1)

    got = np.asarray(global_matching_bank_sharded(q, re, lab, bias, mesh))
    want = np.asarray(global_matching_flat(q, re, lab, bias))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_segment_frame_context_parallel_equivalence(rng):
    """MESH_MODEL_AXIS>1 (GSPMD query-row sharding inside segment_frame)
    must produce the same logits as the unsharded path (VERDICT r1 #7)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from rvos_tpu.configs import tiny_test
    from rvos_tpu.models import AOCNet
    from rvos_tpu.models.aocnet import init_model
    from rvos_tpu.parallel import ambient_mesh_ctx, make_mesh

    base = tiny_test(MODEL_MULTI_LOCAL_DISTANCE=(1, 2), MODEL_MAX_OBJ_NUM=3,
                     USE_PALLAS=False)
    model, variables = init_model(base, jax.random.PRNGKey(0), (33, 33))
    imgs = jnp.asarray(rng.standard_normal((3, 33, 33, 3)).astype(np.float32))
    emb, _ = model.apply(variables, imgs, method=AOCNet.extract_feature)
    labels = jnp.zeros(emb.shape[1:3], jnp.int32).at[2:6, 2:6].set(1)

    def run(cfg, mesh_ctx):
        m = AOCNet(cfg)
        with mesh_ctx:
            return np.asarray(jax.jit(
                lambda v, x, l: m.apply(v, x, l, method=AOCNet.full_forward)
            )(variables, imgs, labels))

    import contextlib
    want = run(base, contextlib.nullcontext())
    mesh = make_mesh(data=2, model=4)
    got = run(base.replace(MESH_MODEL_AXIS=4), ambient_mesh_ctx(mesh))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)

    # ADVICE r2 (medium): MESH_MODEL_AXIS>1 with NO ambient mesh (the
    # cp_mesh-degraded-to-data-only fallback: fewer devices than the
    # model axis) must run the unsharded path, not crash at trace time.
    got_fallback = run(base.replace(MESH_MODEL_AXIS=4),
                       contextlib.nullcontext())
    np.testing.assert_allclose(got_fallback, want, rtol=1e-5, atol=1e-4)


def test_cp_config_degrades_without_mesh():
    """init_model with MESH_MODEL_AXIS > device count builds and runs
    (ADVICE r2 medium: reproduced crash on 1 device, axis=4)."""
    import jax
    import jax.numpy as jnp
    from rvos_tpu.configs import tiny_test
    from rvos_tpu.models import AOCNet
    from rvos_tpu.models.aocnet import init_model
    from rvos_tpu.parallel.mesh import cp_mesh

    cfg = tiny_test(MODEL_MULTI_LOCAL_DISTANCE=(1,), MODEL_MAX_OBJ_NUM=2,
                    MESH_MODEL_AXIS=len(jax.devices()) * 2, USE_PALLAS=False)
    assert cp_mesh(cfg) is None
    model, variables = init_model(cfg, jax.random.PRNGKey(0), (17, 17))
    imgs = jnp.zeros((3, 17, 17, 3), jnp.float32)
    emb, _ = model.apply(variables, imgs, method=AOCNet.extract_feature)
    labels = jnp.zeros(emb.shape[1:3], jnp.int32)
    logits = model.apply(variables, imgs, labels, method=AOCNet.full_forward)
    assert np.isfinite(np.asarray(logits)).all()


@pytest.mark.slow
def test_chunked_eval_context_parallel_equivalence():
    """The chunked evaluator under a context-parallel mesh
    (MESH_MODEL_AXIS=4 over the 8 virtual devices) must reproduce the
    unsharded chunked eval — the chunk scan dispatches run under
    ambient_mesh_ctx like the per-frame graphs."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from rvos_tpu.configs import tiny_test
    from rvos_tpu.data.datasets import SyntheticEval
    from rvos_tpu.engine.eval import Evaluator
    from rvos_tpu.models.aocnet import init_model

    cfg = tiny_test(
        DATA_RANDOMCROP=(33, 33),
        MODEL_MULTI_LOCAL_DISTANCE=(1, 2),
        MODEL_MAX_OBJ_NUM=3,
        TEST_MAX_SIZE=None,
        MEM_EVERY=3,
        TEST_FRAME_CHUNK=3,
    )
    model, variables = init_model(cfg, jax.random.PRNGKey(0), (33, 33))

    def run(model_axis):
        # the model must carry the CP axis itself: segment_frame reads
        # ITS config, so an Evaluator-only override leaves the graph
        # unsharded and the test vacuous (r5 Evaluator guard catches
        # this mismatch loudly now).  Same variables, per-axis module.
        from rvos_tpu.models import AOCNet
        c = cfg.replace(MESH_MODEL_AXIS=model_axis)
        ev = Evaluator(c, AOCNet(c), variables)
        ds = SyntheticEval(size=(33, 33), n_seqs=1, n_frames=7, obj_num=2)
        return ev.evaluate_sequence(ds[0])["results"]

    base = run(1)
    cp = run(4)
    assert set(base) == set(cp)
    total = mismatch = 0
    for k in base:
        a, b = np.asarray(base[k]), np.asarray(cp[k])
        total += a.size
        mismatch += int((a != b).sum())
    assert mismatch / total < 0.005, (mismatch, total)


@pytest.mark.slow
def test_full_graph_resnet_cp_equivalence():
    """Full PRODUCTION graph under context parallelism (VERDICT r4 weak
    #7): the ResNet-101 AOCNet eval step — not the shrunken MobileNet
    dryrun graph — with MESH_MODEL_AXIS=2 query-row sharding must
    reproduce the unsharded evaluator on the same weights.  Small
    spatial dims keep the 1-vCPU host honest; the GRAPH (backbone,
    ASPP, matching stack, calibration decoder) is the production one."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from rvos_tpu.configs import resnet101_aocnet
    from rvos_tpu.data.datasets import SyntheticEval
    from rvos_tpu.engine.eval import Evaluator
    from rvos_tpu.models import AOCNet
    from rvos_tpu.models.aocnet import init_model

    base = resnet101_aocnet().replace(
        PRETRAIN=False, MODEL_MAX_OBJ_NUM=3, TEST_BANK_CAPACITY=3,
        TEST_MAX_SIZE=None, MEM_EVERY=2, USE_PALLAS=False,
        MATCHING_DTYPE="float32", EVAL_COMPUTE_DTYPE="float32",
        TEST_ENSEMBLE_SHARD=False)
    assert base.MODEL_BACKBONE == "resnet"   # ResNet-101 dispatch value
    model, variables = init_model(base, jax.random.PRNGKey(0), (49, 49))

    def run(model_axis):
        c = base.replace(MESH_MODEL_AXIS=model_axis)
        ev = Evaluator(c, AOCNet(c), variables)
        ds = SyntheticEval(size=(49, 49), n_seqs=1, n_frames=4, obj_num=2)
        return ev.evaluate_sequence(ds[0])["results"]

    want = run(1)
    got = run(2)
    assert set(want) == set(got)
    total = mismatch = 0
    for k in want:
        a, b = np.asarray(want[k]), np.asarray(got[k])
        assert a.shape == b.shape
        total += a.size
        mismatch += int((a != b).sum())
    # f32 everywhere → reduction-order noise only; allow a near-tie
    # argmax sliver like the other CP equivalence tests
    assert mismatch / total < 0.002, (mismatch, total)
