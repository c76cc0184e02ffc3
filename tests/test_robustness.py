"""Robust-VOS-Benchmark path end-to-end: perturbed synthetic eval
through the full streaming evaluator (the §3.4 call stack)."""

import numpy as np
import jax
import pytest

from rvos_tpu.configs import tiny_test
from rvos_tpu.data.datasets import SyntheticEval
from rvos_tpu.data.perturb import get_perturbation


@pytest.mark.slow
def test_perturbed_eval_runs(tmp_path):
    from rvos_tpu.engine.eval import Evaluator
    from rvos_tpu.models.aocnet import init_model

    cfg = tiny_test(
        DATA_RANDOMCROP=(33, 33),
        MODEL_MULTI_LOCAL_DISTANCE=(1, 2),
        MODEL_MAX_OBJ_NUM=3,
        TEST_MAX_SIZE=None,
    )
    model, variables = init_model(cfg, jax.random.PRNGKey(0), (33, 33))
    ev = Evaluator(cfg, model, variables)
    for ptype in (2, 5, 9):       # one of each perturbation family
        ds = SyntheticEval(size=(33, 33), n_seqs=1, n_frames=3, obj_num=2,
                           frame_transform=get_perturbation(
                               ptype, np.random.default_rng(0)))
        out = ev.evaluate_sequence(ds[0])
        assert out["frames"] == 2
        for mask in out["results"].values():
            assert mask.shape == (33, 33)
