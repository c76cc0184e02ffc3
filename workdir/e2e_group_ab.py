"""A/B the e2e evaluate_sequence fps vs TEST_H2D_GROUP on the chip.

Usage: python workdir/e2e_group_ab.py [groups...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

from rvos_tpu.configs import resnet101_aocnet
from rvos_tpu.data.transforms import restrict_size
from rvos_tpu.engine.eval import Evaluator
from rvos_tpu.models.aocnet import init_model
from bench import _e2e_bench

groups = [int(a) for a in sys.argv[1:]] or [1, 4, 8, 16]

H, W = restrict_size(480, 854, 800 * 1.3)
cfg0 = resnet101_aocnet().replace(
    MODEL_MAX_OBJ_NUM=4, TEST_BANK_CAPACITY=4, USE_PALLAS=True)

t0 = time.perf_counter()
model, variables = init_model(cfg0, jax.random.PRNGKey(0), (65, 65))
print(f"init {time.perf_counter() - t0:.1f}s", flush=True)

for rep in range(2):
    for g in groups:
        cfg = cfg0.replace(TEST_H2D_GROUP=g)
        ev = Evaluator(cfg, model, variables)
        fps = _e2e_bench(cfg, ev)
        print(f"rep{rep} group={g:3d}: e2e {fps:6.2f} fps", flush=True)
