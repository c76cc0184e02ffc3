"""Measure the MF (multi-scale + flip) ensemble configuration's honest
end-to-end fps on the chip — the reference's headline J&F config
(poster: 84.0 YTB / 83.8 DAVIS uses MS+flip; eval CLI --ms/--flip,
tools/eval_net_mm_rpa.py:57-61 sets TEST_MAX_SIZE=800 when MS != [1]).

Usage: python workdir/mf_bench.py [scales...]
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
from rvos_tpu.engine.eval import Evaluator
from rvos_tpu.models.aocnet import init_model
from bench import _e2e_bench

scales = tuple(float(a) for a in sys.argv[1:]) or (1.0, 1.15, 1.3)

cfg = resnet101_aocnet().replace(
    MODEL_MAX_OBJ_NUM=4, TEST_BANK_CAPACITY=4, USE_PALLAS=True,
    TEST_FLIP=True, TEST_MULTISCALE=scales, TEST_MAX_SIZE=800)

t0 = time.perf_counter()
model, variables = init_model(cfg, jax.random.PRNGKey(0), (65, 65))
print(f"init {time.perf_counter() - t0:.1f}s", flush=True)

ev = Evaluator(cfg, model, variables)
t0 = time.perf_counter()
fps = _e2e_bench(cfg, ev)
print(f"MF ensemble (scales={scales}, flip): e2e {fps:.2f} fps "
      f"({len(scales) * 2} variants/frame; wall {time.perf_counter()-t0:.0f}s)",
      flush=True)
