"""Per-stage host cost of the e2e eval pipeline (1-vCPU host).

Times, per 480p frame: JPEG decode (dataset[i]), variant resize
(eval_variants), clip+cast, device_put dispatch, and a cProfile of a
short evaluate_sequence run to catch anything else.
"""
import cProfile
import io
import os
import pstats
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
from rvos_tpu.data.transforms import eval_variants
from rvos_tpu.engine.eval import Evaluator
from rvos_tpu.models.aocnet import init_model
from bench import _e2e_bench
from rvos_tpu.data.datasets import VOSTestSeq

cfg = resnet101_aocnet().replace(
    MODEL_MAX_OBJ_NUM=4, TEST_BANK_CAPACITY=4, USE_PALLAS=True)

root = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "workdir", "bench_e2e")
img_root = os.path.join(root, "JPEGImages")
lab_root = os.path.join(root, "Annotations")
names = [f"{i:05d}.jpg" for i in range(60)]
ds = VOSTestSeq(img_root, lab_root, "bench_seq", names, ["00000.png"],
                True, False, None)

N = 20
# INTERLEAVED per-frame staging: measuring a stage in a batch loop
# (decode all N, then resize all N) makes glibc mmap/munmap each big
# allocation and reads 3-5x slower than per-frame reality (CLAUDE.md
# "Host/tunnel lessons")
t_dec = t_var = t_cast = t_put = 0.0
from rvos_tpu.engine.eval import _frame_u8
for i in range(N):
    t0 = time.perf_counter()
    s = ds[i]
    t1 = time.perf_counter()
    v = eval_variants(s["current_img"], cfg.TEST_MAX_SIZE,
                      cfg.TEST_MIN_SIZE, cfg.TEST_FLIP,
                      cfg.TEST_MULTISCALE)
    t2 = time.perf_counter()
    arr = _frame_u8(v[0]["img"])
    t3 = time.perf_counter()
    dev = jax.device_put(arr)
    t4 = time.perf_counter()
    t_dec += t1 - t0
    t_var += t2 - t1
    t_cast += t3 - t2
    t_put += t4 - t3
print(f"decode {t_dec/N*1e3:6.1f} ms  variants {t_var/N*1e3:6.1f} ms  "
      f"cast {t_cast/N*1e3:6.1f} ms  put-dispatch {t_put/N*1e3:6.1f} ms",
      flush=True)

# cProfile of the production loop
model, variables = init_model(cfg, jax.random.PRNGKey(0), (65, 65))
ev = Evaluator(cfg, model, variables)
_e2e_bench(cfg, ev, n_frames=12)          # warm compiles
prof = cProfile.Profile()
prof.enable()
out = _e2e_bench(cfg, ev, n_frames=60)
prof.disable()
print(f"e2e fps {out:.2f}", flush=True)
s = io.StringIO()
pstats.Stats(prof, stream=s).sort_stats("cumulative").print_stats(35)
print(s.getvalue())
