"""MF (multi-scale + flip) ensemble A/B: chunked (TEST_FRAME_CHUNK=5)
vs per-frame (=1) in ONE process, with the per-stage timing breakdown —
to show where the MF frame budget actually goes (device FLOPs vs RPC).

Usage: python workdir/mf_ab.py
"""
import json
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
from rvos_tpu.data.datasets import VOSTestSeq
from rvos_tpu.engine.eval import Evaluator
from rvos_tpu.models.aocnet import init_model
from bench import _e2e_bench  # noqa: F401  (reuses its disk fixture)

scales = (1.0, 1.15, 1.3)
root = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "workdir", "bench_e2e")
img_root = os.path.join(root, "JPEGImages")
lab_root = os.path.join(root, "Annotations")
names = [f"{i:05d}.jpg" for i in range(60)]
save_dir = os.path.join(root, "out_mf")
os.makedirs(save_dir, exist_ok=True)


def run(chunk):
    cfg = resnet101_aocnet().replace(
        MODEL_MAX_OBJ_NUM=4, TEST_BANK_CAPACITY=4, USE_PALLAS=True,
        TEST_FLIP=True, TEST_MULTISCALE=scales, TEST_MAX_SIZE=800,
        TEST_FRAME_CHUNK=chunk)
    model, variables = init_model(cfg, jax.random.PRNGKey(0), (65, 65))
    ev = Evaluator(cfg, model, variables)
    # warm pass (compile)
    ev.evaluate_sequence(
        VOSTestSeq(img_root, lab_root, "bench_seq", names[:8],
                   ["00000.png"], True, False, None), save_dir=save_dir)
    best = None
    for _ in range(2):
        r = ev.evaluate_sequence(
            VOSTestSeq(img_root, lab_root, "bench_seq", names,
                       ["00000.png"], True, False, None), save_dir=save_dir)
        if best is None or r["fps"] > best["fps"]:
            best = r
    t = {k: round(v / len(names) * 1000, 1) for k, v in best["timing"].items()}
    print(json.dumps({"chunk": chunk, "fps": round(best["fps"], 2),
                      "per_frame_ms": t}), flush=True)
    return best


for ck in (5, 1):
    t0 = time.perf_counter()
    run(ck)
    print(f"  wall {time.perf_counter() - t0:.0f}s", flush=True)
