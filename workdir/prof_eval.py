"""Profile the fused eval step on the real chip: capture an xplane
trace of steady-state frames and aggregate op time by fusion name.

Usage: python workdir/prof_eval.py [n_frames]
"""
import os, re, subprocess, sys, time, collections
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from rvos_tpu.configs import resnet101_aocnet
from rvos_tpu.data.transforms import restrict_size
from rvos_tpu.engine.eval import Evaluator, _AugState
from rvos_tpu.models import DecoderMemory
from rvos_tpu.models.aocnet import init_model

n_iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20

H, W = restrict_size(480, 854, 800 * 1.3)
n_obj, bank = 4, 4
cfg = resnet101_aocnet().replace(MODEL_MAX_OBJ_NUM=n_obj,
                                 TEST_BANK_CAPACITY=bank, USE_PALLAS=True)
model, variables = init_model(cfg, jax.random.PRNGKey(0), (65, 65))
ev = Evaluator(cfg, model, variables)
rng = np.random.default_rng(0)
img = jnp.asarray(rng.standard_normal((H, W, 3)).astype(np.float32))
emb, low = ev._embed(img)
h, w, c = emb.shape
st = _AugState(bank, h, w, c, n_obj, ((h + 1) // 2, (w + 1) // 2),
               cfg.MODEL_HEAD_EMBEDDING_DIM, ev.compute_dtype)
lab = np.zeros((h, w), np.int32)
lab[h // 4: h // 2, w // 4: w // 2] = 1
lab[h // 2: 3 * h // 4, w // 4: w // 2] = 2
lab[h // 4: h // 2, w // 2: 3 * w // 4] = 3
for s in range(bank):
    st.add_ref(emb, jnp.asarray(lab), first=(s == 0))
st.prev_emb = emb
st.prev_lab = jnp.asarray(lab)
obj_valid = jnp.ones((n_obj,))
exist = jnp.ones((n_obj,))
ori_hw = (480, 854)

def step(i):
    out = ev._step_fused(img, st, obj_valid, exist, i, ori_hw)
    pred_u8, pred_small, conf_small, emb2, ms, mv = out
    st.prev_emb = emb2
    st.prev_lab = pred_small
    st.memory = DecoderMemory(ms, mv)
    return pred_small

for i in range(2):
    t0 = time.perf_counter()
    p = step(i)
    np.asarray(p[0, :4])
    print(f"warmup {i}: {time.perf_counter()-t0:.1f}s", flush=True)

trace_dir = "/tmp/evtrace"
subprocess.run(["rm", "-rf", trace_dir])
jax.profiler.start_trace(trace_dir)
t0 = time.perf_counter()
for i in range(n_iters):
    p = step(i + 2)
np.asarray(p[0, :4])
dt = (time.perf_counter() - t0) / n_iters
jax.profiler.stop_trace()
print(f"steady: {dt*1e3:.2f} ms/frame = {1/dt:.2f} fps", flush=True)

# decode xplane with protoc --decode_raw and aggregate durations
xplanes = []
for root, _, files in os.walk(trace_dir):
    for f in files:
        if f.endswith(".xplane.pb"):
            xplanes.append(os.path.join(root, f))
print("xplane:", xplanes)
for xp in xplanes:
    raw = subprocess.run(["protoc", "--decode_raw"], stdin=open(xp, "rb"),
                         capture_output=True, text=True).stdout
    open("/tmp/xplane_raw.txt", "w").write(raw)
    print("decoded", len(raw), "chars ->", "/tmp/xplane_raw.txt")
