"""Steady-state device timing of the chunked fused step (K frames per
dispatch) — ms/frame comparable to ab_rowgroup's single-step numbers.

Usage: python workdir/ab_chunk.py [K...]
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
import jax.numpy as jnp
import numpy as np

from rvos_tpu.configs import resnet101_aocnet
from rvos_tpu.data.transforms import restrict_size
from rvos_tpu.engine.eval import Evaluator, _AugState
from rvos_tpu.models import DecoderMemory
from rvos_tpu.models.aocnet import init_model

H, W = restrict_size(480, 854, 800 * 1.3)
n_obj, bank = 4, 4
rng = np.random.default_rng(0)

ks = [int(a) for a in sys.argv[1:]] or [5]

cfg = resnet101_aocnet().replace(MODEL_MAX_OBJ_NUM=n_obj,
                                 TEST_BANK_CAPACITY=bank, USE_PALLAS=True)
model, variables = init_model(cfg, jax.random.PRNGKey(0), (65, 65))
ev = Evaluator(cfg, model, variables)
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
u8 = jnp.asarray(
    rng.integers(0, 256, (max(ks), H, W, 3), dtype=np.uint8))

for k_n in ks:
    imgs = u8[:k_n]

    def chunk(i0):
        preds, plab, conf, emb2, ms, mv = ev._step_fused_chunk(
            imgs, st, obj_valid, exist, i0, ori_hw)
        st.prev_emb = emb2
        st.prev_lab = plab
        st.memory = DecoderMemory(ms, mv)
        return preds

    for i in range(2):
        t0 = time.perf_counter()
        p = chunk(1 + i * k_n)
        np.asarray(p[-1, :4, 0])
        print(f"[K={k_n}] warmup {i}: {time.perf_counter() - t0:.1f}s",
              flush=True)
    best = 1e9
    n_ch = max(1, 30 // k_n)
    for rep in range(3):
        t0 = time.perf_counter()
        for i in range(n_ch):
            p = chunk(11 + i * k_n)
        np.asarray(p[-1, :4, 0])
        dt = (time.perf_counter() - t0) / (n_ch * k_n)
        best = min(best, dt)
    print(f"[K={k_n}] steady best-of-3: {best * 1e3:.2f} ms/frame = "
          f"{1.0 / best:.2f} fps", flush=True)
