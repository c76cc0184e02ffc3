"""A/B LOCAL_MATCH_ROW_GROUP on the fused eval step (one process).

Usage: python workdir/ab_rowgroup.py [groups...]
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
img_np = rng.standard_normal((H, W, 3)).astype(np.float32)

groups = [int(a) for a in sys.argv[1:]] or [1, 5, 13]

cfg = resnet101_aocnet().replace(MODEL_MAX_OBJ_NUM=n_obj,
                                 TEST_BANK_CAPACITY=bank, USE_PALLAS=True)
model, variables = init_model(cfg, jax.random.PRNGKey(0), (65, 65))

for g in groups:
    os.environ["LOCAL_MATCH_ROW_GROUP"] = str(g)
    ev = Evaluator(cfg, model, variables)
    img = jnp.asarray(img_np)
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
        _, pred_small, _, emb2, ms, mv = out
        st.prev_emb = emb2
        st.prev_lab = pred_small
        st.memory = DecoderMemory(ms, mv)
        return pred_small

    for i in range(2):
        t0 = time.perf_counter()
        p = step(i)
        np.asarray(p[0, :4])
        print(f"[G={g}] warmup {i}: {time.perf_counter()-t0:.1f}s",
              flush=True)
    best = 1e9
    for rep in range(3):
        t0 = time.perf_counter()
        n = 30
        for i in range(n):
            p = step(2 + i)
        np.asarray(p[0, :4])
        dt = (time.perf_counter() - t0) / n
        best = min(best, dt)
    print(f"[G={g}] steady best-of-3: {best*1e3:.2f} ms/frame = "
          f"{1/best:.2f} fps", flush=True)
