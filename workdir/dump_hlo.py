"""Dump the optimized HLO of the fused eval step (same shapes as prof_eval)."""
import os, sys
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from rvos_tpu.configs import resnet101_aocnet
from rvos_tpu.data.transforms import restrict_size
from rvos_tpu.engine.eval import Evaluator, _AugState
from rvos_tpu.models.aocnet import init_model

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
for s in range(bank):
    st.add_ref(emb, jnp.asarray(lab), first=(s == 0))
st.prev_emb = emb
st.prev_lab = jnp.asarray(lab)
obj_valid = jnp.ones((n_obj,))
exist = jnp.ones((n_obj,))
key = jax.random.PRNGKey(0)
# trigger jit build same as _step_fused
out = ev._step_fused(img, st, obj_valid, exist, 0, (480, 854))
fn = ev._step_jit[("fused", img.shape, (480, 854))] if ("fused", img.shape, (480,854)) in ev._step_jit else None
if fn is None:
    # find whatever key exists
    k = list(ev._step_jit.keys())[-1]
    fn = ev._step_jit[k]
lowered = fn.lower(ev.variables, img, st.ref_emb, st.ref_lab, st.slot_valid,
                   st.prev_emb, st.prev_lab, obj_valid, exist,
                   st.memory.slots, st.memory.valid, key,
                   st.flat_emb, st.flat_lab)
comp = lowered.compile()
txt = comp.as_text()
open("/tmp/step_hlo.txt", "w").write(txt)
print("wrote", len(txt), "chars")
