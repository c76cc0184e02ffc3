"""YTB-shaped eval smoke: MAX_OBJ=11 through the segmented kernel."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from rvos_tpu.configs import resnet101_aocnet
from rvos_tpu.data.transforms import restrict_size
from rvos_tpu.engine.eval import Evaluator, _AugState
from rvos_tpu.models import DecoderMemory
from rvos_tpu.models.aocnet import init_model

H, W = restrict_size(480, 854, 800 * 1.3)
n_obj, bank = 11, 4
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
for i in range(1, n_obj):
    lab[(i * 5) % h:(i * 5) % h + 6, (i * 9) % w:(i * 9) % w + 8] = i
for s in range(bank):
    st.add_ref(emb, jnp.asarray(lab), first=(s == 0))
st.prev_emb = emb
st.prev_lab = jnp.asarray(lab)
obj_valid = jnp.ones((n_obj,))
exist = jnp.ones((n_obj,))
t0 = time.time()
for i in range(4):
    out = ev._step_fused(img, st, obj_valid, exist, i, (480, 854))
    pred_u8, pred_small, conf_small, emb2, ms, mv = out
    st.prev_emb = emb2
    st.prev_lab = pred_small
    st.memory = DecoderMemory(ms, mv)
    if i == 1:
        t0 = time.time()
p = np.asarray(pred_u8)
dt = (time.time() - t0) / 2
labs = np.unique(p)
print(f"O=11 smoke ok: {dt*1000:.1f} ms/frame, pred labels {labs[:6]}..., finite={np.isfinite(np.asarray(conf_small)).all()}")
