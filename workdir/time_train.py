"""Time the full-scale train step on the real chip.

Usage: python workdir/time_train.py [bf16|f32] [crop] [seqlen]
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from rvos_tpu.configs import resnet101_aocnet

dtype = sys.argv[1] if len(sys.argv) > 1 else "bf16"
crop = int(sys.argv[2]) if len(sys.argv) > 2 else 465
seqlen = int(sys.argv[3]) if len(sys.argv) > 3 else 5

cfg = resnet101_aocnet().replace(
    DATA_RANDOMCROP=(crop, crop),
    DATA_CURR_SEQ_LEN=seqlen,
    TRAIN_COMPUTE_DTYPE="bfloat16" if dtype == "bf16" else "float32",
    TRAIN_AUTO_RESUME=False,
    PRETRAIN=False,
)
from rvos_tpu.engine.train import Trainer

t0 = time.perf_counter()
tr = Trainer(cfg)
print(f"init {time.perf_counter()-t0:.1f}s", flush=True)

b = 1
H = W = crop
rng = np.random.default_rng(0)
batch = {
    "ref_img": jnp.asarray(rng.standard_normal((b, H, W, 3), np.float32)),
    "prev_img": jnp.asarray(rng.standard_normal((b, H, W, 3), np.float32)),
    "curr_img": jnp.asarray(rng.standard_normal((seqlen, b, H, W, 3), np.float32)),
    "ref_label": jnp.asarray(rng.integers(0, 3, (b, H, W)).astype(np.int32)),
    "prev_label": jnp.asarray(rng.integers(0, 3, (b, H, W)).astype(np.int32)),
    "curr_label": jnp.asarray(rng.integers(0, 3, (seqlen, b, H, W)).astype(np.int32)),
    "obj_num": jnp.asarray(np.full((b,), 2, np.int32)),
}
key = jax.random.PRNGKey(0)
for i in range(3):
    t0 = time.perf_counter()
    m = tr.train_step(batch, jax.random.fold_in(key, i))
    loss = float(np.asarray(m["loss"]))  # hard sync
    print(f"step {i}: {time.perf_counter()-t0:.2f}s loss={loss:.4f}", flush=True)

# steady-state: chain 3 steps, one sync
t0 = time.perf_counter()
n = 3
for i in range(n):
    m = tr.train_step(batch, jax.random.fold_in(key, 10 + i))
loss = float(np.asarray(m["loss"]))
dt = (time.perf_counter() - t0) / n
print(f"steady: {dt:.2f}s/step loss={loss:.4f}", flush=True)
