import sys
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np
from rvos_tpu.ops.matching import (compact_reference_bank_segmented,
                                   global_matching_min)
from rvos_tpu.ops.pallas_matching import global_matching_pallas_segmented
rng = np.random.default_rng(0)
o, c, r = 4, 100, 20000
emb = jnp.asarray(rng.standard_normal((r, c)).astype(np.float32))
lab = jnp.asarray(np.eye(o, dtype=np.float32)[rng.integers(0, o, size=(r,))])
se, sl = compact_reference_bank_segmented(emb, lab, 16384)
p = se.shape[0]
seg = np.repeat(np.arange(o), p // o)
bias = (1.0 - np.asarray(sl)[np.arange(p), seg]) * 5e4
q = jnp.asarray(rng.standard_normal((5000, c)).astype(np.float32))
d32 = np.asarray(jax.jit(lambda q, r_, b: global_matching_pallas_segmented(
    q, r_, b, n_obj=o, mixed=False))(q, se, jnp.asarray(bias.astype(np.float32))))
dx = np.asarray(jax.jit(global_matching_min)(q, se, sl))
rel = (np.abs(d32 - dx) / np.maximum(np.abs(dx), 1.0)).max()
print(f"f32 segmented kernel on-chip max rel err: {rel:.2e}")
assert rel < 1e-3
print("parity-mode kernel OK")
