"""H2D tunnel microbench: per-frame cost of uint8 frame uploads as a
function of batching, and whether transfers overlap device compute.

Usage: python workdir/h2d_bench.py
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

H, W = 481, 849
rng = np.random.default_rng(0)

# --- raw device_put throughput at different batch sizes ---
for k in (1, 2, 4, 8):
    frames = rng.integers(0, 255, (k, H, W, 3), dtype=np.uint8)
    # warmup
    jax.block_until_ready(jax.device_put(frames))
    reps = max(2, 16 // k)
    t0 = time.perf_counter()
    outs = []
    for r in range(reps):
        outs.append(jax.device_put(frames))
    for o in outs:
        np.asarray(o[-1, :2, :2, 0])   # force completion
    dt = (time.perf_counter() - t0) / (reps * k)
    print(f"batch={k}: {dt*1e3:6.2f} ms/frame H2D", flush=True)

# --- does H2D overlap device compute? ---
# recurrence chain matmul keeps the chip busy ~tens of ms; issue a
# device_put mid-chain and see if total time is max() or sum().
x = jnp.asarray(rng.standard_normal((4096, 4096)).astype(np.float32))


@jax.jit
def burn(x, n=40):
    def body(i, a):
        return a @ a * 1e-3 + 0.1
    return jax.lax.fori_loop(0, n, body, x)


r = burn(x)
np.asarray(r[0, :2])  # warm
t0 = time.perf_counter()
r = burn(x)
np.asarray(r[0, :2])
t_burn = time.perf_counter() - t0
print(f"burn alone: {t_burn*1e3:.1f} ms")

frame = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
jax.block_until_ready(jax.device_put(frame))
t0 = time.perf_counter()
d = jax.device_put(frame)
jax.block_until_ready(d)
t_put = time.perf_counter() - t0
print(f"put alone: {t_put*1e3:.1f} ms")

t0 = time.perf_counter()
r = burn(x)
d = jax.device_put(frame)
jax.block_until_ready(d)
np.asarray(r[0, :2])
t_both = time.perf_counter() - t0
print(f"burn+put concurrent: {t_both*1e3:.1f} ms "
      f"(sum={1e3*(t_burn+t_put):.1f}, max={1e3*max(t_burn,t_put):.1f})",
      flush=True)
