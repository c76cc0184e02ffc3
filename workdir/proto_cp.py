import jax
jax.config.update("jax_platforms", "cpu")
import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

mesh = Mesh(np.array(jax.devices()).reshape(2, 4), ("data", "model"))

def per_example(x, r):
    # x: [h, w, c] per-example; constrain rows over "model"
    x = jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P("model", None, None)))
    d = jnp.einsum("hwc,rc->hwr", x, r)
    return d.min(axis=-1)

def f(xs, r):
    return jax.vmap(lambda x: per_example(x, r))(xs)

xs = jnp.ones((2, 8, 16, 4))
r = jnp.ones((32, 4))
out = jax.jit(f, in_shardings=(NamedSharding(mesh, P("data")), None))(xs, r)
print("vmap+wsc OK", out.shape)

# also: wsc under scan + remat
def body(c, x):
    return c, per_example(x, r)
def g(xs):
    return jax.lax.scan(jax.checkpoint(body), 0.0, xs)[1]
out2 = jax.jit(g)(jnp.ones((3, 8, 16, 4)))
print("scan+remat+wsc OK", out2.shape)
