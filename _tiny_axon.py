import time, jax, jax.numpy as jnp
t0=time.time()
y = jax.jit(lambda v: v * 3 + 1)(jnp.arange(1024, dtype=jnp.uint32))
print("axon ok:", int(y[5]), "dt:", round(time.time()-t0, 2), flush=True)
