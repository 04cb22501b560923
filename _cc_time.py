import time, numpy as np, jax, jax.numpy as jnp
from vfloodnet_tpu.ops.cc import connected_components, largest_connected_component

rng = np.random.RandomState(1)
mask = jnp.asarray((rng.rand(480, 864) < 0.5).astype(np.uint8))
clean = jnp.asarray((np.arange(480)[:,None] > 240).astype(np.uint8) * np.ones((480,864), np.uint8))

f = jax.jit(largest_connected_component)
out = f(mask); out.block_until_ready()
t0=time.time()
for _ in range(10): out = f(mask)
out.block_until_ready()
print(f"heavy CC percolation: {(time.time()-t0)/10*1000:.1f} ms", flush=True)
t0=time.time()
for _ in range(10): out = f(clean)
out.block_until_ready()
print(f"heavy CC clean mask: {(time.time()-t0)/10*1000:.1f} ms", flush=True)
