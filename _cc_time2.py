import time, numpy as np, jax, jax.numpy as jnp
from vfloodnet_tpu.ops.cc import largest_connected_component

rng = np.random.RandomState(1)
masks = [jnp.asarray((rng.rand(480, 864) < 0.5).astype(np.uint8)) for _ in range(10)]
f = jax.jit(largest_connected_component)
out = f(masks[0]); out.block_until_ready()
t0=time.time()
outs = []
for i in range(10):
    outs.append(f(masks[i]))
jax.block_until_ready(outs)
dt=(time.time()-t0)/10*1000
print(f"heavy CC percolation (distinct inputs): {dt:.1f} ms", flush=True)
s = int(np.asarray(outs[3]).sum())
print("sanity sum:", s)
# also with per-call sync
t0=time.time()
for i in range(10):
    f(masks[i]).block_until_ready()
print(f"with per-call sync: {(time.time()-t0)/10*1000:.1f} ms", flush=True)
