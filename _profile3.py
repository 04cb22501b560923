import time, numpy as np, jax, jax.numpy as jnp
x = jax.device_put(np.random.rand(480, 864, 3).astype(np.float32))
for name, fn in [
    ("out=scalar", jax.jit(lambda a: a.sum())),
    ("out=480p f32 (4.9MB)", jax.jit(lambda a: a * 2.0)),
    ("out=1080p f32 (24MB)", jax.jit(lambda a: jnp.broadcast_to(a[0,0,0], (1080,1920,3)) * a[0,0,0])),
    ("out=1080p u8 (6MB)", jax.jit(lambda a: (jnp.broadcast_to(a[0,0,0], (1080,1920)) > 0.5).astype(jnp.uint8))),
]:
    out = fn(x); jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(10):
        out = fn(x)
        jax.block_until_ready(out)
    print(f"{name}: {(time.time()-t0)/10*1000:.1f} ms", flush=True)
