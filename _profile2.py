import time, numpy as np, jax, jax.numpy as jnp
big = np.random.rand(1080, 1920, 3).astype(np.float32)
small = np.random.rand(480, 853, 3).astype(np.float32)
u8 = (big * 255).astype(np.uint8)
# warmup
jax.block_until_ready(jax.device_put(small))
for name, arr in [("H2D 1080p f32 (24MB)", big), ("H2D 1080p u8 (6MB)", u8), ("H2D 480p f32 (4.9MB)", small)]:
    t0 = time.time()
    for _ in range(5):
        x = jax.device_put(arr)
        jax.block_until_ready(x)
    print(f"{name}: {(time.time()-t0)/5*1000:.1f} ms", flush=True)
x = jax.device_put(u8)
lab = jnp.zeros((1080,1920), jnp.uint8)
t0=time.time()
for _ in range(5):
    out = np.asarray(jax.device_get(lab))
print(f"D2H 1080p u8: {(time.time()-t0)/5*1000:.1f} ms")
t0=time.time()
f = jax.jit(lambda a: a.astype(jnp.float32)/255.0)
jax.block_until_ready(f(x))
for _ in range(5):
    y = f(x); jax.block_until_ready(y)
print(f"u8->f32 on device: {(time.time()-t0)/5*1000:.1f} ms")
