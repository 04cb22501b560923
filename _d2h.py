import time, numpy as np, jax, jax.numpy as jnp
f = jax.jit(lambda a, i: a + i)
x8 = jax.device_put(np.zeros((1080,1920), np.uint8))
xs = jax.device_put(np.zeros((480,853), np.uint8))
xf = jax.device_put(np.zeros((1080,1920,3), np.float32))
for name, a in [("D2H 1080p u8 (2MB)", x8), ("D2H 480p u8 (0.4MB)", xs), ("D2H 1080p f32x3 (24MB)", xf)]:
    b = f(a, 1); b.block_until_ready(); np.asarray(b)  # warm compile
    t_fetch = 0.0
    for i in range(5):
        b = f(a, i + 2); b.block_until_ready()
        t0 = time.time()
        np.asarray(jax.device_get(b))
        t_fetch += time.time() - t0
    print(f"{name}: {t_fetch/5*1000:.1f} ms", flush=True)
