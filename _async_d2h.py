import time, numpy as np, jax, jax.numpy as jnp
f = jax.jit(lambda a, i: (a + i).astype(jnp.uint8))
x = jax.device_put(np.zeros((1080,1920), np.float32))
b = f(x, 1); b.block_until_ready(); np.asarray(b)
for use_async in (False, True):
    total = 0.0
    for i in range(5):
        b = f(x, i+2); b.block_until_ready()
        if use_async:
            b.copy_to_host_async(); time.sleep(0.15)
        t0 = time.time(); np.asarray(b); total += time.time()-t0
    print(f"async={use_async}: fetch {total/5*1000:.1f} ms", flush=True)
