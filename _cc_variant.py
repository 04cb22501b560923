import numpy as np, jax, jax.numpy as jnp
from functools import partial
from scipy import ndimage
jax.config.update("jax_platforms", "cpu")

_INF = 2**30

def cc_light(mask, max_iters=64):
    h, w = mask.shape
    fg = mask.astype(bool)
    init = (jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w
            + jax.lax.broadcasted_iota(jnp.int32, (h, w), 1))
    init = jnp.where(fg, init, _INF)

    def sweep(labels):
        big = jnp.where(fg, labels, _INF)
        p = jnp.pad(big, 1, constant_values=_INF)
        neigh = jnp.minimum(
            jnp.minimum(jnp.minimum(p[:-2,1:-1], p[2:,1:-1]),
                        jnp.minimum(p[1:-1,:-2], p[1:-1,2:])),
            jnp.minimum(jnp.minimum(p[:-2,:-2], p[:-2,2:]),
                        jnp.minimum(p[2:,:-2], p[2:,2:])))
        big = jnp.minimum(big, jnp.where(fg, neigh, _INF))
        flat = big.reshape(-1)
        for _ in range(3):
            idx = jnp.clip(flat, 0, h*w-1)
            flat = jnp.minimum(flat, jnp.where(flat < _INF, flat[idx], _INF))
        return jnp.where(fg, flat.reshape(h, w), _INF)

    def cond(s):
        l, pr, it = s
        return jnp.logical_and(it < max_iters, jnp.any(l != pr))
    def body(s):
        l, _, it = s
        return sweep(l), l, it+1
    first = sweep(init)
    labels, _, iters = jax.lax.while_loop(cond, body, (first, init, jnp.int32(1)))
    return jnp.where(fg, labels, -1), iters

struct8 = np.ones((3,3), int)
for density in (0.3, 0.5, 0.6, 0.7):
    for seed in range(3):
        rng = np.random.RandomState(seed)
        mask = (rng.rand(480, 864) < density).astype(np.uint8)
        out, iters = jax.jit(cc_light)(jnp.asarray(mask))
        out = np.asarray(out); iters = int(iters)
        ref, n = ndimage.label(mask, structure=struct8)
        pairs = set(zip(out[mask==1].tolist(), ref[mask==1].tolist()))
        ok = len(pairs) == n == len(set(out[mask==1].tolist()))
        print(f"density {density} seed {seed}: iters={iters} correct={ok}", flush=True)
