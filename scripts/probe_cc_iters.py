#!/usr/bin/env python
"""Probe: what do production masks look like at the CC grid, and how many
fixpoint sweeps do they cost? Runs the single-stream engine on the bundled
lake frames with the trained checkpoint, fetches each frame's small label,
and reports CC iteration counts + component stats at cc grids /2 and /4."""

import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
print = functools.partial(print, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from vfloodnet_tpu.core.cache import enable_compilation_cache
    from vfloodnet_tpu.memory import FeatureBank
    from vfloodnet_tpu.ops import cc, resize
    from vfloodnet_tpu.pipelines.loaders import load_afb_urr
    from vfloodnet_tpu.pipelines.video_seg import VideoSegEngine
    from bench import _bench_frames

    enable_compilation_cache()
    model, variables = load_afb_urr(None, dtype=jnp.bfloat16)
    fb = FeatureBank(obj_n=2, memory_budget=250_000, dtype=jnp.bfloat16)
    # postprocess none: we want the RAW small label the CC stage would see
    eng = VideoSegEngine(model, variables, fb, downsample=480,
                         postprocess="none")
    rng = np.random.RandomState(0)
    frames = _bench_frames((1080, 1920), rng, n=8)
    mask0 = np.zeros((1080, 1920), np.uint8)
    mask0[540:, :] = 1

    @functools.partial(jax.jit, static_argnums=1)
    def iters_at(mask_small, scale):
        h, w = mask_small.shape
        cc_in = resize(mask_small, (h // scale, w // scale), "nearest",
                       spatial_axes=(-2, -1))
        fg = cc_in.astype(bool)
        hh, ww = cc_in.shape
        init = (jax.lax.broadcasted_iota(jnp.int32, (hh, ww), 0) * ww
                + jax.lax.broadcasted_iota(jnp.int32, (hh, ww), 1))
        init = jnp.where(fg, init, 2**30)
        seg_enc = cc._segment_encodings(fg)

        def cond(st):
            labels, prev, it = st
            return jnp.logical_and(it < 64, jnp.any(labels != prev))

        def body(st):
            labels, _, it = st
            return cc._sweep(labels, fg, seg_enc), labels, it + 1

        first = cc._sweep(init, fg, seg_enc)
        labels, _, it = jax.lax.while_loop(
            cond, body, (first, init, jnp.int32(1)))
        n_comp = jnp.unique(jnp.where(fg, labels, -1), size=hh * ww,
                            fill_value=-1)
        n_comp = jnp.sum(n_comp >= 0)
        return it, n_comp, jnp.mean(fg.astype(jnp.float32))

    state = eng.bootstrap(frames[0].astype(np.float32) / 255.0, mask0)
    for t in range(6):
        state, _, label_small = eng.step(state, frames[(t + 1) % 8], t + 1)
        ls = np.asarray(jax.device_get(label_small))
        for scale in (2, 4):
            it, ncomp, frac = jax.device_get(
                iters_at(jnp.asarray(ls), scale))
            print(f"frame {t}: scale{scale} iters={int(it):2d} "
                  f"components={int(ncomp):4d} fg={float(frac):.3f}")


if __name__ == "__main__":
    from vfloodnet_tpu.core.runtime import ensure_backend
    ensure_backend()
    main()
