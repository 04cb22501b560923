#!/usr/bin/env python
"""Microbench: per-stage cost of the fused video step at the production
operating point (1080p frame, 480p operating, 100k-slot bf16 bank).

Stages timed as separate jits (async loop, block at end — same methodology
as bench.py's throughput loop):
  prep     uint8 -> f32 + bicubic downsample 1080p -> 480p
  segment  query encode + bank attention read + decode
  memorize memory encode of frame + soft mask
  update   bank record_usage + merge/append/evict
  cc       largest-CC at half operating res + upsample keep
  finish   full-res upsample + argmax + bit-pack
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
print = functools.partial(print, flush=True)


# honest chained-carry timing: repeated identical calls are deduped by the
# relay and block_until_ready is only a dispatch fence (_bench_timing.py)
from _bench_timing import timeit  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from vfloodnet_tpu import ops
    from vfloodnet_tpu.core.cache import enable_compilation_cache
    from vfloodnet_tpu.memory import FeatureBank
    from vfloodnet_tpu.models import AFBURR
    from vfloodnet_tpu.pipelines.video_seg import (VideoSegEngine,
                                                   device_largest_cc,
                                                   pack_bits)

    enable_compilation_cache()
    print("platform:", jax.devices()[0].platform)

    model = AFBURR(dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((48, 64, 3)),
                           jnp.zeros((2, 48, 64)), method=model.init_all)
    fb = FeatureBank(obj_n=2, memory_budget=250_000, dtype=jnp.bfloat16)
    engine = VideoSegEngine(model, variables, fb, downsample=480,
                            postprocess="device")
    res_hw = (1080, 1920)
    rng = np.random.RandomState(0)
    frame0 = rng.rand(*res_hw, 3).astype(np.float32)
    mask0 = np.zeros(res_hw, np.uint8)
    mask0[res_hw[0] // 2:, :] = 1
    state = engine.bootstrap(frame0, mask0)
    frame_u8 = jax.device_put((rng.rand(*res_hw, 3) * 255).astype(np.uint8))

    small_hw = ops.short_side_size(*res_hw, 480)

    @jax.jit
    def prep(frame_u8):
        f = frame_u8.astype(jnp.float32) / 255.0
        return ops.resize(f, small_hw, "bicubic", spatial_axes=(0, 1))

    frame_small = prep(frame_u8)

    @jax.jit
    def segment(frame_small, keys, values, valid, occ):
        score, _, cnt = model.apply(variables, frame_small[None], keys,
                                    values, valid, False,
                                    method=model.segment, bank_occ=occ)
        return jax.nn.softmax(score, axis=1), cnt

    pred, cnt = segment(frame_small, state.keys, state.values, state.valid,
                        state.occ)

    @jax.jit
    def memorize(frame_small, pred):
        return model.apply(variables, frame_small, pred[0],
                           method=model.memorize)

    k4, v4 = memorize(frame_small, pred)

    @jax.jit
    def update(state, cnt, k4, v4):
        st = fb.record_usage(state, cnt)
        return fb.update(st, k4, v4, jnp.float32(5.0))

    @jax.jit
    def finish(pred):
        up = ops.resize(pred[0], res_hw, "bicubic", spatial_axes=(-2, -1))
        label_full = jnp.argmax(up, axis=0).astype(jnp.uint8)
        label_small = jnp.argmax(pred[0], axis=0).astype(jnp.uint8)
        return label_full, label_small

    label_full, label_small = finish(pred)

    cc = jax.jit(device_largest_cc)
    packf = jax.jit(lambda lab: pack_bits(lab))

    # --- segment sub-breakdown: query encode / bank read / decode ---
    from vfloodnet_tpu.ops import bank_attention_read
    from vfloodnet_tpu.ops.attention_pallas import pallas_bank_read

    @jax.jit
    def encq(f):
        return model.apply(variables, f[None], method=model.encode_query)

    k4q, v4q, skips, hw16, pad = encq(frame_small)
    hw16 = jax.tree.map(int, hw16)       # back to static ints for re-jit
    pad = jax.tree.map(int, pad)

    def make_read(use_occ):
        @jax.jit
        def read(keys, values, valid, q, occ):
            ob = jnp.max(occ) if use_occ else None

            def read_one(k, v, ok, qq):
                return bank_attention_read(k, v, ok, qq.astype(jnp.float32),
                                           thres=model.thres_valid,
                                           chunk=model.read_chunk,
                                           occ_bound=ob)
            ro = jax.vmap(read_one, in_axes=(0, 0, 0, None))
            return jax.vmap(ro, in_axes=(None, None, None, 0))(keys, values,
                                                               valid, q)
        return read

    read, read_full = make_read(True), make_read(False)
    mem, _ = read(state.keys, state.values, state.valid, k4q, state.occ)

    @jax.jit
    def dec(mem, v4q, skips):
        return model.apply(variables, mem, v4q, skips, hw16, pad, False,
                           method=model.decode_with_memory)

    q1 = k4q[0].astype(jnp.float32)             # [P, dk] (batch 0)
    pall = lambda k, v, ok: pallas_bank_read(k, v, ok, q1.astype(k.dtype))
    pall2 = jax.jit(lambda ks, vs, oks: jax.vmap(pall)(ks, vs, oks))

    print(f"  encode_query         {timeit(encq, frame_small):7.2f} ms")
    print(f"  bank read occ={int(state.occ[0])}  {timeit(read, state.keys, state.values, state.valid, k4q, state.occ):7.2f} ms")
    print(f"  bank read full-cap   {timeit(read_full, state.keys, state.values, state.valid, k4q, state.occ):7.2f} ms")
    if os.environ.get("VFLOOD_BENCH_PALLAS") == "1":
        # Off by default: the pallas_call remote-compile at this shape ran
        # >45 min on the dev relay without finishing (2026-08-17).
        try:
            print(f"  pallas read (2 obj)  {timeit(pall2, state.keys, state.values, state.valid):7.2f} ms")
        except Exception as e:
            print(f"  pallas read FAILED: {type(e).__name__}: {e}")
    else:
        del pall2
    print(f"  decode               {timeit(dec, mem, v4q, skips):7.2f} ms")

    print(f"prep (u8->f32 + down)  {timeit(prep, frame_u8):7.2f} ms")
    print(f"segment (enc+read+dec) {timeit(segment, frame_small, state.keys, state.values, state.valid, state.occ):7.2f} ms")
    print(f"memorize               {timeit(memorize, frame_small, pred):7.2f} ms")
    print(f"update (bank)          {timeit(update, state, cnt, k4, v4):7.2f} ms")
    print(f"finish (up+argmax)     {timeit(finish, pred):7.2f} ms")
    print(f"cc (half-res + up)     {timeit(cc, label_full, label_small):7.2f} ms")
    print(f"pack_bits              {timeit(packf, label_full):7.2f} ms")

    # whole fused step for reference (graph identical to bench.py's):
    # state-chained with one forced fetch at the end minus the D2H floor
    from _bench_timing import fetch_floor, force
    out = engine._step(state, frame_u8, jnp.float32(7.0))
    force(out[1])
    floor = fetch_floor(out[1])
    st = out[0]
    t0 = time.time()
    n = 10
    for i in range(n):
        st, lab, _ = engine._step(st, frame_u8, jnp.float32(8.0 + i))
    force(lab)
    print(f"whole fused step       {(time.time()-t0-floor)/n*1000.0:7.2f} ms")


if __name__ == "__main__":
    from vfloodnet_tpu.core.runtime import ensure_backend
    ensure_backend()
    main()
