import time, numpy as np, jax, jax.numpy as jnp
from functools import partial
from vfloodnet_tpu.core.cache import enable_compilation_cache
enable_compilation_cache()
from vfloodnet_tpu.models import AFBURR
from vfloodnet_tpu.memory import FeatureBank
from vfloodnet_tpu import ops

model = AFBURR(dtype=jnp.bfloat16)
variables = model.init(jax.random.PRNGKey(0), jnp.zeros((48, 64, 3)),
                       jnp.zeros((2, 48, 64)), method=model.init_all)
fb = FeatureBank(obj_n=2, memory_budget=250000, dtype=jnp.bfloat16)
rng = np.random.RandomState(0)
H, W = 1080, 1920

def make_step(mode):
    @partial(jax.jit, static_argnums=3)
    def _step(state, frame_u8, frame_idx, m):
        frame_full = frame_u8.astype(jnp.float32) / 255.0
        small_hw = ops.short_side_size(H, W, 480)
        frame_small = ops.resize(frame_full, small_hw, "bicubic", spatial_axes=(0, 1))
        if m == "resize_only":
            return state, frame_small.sum().astype(jnp.uint8)[None,None]
        score, _, cnt = model.apply(variables, frame_small[None], state.keys,
                                    state.values, state.valid, False,
                                    method=model.segment)
        pred = jax.nn.softmax(score, axis=1)
        if m == "segment_only":
            return state, jnp.argmax(pred[0,:, :8,:8], axis=0).astype(jnp.uint8)
        k4, v4 = model.apply(variables, frame_small, pred[0], method=model.memorize)
        if m == "no_update":
            return state, (k4.sum()*0).astype(jnp.uint8)[None,None] + jnp.argmax(pred[0,:,:8,:8],axis=0).astype(jnp.uint8)
        state = fb.record_usage(state, cnt)
        state = fb.update(state, k4, v4, frame_idx)
        if m == "no_upsample":
            return state, jnp.argmax(pred[0,:,:8,:8],axis=0).astype(jnp.uint8)
        up = ops.resize(pred[0], (H, W), "bicubic", spatial_axes=(-2, -1))
        label_full = jnp.argmax(up, axis=0).astype(jnp.uint8)
        label_small = jnp.argmax(pred[0], axis=0).astype(jnp.uint8)
        if m == "no_cc":
            return state, label_full
        keep = ops.largest_connected_component(label_small)
        keep_full = ops.resize(keep, (H, W), "nearest", spatial_axes=(-2, -1))
        return state, label_full * keep_full
    return lambda s, f, i: _step(s, f, jnp.float32(i), mode)

frame0 = rng.rand(H, W, 3).astype(np.float32)
mask0 = np.zeros((H, W), np.uint8); mask0[540:, :] = 1
frames = [jax.device_put((rng.rand(H, W, 3)*255).astype(np.uint8)) for _ in range(4)]

from vfloodnet_tpu.pipelines.video_seg import VideoSegEngine
eng = VideoSegEngine(model, variables, fb, downsample=480)
base_state = eng.bootstrap(frame0, mask0)

for mode in ["resize_only", "segment_only", "no_update", "no_upsample", "no_cc", "full"]:
    step = make_step(mode)
    state = jax.tree.map(lambda x: x.copy() if hasattr(x, 'copy') else x, base_state)
    for i in range(2):
        state, lab = step(state, frames[i%4], i+1)
    jax.block_until_ready(lab)
    n = 15
    t0 = time.time()
    outs = []
    for i in range(n):
        state, lab = step(state, frames[i%4], 5+i)
        outs.append(lab)
    jax.block_until_ready(outs)
    print(f"{mode}: {(time.time()-t0)/n*1000:.1f} ms/frame", flush=True)
