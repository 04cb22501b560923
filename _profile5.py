import time, numpy as np, jax, jax.numpy as jnp
from vfloodnet_tpu.core.cache import enable_compilation_cache
enable_compilation_cache()
from vfloodnet_tpu.models import AFBURR
from vfloodnet_tpu.memory import FeatureBank
from vfloodnet_tpu.pipelines.video_seg import VideoSegEngine
from vfloodnet_tpu import ops

model = AFBURR()
variables = model.init(jax.random.PRNGKey(0), jnp.zeros((48, 64, 3)),
                       jnp.zeros((2, 48, 64)), method=model.init_all)
fb = FeatureBank(obj_n=2, memory_budget=250000)
engine = VideoSegEngine(model, variables, fb, downsample=480, postprocess=True)
rng = np.random.RandomState(0)
frame0 = rng.rand(1080, 1920, 3).astype(np.float32)
mask0 = np.zeros((1080, 1920), np.uint8); mask0[540:, :] = 1
state = engine.bootstrap(frame0, mask0)
frame = rng.rand(1080, 1920, 3).astype(np.float32)
for i in range(2):
    state, label = engine.step(state, frame, i+1)
label.block_until_ready()

# timed: each sub-stage with hard sync
t0=time.time()
for _ in range(5):
    fj = jax.device_put(frame); fj.block_until_ready()
print(f"device_put+sync: {(time.time()-t0)/5*1000:.1f} ms", flush=True)

small_hw = ops.short_side_size(1080, 1920, 480)
t0=time.time()
for _ in range(5):
    fs = ops.resize(fj, small_hw, "bicubic", spatial_axes=(0,1)); fs.block_until_ready()
print(f"downsample+sync: {(time.time()-t0)/5*1000:.1f} ms", flush=True)

t0=time.time()
for i in range(5):
    out = engine._step(state, fs, fj, jnp.float32(5.0+i)); jax.block_until_ready(out)
print(f"_step+sync: {(time.time()-t0)/5*1000:.1f} ms", flush=True)
_, lf, ls = out

t0=time.time()
for _ in range(5):
    lab = engine._clean(lf, ls); lab.block_until_ready()
print(f"_clean+sync: {(time.time()-t0)/5*1000:.1f} ms", flush=True)

t0=time.time()
for i in range(5):
    state2, lab = engine.step(state, frame, 10+i); lab.block_until_ready()
print(f"engine.step+sync: {(time.time()-t0)/5*1000:.1f} ms", flush=True)

# does feeding state2 (donated?) matter - bench threads state through
t0=time.time()
st = state
for i in range(5):
    st, lab = engine.step(st, frame, 20+i)
lab.block_until_ready()
print(f"threaded steps avg: {(time.time()-t0)/5*1000:.1f} ms", flush=True)
