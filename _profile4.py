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

# warm everything
for i in range(2):
    state, label = engine.step(state, frame, i+1)
label.block_until_ready()

def t(name, fn, n=5):
    t0=time.time()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    print(f"{name}: {(time.time()-t0)/n*1000:.1f} ms", flush=True)
    return out

fj = jnp.asarray(frame)
t("asarray H2D", lambda: jnp.asarray(frame))
small_hw = ops.short_side_size(1080, 1920, 480)
fs = ops.resize(fj, small_hw, "bicubic", spatial_axes=(0,1))
t("eager downsample", lambda: ops.resize(fj, small_hw, "bicubic", spatial_axes=(0,1)))
out = engine._step(state, fs, fj, jnp.float32(5.0))
t("_step jit", lambda: engine._step(state, fs, fj, jnp.float32(5.0)))
_, lf, ls = out
t("_clean jit", lambda: engine._clean(lf, ls))
t("full engine.step", lambda: engine.step(state, frame, 7)[1])
