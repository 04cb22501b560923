import time, numpy as np, jax, jax.numpy as jnp
from vfloodnet_tpu.core.cache import enable_compilation_cache
enable_compilation_cache()
from vfloodnet_tpu.models import AFBURR
from vfloodnet_tpu.memory import FeatureBank
from vfloodnet_tpu.pipelines.video_seg import VideoSegEngine

model = AFBURR(dtype=jnp.bfloat16)
variables = model.init(jax.random.PRNGKey(0), jnp.zeros((48, 64, 3)),
                       jnp.zeros((2, 48, 64)), method=model.init_all)
fb = FeatureBank(obj_n=2, memory_budget=250000, dtype=jnp.bfloat16)
engine = VideoSegEngine(model, variables, fb, downsample=480, postprocess=True)
rng = np.random.RandomState(0)
frame0 = rng.rand(1080, 1920, 3).astype(np.float32)
mask0 = np.zeros((1080, 1920), np.uint8); mask0[540:, :] = 1
state = engine.bootstrap(frame0, mask0)
frames = [engine.upload((rng.rand(1080, 1920, 3)*255).astype(np.uint8)) for _ in range(4)]
for i in range(3):
    state, label = engine.step(state, frames[i % 4], i + 1)
label.block_until_ready()

for n in (10, 30):
    t0 = time.time()
    labels = []
    for i in range(n):
        state, label = engine.step(state, frames[i % 4], 10 + i)
        labels.append(label)
    jax.block_until_ready(labels)
    dt = (time.time() - t0) / n
    print(f"amortized over {n} frames: {dt*1000:.1f} ms -> {1/dt:.1f} fps", flush=True)
