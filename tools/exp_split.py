"""Split FULL-STEP time into device compute vs packed readback (dev tool)."""
import sys; sys.path.insert(0, "/root/repo")
import time
import numpy as np, jax, jax.numpy as jnp
from sondetpu.runtime.pipeline import Pipeline, PipelineConfig

C = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
SECS = 4
cfg = PipelineConfig(sonde="rs41", channels=C, block_len=48000 * SECS)
pipe = Pipeline(cfg)
state = pipe.init_state()
rng = np.random.default_rng(0)
ii = jax.device_put(rng.normal(size=(C, cfg.block_len)).astype(np.float32))
qq = jax.device_put(rng.normal(size=(C, cfg.block_len)).astype(np.float32))

# tiny-readback step: forces execution, measures compute + RTT only
tiny = jax.jit(lambda s, i, q: (pipe._step_impl(s, i, q)[0],
                                pipe._step_impl(s, i, q)[1].packed[:1]))
s2, t = tiny(state, ii, qq); _ = np.asarray(t)
ts = []
for _ in range(6):
    t0 = time.perf_counter(); s2, t = tiny(s2, ii, qq); _ = np.asarray(t)
    ts.append(time.perf_counter() - t0)
print(f"compute+RTT (packed[:1]):  {min(ts)*1e3:7.1f} ms")

state = pipe.init_state()
state, out = pipe.step(state, (ii, qq)); _ = np.asarray(out.packed)
ts = []
for _ in range(6):
    t0 = time.perf_counter()
    state, out = pipe.step(state, (ii, qq)); _ = np.asarray(out.packed)
    ts.append(time.perf_counter() - t0)
print(f"compute+full readback:     {min(ts)*1e3:7.1f} ms   (packed {out.packed.size/1e6:.2f} MB)")

# pure transfer: read packed again (already computed)
ts = []
for _ in range(6):
    t0 = time.perf_counter(); _ = np.asarray(out.packed)
    ts.append(time.perf_counter() - t0)
print(f"re-read packed only:       {min(ts)*1e3:7.1f} ms")
