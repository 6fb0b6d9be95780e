"""Stage-by-stage device timing of the RS41 pipeline step (dev tool)."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from sondetpu.dsp.fir import _apply_windows, design_lowpass
from sondetpu.sync.timing import oerder_meyr_tau
from sondetpu.sync.correlator import correlate_syncword, find_frame_starts, gather_frames
from sondetpu.runtime.pipeline import Pipeline, PipelineConfig

C, N = 2048, 48000
rng = np.random.default_rng(0)


def bench(name, fn, *args, iters=8):
    f = jax.jit(fn)
    o = f(*args)
    jax.block_until_ready(o)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        o = f(*args)
        jax.block_until_ready(o)
        ts.append(time.perf_counter() - t0)
    print(f"{name:36s} {min(ts)*1e3:8.2f} ms")
    return o


x = jax.device_put(rng.normal(size=(C, N)).astype(np.float32))
y = jax.device_put(rng.normal(size=(C, N)).astype(np.float32))
taps = design_lowpass(2640.0, 48000.0, 41)

xp = jnp.pad(x, ((0, 0), (40, 0)))
bench("chan filter conv stride2 (I+Q)", lambda a, b: (_apply_windows(jnp.pad(a, ((0,0),(40,0))), taps, stride=2),
                                                      _apply_windows(jnp.pad(b, ((0,0),(40,0))), taps, stride=2)), x, y)

M = N // 2
xh = jax.device_put(rng.normal(size=(C, M)).astype(np.float32))
yh = jax.device_put(rng.normal(size=(C, M)).astype(np.float32))

def fm(a, b):
    pi_ = jnp.concatenate([a[:, 0:1], a[:, :-1]], axis=-1)
    pq_ = jnp.concatenate([b[:, 0:1], b[:, :-1]], axis=-1)
    dre = a * pi_ + b * pq_
    dim = b * pi_ - a * pq_
    au = jnp.arctan2(dim, dre)
    return au - jnp.mean(au, axis=-1, keepdims=True)

bench("fm demod + dc (half rate)", fm, xh, yh)
bench("matched fir (half rate)", lambda a: _apply_windows(jnp.pad(a, ((0,0),(40,0))), taps), xh)
bench("oerder_meyr tau", lambda a: oerder_meyr_tau(a, 5.0), xh)

cfg = PipelineConfig(sonde="rs41", channels=C, block_len=N)
pipe = Pipeline(cfg)
buf = jax.device_put(rng.normal(size=(C, cfg.buf_len)).astype(np.float32))
tmpl = pipe._template
bench("syncword correlator", lambda a: correlate_syncword(a, tmpl), buf)

corr = correlate_syncword(buf, tmpl)
bench("find starts + gather", lambda cr, b: gather_frames(
    b, *find_frame_starts(cr, 0.6, 4, 640), cfg.frame_chips)[0], corr, buf)


def sample(f):
    start = jnp.zeros((C,), jnp.float32) + 2.3
    return pipe._sample_symbols(f, start, 5.0, cfg.chips_per_block)

bench("symbol sampling", sample, xh)

st = pipe.init_state()
st, out = pipe.step(st, (np.asarray(x), np.asarray(y)))
jax.block_until_ready(out)
ts = []
for _ in range(6):
    t0 = time.perf_counter()
    st, out = pipe.step(st, (np.asarray(x), np.asarray(y)))
    jax.block_until_ready(out)
    ts.append(time.perf_counter() - t0)
print(f"{'FULL STEP (incl upload)':36s} {min(ts)*1e3:8.2f} ms")
