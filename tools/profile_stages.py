"""Stage-by-stage device timing of the RS41 pipeline step (dev tool).

NOTE: on the tunneled backend, jax.block_until_ready does NOT reliably wait
for execution; every measurement here forces execution by reading back a
tiny reduction of the stage output (np.asarray of a scalar), which costs a
constant ~23 ms RTT — compare stages relative to the 'noop' row.
"""
import sys
sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax
import jax.numpy as jnp

from sondetpu.dsp.fir import _apply_windows, design_lowpass
from sondetpu.sync.timing import oerder_meyr_tau
from sondetpu.sync.correlator import correlate_syncword, find_frame_starts, gather_frames
from sondetpu.runtime.pipeline import Pipeline, PipelineConfig

C = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
SECS = int(sys.argv[2]) if len(sys.argv) > 2 else 4
N = 48000 * SECS
rng = np.random.default_rng(0)


def bench(name, fn, *args, iters=5):
    # reduce to a scalar (full sum so nothing dead-code-eliminates) and read
    # it back: one RTT, forces execution on the tunneled backend
    f = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
    _ = np.asarray(f(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _ = np.asarray(f(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name:40s} {min(ts)*1e3:8.1f} ms", flush=True)


cfg = PipelineConfig(sonde="rs41", channels=C, block_len=N)
pipe = Pipeline(cfg)
row = rng.normal(size=N).astype(np.float32)
x = jax.device_put(np.tile(row[None], (C, 1)))
y = jax.device_put(np.tile(row[None] * 0.7, (C, 1)))
taps = design_lowpass(2640.0, 48000.0, 41)

bench("noop (RTT floor)", lambda a: a[:1, :1], x)
bench("chan filter conv s2 (I+Q)", lambda a, b: (
    _apply_windows(jnp.pad(a, ((0, 0), (40, 0))), taps, stride=2)
    + _apply_windows(jnp.pad(b, ((0, 0), (40, 0))), taps, stride=2)), x, y)

M = N // 2
rowh = rng.normal(size=M).astype(np.float32)
xh = jax.device_put(np.tile(rowh[None], (C, 1)))
yh = jax.device_put(np.tile(rowh[None] * 0.9, (C, 1)))


def fm(a, b):
    pi_ = jnp.concatenate([a[:, 0:1], a[:, :-1]], axis=-1)
    pq_ = jnp.concatenate([b[:, 0:1], b[:, :-1]], axis=-1)
    dre = a * pi_ + b * pq_
    dim = b * pi_ - a * pq_
    au = jnp.arctan2(dim, dre)
    return au - jnp.mean(au, axis=-1, keepdims=True)


bench("fm demod + dc", fm, xh, yh)
bench("matched fir", lambda a: _apply_windows(jnp.pad(a, ((0, 0), (40, 0))), taps), xh)
bench("oerder_meyr tau", lambda a: oerder_meyr_tau(a, 5.0), xh)

buf = jax.device_put(np.tile(rng.normal(size=cfg.buf_len).astype(np.float32)[None],
                             (C, 1)))
tmpl = pipe._template
bench("syncword correlator", lambda a: correlate_syncword(a, tmpl), buf)

corr = jax.jit(lambda a: correlate_syncword(a, tmpl))(buf)
K = cfg.k_slots
bench(f"find starts (K={K})", lambda cr: find_frame_starts(
    cr, 0.6, K, 640)[0], corr)
starts, ok = jax.jit(lambda cr: find_frame_starts(cr, 0.6, K, 640))(corr)
bench("gather frames (u8 pre-sliced)", lambda b, s, o: gather_frames(
    (b > 0).astype(jnp.uint8), s, o, cfg.frame_chips)[0], buf, starts, ok)

hard = jax.jit(lambda b, s, o: gather_frames((b > 0).astype(jnp.uint8), s, o,
                                             cfg.frame_chips)[0])(buf, starts, ok)


def pack_bytes(ch):
    bits8 = ch.reshape(ch.shape[0], ch.shape[1], cfg.spec.frame_bytes, 8)
    w = np.array([1, 2, 4, 8, 16, 32, 64, 128], dtype=np.int32)
    return jnp.sum(bits8.astype(jnp.int32) * w, axis=-1).astype(jnp.uint8)


bench("bit->byte pack + whiten", pack_bytes, hard)


def sample(f):
    start = jnp.zeros((C,), jnp.float32) + 2.3
    return pipe._sample_symbols(f, start, 5.0, cfg.chips_per_block)


bench("symbol sampling", sample, xh)

st = pipe.init_state()
st, out = pipe.step(st, (x, y))
_ = np.asarray(out.packed)
ts = []
for _ in range(5):
    t0 = time.perf_counter()
    st, out = pipe.step(st, (x, y))
    p = np.asarray(out.packed)
    ts.append(time.perf_counter() - t0)
print(f"{'FULL STEP + packed readback':40s} {min(ts)*1e3:8.1f} ms")
