#!/usr/bin/env python
"""Channel-filter FIR formulation experiment (r4): XLA depthwise conv vs a
Pallas lane-shift kernel at the fleet group shapes (small C — where the
conv is ~30x off roofline) and the single-type bench shape (large C).

Usage: python tools/exp_chanfilt.py
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(out):
    import jax
    leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "ravel")]
    np.asarray(leaves[-1].ravel()[:1])


def timeit(fn, *args, iters=5):
    out = fn(*args)
    _sync(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from sondetpu.dsp.fir import _apply_windows, design_lowpass

    ntaps = 41
    taps = design_lowpass(0.1, 1.0, ntaps).astype(np.float32)

    def lane_fir(x, h, tm=768, tc=8):
        """x [C, n + ntaps - 1] -> y [C, n]; n % tm == 0 (C padded here)."""
        c, ln = x.shape
        n = ln - ntaps + 1
        cp = -(-c // tc) * tc
        # pad lanes so the halo strip's 128-lane block stays in bounds
        xpad = jnp.pad(x, ((0, cp - c), (0, n + 128 - ln)))
        hv = [float(v) for v in h]

        def kernel(xm_ref, xh_ref, y_ref):
            xf = jnp.concatenate([xm_ref[:], xh_ref[:]], axis=1)
            acc = None
            for t in range(ntaps):
                s = xf[:, t:t + tm] * hv[t]
                acc = s if acc is None else acc + s
            y_ref[:] = acc

        grid = (cp // tc, n // tm)
        y = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((tc, tm), lambda i, j: (i, j)),
                pl.BlockSpec((tc, 128),
                             lambda i, j: (i, j * (tm // 128) + tm // 128)),
            ],
            out_specs=pl.BlockSpec((tc, tm), lambda i, j: (i, j)),
            out_shape=jax.ShapeDtypeStruct((cp, n), x.dtype),
        )(xpad, xpad)
        return y[:c]

    rng = np.random.default_rng(0)
    for (c, n) in [(306, 96000), (102, 96000), (616, 96000), (2048, 192000)]:
        x = jax.device_put(rng.normal(size=(c, n + ntaps - 1))
                           .astype(np.float32))
        tj = jnp.asarray(taps)

        conv = jax.jit(lambda x: _apply_windows(x, tj))
        t_conv, y_conv = timeit(conv, x)

        for tc in (8, 64):
            f = jax.jit(functools.partial(lane_fir, h=taps, tc=tc))
            t_p, y_p = timeit(f, x)
            err = float(jnp.max(jnp.abs(y_p - y_conv)))
            print(f"[{c:5d},{n}] conv {t_conv*1e3:7.2f} ms   "
                  f"pallas(tc={tc}) {t_p*1e3:7.2f} ms   err {err:.2e}",
                  flush=True)


if __name__ == "__main__":
    main()
