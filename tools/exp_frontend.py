#!/usr/bin/env python
"""Micro-benchmark the front-end ops on hardware: conv dtype and atan2.

Times, at bench shapes (2048ch x 192k samples):
  - grouped depthwise conv (chanfilt) at f32 vs bf16 input
  - jnp.arctan2 vs a quadrant-folded polynomial approximation
  - the concatenate+slice overlap-save overhead

Usage: python tools/exp_frontend.py [channels] [n]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def atan2_approx(y, x):
    """Quadrant-folded polynomial atan2, max error ~0.0038 rad.

    atan(z) ~= z*(a + b*z^2) for |z|<=1 (minimax over [0,1]), folded by
    |y|<=|x| swap and sign restoration. One rsqrt-free rational — cheap on
    the VPU compared to the libm-grade arctan2 lowering."""
    import jax.numpy as jnp
    ax, ay = jnp.abs(x), jnp.abs(y)
    swap = ay > ax
    num = jnp.where(swap, ax, ay)
    den = jnp.where(swap, ay, ax)
    z = num / jnp.maximum(den, 1e-30)
    z2 = z * z
    # 5th-order odd minimax on [0,1]
    a = z * (0.99997726 + z2 * (-0.33262347 + z2 * (0.19354346
             + z2 * (-0.11643287 + z2 * (0.05265332 + z2 * -0.01172120)))))
    a = jnp.where(swap, jnp.float32(np.pi / 2) - a, a)
    a = jnp.where(x < 0, jnp.float32(np.pi) - a, a)
    return jnp.where(y < 0, -a, a)


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    from sondetpu.dsp.fir import _conv1d, design_lowpass

    c = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 192000
    taps = design_lowpass(5000.0, 48000.0, 41)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(c, n)).astype(np.float32)
    y = rng.normal(size=(c, n)).astype(np.float32)

    def timeit(name, fn, *args):
        f = jax.jit(fn)
        r = f(*args)
        jax.block_until_ready(r)
        ts = []
        for _ in range(6):
            t0 = time.perf_counter()
            r = f(*args)
            # tiny readback to drain the queue (tunnel: block_until_ready
            # does not synchronize)
            _ = np.asarray(jax.tree.leaves(r)[0].ravel()[0])
            ts.append(time.perf_counter() - t0)
        print(f"{name:34s} {min(ts)*1e3:8.2f} ms")
        return min(ts)

    xd = jax.device_put(x)
    yd = jax.device_put(y)
    xb = jax.device_put(x.astype(jnp.bfloat16))
    yb = jax.device_put(y.astype(jnp.bfloat16))

    timeit("conv41 f32 stride2", lambda a: _conv1d(a, jnp.asarray(taps), 2), xd)
    timeit("conv41 bf16 stride2", lambda a: _conv1d(a, jnp.asarray(taps), 2), xb)
    timeit("conv41 f32 stride1", lambda a: _conv1d(a, jnp.asarray(taps), 1), xd)
    timeit("arctan2 f32", lambda a, b: jnp.arctan2(a, b), xd, yd)
    timeit("atan2_approx f32", atan2_approx, xd, yd)
    timeit("concat+slice (overlap-save)",
           lambda a: jnp.concatenate([jnp.zeros((c, 40), a.dtype), a],
                                     axis=-1)[:, -40:], xd)
    # fused demod shape: two mults + two FMAs + atan2 + scale
    def demod(i, q):
        pi_ = jnp.concatenate([i[:, :1], i[:, :-1]], axis=-1)
        pq_ = jnp.concatenate([q[:, :1], q[:, :-1]], axis=-1)
        dre = i * pi_ + q * pq_
        dim = q * pi_ - i * pq_
        return jnp.arctan2(dim, dre) * 3.1831
    def demod_fast(i, q):
        pi_ = jnp.concatenate([i[:, :1], i[:, :-1]], axis=-1)
        pq_ = jnp.concatenate([q[:, :1], q[:, :-1]], axis=-1)
        dre = i * pi_ + q * pq_
        dim = q * pi_ - i * pq_
        return atan2_approx(dim, dre) * 3.1831
    timeit("fm demod arctan2", demod, xd, yd)
    timeit("fm demod approx", demod_fast, xd, yd)

    # accuracy of the approximation
    import jax.numpy as jnp2
    ref = np.arctan2(y[:4].astype(np.float64), x[:4].astype(np.float64))
    got = np.asarray(jax.jit(atan2_approx)(yd[:4], xd[:4]))
    print(f"atan2 approx max err: {np.abs(got - ref).max():.2e} rad")


if __name__ == "__main__":
    main()
