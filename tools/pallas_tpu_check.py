#!/usr/bin/env python
"""Compile + run each Pallas kernel on the real TPU, one at a time,
printing wall time per step — isolates slow/hanging Mosaic compiles.

Usage: python tools/pallas_tpu_check.py [channels] [block_len]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def tick(label, fn):
    t0 = time.perf_counter()
    out = fn()
    import jax
    jax.block_until_ready(out)
    print(f"{label:>28}: {time.perf_counter() - t0:8.2f}s", flush=True)
    return out


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    channels = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 48000
    ntaps = 41

    from sondetpu.dsp.fir import design_lowpass
    from sondetpu.pallas.frontend import HALO, frontend_chunk, fused_frontend
    from sondetpu.pallas import corr_kernel
    from sondetpu.pallas.syndrome import rs_clean_flags_pallas

    rng = np.random.default_rng(0)
    iq_i = jnp.asarray(rng.normal(size=(channels, n)).astype(np.float32))
    iq_q = jnp.asarray(rng.normal(size=(channels, n)).astype(np.float32))
    ti = jnp.zeros((channels, HALO), jnp.float32)
    tq = jnp.zeros((channels, HALO), jnp.float32)
    ct = jnp.asarray(design_lowpass(5000.0, 48000.0, ntaps)[None, :])
    chunk = frontend_chunk(n)
    print(f"chunk={chunk} pad={-n % chunk}", flush=True)

    for decim in (1, 2):
        mt = jnp.asarray(design_lowpass(2640.0, 48000.0 / decim, ntaps)[None, :])
        sc = jnp.asarray([[1.0]], jnp.float32)
        tick(f"fused_frontend decim={decim}",
             lambda: fused_frontend(iq_i, iq_q, ti, tq, ct, mt, sc,
                                    ntaps=ntaps, decim=decim, chunk=chunk))
        tick(f"fused_frontend decim={decim} #2",
             lambda: fused_frontend(iq_i, iq_q, ti, tq, ct, mt, sc,
                                    ntaps=ntaps, decim=decim, chunk=chunk))

    buf = jnp.asarray(rng.choice([-1.0, 1.0], size=(channels, 21760))
                      .astype(np.float32))
    tmpl = jnp.asarray(rng.choice([-1.0, 1.0], size=(1, 64)).astype(np.float32))
    tick("corr_kernel", lambda: corr_kernel(buf, tmpl))
    tick("corr_kernel #2", lambda: corr_kernel(buf, tmpl))

    frames = jnp.asarray(rng.integers(0, 256, size=(channels, 9, 320))
                         .astype(np.uint8))
    layout = {"data_start": 48, "parity_start": 0, "nroots": 24,
              "interleave": 2}
    tick("rs_clean_flags_pallas",
         lambda: rs_clean_flags_pallas(frames, layout))
    tick("rs_clean_flags_pallas #2",
         lambda: rs_clean_flags_pallas(frames, layout))


if __name__ == "__main__":
    main()
