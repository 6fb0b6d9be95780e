"""Micro-bench: depthwise conv vs blocked-Toeplitz matmul variants (dev tool)."""
import sys, time
import sys; sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp

C, N, NT, STRIDE = 2048, 192000, 41, 2
rng = np.random.default_rng(0)
x = jax.device_put(rng.normal(size=(C, N + NT - 1)).astype(np.float32))
k = rng.normal(size=NT).astype(np.float32)

def bench(name, fn):
    f = jax.jit(lambda a: jnp.sum(fn(a)))
    _ = np.asarray(f(x))
    ts = []
    for _ in range(4):
        t0 = time.perf_counter(); _ = np.asarray(f(x)); ts.append(time.perf_counter()-t0)
    print(f"{name:34s} {min(ts)*1e3:7.1f} ms", flush=True)

from sondetpu.dsp.fir import _group_size

def depthwise(a):
    g = _group_size(C)
    out = jax.lax.conv_general_dilated(
        a.reshape(C // g, g, -1), jnp.tile(jnp.asarray(k)[None, None, :], (g, 1, 1)),
        window_strides=(STRIDE,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"), feature_group_count=g)
    return out.reshape(C, -1)

def make_mxu(T, dtype, prec=None):
    def f(a):
        n = a.shape[-1] - NT + 1
        nblk = -(-n // T)
        xp = jnp.pad(a, ((0, 0), (0, nblk * T + T - a.shape[-1])))
        A = xp[:, : nblk * T].reshape(C, nblk, T)
        B = xp[:, T: T + nblk * T].reshape(C, nblk, T)[:, :, : NT - 1]
        j = jnp.arange(0, T, STRIDE)[None, :]
        d0 = jnp.arange(T)[:, None] - j
        h0 = jnp.where((d0 >= 0) & (d0 < NT), jnp.asarray(k)[jnp.clip(d0, 0, NT - 1)], 0.)
        d1 = (T + jnp.arange(NT - 1))[:, None] - j
        h1 = jnp.where((d1 >= 0) & (d1 < NT), jnp.asarray(k)[jnp.clip(d1, 0, NT - 1)], 0.)
        kw = dict(preferred_element_type=jnp.float32)
        if prec: kw["precision"] = prec
        y = (jnp.einsum("cmt,tj->cmj", A.astype(dtype), h0.astype(dtype), **kw)
             + jnp.einsum("cmd,dj->cmj", B.astype(dtype), h1.astype(dtype), **kw))
        return y.reshape(C, -1)[:, : -(-n // STRIDE)]
    return f

bench("depthwise grouped conv", depthwise)
bench("toeplitz T=128 f32 default", make_mxu(128, jnp.float32))
bench("toeplitz T=128 bf16", make_mxu(128, jnp.bfloat16))
bench("toeplitz T=256 bf16", make_mxu(256, jnp.bfloat16))
bench("toeplitz T=512 bf16", make_mxu(512, jnp.bfloat16))
bench("toeplitz T=128 f32 HIGHEST", make_mxu(128, jnp.float32, jax.lax.Precision.HIGHEST))
