"""Syncword correlator Pallas kernel.

The frame-sync correlator of BASELINE.json:5 as a VMEM-resident
shifted-MAC loop over the template length: the [C, buf] chip buffer is read
once from HBM and the L-tap correlation accumulates in registers/VMEM,
instead of XLA's conv lowering materializing intermediates.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

TILE_C = 8


def _kernel(buf_ref, tmpl_ref, out_ref, *, L: int):
    buf = buf_ref[:]
    n_out = buf.shape[-1] - L + 1
    acc = jnp.zeros(buf[:, :n_out].shape, jnp.float32)
    for k in range(L):
        # static slices only (no dynamic_slice lowering in Pallas TPU)
        acc = acc + tmpl_ref[0, k] * buf[:, k:k + n_out]
    out_ref[:] = acc * (1.0 / L)


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def corr_kernel(chipbuf, template, *, chunk: int = 4096,
                interpret: bool = False):
    """chipbuf [C, buf], template [1, L] -> corr [C, buf - L + 1] / L.

    Time-chunked: one pallas_call per ``chunk`` output columns (each call's
    input is the chunk plus an L-1 halo), so VMEM stays bounded at any
    channel count / block length — a monolithic row at 2048 ch x 4 s blocks
    blows the ~16 MB scoped-VMEM budget.
    """
    c, buf = chipbuf.shape
    L = template.shape[-1]
    assert c % TILE_C == 0, c
    n_out = buf - L + 1
    kern = functools.partial(_kernel, L=L)
    outs = []
    for s in range(0, n_out, chunk):
        w = min(chunk, n_out - s)
        piece = jax.lax.slice_in_dim(chipbuf, s, s + w + L - 1, axis=1)
        outs.append(pl.pallas_call(
            kern,
            grid=(c // TILE_C,),
            in_specs=[
                pl.BlockSpec((TILE_C, w + L - 1), lambda g: (g, 0)),
                pl.BlockSpec((1, L), lambda g: (0, 0)),
            ],
            out_specs=pl.BlockSpec((TILE_C, w), lambda g: (g, 0)),
            out_shape=jax.ShapeDtypeStruct((c, w), jnp.float32),
            interpret=interpret,
        )(piece, template))
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-1)
