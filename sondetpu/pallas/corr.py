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


@functools.partial(jax.jit, static_argnames=("interpret",))
def corr_kernel(chipbuf, template, *, interpret: bool = False):
    """chipbuf [C, buf], template [1, L] -> corr [C, buf - L + 1] / L."""
    c, buf = chipbuf.shape
    L = template.shape[-1]
    assert c % TILE_C == 0, c
    n_out = buf - L + 1
    kern = functools.partial(_kernel, L=L)
    return pl.pallas_call(
        kern,
        grid=(c // TILE_C,),
        in_specs=[
            pl.BlockSpec((TILE_C, buf), lambda g: (g, 0)),
            pl.BlockSpec((1, L), lambda g: (0, 0)),
        ],
        out_specs=pl.BlockSpec((TILE_C, n_out), lambda g: (g, 0)),
        out_shape=jax.ShapeDtypeStruct((c, n_out), jnp.float32),
        interpret=interpret,
    )(chipbuf, template)
