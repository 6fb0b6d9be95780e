"""Fused FM-discriminator + DC-block + matched-FIR Pallas kernel.

One VMEM-resident pass per channel tile replaces three XLA stages (demod,
mean-subtract, FIR) that would each round-trip [C, n] float32 through HBM —
the fusion named in BASELINE.json:5 ("FM/GFSK quadrature demod, polyphase/
FIR matched filtering ... with Pallas kernels for the FIR ... and demod").

Inputs are I/Q planes plus the carried previous sample and audio tail;
output is the filtered audio block, bit-identical (up to float assoc.) to
the jnp path in runtime/pipeline.py.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_C = 8

# odd minimax polynomial for atan on [0, 1] (max err ~1e-6 rad)
_ATAN_C = (0.99997726, -0.33262347, 0.19354346, -0.11643287,
           0.05265332, -0.01172120)


def fast_atan2(y, x):
    """Polynomial atan2 (Pallas TPU has no atan2 primitive).

    Octant reduction + degree-11 odd minimax polynomial; max error ~1e-6 rad
    — far below the demod noise floor at any usable SNR.
    """
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    den = jnp.maximum(ax, ay)
    num = jnp.minimum(ax, ay)
    z = num / jnp.maximum(den, 1e-30)
    z2 = z * z
    c = _ATAN_C
    p = z * (c[0] + z2 * (c[1] + z2 * (c[2] + z2 * (c[3] + z2 * (c[4] + z2 * c[5])))))
    p = jnp.where(ay > ax, (jnp.pi / 2) - p, p)
    p = jnp.where(x < 0, jnp.pi - p, p)
    return jnp.where(y < 0, -p, p)


def _kernel(iq_i_ref, iq_q_ref, prev_ref, atail_ref, taps_ref, scale_ref,
            out_ref, tail_out_ref, *, ntaps: int, dc_block: bool):
    i = iq_i_ref[:]
    q = iq_q_ref[:]
    # one-sample-delayed copies with the carried previous sample
    ip = jnp.concatenate([prev_ref[:, 0:1], i[:, :-1]], axis=-1)
    qp = jnp.concatenate([prev_ref[:, 1:2], q[:, :-1]], axis=-1)
    dre = i * ip + q * qp
    dim = q * ip - i * qp
    audio = fast_atan2(dim, dre) * scale_ref[0, 0]
    if dc_block:
        audio = audio - jnp.mean(audio, axis=-1, keepdims=True)
    n = audio.shape[-1]
    ap = jnp.concatenate([atail_ref[:], audio], axis=-1)
    acc = jnp.zeros_like(audio)
    for k in range(ntaps):
        # y[m] = sum_k h[k] * ap[m + ntaps-1 - k]  (static slices only:
        # Pallas TPU has no dynamic_slice lowering)
        off = ntaps - 1 - k
        acc = acc + taps_ref[0, k] * ap[:, off:off + n]
    out_ref[:] = acc
    # next block's overlap-save carry: the (dc-removed) audio tail
    tail_out_ref[:] = audio[:, -(ntaps - 1):]


@functools.partial(jax.jit, static_argnames=("ntaps", "dc_block", "interpret"))
def fused_demod_fir(iq_i, iq_q, prev, atail, taps, scale, *,
                    ntaps: int, dc_block: bool = True, interpret: bool = False):
    """iq planes [C, n], prev [C, 2], atail [C, ntaps-1], taps [1, ntaps],
    scale [1, 1] -> (filtered audio [C, n], next audio tail [C, ntaps-1]).

    C must be a multiple of TILE_C (the pipeline pads its channel count).
    """
    c, n = iq_i.shape
    assert c % TILE_C == 0, c
    grid = (c // TILE_C,)

    kern = functools.partial(_kernel, ntaps=ntaps, dc_block=dc_block)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_C, n), lambda g: (g, 0)),
            pl.BlockSpec((TILE_C, n), lambda g: (g, 0)),
            pl.BlockSpec((TILE_C, 2), lambda g: (g, 0)),
            pl.BlockSpec((TILE_C, ntaps - 1), lambda g: (g, 0)),
            pl.BlockSpec((1, ntaps), lambda g: (0, 0)),
            pl.BlockSpec((1, 1), lambda g: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((TILE_C, n), lambda g: (g, 0)),
            pl.BlockSpec((TILE_C, ntaps - 1), lambda g: (g, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((c, n), jnp.float32),
            jax.ShapeDtypeStruct((c, ntaps - 1), jnp.float32),
        ),
        interpret=interpret,
    )(iq_i, iq_q, prev, atail, taps, scale)


@functools.partial(jax.jit,
                   static_argnames=("ntaps", "dc_block", "chunk", "interpret"))
def fused_demod_fir_chunked(iq_i, iq_q, prev, atail, taps, scale, *,
                            ntaps: int, dc_block: bool = True,
                            chunk: int = 6000, interpret: bool = False):
    """Time-chunked driver for :func:`fused_demod_fir`.

    A full 1-second block at 48 kHz plus kernel temporaries exceeds the
    ~16 MB VMEM budget, so the block is processed as static time chunks with
    the demod prev-sample and FIR audio tail threaded between kernel calls
    (the same carry discipline as between outer blocks). With dc_block the
    DC estimate is per-chunk rather than per-block — a strictly faster
    tracking of residual carrier drift.

    Returns (filtered audio [C, n], next audio tail, next prev)."""
    n = iq_i.shape[-1]
    outs = []
    for s in range(0, n, chunk):
        ii = iq_i[:, s:s + chunk]
        qq = iq_q[:, s:s + chunk]
        filt, atail = fused_demod_fir(ii, qq, prev, atail, taps, scale,
                                      ntaps=ntaps, dc_block=dc_block,
                                      interpret=interpret)
        prev = jnp.stack([ii[:, -1], qq[:, -1]], axis=-1)
        outs.append(filt)
    return jnp.concatenate(outs, axis=-1), atail, prev
