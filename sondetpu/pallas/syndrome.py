"""RS syndrome-check Pallas kernel (the decode-stage kernel).

VMEM-resident version of sondetpu.fec.syndrome.rs_clean_flags: per row tile,
expand the frame bytes into GF(2) bit-planes, multiply by the constant
frame-level syndrome matrix on the MXU, reduce mod 2, and emit one
clean/suspect flag per frame. One HBM read of the frame bytes, one flag out.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

TILE_R = 8


def _kernel(fr_ref, w_ref, out_ref, *, fb: int):
    # Mosaic cannot lower the [T, fb, 8] -> [T, 8*fb] bit-flatten reshape
    # ("unsupported shape cast"), so the GF(2) matmul runs as 8 bit-plane
    # matmuls against a BIT-MAJOR weight layout (row = bit*fb + byte):
    # identical arithmetic, static slices only, still MXU dots.
    fr = fr_ref[:]                                     # [T, fb] int32
    ncols = w_ref.shape[-1]
    snd = jnp.zeros((fr.shape[0], ncols), jnp.float32)
    for b in range(8):
        bits = ((fr >> b) & 1).astype(jnp.float32)     # [T, fb]
        snd = snd + jnp.dot(bits, w_ref[b * fb:(b + 1) * fb, :],
                            preferred_element_type=jnp.float32)
    odd = jnp.bitwise_and(snd.astype(jnp.int32), 1)
    out_ref[:] = (odd.sum(axis=-1, keepdims=True) == 0).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("fb", "interpret"))
def rs_clean_kernel(frames_i32, w, *, fb: int, interpret: bool = False):
    """frames_i32 [R, fb] (R % TILE_R == 0), w [8*fb, 8*nroots*ilv] f32 in
    BIT-MAJOR row order (row = bit*fb + byte) -> clean [R] bool."""
    r = frames_i32.shape[0]
    assert r % TILE_R == 0, r
    kern = functools.partial(_kernel, fb=fb)
    out = pl.pallas_call(
        kern,
        grid=(r // TILE_R,),
        in_specs=[
            pl.BlockSpec((TILE_R, fb), lambda g: (g, 0)),
            pl.BlockSpec(w.shape, lambda g: (0, 0)),
        ],
        out_specs=pl.BlockSpec((TILE_R, 1), lambda g: (g, 0)),
        out_shape=jax.ShapeDtypeStruct((r, 1), jnp.int32),
        interpret=interpret,
    )(frames_i32, w)
    return out[:, 0] != 0


def rs_clean_flags_pallas(frames, rs_layout: dict, *, interpret: bool = False):
    """Pallas-path equivalent of fec.syndrome.rs_clean_flags.

    frames [..., frame_bytes]; leading dims are flattened into rows and
    padded to a TILE_R multiple."""
    from sondetpu.fec.syndrome import frame_syndrome_matrix

    fb = frames.shape[-1]
    w_bytemajor = frame_syndrome_matrix(
        fb, rs_layout["data_start"], rs_layout["parity_start"],
        rs_layout["nroots"], rs_layout.get("interleave", 2),
        rs_layout.get("fcr", 0), rs_layout.get("prim", 0x11D))
    # byte-major rows (byte*8 + bit) -> bit-major rows (bit*fb + byte) for
    # the kernel's per-bit-plane matmuls
    ncols = w_bytemajor.shape[-1]
    w = jnp.asarray(np.ascontiguousarray(
        np.asarray(w_bytemajor).reshape(fb, 8, ncols)
        .transpose(1, 0, 2).reshape(8 * fb, ncols)))
    lead = frames.shape[:-1]
    r = int(np.prod(lead)) if lead else 1
    fr = frames.astype(jnp.int32).reshape(r, fb)
    pad = (-r) % TILE_R
    if pad:
        fr = jnp.pad(fr, ((0, pad), (0, 0)))
    clean = rs_clean_kernel(fr, w, fb=fb, interpret=interpret)
    return clean[:r].reshape(lead)
