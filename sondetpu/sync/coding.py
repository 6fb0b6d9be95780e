"""Line coding: Manchester/biphase decode, descrambling, bit packing.

Batched array re-implementations of sondedump's deframing primitives
(SURVEY.md S0: "Manchester/biphase decoder", "data whitening/descramble").
All functions operate on a trailing bit/symbol axis with any leading batch
dims, uint8 in/out, and are jit-safe (static shapes).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def manchester_decode(chips: jax.Array, invert: bool = False) -> jax.Array:
    """IEEE Manchester: chip pair (1,0) -> 1, (0,1) -> 0 (swapped if invert).

    chips: [..., 2*n] uint8; returns [..., n]. Used by DFM (S2) and the
    Manchester-coded M10/M20 path (S3).
    """
    a = chips[..., 0::2]
    b = chips[..., 1::2]
    bit = (a & (1 - b)).astype(jnp.uint8)
    if invert:
        bit = ((1 - a) & b).astype(jnp.uint8)
    return bit


def biphase_m_decode(chips: jax.Array) -> jax.Array:
    """Biphase-Mark: a transition mid-cell encodes 1, none encodes 0.

    chips: [..., 2*n] uint8 -> bits [..., n]. (M10/M20 deframe, SURVEY.md S3.)
    """
    a = chips[..., 0::2]
    b = chips[..., 1::2]
    return (a ^ b).astype(jnp.uint8)


def nrzs_decode(bits: jax.Array, prev: jax.Array | None = None) -> jax.Array:
    """NRZ-S differential decode: output 0 on transition, 1 on no transition.

    bits: [..., n]; prev: [...] previous bit carry (defaults to 0).
    """
    if prev is None:
        prev = jnp.zeros(bits.shape[:-1], dtype=bits.dtype)
    shifted = jnp.concatenate([prev[..., None], bits[..., :-1]], axis=-1)
    return (1 - (bits ^ shifted)).astype(jnp.uint8)


def bits_to_bytes(bits: jax.Array, lsb_first: bool = False) -> jax.Array:
    """Pack [..., 8*n] bits into [..., n] bytes."""
    shape = bits.shape[:-1] + (bits.shape[-1] // 8, 8)
    b = bits.reshape(shape).astype(jnp.uint8)
    if lsb_first:
        weights = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], dtype=jnp.uint8)
    else:
        weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], dtype=jnp.uint8)
    return jnp.sum(b.astype(jnp.int32) * weights.astype(jnp.int32), axis=-1).astype(jnp.uint8)


def bytes_to_bits(data: jax.Array, lsb_first: bool = False) -> jax.Array:
    """Unpack [..., n] bytes into [..., 8*n] bits."""
    data = jnp.asarray(data, dtype=jnp.uint8)
    shifts = jnp.arange(8, dtype=jnp.uint8)
    if not lsb_first:
        shifts = shifts[::-1]
    bits = (data[..., None] >> shifts) & 1
    return bits.reshape(data.shape[:-1] + (data.shape[-1] * 8,)).astype(jnp.uint8)


def descramble_xor(frame: jax.Array, mask: np.ndarray) -> jax.Array:
    """XOR-descramble bytes with a repeating mask (RS41 whitening,
    SURVEY.md S1: "data whitening/descramble").

    frame: [..., n] uint8; mask: [m] uint8 repeated cyclically from frame
    start.
    """
    n = frame.shape[-1]
    m = np.asarray(mask, dtype=np.uint8)
    reps = -(-n // m.size)
    full = jnp.asarray(np.tile(m, reps)[:n])
    return jnp.bitwise_xor(frame, full)


# NumPy twins for host-side parsing/modulation ------------------------------

def np_bits_to_bytes(bits: np.ndarray, lsb_first: bool = False) -> np.ndarray:
    b = np.asarray(bits, dtype=np.uint8).reshape(*bits.shape[:-1], -1, 8)
    w = np.array([1, 2, 4, 8, 16, 32, 64, 128] if lsb_first
                 else [128, 64, 32, 16, 8, 4, 2, 1], dtype=np.uint32)
    return (b * w).sum(axis=-1).astype(np.uint8)


def np_bytes_to_bits(data: np.ndarray, lsb_first: bool = False) -> np.ndarray:
    data = np.asarray(data, dtype=np.uint8)
    shifts = np.arange(8) if lsb_first else np.arange(7, -1, -1)
    bits = (data[..., None] >> shifts) & 1
    return bits.reshape(*data.shape[:-1], -1).astype(np.uint8)
