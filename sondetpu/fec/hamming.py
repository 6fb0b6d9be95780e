"""Hamming(8,4) SECDED codec for the DFM family (SURVEY.md S2).

GRAW DFM06/09 protect each 4-bit data nibble with an extended Hamming(8,4)
code (BASELINE.json:9 "Hamming FEC"). Decode is a pure 256-entry syndrome
lookup table — applied as one NumPy gather over all received bytes of all
channels at once ("vectorized Hamming syndrome LUT", SURVEY.md S2).

Code construction (even parity, extended):
    codeword bits [d3 d2 d1 d0 p2 p1 p0 pe]
    p0 = d3^d2^d0, p1 = d3^d1^d0, p2 = d2^d1^d0, pe = overall parity.
Single-bit errors are corrected; double-bit errors are detected (fail).
"""

from __future__ import annotations

import numpy as np


def _encode_nibble(d: int) -> int:
    d3, d2, d1, d0 = (d >> 3) & 1, (d >> 2) & 1, (d >> 1) & 1, d & 1
    p0 = d3 ^ d2 ^ d0
    p1 = d3 ^ d1 ^ d0
    p2 = d2 ^ d1 ^ d0
    word = (d3 << 7) | (d2 << 6) | (d1 << 5) | (d0 << 4) | (p2 << 3) | (p1 << 2) | (p0 << 1)
    pe = bin(word).count("1") & 1
    return word | pe


_ENC = np.array([_encode_nibble(d) for d in range(16)], dtype=np.uint8)

# syndrome decode table: for each received byte, (nibble, ok)
_DEC = np.zeros(256, dtype=np.uint8)
_OK = np.zeros(256, dtype=bool)
for _d in range(16):
    cw = int(_ENC[_d])
    _DEC[cw] = _d
    _OK[cw] = True
    for _b in range(8):            # all single-bit corruptions correct back
        e = cw ^ (1 << _b)
        _DEC[e] = _d
        _OK[e] = True
# double-bit errors: even overall parity but nonzero syndrome -> detectable.
for _v in range(256):
    if _OK[_v]:
        continue
    _DEC[_v] = 0
    _OK[_v] = False


def hamming84_encode(nibbles: np.ndarray) -> np.ndarray:
    """nibbles [... ] 0..15 -> codeword bytes."""
    return _ENC[np.asarray(nibbles, dtype=np.uint8) & 0x0F]


def hamming84_decode(codewords: np.ndarray):
    """codewords [...] uint8 -> (nibbles [...], ok [...] bool)."""
    cw = np.asarray(codewords, dtype=np.uint8)
    return _DEC[cw], _OK[cw]
