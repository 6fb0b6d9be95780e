"""ctypes bindings for the native FEC library (sondetpu/native/sondefec.cpp).

The reference's whole decode layer is native C (sondedump, SURVEY.md §2.3);
here the host-side FEC hot path (RS(255,231) per suspect frame, per-block
CRC16, BCH(63,51)) is native C++ while the NumPy implementations in this
package remain the oracle and automatic fallback. Set SONDETPU_NO_NATIVE=1
to force the NumPy path (used by the equivalence tests).

The library is compiled on first use if the .so is missing and a compiler
is available; failures degrade silently to NumPy.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), os.pardir, "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libsondefec.so"))

_lib: Optional[ctypes.CDLL] = None
_load_attempted = False


def _try_build() -> bool:
    src = os.path.join(os.path.dirname(_LIB_PATH), "sondefec.cpp")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-fPIC", "-shared", "-std=c++17",
             "-o", _LIB_PATH, src],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_attempted
    if _load_attempted:
        return _lib
    _load_attempted = True
    if not os.path.exists(_LIB_PATH) and not _try_build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        # stale binary for another arch etc. -> rebuild once
        if not _try_build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    u16p = ctypes.POINTER(ctypes.c_uint16)
    lib.fec_rs_decode_batch.argtypes = [
        u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, i32p, u8p]
    lib.fec_bch63_decode_batch.argtypes = [u8p, ctypes.c_int64, i32p, u8p]
    lib.fec_crc16_batch.argtypes = [
        u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_uint16, u16p]
    _lib = lib
    return _lib


def available() -> bool:
    """True when the native library is loadable and not disabled by env."""
    if os.environ.get("SONDETPU_NO_NATIVE"):
        return False
    return _load() is not None


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def rs_decode(recv: np.ndarray, nroots: int, fcr: int, prim_poly: int
              ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Native RS decode: recv [batch, n] uint8 -> (corrected, nerr, ok).

    Semantics identical to fec.rs.ReedSolomon.decode (the NumPy oracle)."""
    lib = _load()
    assert lib is not None
    recv = np.ascontiguousarray(recv, dtype=np.uint8)
    batch, n = recv.shape
    out = recv.copy()
    nerr = np.zeros(batch, dtype=np.int32)
    ok = np.zeros(batch, dtype=np.uint8)
    lib.fec_rs_decode_batch(
        _u8p(out), batch, n, nroots, fcr, prim_poly,
        nerr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), _u8p(ok))
    return out, nerr.astype(np.int64), ok.astype(bool)


def bch63_decode(bits: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Native BCH(63,51) t=2 decode: bits [batch, 63] -> (corrected, nerr, ok)."""
    lib = _load()
    assert lib is not None
    bits = np.ascontiguousarray(bits, dtype=np.uint8)
    batch = bits.shape[0]
    out = bits.copy()
    nerr = np.zeros(batch, dtype=np.int32)
    ok = np.zeros(batch, dtype=np.uint8)
    lib.fec_bch63_decode_batch(
        _u8p(out), batch,
        nerr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), _u8p(ok))
    return out, nerr.astype(np.int64), ok.astype(bool)


def crc16_batch(data: np.ndarray, init: int = 0xFFFF) -> np.ndarray:
    """Native CRC16-CCITT over rows of data [batch, n] -> [batch] uint16."""
    lib = _load()
    assert lib is not None
    data = np.ascontiguousarray(data, dtype=np.uint8)
    batch, n = data.shape
    out = np.zeros(batch, dtype=np.uint16)
    lib.fec_crc16_batch(
        _u8p(data), batch, n, init,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)))
    return out
