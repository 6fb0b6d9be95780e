"""FEC property tests (SURVEY.md §4 item 5: codes round-trip random
codewords with <= t errors)."""

import numpy as np
import pytest

from sondetpu.fec import (
    BCH_63_51, RS255_231, crc16_ccitt, crc16_ccitt_batch,
    hamming84_decode, hamming84_encode,
)
from sondetpu.fec.rs import ReedSolomon


def test_crc16_known_vector():
    # CRC16/CCITT-FALSE of "123456789" is 0x29B1
    assert crc16_ccitt(b"123456789") == 0x29B1


def test_crc16_batch_matches_scalar():
    rng = np.random.default_rng(1)
    msgs = rng.integers(0, 256, size=(16, 40), dtype=np.uint8)
    batch = crc16_ccitt_batch(msgs)
    for i in range(16):
        assert batch[i] == crc16_ccitt(msgs[i].tobytes())


def test_rs_encode_roundtrip_clean():
    rng = np.random.default_rng(2)
    msg = rng.integers(0, 256, size=(8, 231), dtype=np.uint8)
    cw = RS255_231.encode(msg)
    assert cw.shape == (8, 255)
    dec, nerr, ok = RS255_231.decode(cw)
    assert ok.all() and (nerr == 0).all()
    np.testing.assert_array_equal(dec, cw)


@pytest.mark.parametrize("nerrs", [1, 5, 12])
def test_rs_corrects_up_to_t_errors(nerrs):
    rng = np.random.default_rng(nerrs)
    msg = rng.integers(0, 256, size=(8, 231), dtype=np.uint8)
    cw = RS255_231.encode(msg)
    corrupted = cw.copy().astype(np.int32)
    for b in range(8):
        pos = rng.choice(255, size=nerrs, replace=False)
        for p in pos:
            corrupted[b, p] ^= int(rng.integers(1, 256))
    dec, nerr, ok = RS255_231.decode(corrupted.astype(np.uint8))
    assert ok.all()
    assert (nerr == nerrs).all()
    np.testing.assert_array_equal(dec, cw)


def test_rs_detects_uncorrectable():
    rng = np.random.default_rng(99)
    msg = rng.integers(0, 256, size=(4, 231), dtype=np.uint8)
    cw = RS255_231.encode(msg)
    corrupted = cw.astype(np.int32).copy()
    for b in range(4):
        pos = rng.choice(255, size=30, replace=False)  # way over t=12
        for p in pos:
            corrupted[b, p] ^= int(rng.integers(1, 256))
    _, _, ok = RS255_231.decode(corrupted.astype(np.uint8))
    # Most heavy error patterns must be flagged; miscorrection odds are tiny
    assert (~ok).sum() >= 3


def test_rs_shortened_codeword():
    """RS41 uses shortened codewords (132 data + 24 parity, SURVEY.md S1)."""
    rs = ReedSolomon(nroots=24)
    rng = np.random.default_rng(3)
    msg = rng.integers(0, 256, size=(4, 132), dtype=np.uint8)
    cw = rs.encode(msg)
    assert cw.shape == (4, 156)
    corrupted = cw.astype(np.int32).copy()
    for b in range(4):
        pos = rng.choice(156, size=6, replace=False)
        for p in pos:
            corrupted[b, p] ^= int(rng.integers(1, 256))
    dec, nerr, ok = rs.decode(corrupted.astype(np.uint8))
    assert ok.all() and (nerr == 6).all()
    np.testing.assert_array_equal(dec, cw)


def test_hamming84_roundtrip_and_correction():
    nibbles = np.arange(16, dtype=np.uint8)
    cw = hamming84_encode(nibbles)
    dec, ok = hamming84_decode(cw)
    assert ok.all()
    np.testing.assert_array_equal(dec, nibbles)
    # single-bit errors in every position correct back
    for bit in range(8):
        dec, ok = hamming84_decode(cw ^ (1 << bit))
        assert ok.all()
        np.testing.assert_array_equal(dec, nibbles)
    # double-bit errors are detected (not silently miscorrected to ok+wrong)
    dec, ok = hamming84_decode(cw ^ 0b11)
    assert not ok.any()


def test_bch_63_51_roundtrip_and_correction():
    rng = np.random.default_rng(7)
    msg = rng.integers(0, 2, size=(8, 51), dtype=np.uint8)
    cw = BCH_63_51.encode(msg)
    assert cw.shape == (8, 63)
    dec, nerr, ok = BCH_63_51.decode(cw)
    assert ok.all() and (nerr == 0).all()
    for t in (1, 2):
        corrupted = cw.copy()
        for b in range(8):
            pos = rng.choice(63, size=t, replace=False)
            corrupted[b, pos] ^= 1
        dec, nerr, ok = BCH_63_51.decode(corrupted)
        assert ok.all(), f"t={t}"
        assert (nerr == t).all()
        np.testing.assert_array_equal(dec, cw)
