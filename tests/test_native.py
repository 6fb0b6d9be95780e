"""Native (C++) vs NumPy-oracle equivalence for FEC and IQ streaming.

The native library (sondetpu/native/sondefec.cpp, iqstream.cpp) must be
semantically identical to the NumPy implementations it accelerates; these
tests lock that by running both paths on identical inputs, including
uncorrectable-garbage cases where tie-break rules (ok/revert/nerr) matter.
"""

import os

import numpy as np
import pytest

from sondetpu.fec import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native FEC library unavailable")


@pytest.fixture()
def numpy_path(monkeypatch):
    """Force the NumPy implementations inside the fixture scope."""
    monkeypatch.setenv("SONDETPU_NO_NATIVE", "1")


def _rs():
    from sondetpu.fec.rs import ReedSolomon
    return ReedSolomon(nroots=24, fcr=0, prim_poly=0x11D)


def test_rs_native_matches_numpy_correctable(monkeypatch):
    rs = _rs()
    rng = np.random.default_rng(7)
    msgs = rng.integers(0, 256, size=(64, 231), dtype=np.uint8)
    cw = rs.encode(msgs.astype(np.int32))
    recv = cw.copy()
    for i in range(recv.shape[0]):
        nerr = int(rng.integers(0, 13))        # 0..12 = t errors
        pos = rng.choice(recv.shape[1], size=nerr, replace=False)
        recv[i, pos] ^= rng.integers(1, 256, size=nerr).astype(np.uint8)
    c_nat, e_nat, ok_nat = native.rs_decode(recv, 24, 0, 0x11D)
    monkeypatch.setenv("SONDETPU_NO_NATIVE", "1")
    c_np, e_np, ok_np = rs.decode(recv)
    assert ok_nat.all() and ok_np.all()
    np.testing.assert_array_equal(c_nat, c_np)
    np.testing.assert_array_equal(c_nat, cw)
    np.testing.assert_array_equal(e_nat, e_np)


def test_rs_native_matches_numpy_shortened_and_garbage(monkeypatch):
    rs = _rs()
    rng = np.random.default_rng(11)
    # shortened code as RS41 uses it: 132 data + 24 parity = 156 symbols
    msgs = rng.integers(0, 256, size=(32, 132), dtype=np.uint8)
    cw = rs.encode(msgs.astype(np.int32))
    recv = cw.copy()
    for i in range(0, recv.shape[0], 2):       # half clean, half corrupted
        nerr = int(rng.integers(1, 20))        # some beyond t -> uncorrectable
        pos = rng.choice(recv.shape[1], size=nerr, replace=False)
        recv[i, pos] ^= rng.integers(1, 256, size=nerr).astype(np.uint8)
    c_nat, e_nat, ok_nat = native.rs_decode(recv, 24, 0, 0x11D)
    monkeypatch.setenv("SONDETPU_NO_NATIVE", "1")
    c_np, e_np, ok_np = rs.decode(recv)
    np.testing.assert_array_equal(ok_nat, ok_np)
    np.testing.assert_array_equal(c_nat, c_np)
    np.testing.assert_array_equal(e_nat, e_np)
    # uncorrectable rows must be returned unchanged by both
    bad = ~ok_nat
    np.testing.assert_array_equal(c_nat[bad], recv[bad])


def test_rs_pure_garbage_agreement(monkeypatch):
    rs = _rs()
    rng = np.random.default_rng(3)
    recv = rng.integers(0, 256, size=(48, 156), dtype=np.uint8)
    c_nat, e_nat, ok_nat = native.rs_decode(recv, 24, 0, 0x11D)
    monkeypatch.setenv("SONDETPU_NO_NATIVE", "1")
    c_np, e_np, ok_np = rs.decode(recv)
    np.testing.assert_array_equal(ok_nat, ok_np)
    np.testing.assert_array_equal(c_nat, c_np)
    np.testing.assert_array_equal(e_nat, e_np)


def test_bch63_native_matches_numpy(monkeypatch):
    from sondetpu.fec.bch import BCH_63_51
    rng = np.random.default_rng(5)
    msgs = rng.integers(0, 2, size=(64, 51), dtype=np.uint8)
    cw = BCH_63_51.encode(msgs)
    recv = cw.copy()
    for i in range(recv.shape[0]):
        nerr = int(rng.integers(0, 4))         # 0..3 (t = 2, so some fail)
        pos = rng.choice(63, size=nerr, replace=False)
        recv[i, pos] ^= 1
    c_nat, e_nat, ok_nat = native.bch63_decode(recv)
    monkeypatch.setenv("SONDETPU_NO_NATIVE", "1")
    c_np, e_np, ok_np = BCH_63_51.decode(recv)
    np.testing.assert_array_equal(ok_nat, ok_np)
    np.testing.assert_array_equal(c_nat, c_np)
    np.testing.assert_array_equal(e_nat, e_np)


def test_crc16_native_matches_numpy():
    from sondetpu.fec.crc import _CCITT_TABLE, crc16_ccitt
    rng = np.random.default_rng(9)
    data = rng.integers(0, 256, size=(37, 40), dtype=np.uint8)
    got = native.crc16_batch(data)
    want = np.array([crc16_ccitt(row.tobytes()) for row in data],
                    dtype=np.uint16)
    np.testing.assert_array_equal(got, want)


def test_rs41_frame_decode_uses_native_and_matches(monkeypatch):
    """Full RS41 frame-level RS decode: native == numpy on corrupted frames."""
    from sondetpu.sondes.rs41 import RS41Modulator, RS41Truth, rs_decode_frames
    mod = RS41Modulator()
    frames = np.stack([mod.build_frame(RS41Truth(frame_no=i)) for i in range(8)])
    rng = np.random.default_rng(2)
    dirty = frames.copy()
    for i in range(dirty.shape[0]):
        pos = rng.choice(np.arange(0x38, 320), size=8, replace=False)
        dirty[i, pos] ^= rng.integers(1, 256, size=8).astype(np.uint8)
    c_nat, e_nat, ok_nat = rs_decode_frames(dirty)
    monkeypatch.setenv("SONDETPU_NO_NATIVE", "1")
    c_np, e_np, ok_np = rs_decode_frames(dirty)
    assert ok_nat.all() and ok_np.all()
    np.testing.assert_array_equal(c_nat, c_np)
    np.testing.assert_array_equal(c_nat, frames)


def test_streaming_iq_source_matches_file_source(tmp_path):
    from sondetpu.io.iq import IQFileSource, StreamingIQSource, write_iq
    rng = np.random.default_rng(4)
    n = 3 * 1000 + 321                         # forces a partial tail block
    iq = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64) * 0.3
    path = str(tmp_path / "x.cs16")
    write_iq(path, iq, fmt="cs16")

    ref_blocks = list(IQFileSource(path, block_len=1000, fmt="cs16").blocks())
    got_blocks = list(StreamingIQSource(path, block_len=1000, fmt="cs16").blocks())
    assert len(got_blocks) == len(ref_blocks)
    for (rb, rv), (pi, pq, gv) in zip(ref_blocks, got_blocks):
        assert rv == gv
        np.testing.assert_allclose(pi, rb.real.astype(np.float32), atol=1e-6)
        np.testing.assert_allclose(pq, rb.imag.astype(np.float32), atol=1e-6)


def test_streaming_iq_source_reads_fifo(tmp_path):
    """The native reader works on FIFOs (live SDR piping into the decoder)."""
    import os
    import threading

    from sondetpu.io.iq import StreamingIQSource

    fifo = str(tmp_path / "iq.fifo")
    os.mkfifo(fifo)
    rng = np.random.default_rng(8)
    n = 2500
    inter = rng.integers(-3000, 3000, size=2 * n).astype(np.int16)

    def writer():
        with open(fifo, "wb") as f:
            f.write(inter.tobytes())

    t = threading.Thread(target=writer)
    t.start()
    got = list(StreamingIQSource(fifo, block_len=1000, fmt="cs16").blocks())
    t.join()
    assert [v for _, _, v in got] == [1000, 1000, 500]
    joined = np.concatenate([pi[:v] for pi, _, v in got])
    np.testing.assert_allclose(
        joined, inter[0::2].astype(np.float32)[:n] / 32768.0, atol=1e-7)


def test_streaming_iq_numpy_fallback_matches_native(tmp_path, monkeypatch):
    from sondetpu.io import iq as iqmod
    rng = np.random.default_rng(6)
    n = 2048 + 17
    data = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)
    path = str(tmp_path / "x.cf32")
    iqmod.write_iq(path, data, fmt="cf32")

    nat = list(iqmod.StreamingIQSource(path, block_len=512).blocks())
    monkeypatch.setattr(iqmod, "_iqstream", False)
    fb = list(iqmod.StreamingIQSource(path, block_len=512).blocks())
    assert len(nat) == len(fb)
    for (ni, nq, nv), (fi, fq, fv) in zip(nat, fb):
        assert nv == fv
        np.testing.assert_array_equal(ni, fi)
        np.testing.assert_array_equal(nq, fq)


def test_streaming_raw_int_planes_match_file(tmp_path):
    """raw_planes streaming (native + numpy fallback) yields the same int
    planes as the file splitter — the device-dequant streaming path."""
    import os
    from sondetpu.io.iq import (IntIQFileSource, StreamingIQSource, write_iq)
    rng = np.random.default_rng(5)
    iq = (rng.normal(size=4096) + 1j * rng.normal(size=4096)
          ).astype(np.complex64) * 0.3
    path = str(tmp_path / "x.cs16")
    write_iq(path, iq, "cs16")

    ref = IntIQFileSource(path, block_len=1000)
    want = list(ref.blocks())
    assert ref.input_dtype == "i16"

    for force_numpy in (False, True):
        env = os.environ.get("SONDETPU_NO_NATIVE")
        if force_numpy:
            os.environ["SONDETPU_NO_NATIVE"] = "1"
        try:
            import sondetpu.io.iq as iqmod
            iqmod._iqstream = None   # reset lib cache so the env applies
            src = StreamingIQSource(path, block_len=1000, raw_planes=True)
            got = list(src.blocks())
        finally:
            iqmod._iqstream = None
            if force_numpy:
                if env is None:
                    os.environ.pop("SONDETPU_NO_NATIVE", None)
                else:
                    os.environ["SONDETPU_NO_NATIVE"] = env
        assert src.input_dtype == "i16"
        assert len(got) == len(want)
        for (gi, gq, gn), (wi, wq, wn) in zip(got, want):
            assert gn == wn and gi.dtype == np.int16
            np.testing.assert_array_equal(gi, wi)
            np.testing.assert_array_equal(gq, wq)
