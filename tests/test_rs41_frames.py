"""RS41 byte-level codec tests: build -> corrupt -> decode round trips."""

import numpy as np
import pytest

from sondetpu.sondes.rs41 import (
    FRAME_BYTES, RS41Decoder, RS41Modulator, RS41Truth, SYNCWORD,
    rs_decode_frames, scramble,
)
from sondetpu.telemetry import Fields, SondeTelemetry


def _decode_all(frames, dec=None):
    dec = dec or RS41Decoder()
    return dec.decode_byte_frames(np.atleast_2d(frames), np.zeros(len(np.atleast_2d(frames)), int)), dec


def test_frame_build_and_parse_clean():
    mod = RS41Modulator()
    truth = RS41Truth(o3_mpa=2.5, burstkill=300)
    frame = mod.build_frame(truth)
    assert frame.shape == (FRAME_BYTES,)
    # on-air frame starts with the public syncword
    assert scramble(frame)[:8].tobytes() == SYNCWORD

    out, _ = _decode_all(frame)
    assert len(out) == 1
    ch, frag = out[0]
    assert frag.fields & Fields.SEQ and frag.seq == truth.frame_no
    assert frag.serial == truth.serial
    assert frag.shutdown == 300
    assert frag.o3_mpa == pytest.approx(2.5)
    assert frag.lat == pytest.approx(truth.lat, abs=1e-5)
    assert frag.lon == pytest.approx(truth.lon, abs=1e-5)
    assert frag.alt == pytest.approx(truth.alt, abs=0.05)
    assert frag.speed == pytest.approx(np.hypot(truth.ve, truth.vn), abs=0.05)
    assert frag.climb == pytest.approx(truth.vu, abs=0.05)
    assert frag.time == pytest.approx(truth.time_utc, abs=0.001)


def test_rs_corrects_byte_errors():
    mod = RS41Modulator()
    frame = mod.build_frame(RS41Truth())
    rng = np.random.default_rng(0)
    bad = frame.copy()
    pos = rng.choice(np.arange(8, FRAME_BYTES), size=20, replace=False)
    for p in pos:
        bad[p] ^= int(rng.integers(1, 256))
    fixed, nerr, ok = rs_decode_frames(bad[None, :])
    assert ok.all()
    np.testing.assert_array_equal(fixed[0], frame)

    out, _ = _decode_all(bad)
    assert len(out) == 1 and out[0][1].serial == "S1234567"


def test_calibration_accumulation():
    """PTU values appear only after the calib pages carrying the polynomials
    arrive; calib_percent grows toward 100 (reference decoder.hpp:85-86)."""
    mod = RS41Modulator()
    dec = RS41Decoder()
    telem = SondeTelemetry()
    percents = []
    got_temp_at = None
    for k in range(51):
        truth = RS41Truth(frame_no=k, temp=-30.0, rh=55.0)
        out, _ = _decode_all(mod.build_frame(truth), dec)
        (_, frag), = out
        telem.merge(frag)
        percents.append(frag.calib_percent)
        if got_temp_at is None and not np.isnan(frag.temp):
            got_temp_at = k
    assert percents[-1] == pytest.approx(100.0)
    assert percents[0] < percents[-1]
    assert got_temp_at is not None and got_temp_at >= 2
    assert telem.calibrated
    assert telem.temp == pytest.approx(-30.0, abs=0.01)
    assert telem.rh == pytest.approx(55.0, abs=0.01)
    # no pressure sensor -> ISA fallback kicked in (decoder.hpp:108-110)
    assert telem.pressure > 0


def test_corrupted_block_crc_skipped():
    mod = RS41Modulator()
    frame = mod.build_frame(RS41Truth())
    # corrupt more bytes than RS can fix in one codeword region: blank parity
    bad = frame.copy()
    bad[8:56] = 0
    bad[0x3B] ^= 0xFF  # break status block
    fixed, _, ok = rs_decode_frames(bad[None, :])
    # RS fails; parser still extracts blocks whose CRC is intact
    dec = RS41Decoder()
    out = dec.decode_byte_frames(bad[None, :], np.zeros(1, int))
    assert out == []  # rs_ok gate drops the frame entirely


def test_extended_frame_roundtrip():
    """518-byte extended frames (type 0xF0, long XDATA) build, RS-protect
    with the full-length code, and parse; a standard frame embedded in an
    extended-length gather also parses (mixed dispatch)."""
    from sondetpu.sondes.rs41 import FRAME_BYTES_EXT

    mod = RS41Modulator()
    truth = RS41Truth(o3_mpa=4.5, xdata_extra="XDATA0123456789" * 10)
    ext = mod.build_frame(truth, extended=True)
    assert ext.shape == (FRAME_BYTES_EXT,)
    dec = RS41Decoder()
    out = dec.decode_byte_frames(ext[None, :], np.zeros(1, int))
    assert len(out) == 1
    frag = out[0][1]
    assert frag.o3_mpa == pytest.approx(4.5)
    assert frag.serial == "S1234567"

    # RS corrects errors in the full-length codeword too
    bad = ext.copy().astype(np.int32)
    rng = np.random.default_rng(1)
    for p in rng.choice(np.arange(8, FRAME_BYTES_EXT), size=20, replace=False):
        bad[p] ^= int(rng.integers(1, 256))
    out = dec.decode_byte_frames(bad.astype(np.uint8)[None, :], np.zeros(1, int))
    assert len(out) == 1 and out[0][1].serial == "S1234567"

    # standard frame padded into a 518-byte gather window still parses
    std = mod.build_frame(RS41Truth(frame_no=7))
    padded = np.zeros(FRAME_BYTES_EXT, np.uint8)
    padded[:320] = std
    out = dec.decode_byte_frames(padded[None, :], np.zeros(1, int))
    assert len(out) == 1 and out[0][1].seq == 7


def test_rs41x_pipeline_end_to_end():
    """Extended frames decode through the device pipeline (sonde rs41x)."""
    from sondetpu.runtime.pipeline import PipelineConfig
    from sondetpu.runtime.session import DecoderSession
    from sondetpu.sondes.rs41 import RS41XModulator

    mod = RS41XModulator()
    truths = [RS41Truth(frame_no=60 + i, o3_mpa=2.25) for i in range(4)]
    iq = mod.modulate(truths)
    cfg = PipelineConfig(sonde="rs41x", channels=1, block_len=48000)
    sess = DecoderSession(cfg)
    n = iq.size
    for i in range(0, n - 48000 + 1, 48000):
        sess.process_block(iq[None, i:i + 48000])
    assert sess.frames_seen >= 2
    t = sess.telemetry[0]
    assert t.serial == "S1234567"
    assert t.aux_data == "O3=2.25mPa"


def test_type_byte_corruption_still_decodes():
    """A corrupted frame-type byte must not bypass the RS repair: on a
    standard channel even a type byte hit to exactly 0xF0 (the extended
    marker) takes the STD pass; on an extended channel an unknown type is
    attempted at BOTH lengths so a real extended frame with a hit type
    byte still corrects."""
    from sondetpu.sondes.rs41 import (FRAME_TYPE_EXT, DATA_START,
                                      RS41Decoder, RS41Modulator, RS41Truth)

    mod = RS41Modulator()
    f = mod.build_frame(RS41Truth(frame_no=77))
    f[DATA_START] = FRAME_TYPE_EXT          # corrupt type to the EXT marker
    dec = RS41Decoder()
    frags = dec.decode_byte_frames(f[None, :], [0])
    assert frags and frags[0][1].seq == 77

    fx = mod.build_frame(RS41Truth(frame_no=88), extended=True)
    fx[DATA_START] = 0x55                   # corrupt type to garbage
    decx = RS41Decoder()
    frags = decx.decode_byte_frames(fx[None, :], [0])
    assert any(fr.seq == 88 for _, fr in frags)
