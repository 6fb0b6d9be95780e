"""Compact wire-column readback tests (runtime/pipeline.py wire_columns).

The RS41 specs declare extra['wire_columns'] — the byte columns the host
parser reads — so the packed device->host buffer carries only those columns
per frame (~2.6x less traffic). RS-clean frames parse from the sparse
reconstruction with CRC checks replaced by the device RS-syndrome verdict;
suspect frames are fetched in full (Pipeline.fetch_frames) for host FEC.
"""

import numpy as np
import pytest

from sondetpu.runtime.pipeline import (Pipeline, PipelineConfig,
                                       unpack_block_output)
from sondetpu.runtime.session import DecoderSession
from sondetpu.sondes.modulate import gfsk_modulate
from sondetpu.sondes.rs41 import (BAUD, DATA_START, SPEC, RS41Modulator,
                                  RS41Truth, WIRE_COLUMNS)


def _iq_from_frames(frames, fs=48000.0):
    mod = RS41Modulator()
    bits = mod.frames_to_bits(np.stack(frames))
    return gfsk_modulate(bits, fs / BAUD, SPEC.dev / fs, bt=0.5)


def test_wire_columns_cover_parser_needs():
    cols = np.asarray(WIRE_COLUMNS)
    assert cols[0] == DATA_START
    assert np.all(np.diff(cols) >= 1)
    assert cols[-1] < SPEC.frame_bytes
    # the compaction must actually compact
    assert len(cols) < 0.5 * SPEC.frame_bytes


def test_packed_carries_wire_columns_and_fetch_matches():
    mod = RS41Modulator()
    iq = mod.modulate([RS41Truth(frame_no=i) for i in range(5)], fs=48000.0)
    assert iq.size >= 2 * 48000
    cfg = PipelineConfig(sonde="rs41", channels=2, block_len=48000)
    pipe = Pipeline(cfg)
    state = pipe.init_state()
    x = np.stack([iq[:48000], iq[:48000]])
    state, out = pipe.step(state, x)
    y = iq[48000: 2 * 48000]
    state, out = pipe.step(state, np.stack([y, y]))

    wire, valid, rs_clean, _ = unpack_block_output(
        np.asarray(out.packed), cfg.k_slots, cfg.wire_ncols)
    frames_full = np.asarray(out.frames)
    cols = np.asarray(cfg.wire_columns)
    np.testing.assert_array_equal(wire, frames_full[:, :, cols])
    assert valid.any()

    # fetch_frames pulls the exact full rows
    ch_idx, slot_idx = np.nonzero(valid)
    fetched = pipe.fetch_frames(out.frames, ch_idx, slot_idx)
    np.testing.assert_array_equal(fetched, frames_full[ch_idx, slot_idx])


def test_compact_clean_path_decodes_telemetry():
    """RS-clean frames parse correctly from the column-sparse readback."""
    mod = RS41Modulator()
    iq = mod.modulate([RS41Truth(frame_no=10 + i, alt=8000.0)
                       for i in range(6)], fs=48000.0)
    cfg = PipelineConfig(sonde="rs41", channels=1, block_len=48000)
    sess = DecoderSession(cfg)
    updates = []
    for i in range(0, iq.size - cfg.block_len + 1, cfg.block_len):
        updates += sess.process_block(iq[None, i:i + cfg.block_len])
    assert updates
    ch, telem = updates[-1]
    assert telem.serial == "S1234567"
    assert telem.alt == pytest.approx(8000.0, abs=0.1)
    assert telem.seq >= 10


def test_compact_suspect_path_corrects_and_decodes():
    """Frames with byte errors fail the device syndrome, take the full-frame
    fetch + host RS path, and still decode (errors within t=12/codeword)."""
    mod = RS41Modulator()
    frames = [mod.build_frame(RS41Truth(frame_no=20 + i, alt=5000.0))
              for i in range(6)]
    rng = np.random.default_rng(7)
    for i in (1, 3, 4):   # corrupt some frames' data region post-RS-encode
        pos = rng.choice(np.arange(DATA_START, 320), size=6, replace=False)
        frames[i][pos] ^= rng.integers(1, 256, size=6).astype(np.uint8)
    iq = _iq_from_frames(frames)
    cfg = PipelineConfig(sonde="rs41", channels=1, block_len=48000)
    sess = DecoderSession(cfg)
    seqs = set()
    for i in range(0, iq.size - cfg.block_len + 1, cfg.block_len):
        for _, t in sess.process_block(iq[None, i:i + cfg.block_len]):
            seqs.add(t.seq)
    # both the corrupted (suspect) and clean frames must come through
    assert {21, 23, 24} & seqs, seqs
    assert {20, 22} & seqs, seqs
    assert len(seqs) >= 4


def test_wire_column_trust_chain_catches_crc_and_data_corruption():
    """Adversarial proof of the crc_present=False trust chain: the compact
    clean path skips CRC re-checks because "zero RS syndrome => the block
    CRCs would pass". That holds only while the RS code covers every byte
    the CRC covers — so corrupting (a) a block CRC byte and (b) a data
    byte of otherwise-clean frames MUST flip the device syndrome to
    suspect (never the clean path), and a corruption beyond the RS budget
    MUST be rejected outright, not accepted with a bad CRC."""
    from sondetpu.sondes.rs41 import _BLOCK_OFFSETS

    mod = RS41Modulator()
    frames = [mod.build_frame(RS41Truth(frame_no=40 + i, alt=6000.0))
              for i in range(6)]
    # frame 1: flip a CRC byte of the first block (status) — pos layout is
    # [type][len][data dlen][crc16], so the CRC lives at pos+2+dlen
    typ, pos, dlen = _BLOCK_OFFSETS[0]
    frames[1][pos + 2 + dlen] ^= 0xFF
    # frame 2: flip a data byte inside the same block
    frames[2][pos + 2] ^= 0xA5
    # frame 4: blow past the RS correction budget (t=12 per codeword):
    # 30 corrupted bytes in one interleave arm land >12 errors in one
    # codeword — uncorrectable, must be REJECTED
    frames[4][DATA_START:DATA_START + 60:2] ^= 0x5A

    iq = _iq_from_frames(frames)
    cfg = PipelineConfig(sonde="rs41", channels=1, block_len=48000)
    pipe = Pipeline(cfg)
    state = pipe.init_state()
    iq = np.pad(iq, (0, (-iq.size) % cfg.block_len))
    seen = {}
    for i in range(0, iq.size - cfg.block_len + 1, cfg.block_len):
        state, out = pipe.step(state, iq[None, i:i + cfg.block_len])
        res = unpack_block_output(np.asarray(out.packed), cfg.k_slots,
                                  cfg.wire_ncols)
        wire, valid, rs_clean = res[0], res[1], res[2]
        full = np.asarray(out.frames)
        for s in np.nonzero(valid[0])[0]:
            fno = None
            # frame number from the status block via the full frame
            fr = full[0, s]
            fno = int(fr[pos + 2]) | (int(fr[pos + 3]) << 8)
            seen[len(seen)] = (bool(rs_clean[0, s]),)
    # order of arrival == transmit order (frames back-to-back)
    clean_flags = [v[0] for v in seen.values()]
    assert len(clean_flags) >= 6
    assert clean_flags[0] and clean_flags[3] and clean_flags[5]  # untouched
    assert not clean_flags[1]      # CRC-byte corruption -> suspect
    assert not clean_flags[2]      # data-byte corruption -> suspect
    assert not clean_flags[4]      # beyond-budget corruption -> suspect

    # end-to-end: the decode session corrects frames 1/2 on the host RS
    # path and REJECTS frame 4 (no fabricated telemetry)
    sess = DecoderSession(cfg)
    seqs = set()
    for i in range(0, iq.size - cfg.block_len + 1, cfg.block_len):
        for _, t in sess.process_block(iq[None, i:i + cfg.block_len]):
            seqs.add(t.seq)
    assert {41, 42} <= seqs, seqs      # corrected via host RS
    assert 44 not in seqs, seqs        # uncorrectable: rejected
