"""Automatic frequency control: per-channel carrier-drift tracking.

The reference relies on the human re-dragging the VFO when a sonde's
transmitter drifts (main.cpp:55-56); sondetpu tracks drift device-side —
the DDC frequency is pipeline STATE nudged each block by the FM
discriminator's DC (runtime/pipeline.py PipelineConfig.afc)."""

import numpy as np
import pytest

from sondetpu.runtime.pipeline import PipelineConfig
from sondetpu.runtime.session import DecoderSession
from sondetpu.sondes.rs41 import RS41Modulator, RS41Truth


def _drifting_rs41(n_frames=16, f0=1000.0, f1=6500.0, seed=0):
    fs = 48000.0
    mod = RS41Modulator()
    iq = mod.modulate([RS41Truth(frame_no=i) for i in range(n_frames)], fs=fs)
    n = iq.size
    t = np.arange(n)
    finst = f0 + (f1 - f0) * t / n
    phase = 2.0 * np.pi * np.cumsum(finst) / fs
    sig = (iq * np.exp(1j * phase)).astype(np.complex64)
    rng = np.random.default_rng(seed)
    return sig + (0.05 * (rng.normal(size=n) + 1j * rng.normal(size=n))
                  ).astype(np.complex64)


def _decode(sig, afc):
    cfg = PipelineConfig(sonde="rs41", channels=1, block_len=48000, afc=afc)
    sess = DecoderSession(cfg)
    for b in range(sig.size // 48000):
        sess.process_block(sig[b * 48000:(b + 1) * 48000][None, :])
    return sess


def test_afc_tracks_drifting_carrier():
    """Carrier drifting 1 -> 6.5 kHz across the stream: the AFC loop keeps
    the signal centered (tracked freq follows the ramp) and decodes frames
    the static pipeline loses once the drift leaves the channel filter."""
    sig = _drifting_rs41()
    static = _decode(sig, afc=False)
    afc = _decode(sig, afc=True)
    assert afc.metrics.frames_decoded >= static.metrics.frames_decoded + 2
    # tracked frequency ends near the final ramp value
    f = afc.afc_freqs[0]
    assert 4000.0 < f < 6500.0
    assert static.afc_freqs is None


def test_afc_state_checkpoints(tmp_path):
    from sondetpu.runtime import checkpoint as ckpt

    sig = _drifting_rs41(n_frames=4, f0=2000.0, f1=2000.0)
    sess = _decode(sig, afc=True)
    f_before = sess.afc_freqs.copy()
    assert abs(f_before[0] - 2000.0) < 600.0
    path = tmp_path / "afc.ckpt"
    ckpt.save_session(sess, str(path))
    cfg = PipelineConfig(sonde="rs41", channels=1, block_len=48000, afc=True)
    sess2 = DecoderSession(cfg)
    ckpt.load_session(sess2, str(path))
    np.testing.assert_allclose(sess2.afc_freqs, f_before)


def test_afc_config_gates():
    # afc + use_pallas coexist since r5 (the kernels export the DC /
    # rotation sums); bf16 + pallas remains unsupported
    cfg = PipelineConfig(sonde="rs41", channels=8, afc=True, use_pallas=True)
    assert cfg.afc and cfg.use_pallas
    with pytest.raises(ValueError):
        PipelineConfig(sonde="rs41", channels=8, use_pallas=True,
                       compute_dtype="bf16")


def test_afc_tracks_drifting_afsk_imet4():
    """AFSK AFC: a drifting iMet-4 carrier (0 -> +14 kHz, past the channel
    filter's edge) keeps decoding with afc on — the discriminator-DC loop
    tracks tone-pair carrier offset too; the tone correlators themselves
    are DC-immune, so only drift beyond the channel filter hurts, and
    that is exactly what the loop removes (the reference's human re-drag
    covered AFSK sondes as well, main.cpp:55-56)."""
    from sondetpu.sondes.imet4 import IMET4Modulator, IMET4Truth

    fs = 48000.0
    mod = IMET4Modulator()
    iq = mod.modulate([IMET4Truth(frame_no=i) for i in range(16)], fs=fs)
    n = iq.size
    t = np.arange(n)
    finst = 14000.0 * t / n                     # ramp 0 -> 14 kHz
    phase = 2.0 * np.pi * np.cumsum(finst) / fs
    sig = (iq * np.exp(1j * phase)).astype(np.complex64)
    rng = np.random.default_rng(3)
    sig = sig + (0.03 * (rng.normal(size=n) + 1j * rng.normal(size=n))
                 ).astype(np.complex64)
    sig = np.pad(sig, (0, (-n) % 48000))

    def run(afc):
        cfg = PipelineConfig(sonde="imet4", channels=1, block_len=48000,
                             afc=afc, afc_max_hz=20000.0)
        sess = DecoderSession(cfg)
        for b in range(sig.size // 48000):
            sess.process_block(sig[b * 48000:(b + 1) * 48000][None, :])
        return sess

    afc = run(afc=True)
    static = run(afc=False)
    assert afc.metrics.frames_decoded >= static.metrics.frames_decoded + 4
    # tracked frequency follows the ramp into its upper half
    assert 9000.0 < afc.afc_freqs[0] < 14500.0


def test_afc_seeded_by_fine_offsets():
    cfg = PipelineConfig(sonde="rs41", channels=2, block_len=48000,
                         afc=True, fine_offsets=(1500.0, -800.0))
    sess = DecoderSession(cfg)
    np.testing.assert_allclose(sess.afc_freqs, [1500.0, -800.0])


def test_afc_holds_large_seed_offset():
    """A channel seeded far off-grid (|offset| > bandwidth/2, as
    bin_and_offset legitimately produces on the wideband path) must NOT be
    yanked to the clamp: the AFC bounds the drift excursion RELATIVE to the
    seed, so a 20 kHz-offset RS41 decodes as well with afc on as off."""
    fs = 48000.0
    off = 20000.0                      # >> bandwidth/2 = 5 kHz
    mod = RS41Modulator()
    iq = mod.modulate([RS41Truth(frame_no=i) for i in range(8)], fs=fs)
    t = np.arange(iq.size)
    sig = (iq * np.exp(2j * np.pi * off * t / fs)).astype(np.complex64)

    def run(afc):
        cfg = PipelineConfig(sonde="rs41", channels=1, block_len=48000,
                             afc=afc, fine_offsets=(off,))
        sess = DecoderSession(cfg)
        for b in range(sig.size // 48000):
            sess.process_block(sig[b * 48000:(b + 1) * 48000][None, :])
        return sess

    base = run(afc=False)
    afc = run(afc=True)
    assert base.metrics.frames_decoded >= 5
    assert afc.metrics.frames_decoded >= base.metrics.frames_decoded - 1
    # the tracked frequency stays near the seed, not pinned at bandwidth/2
    assert abs(afc.afc_freqs[0] - off) < 2500.0


def test_checkpoint_rejects_afc_layout_mismatch(tmp_path):
    """A checkpoint saved without afc cannot silently restore into an afc
    session (and vice versa) — the state layouts differ."""
    from sondetpu.runtime import checkpoint as ckpt

    sig = _drifting_rs41(n_frames=2, f0=0.0, f1=0.0)
    plain = _decode(sig, afc=False)
    path = tmp_path / "plain.ckpt"
    ckpt.save_session(plain, str(path))

    cfg = PipelineConfig(sonde="rs41", channels=1, block_len=48000, afc=True)
    with pytest.raises(ValueError, match="layout|mismatch"):
        ckpt.load_session(DecoderSession(cfg), str(path))


def test_checkpoint_rejects_compute_dtype_mismatch(tmp_path):
    from sondetpu.runtime import checkpoint as ckpt

    sig = _drifting_rs41(n_frames=2, f0=0.0, f1=0.0)
    cfg32 = PipelineConfig(sonde="rs41", channels=1, block_len=48000)
    sess = DecoderSession(cfg32)
    sess.process_block(sig[:48000][None, :])
    path = tmp_path / "f32.ckpt"
    ckpt.save_session(sess, str(path))
    cfg16 = PipelineConfig(sonde="rs41", channels=1, block_len=48000,
                           compute_dtype="bf16")
    with pytest.raises(ValueError, match="dtype"):
        ckpt.load_session(DecoderSession(cfg16), str(path))


def test_afc_tracks_offset_on_dualtone_family():
    """The dual-tone envelope metric's DC carries no offset information, so
    dual-tone AFC measures the power-weighted phase advance of the mixed
    tone envelopes (which rotate at exactly the residual offset). A fixed
    800 Hz offset on an m10 channel must pull the tracked frequency toward
    +800 Hz."""
    from sondetpu.sondes.m10 import M10Modulator, M10Truth

    fs = 48000.0
    mod = M10Modulator()
    iq = mod.modulate([M10Truth(frame_no=i) for i in range(30)], fs=fs)
    n = iq.size
    t = np.arange(n)
    sig = (iq * np.exp(2j * np.pi * 800.0 * t / fs)).astype(np.complex64)
    rng = np.random.default_rng(0)
    sig = sig + (0.05 * (rng.normal(size=n) + 1j * rng.normal(size=n))
                 ).astype(np.complex64)

    cfg = PipelineConfig(sonde="m10", channels=1, block_len=48000, afc=True)
    sess = DecoderSession(cfg)
    assert sess.pipeline._dualtone          # the path under test
    for b in range(sig.size // 48000):
        sess.process_block(sig[b * 48000:(b + 1) * 48000][None, :])
    f = sess.afc_freqs[0]
    assert 400.0 < f < 1200.0, f
    assert sess.metrics.frames_decoded > 0


def test_reset_channel_reseeds_afc_row():
    """A watchdog reset must return the channel's AFC-tracked DDC frequency
    to its fine_offsets seed: a loop that mis-tracked to its clamp would
    otherwise hand the dead sonde's offset to the next sonde on that
    channel (VERDICT r4 weak #5)."""
    cfg = PipelineConfig(sonde="rs41", channels=2, block_len=48000, afc=True,
                         fine_offsets=(1500.0, -2000.0))
    sess = DecoderSession(cfg)
    # walk channel 0's tracked frequency away from its seed
    sig = _drifting_rs41(n_frames=6, f0=1500.0, f1=5500.0)
    blk = np.zeros((2, 48000), np.complex64)
    for b in range(sig.size // 48000):
        blk[0] = sig[b * 48000:(b + 1) * 48000]
        sess.process_block(blk.copy())
    assert sess.afc_freqs[0] > 3000.0          # tracked away from the seed
    f1_before = sess.afc_freqs[1]
    sess.reset_channel(0)
    assert sess.afc_freqs[0] == 1500.0         # reseeded
    assert sess.afc_freqs[1] == f1_before      # other channels untouched
    # the session keeps decoding after the reseed (state still valid)
    sess.process_block(blk.copy())
