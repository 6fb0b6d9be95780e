"""Arbitrary capture-rate ingest: device-side rational resampling to the
48 kHz channel / PFB grid (VERDICT r4 missing #3; reference main.cpp:60
resamples any VFO rate to 48 kHz in-chain)."""

import json
import subprocess
import sys

import numpy as np
import pytest


def test_device_streaming_resampler_matches_host_reference():
    """Chunked device resampling == the host StreamingResampler exactly
    (same polyphase schedule, static-slice formulation)."""
    from sondetpu.dsp.resample import (DeviceStreamingResampler,
                                       StreamingResampler)

    fs_in, fs_out = 50000.0, 48000.0          # 24/25 — not a multiple
    out_len = 48000
    dev = DeviceStreamingResampler(fs_in, fs_out, out_len)
    host = StreamingResampler(fs_in, fs_out, channels=2)
    assert dev.in_len == 50000

    rng = np.random.default_rng(0)
    st = dev.init_state()
    for _ in range(3):
        x = rng.normal(size=(2, dev.in_len)).astype(np.float32)
        st, yi, yq = dev(st, x[0], x[1])
        want = host.process(x)
        assert want.shape[-1] == out_len
        np.testing.assert_allclose(np.asarray(yi), want[0], atol=1e-5)
        np.testing.assert_allclose(np.asarray(yq), want[1], atol=1e-5)


def test_device_resampler_rejects_unaligned_block():
    from sondetpu.dsp.resample import DeviceStreamingResampler

    with pytest.raises(ValueError):
        DeviceStreamingResampler(50000.0, 48000.0, out_len=1000)


def test_single_channel_decode_at_50ksps(tmp_path):
    """End-to-end CLI: an rs41 capture at 50 kSps (not a multiple of
    48 kHz) decodes through `decode --rate 50000`."""
    from sondetpu.sondes.rs41 import RS41Modulator, RS41Truth

    fs = 50000.0
    mod = RS41Modulator()
    iq = mod.modulate([RS41Truth(frame_no=30 + i) for i in range(6)], fs=fs)
    rng = np.random.default_rng(3)
    iq = iq + (0.05 * (rng.normal(size=iq.size)
                       + 1j * rng.normal(size=iq.size))
               ).astype(np.complex64)
    p = tmp_path / "cap50k.cf32"
    iq.astype(np.complex64).tofile(p)

    out = subprocess.run(
        [sys.executable, "-m", "sondetpu.cli.main", "decode",
         "--iq", str(p), "--sonde", "rs41", "--rate", "50000",
         "--jsonl", str(tmp_path / "o.jsonl")],
        capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr
    metrics = json.loads(out.stderr.strip().splitlines()[-1])
    assert metrics["frames_decoded"] >= 4, metrics
    last = json.loads((tmp_path / "o.jsonl").read_text().splitlines()[-1])
    assert last["serial"] == "S1234567"


def test_wideband_decode_at_2048ksps(tmp_path):
    """End-to-end: a 2.048 Msps wideband capture (PFB grid is 40 x 48 kHz
    = 1.92 Msps; ratio 15/16) channelizes and decodes after the in-chain
    device resampler — the VERDICT r4 acceptance scenario."""
    from sondetpu.dsp.resample import DeviceStreamingResampler
    from sondetpu.runtime.fleet import FleetChannel, FleetSession
    from sondetpu.sondes.rs41 import RS41Modulator, RS41Truth

    n_bins = 40
    fs_chan = 48000.0
    fs_pfb = n_bins * fs_chan                 # 1.92 Msps
    fs_cap = 2.048e6                          # typical SDR rate
    k_bin = 3

    mod = RS41Modulator()
    sig = mod.modulate([RS41Truth(frame_no=50 + i) for i in range(5)],
                       fs=fs_cap)
    t = np.arange(sig.size)
    sig = (sig * np.exp(2j * np.pi * (k_bin * fs_chan) * t / fs_cap)
           ).astype(np.complex64)
    rng = np.random.default_rng(4)
    sig = sig + (0.02 * (rng.normal(size=sig.size)
                         + 1j * rng.normal(size=sig.size))
                 ).astype(np.complex64)

    w = n_bins * 48000
    rs = DeviceStreamingResampler(fs_cap, fs_pfb, w)
    n_blocks = sig.size // rs.in_len
    assert n_blocks >= 2

    fleet = FleetSession([FleetChannel(pfb_bin=k_bin, sonde="rs41")],
                         n_bins=n_bins)
    st = rs.init_state()
    for b in range(n_blocks):
        blk = sig[b * rs.in_len:(b + 1) * rs.in_len]
        st, yi, yq = rs(st, blk.real.copy(), blk.imag.copy())
        fleet.process_wideband((yi, yq))

    telem = fleet.telemetry
    assert 0 in telem and telem[0].serial == "S1234567"
    assert telem[0].lat == pytest.approx(45.0, abs=1e-4)
