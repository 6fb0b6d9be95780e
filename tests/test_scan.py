"""Wideband scan: carrier detection + automatic type classification.

The reference delegates both steps to the human (waterfall + VFO +
combobox, main.cpp:55-56,136-151); sondetpu automates them
(sondetpu/dsp/scan.py) and these tests gate that automation."""

import json

import numpy as np
import pytest

from sondetpu.dsp.scan import (Carrier, classify_carriers, detect_carriers,
                               scan_to_config, welch_psd)
from sondetpu.sondes.modulate import freq_shift, gfsk_modulate


FS_WIDE = 8 * 48000.0


def _tone(n, f_norm, amp=1.0):
    t = np.arange(n)
    return (amp * np.exp(2j * np.pi * f_norm * t)).astype(np.complex64)


def _noise(n, rng, amp=0.05):
    return (amp * (rng.normal(size=n) + 1j * rng.normal(size=n))
            ).astype(np.complex64)


def test_welch_psd_locates_tone():
    rng = np.random.default_rng(0)
    n = 1 << 16
    x = _tone(n, 0.1) + _noise(n, rng)
    bins, psd = welch_psd(np.ascontiguousarray(x.real),
                          np.ascontiguousarray(x.imag), nfft=1024)
    peak = bins[int(np.argmax(psd))] / 1024.0
    assert abs(peak - 0.1) < 1.5 / 1024.0


def test_detect_carriers_centers_and_noise_floor():
    rng = np.random.default_rng(1)
    n = 1 << 18
    f1, f2 = 60000.0, -130000.0
    x = (_tone(n, f1 / FS_WIDE) + 0.6 * _tone(n, f2 / FS_WIDE)
         + _noise(n, rng))
    cars = detect_carriers(x, FS_WIDE, min_bw_hz=0.0)
    assert len(cars) == 2
    # sorted by power: f1 first
    assert abs(cars[0].center_hz - f1) < 1000.0
    assert abs(cars[1].center_hz - f2) < 1000.0
    assert cars[0].snr_db > 10.0
    # pure noise -> nothing detected
    assert detect_carriers(_noise(n, rng), FS_WIDE) == []


def _rs41_wideband(f_center, n, rng, snr_amp=0.03):
    from sondetpu.sondes.rs41 import RS41Modulator, RS41Truth

    mod = RS41Modulator()
    bits = mod.frames_to_bits(np.stack(
        [mod.build_frame(RS41Truth(frame_no=40 + i)) for i in range(12)]))
    sig = freq_shift(gfsk_modulate(bits, FS_WIDE / 4800.0, 2400.0 / FS_WIDE),
                     f_center / FS_WIDE)
    out = _noise(n, rng, snr_amp)
    out[:min(n, sig.size)] += sig[:n]
    return out


def _m10_wideband(f_center, n, rng):
    from sondetpu.sondes.m10 import M10Modulator, M10Truth

    mod = M10Modulator()
    chips = mod.frames_to_chips(np.stack(
        [mod.build_frame(M10Truth(frame_no=8 + i)) for i in range(24)]))
    sig = freq_shift(
        gfsk_modulate(chips, FS_WIDE / 9600.0, 12000.0 / FS_WIDE, bt=0.7),
        f_center / FS_WIDE)
    out = np.zeros(n, np.complex64)
    out[:min(n, sig.size)] += sig[:n]
    return out


def test_scan_classifies_mixed_wideband():
    """RS41 + M10 at arbitrary (off-grid) frequencies: detect both, decode
    probes claim each for the right family, wrong families score zero."""
    rng = np.random.default_rng(2)
    n = 3 * 8 * 48000           # 3 probe blocks
    f_rs41 = 50000.0            # bin 1 + 2 kHz fine offset
    f_m10 = -93000.0            # bin -2 + 3 kHz fine offset
    wide = _rs41_wideband(f_rs41, n, rng) + _m10_wideband(f_m10, n, rng)

    cars = detect_carriers(wide, FS_WIDE)
    assert len(cars) == 2
    cars = classify_carriers(wide, FS_WIDE, cars,
                             families=["rs41", "m10", "dfm"])
    rs = min(cars, key=lambda c: abs(c.center_hz - f_rs41))
    m1 = min(cars, key=lambda c: abs(c.center_hz - f_m10))
    assert rs is not m1
    assert rs.sonde == "rs41" and rs.frames >= 1
    assert m1.sonde == "m10" and m1.frames >= 1
    assert "dfm" not in rs.scores and "dfm" not in m1.scores

    cfg = scan_to_config(cars)
    assert cfg.wideband
    assert sorted(e.sonde for e in cfg.channel_map) == ["m10", "rs41"]


def test_classify_requires_commensurate_rate():
    with pytest.raises(ValueError):
        classify_carriers(np.zeros(1000, np.complex64), 100000.0,
                          [Carrier(0.0, 5000.0, 10.0)])


def test_cli_scan_writes_channel_map(tmp_path):
    from sondetpu.cli.main import main
    from sondetpu.io.iq import write_iq

    rng = np.random.default_rng(3)
    n = 2 * 8 * 48000
    wide = _rs41_wideband(50000.0, n, rng)
    path = tmp_path / "wide.cf32"
    write_iq(str(path), wide, "cf32")
    out = tmp_path / "scan.json"
    rc = main(["scan", "--iq", str(path), "--fs-wide", str(FS_WIDE),
               "--families", "rs41,m10", "--probe-secs", "2",
               "--out", str(out)])
    assert rc == 0
    cfg = json.loads(out.read_text())
    assert cfg["wideband"] is True
    assert cfg["wide_bins"] == 8     # decode --wideband needs no --bins
    assert len(cfg["channel_map"]) == 1
    entry = cfg["channel_map"][0]
    assert entry["sonde"] == "rs41"
    assert abs(entry["center_freq"] - 50000.0) < 1500.0


def test_scan_classifies_afsk_family():
    """AFSK families probe correctly through the fine-offset DDC (the AFSK
    aux carry and the DDC phase share the state tuple): an iMet-4 at an
    off-grid frequency is detected and claimed by imet4, not rs41."""
    from sondetpu.sondes.imet4 import IMET4Modulator, IMET4Truth
    from sondetpu.sondes.modulate import freq_shift

    rng = np.random.default_rng(5)
    n = 3 * 8 * 48000
    mod = IMET4Modulator()
    sig = mod.modulate([IMET4Truth(frame_no=20 + i) for i in range(40)],
                       fs=FS_WIDE)
    sig = freq_shift(sig, 50000.0 / FS_WIDE)      # bin 1 + 2 kHz offset
    wide = _noise(n, rng, 0.02)
    wide[:min(n, sig.size)] += sig[:n]

    cars = detect_carriers(wide, FS_WIDE)
    assert len(cars) == 1
    cars = classify_carriers(wide, FS_WIDE, cars,
                             families=["rs41", "imet4"])
    assert cars[0].sonde == "imet4" and cars[0].frames >= 1
    assert "rs41" not in cars[0].scores


def test_detect_carriers_edge_pair_not_merged():
    """Two DISTINCT carriers near opposite Nyquist edges (circularly far
    apart) must not be merged by the wrap handling."""
    rng = np.random.default_rng(7)
    n = 1 << 18
    f1 = FS_WIDE / 2 - 3500.0
    f2 = -FS_WIDE / 2 + 3500.0      # 7 kHz circular separation
    x = _tone(n, f1 / FS_WIDE) + 0.7 * _tone(n, f2 / FS_WIDE) + _noise(n, rng)
    cars = detect_carriers(x, FS_WIDE, min_bw_hz=0.0)
    assert len(cars) == 2
    got = sorted(c.center_hz for c in cars)
    assert abs(got[0] - f2) < 1000.0 and abs(got[1] - f1) < 1000.0
