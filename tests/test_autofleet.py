"""AutoFleet: live discovery + classification of sondes in a wideband
stream (runtime/autofleet.py) — the reference's human create-an-instance-
per-carrier workflow (main.cpp:23,55-56) run closed-loop."""

import numpy as np
import pytest

from sondetpu.runtime.autofleet import AutoFleet
from sondetpu.sondes.modulate import freq_shift, gfsk_modulate

N_BINS = 4
FS_CHAN = 48000.0
FS_WIDE = N_BINS * FS_CHAN
W = N_BINS * 48000


def _rs41_sig(n_frames, first=40):
    from sondetpu.sondes.rs41 import RS41Modulator, RS41Truth

    mod = RS41Modulator()
    bits = mod.frames_to_bits(np.stack(
        [mod.build_frame(RS41Truth(frame_no=first + i))
         for i in range(n_frames)]))
    return freq_shift(gfsk_modulate(bits, FS_WIDE / 4800.0, 2400.0 / FS_WIDE),
                      FS_CHAN / FS_WIDE)              # bin 1


def _m10_sig(n_frames):
    from sondetpu.sondes.m10 import M10Modulator, M10Truth

    mod = M10Modulator()
    chips = mod.frames_to_chips(np.stack(
        [mod.build_frame(M10Truth(frame_no=8 + i)) for i in range(n_frames)]))
    return freq_shift(
        gfsk_modulate(chips, FS_WIDE / 9600.0, 12000.0 / FS_WIDE, bt=0.7),
        -FS_CHAN / FS_WIDE)                           # bin -1

def test_autofleet_discovers_and_grows():
    """RS41 transmits from t=0; an M10 launches 3 blocks in.  The AutoFleet
    finds the RS41 on its first scan, decodes it, then picks up the M10 at
    a later rescan WITHOUT losing the RS41 group's state (its session is
    reused object-identically across the rebuild)."""
    n_blocks = 9
    wide = np.zeros(n_blocks * W, np.complex64)
    rs = _rs41_sig(14)
    wide[:rs.size] += rs[:wide.size]
    m10 = _m10_sig(60)
    start = 3 * W
    seg = m10[:wide.size - start]
    wide[start:start + seg.size] += seg

    changes = []
    auto = AutoFleet(n_bins=N_BINS, rescan_blocks=3, probe_blocks=2,
                     families=["rs41", "m10"], min_snr_db=8.0,
                     on_change=lambda tr: changes.append(
                         [t.sonde for t in tr]))
    for b in range(n_blocks):
        auto.process_wideband(wide[b * W:(b + 1) * W])

    kinds = sorted(t.sonde for t in auto.tracked)
    assert kinds == ["m10", "rs41"]
    telem = auto.telemetry
    by_type = {s: t for _, (s, t) in telem.items()}
    assert by_type["rs41"].serial == "S1234567"
    assert by_type["m10"].serial == "910-2-12345"
    # rs41 session survived the m10 rebuild: telemetry kept advancing, so
    # its last seq is near the final transmitted frame
    assert by_type["rs41"].seq >= 48
    # first change discovered only rs41; a later change added m10
    assert changes[0] == ["rs41"]
    assert changes[-1] in (["rs41", "m10"], ["m10", "rs41"])
    # the rs41 group object was REUSED (state transplant, not restart)
    rs41_sess = auto.fleet.groups["rs41"][1]
    assert rs41_sess.blocks_seen > 3


def test_autofleet_drops_idle():
    """A carrier that stops transmitting is dropped after drop_idle_blocks."""
    n_blocks = 10
    wide = np.zeros(n_blocks * W, np.complex64)
    rs = _rs41_sig(6)          # ~3.2 s, silent afterwards
    wide[:rs.size] += rs[:wide.size]

    auto = AutoFleet(n_bins=N_BINS, rescan_blocks=2, probe_blocks=2,
                     families=["rs41"], min_snr_db=8.0, drop_idle_blocks=3)
    seen = []
    for b in range(n_blocks):
        auto.process_wideband(wide[b * W:(b + 1) * W])
        seen.append(len(auto.tracked))
    assert max(seen) == 1          # discovered while transmitting
    assert len(auto.tracked) == 0  # dropped after going quiet


def test_cli_auto_decode(tmp_path):
    from sondetpu.cli.main import main
    from sondetpu.io.iq import write_iq

    wide = np.zeros(6 * W, np.complex64)
    rs = _rs41_sig(10)
    wide[:min(rs.size, wide.size)] += rs[:wide.size]
    path = tmp_path / "wide.cf32"
    write_iq(str(path), wide, "cf32")
    out = tmp_path / "o.jsonl"
    rc = main(["decode", "--iq", str(path), "--wideband", "--bins", "4",
               "--auto", "--rescan", "3", "--jsonl", str(out)])
    assert rc == 0
    lines = out.read_text().strip().splitlines()
    assert len(lines) >= 3
    assert '"serial": "S1234567"' in lines[-1]


def test_bin_and_offset_nyquist_wrap():
    """Carriers near the Nyquist bin get the alias-equivalent SMALL offset,
    not an unwrapped ~fs_wide residual (float32 DDC phase quantization)."""
    from sondetpu.dsp.channelizer import bin_and_offset

    assert bin_and_offset(191000.0, 48000.0, 8) == (4, -1000.0)
    assert bin_and_offset(-191000.0, 48000.0, 8) == (4, 1000.0)
    assert bin_and_offset(50000.0, 48000.0, 8) == (1, 2000.0)
    assert bin_and_offset(-93000.0, 48000.0, 8) == (6, 3000.0)


def test_autofleet_checkpoint_roundtrip(tmp_path):
    from sondetpu.runtime import checkpoint as ckpt

    n_blocks = 5
    wide = np.zeros(n_blocks * W, np.complex64)
    rs = _rs41_sig(10)
    wide[:min(rs.size, wide.size)] += rs[:wide.size]

    auto = AutoFleet(n_bins=N_BINS, rescan_blocks=2, probe_blocks=2,
                     families=["rs41"], min_snr_db=8.0)
    for b in range(3):
        auto.process_wideband(wide[b * W:(b + 1) * W])
    assert len(auto.tracked) == 1
    path = tmp_path / "auto.ckpt"
    ckpt.save_autofleet(auto, str(path))

    auto2 = AutoFleet(n_bins=N_BINS, rescan_blocks=2, probe_blocks=2,
                      families=["rs41"], min_snr_db=8.0)
    ckpt.load_autofleet(auto2, str(path))
    assert len(auto2.tracked) == 1
    assert auto2.telemetry[0][1].serial == "S1234567"
    for auto_x in (auto, auto2):
        for b in range(3, n_blocks):
            auto_x.process_wideband(wide[b * W:(b + 1) * W])
    assert auto.telemetry[0][1].seq == auto2.telemetry[0][1].seq


def test_autofleet_failed_classification_not_reprobed(monkeypatch):
    """A strong unclassifiable emitter (interference) is probed once and
    then remembered — classify_carriers is NOT re-run every rescan (each
    run would recompile probe pipelines inside the ingest loop)."""
    import sondetpu.runtime.autofleet as af

    # an emission the probe set cannot decode: an RS41 carrier while only
    # the m10 family is allowed
    tone = np.zeros(6 * W, np.complex64)
    rs = _rs41_sig(14)
    tone[:min(rs.size, tone.size)] += rs[:tone.size]

    calls = []
    real = af.classify_carriers

    def counting(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(af, "classify_carriers", counting)
    auto = AutoFleet(n_bins=N_BINS, rescan_blocks=2, probe_blocks=1,
                     families=["m10"], min_snr_db=8.0)
    for b in range(6):
        auto.process_wideband(tone[b * W:(b + 1) * W])
    assert auto.tracked == []
    assert len(calls) == 1         # probed once, then cached as failed


def test_autofleet_multi_carrier_groups():
    """Three carriers (two RS41s + an M10) discovered in one scan form a
    2-channel rs41 group and a 1-channel m10 group, all decoding."""
    n_blocks = 6
    wide = np.zeros(n_blocks * W, np.complex64)
    rs_a = _rs41_sig(10)                      # bin 1
    from sondetpu.sondes.rs41 import RS41Modulator, RS41Truth
    mod = RS41Modulator()
    bits = mod.frames_to_bits(np.stack(
        [mod.build_frame(RS41Truth(frame_no=90 + i)) for i in range(10)]))
    rs_b = freq_shift(gfsk_modulate(bits, FS_WIDE / 4800.0, 2400.0 / FS_WIDE),
                      (-2 * FS_CHAN + 3000.0) / FS_WIDE)  # bin -2, +3 kHz off
    m10 = _m10_sig(40)
    for sig in (rs_a, rs_b, m10):
        wide[:min(sig.size, wide.size)] += sig[:wide.size]

    auto = AutoFleet(n_bins=N_BINS, rescan_blocks=3, probe_blocks=2,
                     families=["rs41", "m10"], min_snr_db=8.0)
    for b in range(n_blocks):
        auto.process_wideband(wide[b * W:(b + 1) * W])

    kinds = sorted(t.sonde for t in auto.tracked)
    assert kinds == ["m10", "rs41", "rs41"]
    idxs, rs41_sess = auto.fleet.groups["rs41"]
    assert rs41_sess.config.channels == 2
    seqs = {t.telem.seq for t in auto.tracked
            if t.sonde == "rs41" and t.telem is not None}
    assert len(seqs) == 2          # both RS41s decode independently


def test_autofleet_afc_refreshes_tracked_centers():
    """With AFC on, a carrier's tracked center follows the measured offset
    at each rescan, so a drifting sonde keeps matching itself instead of
    being re-discovered as a new carrier."""
    n_blocks = 8
    wide = np.zeros(n_blocks * W, np.complex64)
    sig = freq_shift(_rs41_sig(14), 3000.0 / FS_WIDE)   # bin 1 + 3 kHz
    wide[:min(sig.size, wide.size)] += sig[:wide.size]

    auto = AutoFleet(n_bins=N_BINS, rescan_blocks=2, probe_blocks=2,
                     families=["rs41"], min_snr_db=8.0, afc=True)
    for b in range(n_blocks):
        auto.process_wideband(wide[b * W:(b + 1) * W])

    assert len(auto.tracked) == 1                 # never duplicated
    t = auto.tracked[0]
    # refreshed center converged near the true 51 kHz carrier
    assert abs(t.center_hz - 51000.0) < 1500.0
    assert t.telem is not None and t.telem.serial == "S1234567"


def test_autofleet_afc_checkpoint_roundtrip(tmp_path):
    """An AFC autofleet checkpoint taken AFTER center refreshes (live
    centers drifted from the seeded layout) still restores: group layout
    identity is the discovery-time (bin, seed offset), not the live
    center."""
    from sondetpu.runtime import checkpoint as ckpt

    n_blocks = 6
    wide = np.zeros(n_blocks * W, np.complex64)
    sig = freq_shift(_rs41_sig(12), 3000.0 / FS_WIDE)
    wide[:min(sig.size, wide.size)] += sig[:wide.size]

    auto = AutoFleet(n_bins=N_BINS, rescan_blocks=2, probe_blocks=2,
                     families=["rs41"], min_snr_db=8.0, afc=True)
    for b in range(4):
        auto.process_wideband(wide[b * W:(b + 1) * W])
    assert len(auto.tracked) == 1
    path = tmp_path / "afc_auto.ckpt"
    ckpt.save_autofleet(auto, str(path))

    auto2 = AutoFleet(n_bins=N_BINS, rescan_blocks=2, probe_blocks=2,
                      families=["rs41"], min_snr_db=8.0, afc=True)
    ckpt.load_autofleet(auto2, str(path))
    for b in range(4, n_blocks):
        auto2.process_wideband(wide[b * W:(b + 1) * W])
    assert auto2.telemetry[0][1].serial == "S1234567"
