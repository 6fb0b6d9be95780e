"""Aux subsystems: metrics, checkpoint/resume, watchdog, config, AGC, CLI."""

import json
import subprocess
import sys

import numpy as np
import pytest

from sondetpu.cli.config import ChannelConfig, FrameworkConfig, SinkConfig
from sondetpu.runtime import checkpoint as ckpt
from sondetpu.runtime.pipeline import PipelineConfig
from sondetpu.runtime.session import DecoderSession
from sondetpu.sondes.rs41 import RS41Modulator, RS41Truth


def _rs41_iq(n_frames=4, first=100):
    mod = RS41Modulator()
    return mod.modulate([RS41Truth(frame_no=first + i) for i in range(n_frames)])


def test_metrics_counters():
    iq = _rs41_iq(4)[None, :]
    cfg = PipelineConfig(sonde="rs41", channels=1, block_len=48000)
    sess = DecoderSession(cfg)
    for i in range(0, iq.shape[1] - 48000 + 1, 48000):
        sess.process_block(iq[:, i:i + 48000])
    m = sess.metrics
    assert m.blocks == sess.blocks_seen > 0
    assert m.samples_in == m.blocks * 48000
    assert m.frames_decoded >= 2
    assert m.frame_yield > 0.9
    assert m.msamples_per_sec > 0
    d = m.to_dict()
    assert d["locked_channels"] == 1
    json.loads(m.json_line())
    assert "Msps" in m.status_line()


def test_checkpoint_resume_preserves_calibration(tmp_path):
    """Calibration accumulated before the checkpoint survives resume —
    the capability the reference lacks (SURVEY.md §5.4)."""
    mod = RS41Modulator()
    iq1 = mod.modulate([RS41Truth(frame_no=i, temp=-25.0) for i in range(0, 60)])
    cfg = PipelineConfig(sonde="rs41", channels=1, block_len=48000)
    sess = DecoderSession(cfg)
    n1 = (iq1.size // 48000) * 48000
    for i in range(0, n1 - 48000 + 1, 48000):
        sess.process_block(iq1[None, i:i + 48000])
    assert sess.telemetry[0].calibrated    # all 51 pages seen
    path = str(tmp_path / "state.ckpt")
    ckpt.save_session(sess, path)

    sess2 = DecoderSession(cfg)
    ckpt.load_session(sess2, path)
    assert sess2.telemetry[0].calibrated
    assert sess2.blocks_seen == sess.blocks_seen
    # resumed session keeps decoding with full calibration immediately
    iq2 = mod.modulate([RS41Truth(frame_no=100 + i, temp=-25.0) for i in range(3)])
    for i in range(0, iq2.size - 48000 + 1, 48000):
        sess2.process_block(iq2[None, i:i + 48000])
    assert sess2.telemetry[0].temp == pytest.approx(-25.0, abs=0.01)
    assert sess2.telemetry[0].calib_percent == 100.0


def test_checkpoint_rejects_mismatched_config(tmp_path):
    cfg = PipelineConfig(sonde="rs41", channels=1, block_len=48000)
    sess = DecoderSession(cfg)
    path = str(tmp_path / "s.ckpt")
    ckpt.save_session(sess, path)
    other = DecoderSession(PipelineConfig(sonde="rs41", channels=2, block_len=48000))
    with pytest.raises(ValueError):
        ckpt.load_session(other, path)


def test_watchdog_resets_stale_channels():
    iq = _rs41_iq(3)
    cfg = PipelineConfig(sonde="rs41", channels=1, block_len=48000)
    sess = DecoderSession(cfg)
    for i in range(0, iq.size - 48000 + 1, 48000):
        sess.process_block(iq[None, i:i + 48000])
    assert 0 in sess.telemetry
    # feed silence: the channel stops updating
    silence = np.zeros((1, 48000), np.complex64)
    for _ in range(4):
        sess.process_block(silence)
        assert sess.watchdog(max_idle_blocks=10) == []
    stale = sess.watchdog(max_idle_blocks=2)
    assert stale == [0]
    assert 0 not in sess.telemetry


def test_config_roundtrip_and_write_through(tmp_path):
    p = str(tmp_path / "cfg.json")
    cfg = FrameworkConfig(sonde="m10", channels=16)
    cfg.channel_map = [ChannelConfig(center_freq=402.5e6, sonde="rs41")]
    cfg.save(p)
    back = FrameworkConfig.load(p)
    assert back.sonde == "m10" and back.channels == 16
    assert back.channel_map[0].center_freq == 402.5e6
    back.set("sonde", "rs41")     # write-through (ref main.cpp:384-387)
    again = FrameworkConfig.load(p)
    assert again.sonde == "rs41"
    # defaults use a correct temp path join (P11 bug fixed, not replicated)
    assert "\\" not in SinkConfig().gpx_path


def test_agc_tracks_level():
    import jax.numpy as jnp
    from sondetpu.dsp.agc import agc_apply, agc_init

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 1000)).astype(np.float32)
    st = agc_init(2)
    for _ in range(60):
        st, yi, yq, gain = agc_apply(st, jnp.asarray(x * 5.0), jnp.asarray(x * 5.0))
    rms = float(np.sqrt(np.mean(np.asarray(yi) ** 2 + np.asarray(yq) ** 2)))
    assert rms == pytest.approx(1.0, rel=0.15)


def test_cli_synth_decode_roundtrip(tmp_path):
    iqf = str(tmp_path / "x.cf32")
    jsonlf = str(tmp_path / "out.jsonl")
    gpxf = str(tmp_path / "t.gpx")
    env = {"JAX_PLATFORMS": "cpu", "PYTHONPATH": "."}
    import os
    full_env = dict(os.environ)
    full_env.update(env)
    r = subprocess.run([sys.executable, "-m", "sondetpu.cli.main", "synth",
                        "--sonde", "rs41", "--frames", "4", "--out", iqf],
                       capture_output=True, text=True, env=full_env, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    r = subprocess.run([sys.executable, "-m", "sondetpu.cli.main", "decode",
                        "--iq", iqf, "--sonde", "rs41", "--jsonl", jsonlf,
                        "--gpx", gpxf],
                       capture_output=True, text=True, env=full_env, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    lines = [json.loads(l) for l in open(jsonlf)]
    assert lines and lines[-1]["serial"] == "S1234567"
    metrics = json.loads(r.stderr.strip().splitlines()[-1])
    assert metrics["frames_decoded"] >= 2
    assert open(gpxf).read().endswith("</gpx>\n")


def test_cli_stream_decode_matches_file_decode(tmp_path):
    """--stream (native prefetching reader, O(block) memory) decodes the
    same frames as the load-whole-file path."""
    import os
    iqf = str(tmp_path / "x.cs16")
    full_env = dict(os.environ)
    full_env.update({"JAX_PLATFORMS": "cpu", "PYTHONPATH": "."})
    r = subprocess.run([sys.executable, "-m", "sondetpu.cli.main", "synth",
                        "--sonde", "rs41", "--frames", "4", "--snr", "8",
                        "--format", "cs16", "--out", iqf],
                       capture_output=True, text=True, env=full_env, cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    metrics = {}
    for mode, extra in (("plain", []), ("stream", ["--stream"])):
        jf = str(tmp_path / f"{mode}.jsonl")
        r = subprocess.run([sys.executable, "-m", "sondetpu.cli.main", "decode",
                            "--iq", iqf, "--sonde", "rs41", "--jsonl", jf] + extra,
                           capture_output=True, text=True, env=full_env,
                           cwd="/root/repo")
        assert r.returncode == 0, r.stderr
        metrics[mode] = json.loads(r.stderr.strip().splitlines()[-1])
    assert metrics["stream"]["frames_decoded"] == metrics["plain"]["frames_decoded"]
    assert metrics["stream"]["frames_decoded"] >= 3


def test_cli_types():
    import os
    full_env = dict(os.environ)
    full_env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run([sys.executable, "-m", "sondetpu.cli.main", "types"],
                       capture_output=True, text=True, env=full_env, cwd="/root/repo")
    assert r.returncode == 0
    for name in ("RS41", "DFM06/09", "iMS100/RS-11G", "M10/M20", "iMet-4",
                 "SRS-C50", "MRZ-N1"):
        assert name in r.stdout


def test_fer_sweep_shape():
    from sondetpu.bench.fer import fer_sweep

    res = fer_sweep("rs41", [20.0], n_frames=4)
    assert res["points"][0]["fer"] <= 0.5


def test_fer_rs41_10db_acceptance():
    """BASELINE.json:5 acceptance point: FER at 10 dB SNR must match the CPU
    reference. The reference decodes RS41 cleanly at 10 dB (RS(255,231)
    corrects what little the channel corrupts); this pipeline must too."""
    from sondetpu.bench.fer import fer_sweep

    res = fer_sweep("rs41", [10.0], n_frames=10, seed=3)
    assert res["points"][0]["fer"] == 0.0, res


def test_cli_wideband_mixed_fleet(tmp_path):
    """CLI wideband decode: a config channel_map routes PFB bins to sonde
    types; telemetry comes out tagged per channel (BASELINE.json:11)."""
    import os
    import numpy as np
    from sondetpu.cli.config import ChannelConfig, FrameworkConfig
    from sondetpu.io import write_iq
    from sondetpu.sondes.modulate import freq_shift, gfsk_modulate
    from sondetpu.sondes.rs41 import RS41Modulator, RS41Truth

    n_bins = 8
    fs_chan = 48000.0
    fs_wide = n_bins * fs_chan
    mod = RS41Modulator()
    bits = mod.frames_to_bits(np.stack(
        [mod.build_frame(RS41Truth(frame_no=20 + i)) for i in range(3)]))
    iq = gfsk_modulate(bits, fs_wide / 4800.0, 2400.0 / fs_wide, bt=0.5)
    # channel at bin 2 + 3 kHz fine offset
    f_center = 2 * fs_chan + 3000.0
    iq = freq_shift(iq, f_center / fs_wide)
    w = n_bins * 48000
    iq = np.pad(iq, (0, (-iq.size) % w))
    iqf = str(tmp_path / "wide.cf32")
    write_iq(iqf, iq)

    cfgf = str(tmp_path / "cfg.json")
    cfg = FrameworkConfig()
    cfg.channel_map = [ChannelConfig(center_freq=f_center, sonde="rs41")]
    cfg.save(cfgf)

    jsonlf = str(tmp_path / "w.jsonl")
    full_env = dict(os.environ)
    full_env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run([sys.executable, "-m", "sondetpu.cli.main", "decode",
                        "--iq", iqf, "--wideband", "--bins", str(n_bins),
                        "--config", cfgf, "--jsonl", jsonlf],
                       capture_output=True, text=True, env=full_env,
                       cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    lines = [json.loads(l) for l in open(jsonlf)]
    assert lines, r.stderr
    assert lines[-1]["serial"] == "S1234567"
    assert lines[-1]["type"] == "rs41"


def test_pipelined_session_decodes_with_one_block_lag():
    iq = _rs41_iq(6)
    cfg = PipelineConfig(sonde="rs41", channels=1, block_len=48000)
    plain = DecoderSession(cfg)
    piped = DecoderSession(cfg, pipelined=True)
    for i in range(0, iq.size - 48000 + 1, 48000):
        plain.process_block(iq[None, i:i + 48000])
        piped.process_block(iq[None, i:i + 48000])
    piped.flush()
    assert piped.frames_seen == plain.frames_seen
    assert piped.telemetry[0].seq == plain.telemetry[0].seq


def test_cli_device_dequant_cs8_decode(tmp_path):
    """decode with device_dequant=true on a cs8 file: raw int8 planes feed
    the device (input_dtype="i8") and the stream still decodes."""
    import os
    iqf = str(tmp_path / "x.cs8")
    jsonlf = str(tmp_path / "out.jsonl")
    cfgf = str(tmp_path / "cfg.json")
    open(cfgf, "w").write('{"device_dequant": true}')
    full_env = dict(os.environ)
    full_env.update({"JAX_PLATFORMS": "cpu", "PYTHONPATH": "."})
    r = subprocess.run([sys.executable, "-m", "sondetpu.cli.main", "synth",
                        "--sonde", "rs41", "--frames", "4", "--snr", "20",
                        "--format", "cs8", "--out", iqf],
                       capture_output=True, text=True, env=full_env,
                       cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    r = subprocess.run([sys.executable, "-m", "sondetpu.cli.main", "decode",
                        "--iq", iqf, "--sonde", "rs41", "--config", cfgf,
                        "--jsonl", jsonlf],
                       capture_output=True, text=True, env=full_env,
                       cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    lines = [json.loads(l) for l in open(jsonlf)]
    assert lines and lines[-1]["serial"] == "S1234567"
    metrics = json.loads(r.stderr.strip().splitlines()[-1])
    assert metrics["frames_decoded"] >= 2


def test_checkpoint_resume_bf16_state(tmp_path):
    """Checkpoint/resume round-trips bfloat16 device state (pickle keeps
    ml_dtypes dtypes) and the resumed bf16 session keeps decoding."""
    mod = RS41Modulator()
    iq1 = mod.modulate([RS41Truth(frame_no=i) for i in range(6)])
    cfg = PipelineConfig(sonde="rs41", channels=1, block_len=48000,
                         compute_dtype="bf16")
    sess = DecoderSession(cfg)
    n1 = (iq1.size // 48000) * 48000
    for i in range(0, n1 - 48000 + 1, 48000):
        sess.process_block(iq1[None, i:i + 48000])
    assert sess.frames_seen >= 3
    path = str(tmp_path / "state.ckpt")
    ckpt.save_session(sess, path)

    sess2 = DecoderSession(cfg)
    ckpt.load_session(sess2, path)
    import ml_dtypes
    assert np.asarray(sess2.state.chipbuf).dtype == ml_dtypes.bfloat16
    iq2 = mod.modulate([RS41Truth(frame_no=50 + i) for i in range(3)])
    before = sess2.frames_seen
    for i in range(0, iq2.size - 48000 + 1, 48000):
        sess2.process_block(iq2[None, i:i + 48000])
    assert sess2.frames_seen > before


def test_cli_sonde_auto_detects_family(tmp_path):
    """--sonde auto probes every family on the first blocks and picks the
    one that parses (the reference's type combobox, main.cpp:136-151,
    automated)."""
    from sondetpu.cli.main import main

    iq = tmp_path / "m.cf32"
    rc = main(["synth", "--sonde", "m10", "--frames", "12", "--snr", "15",
               "--out", str(iq)])
    assert rc == 0
    out = tmp_path / "o.jsonl"
    rc = main(["decode", "--iq", str(iq), "--sonde", "auto",
               "--jsonl", str(out)])
    assert rc == 0
    lines = out.read_text().strip().splitlines()
    assert lines and '"type": "m10"' in lines[-1]
