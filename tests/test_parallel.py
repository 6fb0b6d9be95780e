"""Multi-device tests on the virtual 8-device CPU mesh (SURVEY.md §4 item 4)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sondetpu.dsp.fir import design_lowpass, fir_filter
from sondetpu.parallel import (frontend_serial, make_mesh, shard_channels,
                               sharded_pipeline_step, time_parallel_fir,
                               time_parallel_frontend)
from sondetpu.runtime.pipeline import Pipeline, PipelineConfig
from sondetpu.runtime.session import DecoderSession
from sondetpu.sondes.rs41 import RS41Modulator, RS41Truth


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_time_parallel_fir_matches_serial():
    """Halo exchange via ppermute == unsharded causal FIR (SURVEY.md §5.7)."""
    mesh = make_mesh()
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 1024)).astype(np.float32)
    taps = jnp.asarray(design_lowpass(0.2, 1.0, 33))
    want = np.asarray(fir_filter(jnp.asarray(x), taps))
    got = np.asarray(time_parallel_fir(jnp.asarray(x), taps, mesh))
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("decim", [1, 2])
def test_time_parallel_frontend_matches_serial(decim):
    """The FULL front end (chanfilt+decim+FM demod+matched FIR) over a
    time-sharded block — ONE ppermute halo, recompute inside it, pmean DC —
    equals the serial chain exactly (SURVEY.md §5.7 beyond a single FIR)."""
    mesh = make_mesh()
    rng = np.random.default_rng(1)
    n = 8 * 1024 * decim
    xi = rng.normal(size=(4, n)).astype(np.float32)
    xq = rng.normal(size=(4, n)).astype(np.float32)
    chan_taps = design_lowpass(5000.0, 48000.0, 41)
    match_taps = design_lowpass(2640.0, 48000.0 / decim, 41)
    for dc_block in (False, True):
        want = np.asarray(frontend_serial(
            jnp.asarray(xi), jnp.asarray(xq), chan_taps, match_taps,
            decim=decim, scale=3.18, dc_block=dc_block))
        got = np.asarray(time_parallel_frontend(
            jnp.asarray(xi), jnp.asarray(xq), chan_taps, match_taps, mesh,
            decim=decim, scale=3.18, dc_block=dc_block))
        assert got.shape == want.shape == (4, n // decim)
        np.testing.assert_allclose(got, want, atol=2e-4)


def test_channel_sharded_pipeline_step():
    """The full decode step runs SPMD with channels sharded over 8 devices
    and produces the same frames as the single-device run."""
    channels = 8
    mod = RS41Modulator()
    fs = 48000.0
    iq1 = mod.modulate([RS41Truth(frame_no=10 + i) for i in range(2)], fs=fs)
    iq = np.stack([iq1] * channels)[:, :48000]

    cfg = PipelineConfig(sonde="rs41", channels=channels, block_len=48000)
    pipe = Pipeline(cfg)

    # single-device reference
    st0 = pipe.init_state()
    _, out_ref = pipe.step(st0, iq)

    # sharded
    mesh = make_mesh()
    step_fn, shard_fn = sharded_pipeline_step(pipe, mesh)
    st = shard_fn(pipe.init_state())
    iq_i = shard_fn(np.ascontiguousarray(iq.real.astype(np.float32)))
    iq_q = shard_fn(np.ascontiguousarray(iq.imag.astype(np.float32)))
    _, out = step_fn(st, iq_i, iq_q)

    np.testing.assert_array_equal(np.asarray(out.frame_valid),
                                  np.asarray(out_ref.frame_valid))
    np.testing.assert_array_equal(np.asarray(out.frames), np.asarray(out_ref.frames))


def test_sharded_session_decodes():
    """Sharded state + step through multiple blocks decodes telemetry."""
    channels = 8
    mod = RS41Modulator()
    iq1 = mod.modulate([RS41Truth(frame_no=5 + i, serial="SHRD0001") for i in range(4)])
    iq = np.stack([iq1] * channels)

    cfg = PipelineConfig(sonde="rs41", channels=channels, block_len=48000)
    pipe = Pipeline(cfg)
    mesh = make_mesh()
    step_fn, shard_fn = sharded_pipeline_step(pipe, mesh)
    state = shard_fn(pipe.init_state())
    n = iq.shape[1]
    total = 0
    for i in range(0, n - 48000 + 1, 48000):
        blk = iq[:, i:i + 48000]
        state, out = step_fn(
            state,
            shard_fn(np.ascontiguousarray(blk.real.astype(np.float32))),
            shard_fn(np.ascontiguousarray(blk.imag.astype(np.float32))))
        total += int(np.asarray(out.frame_valid).sum())
    assert total >= channels * 2


def test_channel_sharded_bf16_step_matches_single_device():
    """bf16 state leaves shard over the mesh and the SPMD step matches the
    single-device bf16 run bit-for-bit at the framed-bytes level."""
    channels = 8
    mod = RS41Modulator()
    iq1 = mod.modulate([RS41Truth(frame_no=20 + i) for i in range(2)],
                       fs=48000.0)
    iq = np.stack([iq1] * channels)[:, :48000]

    cfg = PipelineConfig(sonde="rs41", channels=channels, block_len=48000,
                         compute_dtype="bf16")
    pipe = Pipeline(cfg)
    st0 = pipe.init_state()
    _, out_ref = pipe.step(st0, iq)

    mesh = make_mesh()
    step_fn, shard_fn = sharded_pipeline_step(pipe, mesh)
    st = shard_fn(pipe.init_state())
    iq_i = shard_fn(np.ascontiguousarray(iq.real.astype(np.float32)))
    iq_q = shard_fn(np.ascontiguousarray(iq.imag.astype(np.float32)))
    _, out = step_fn(st, iq_i, iq_q)

    np.testing.assert_array_equal(np.asarray(out.frame_valid),
                                  np.asarray(out_ref.frame_valid))
    np.testing.assert_array_equal(np.asarray(out.frames),
                                  np.asarray(out_ref.frames))


def test_2d_host_chip_mesh_step_matches_single_device():
    """A ('host', 'chip') 2-D mesh (the real multi-host layout,
    SURVEY.md §5.8): channels shard over the host x chip product and the
    SPMD step matches the single-device run exactly."""
    channels = 8
    mod = RS41Modulator()
    iq1 = mod.modulate([RS41Truth(frame_no=30 + i) for i in range(2)],
                       fs=48000.0)
    iq = np.stack([iq1] * channels)[:, :48000]

    cfg = PipelineConfig(sonde="rs41", channels=channels, block_len=48000)
    pipe = Pipeline(cfg)
    _, out_ref = pipe.step(pipe.init_state(), iq)

    mesh = make_mesh(axis_names=("host", "chip"), shape=(2, 4))
    assert mesh.shape == {"host": 2, "chip": 4}
    step_fn, shard_fn = sharded_pipeline_step(pipe, mesh)   # axis inferred
    st = shard_fn(pipe.init_state())
    iq_i = shard_fn(np.ascontiguousarray(iq.real.astype(np.float32)))
    iq_q = shard_fn(np.ascontiguousarray(iq.imag.astype(np.float32)))
    # channel axis is sharded over BOTH mesh axes
    assert len(iq_i.sharding.device_set) == 8
    _, out = step_fn(st, iq_i, iq_q)
    np.testing.assert_array_equal(np.asarray(out.frame_valid),
                                  np.asarray(out_ref.frame_valid))
    np.testing.assert_array_equal(np.asarray(out.frames),
                                  np.asarray(out_ref.frames))


def test_sharded_session_2d_mesh_decodes():
    """DecoderSession over a 2-D ('host','chip') mesh decodes telemetry
    (the runtime path, not just the raw step)."""
    mod = RS41Modulator()
    iq1 = mod.modulate([RS41Truth(frame_no=3 + i) for i in range(3)])
    iq = np.stack([iq1] * 8)
    mesh = make_mesh(axis_names=("host", "chip"), shape=(2, 4))
    cfg = PipelineConfig(sonde="rs41", channels=8, block_len=48000)
    sess = DecoderSession(cfg, mesh=mesh)
    for i in range(0, iq.shape[1] - 48000 + 1, 48000):
        sess.process_block(iq[:, i:i + 48000])
    assert len(sess.telemetry) == 8
    assert sess.telemetry[0].serial == "S1234567"
    # single-process: fan-in is the identity view of the same telemetry
    fan = sess.telemetry_fanin()
    assert set(fan) == set(range(8))
    assert fan[0]["lat"] == pytest.approx(45.0, abs=1e-4)
    m = sess.metrics_fanin()
    assert m["frames_decoded"] >= 8


def test_fanin_rows_roundtrip():
    from sondetpu.parallel import fanin
    from sondetpu.telemetry import SondeTelemetry

    t = SondeTelemetry()
    t.lat, t.lon, t.alt = 45.0, 9.0, 12000.0
    t.time, t.seq = 1_700_000_045.0, 107
    rows = fanin.telemetry_rows({3: t})
    got = fanin.allgather_rows(rows)
    assert got.shape == rows.shape
    d = fanin.rows_to_dict(got)
    assert d[3]["lat"] == pytest.approx(45.0)
    # epoch time survives the 32-bit wire EXACTLY (split day/second-of-day;
    # a single float32 would quantize 1.7e9 to ~128 s steps)
    assert d[3]["time"] == pytest.approx(1_700_000_045.0, abs=0.01)
    # counters beyond float32's 2^24 exact range stay integer-exact
    tot = fanin.sum_counts([5, 7, 16_777_217, 2_500_000_001])
    np.testing.assert_array_equal(tot, [5, 7, 16_777_217, 2_500_000_001])


def test_allgather_rows_warns_instead_of_silent_drop(caplog):
    """ADVICE r3: rows beyond the wire cap must not vanish silently."""
    import logging

    import numpy as np

    from sondetpu.parallel import fanin

    rows = np.arange(5 * len(fanin.ROW_FIELDS), dtype=np.float32).reshape(5, -1)
    with caplog.at_level(logging.WARNING):
        out = fanin.allgather_rows(rows, cap=3)
    assert out.shape[0] == 3
    assert any("dropping 2 of 5" in r.message for r in caplog.records)


def test_session_fanin_cap_defaults_to_channel_count():
    from sondetpu.runtime.pipeline import PipelineConfig
    from sondetpu.runtime.session import DecoderSession
    from sondetpu.telemetry import SondeTelemetry

    sess = DecoderSession(PipelineConfig(sonde="rs41", channels=300,
                                         block_len=48000))
    for ch in range(300):                      # more channels than the old
        t = SondeTelemetry()                   # fixed cap of 256
        t.lat, t.lon = 1.0 + ch, 2.0
        sess.telemetry[ch] = t
    fan = sess.telemetry_fanin()
    assert len(fan) == 300                     # nothing dropped
