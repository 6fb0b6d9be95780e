"""DSP kernel property tests (SURVEY.md §4 item 5)."""

import numpy as np
import pytest
import jax.numpy as jnp

from sondetpu.dsp import (
    FMState, design_lowpass, fir_apply, fir_filter, fir_init, fm_apply,
    fm_demod, fm_init, gaussian_taps, polyphase_decimate, rational_resample,
)
from sondetpu.dsp.resample import make_rational_resampler


def test_fir_matches_numpy_convolve():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(3, 256)).astype(np.float32)
    taps = design_lowpass(0.2, 1.0, 31)
    y = np.asarray(fir_filter(jnp.asarray(x), jnp.asarray(taps)))
    for c in range(3):
        want = np.convolve(x[c], taps)[:256]
        np.testing.assert_allclose(y[c], want, atol=1e-5)


def test_fir_chunked_equals_unchunked():
    """Overlap-save carry: chunked == unchunked for any block size
    (SURVEY.md §7 'carry-over correctness')."""
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 600)).astype(np.float32)
    taps = jnp.asarray(design_lowpass(0.15, 1.0, 41))
    full = np.asarray(fir_filter(jnp.asarray(x), taps))
    for block in (50, 100, 150, 300):
        st = fir_init(2, 41)
        outs = []
        for i in range(0, 600, block):
            st, y = fir_apply(st, jnp.asarray(x[:, i:i + block]), taps)
            outs.append(np.asarray(y))
        np.testing.assert_allclose(np.concatenate(outs, axis=1), full, atol=1e-5)


def test_fir_complex():
    rng = np.random.default_rng(2)
    x = (rng.normal(size=(2, 128)) + 1j * rng.normal(size=(2, 128))).astype(np.complex64)
    taps = design_lowpass(0.25, 1.0, 21)
    y = np.asarray(fir_filter(jnp.asarray(x), jnp.asarray(taps)))
    want = np.stack([np.convolve(x[c], taps)[:128] for c in range(2)])
    np.testing.assert_allclose(y, want, atol=1e-5)


def test_fm_demod_recovers_tone():
    """A tone at +deviation must demodulate to +1 (main.cpp:57 deviation
    convention)."""
    fs, dev = 48000.0, 2400.0
    n = 4800
    t = np.arange(n) / fs
    iq = np.exp(2j * np.pi * dev * t).astype(np.complex64)[None, :]
    audio = np.asarray(fm_demod(jnp.asarray(iq), fs, dev))
    np.testing.assert_allclose(audio[0, 10:], 1.0, atol=1e-3)


def test_fm_chunked_equals_unchunked():
    rng = np.random.default_rng(3)
    fs, dev = 48000.0, 2400.0
    phase = np.cumsum(rng.normal(size=1000)) * 0.1
    iq = np.exp(1j * phase).astype(np.complex64)[None, :]
    full = np.asarray(fm_demod(jnp.asarray(iq), fs, dev))
    st = fm_init(1)
    outs = []
    for i in range(0, 1000, 250):
        st, y = fm_apply(st, jnp.asarray(iq[:, i:i + 250]), fs, dev)
        outs.append(np.asarray(y))
    np.testing.assert_allclose(np.concatenate(outs, axis=1), full, atol=1e-5)


def test_polyphase_decimate_tone():
    fs = 48000.0
    n = 4800
    t = np.arange(n) / fs
    x = np.cos(2 * np.pi * 1000.0 * t).astype(np.float32)[None, :]
    y = np.asarray(polyphase_decimate(jnp.asarray(x), 5, fs=fs))
    assert y.shape == (1, 960)
    # The decimated signal still contains the 1 kHz tone at the new rate
    spec = np.abs(np.fft.rfft(y[0, 100:900]))
    f = np.fft.rfftfreq(800, d=5 / fs)
    assert abs(f[np.argmax(spec)] - 1000.0) < 30


def test_rational_resample_tone():
    fs_in, fs_out = 20000.0, 48000.0
    up, down, taps = make_rational_resampler(fs_in, fs_out)
    assert (up, down) == (12, 5)
    n = 2000
    t = np.arange(n) / fs_in
    x = np.cos(2 * np.pi * 700.0 * t).astype(np.float32)[None, :]
    y = np.asarray(rational_resample(jnp.asarray(x), up, down, taps))
    assert y.shape[1] == n * up // down
    m = y.shape[1]
    # compare against an ideal resample in the steady-state region
    t_out = np.arange(m) / fs_out
    want = np.cos(2 * np.pi * 700.0 * t_out)
    # allow for filter group delay: correlate to find it
    core = y[0, 200:m - 200]
    lag = np.argmax(np.correlate(want, core, mode="valid"))
    np.testing.assert_allclose(core, want[lag:lag + core.size], atol=0.05)


def test_streaming_resampler_chunked_equals_stateless():
    from sondetpu.dsp.resample import StreamingResampler, make_rational_resampler

    fs_in, fs_out = 20000.0, 48000.0
    rng = np.random.default_rng(7)
    x = rng.normal(size=(2, 4000)).astype(np.float32)
    up, down, taps = make_rational_resampler(fs_in, fs_out)
    full = np.asarray(rational_resample(jnp.asarray(x), up, down, taps))

    rs = StreamingResampler(fs_in, fs_out, channels=2)
    outs = [rs.process(x[:, i:i + 500]) for i in range(0, 4000, 500)]
    y = np.concatenate(outs, axis=1)
    m = min(y.shape[1], full.shape[1])
    np.testing.assert_allclose(y[:, :m], full[:, :m], atol=1e-4)


def test_c64_to_planes_native():
    from sondetpu.io.iq import c64_to_planes

    rng = np.random.default_rng(8)
    iq = (rng.normal(size=(3, 100)) + 1j * rng.normal(size=(3, 100))).astype(np.complex64)
    i, q = c64_to_planes(iq)
    np.testing.assert_array_equal(i, iq.real)
    np.testing.assert_array_equal(q, iq.imag)
    assert i.flags["C_CONTIGUOUS"] and i.dtype == np.float32
