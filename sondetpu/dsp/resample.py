"""Polyphase resampling: integer decimation and rational L/M resampling.

TPU-native equivalent of SDR++'s ``dsp::multirate::RationalResampler``
(reference src/main.cpp:60: arbitrary channel bandwidth -> 48 kHz audio).
The anti-alias/anti-image FIR is designed host-side (windowed sinc) and the
polyphase application is a batched gather + contraction, jit-friendly with
static shapes.
"""

from __future__ import annotations

from math import gcd
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from sondetpu.dsp.fir import design_lowpass, fir_filter


def polyphase_decimate(x: jax.Array, factor: int, taps: Optional[np.ndarray] = None,
                       fs: float = 1.0) -> jax.Array:
    """Decimate [channels, n] by an integer factor with anti-alias filtering.

    n must be a multiple of ``factor``. Zero initial filter state.
    """
    if taps is None:
        taps = design_lowpass(0.45 * fs / factor, fs, 8 * factor + 1)
    y = fir_filter(x, jnp.asarray(taps))
    return y[:, ::factor]


def make_rational_resampler(fs_in: float, fs_out: float, ntaps_per_phase: int = 8):
    """Build a rational resampling plan fs_in -> fs_out."""
    frac = (fs_out / fs_in)
    # find rational approximation
    from fractions import Fraction

    f = Fraction(frac).limit_denominator(1 << 14)
    up, down = f.numerator, f.denominator
    g = gcd(up, down)
    up //= g
    down //= g
    cutoff = 0.45 * min(fs_in, fs_out)
    ntaps = ntaps_per_phase * up
    if ntaps % 2 == 0:
        ntaps += 1
    taps = design_lowpass(cutoff, fs_in * up, ntaps) * up
    return up, down, taps


def rational_resample(x: jax.Array, up: int, down: int, taps: np.ndarray) -> jax.Array:
    """Resample [channels, n] by up/down with the given prototype filter.

    Polyphase: never materializes the upsampled signal. Output length
    floor(n * up / down). Zero initial state (stateless variant; the
    streaming pipeline keeps channels at integer-related rates and uses
    fir_apply + strided pick instead).
    """
    taps = np.asarray(taps, dtype=np.float32)
    nph = -(-taps.size // up)  # taps per phase
    # pad taps to up * nph and reshape into polyphase bank [up, nph]
    tp = np.zeros(up * nph, dtype=np.float32)
    tp[: taps.size] = taps
    bank = jnp.asarray(tp.reshape(nph, up).T)  # bank[p, k] = taps[k*up + p]

    c, n = x.shape
    n_out = (n * up) // down
    m = jnp.arange(n_out)
    # output m taps the upsampled stream at index m*down = i*up + p
    i = (m * down) // up          # input sample index
    p = (m * down) % up           # phase
    xp = jnp.pad(x, ((0, 0), (nph - 1, 0)))
    # gather ONLY the n_out needed windows (a full [c, n, nph] sliding-
    # window tensor first would be an O(n * nph) memory blowup — the exact
    # trap fir.py's _apply_windows documents)
    pos = i[:, None] + jnp.arange(nph)[None, :]          # [n_out, nph]
    sel = jnp.take(xp, pos, axis=1)                      # [c, n_out, nph]
    coeffs = bank[p][:, ::-1]                  # [n_out, nph] reversed for convolution
    return jnp.einsum("cnj,nj->cn", sel, coeffs)


class StreamingResampler:
    """Stateful rational resampler: chunked output == unchunked output.

    The streaming form of SDR++'s RationalResampler (reference main.cpp:60
    resamples each channel's audio to 48 kHz continuously). Carries the
    polyphase filter history and the fractional output phase across blocks.
    Input blocks may be any length; output length varies per block
    (floor-accumulated), so this host-facing utility returns NumPy arrays.
    """

    def __init__(self, fs_in: float, fs_out: float, channels: int,
                 ntaps_per_phase: int = 8):
        self.up, self.down, taps = make_rational_resampler(
            fs_in, fs_out, ntaps_per_phase)
        taps = np.asarray(taps, dtype=np.float32)
        self.nph = -(-taps.size // self.up)
        tp = np.zeros(self.up * self.nph, dtype=np.float32)
        tp[: taps.size] = taps
        self._bank = tp.reshape(self.nph, self.up).T   # [up, nph]
        self.channels = channels
        self._hist = np.zeros((channels, self.nph - 1), dtype=np.float32)
        self._next_t = 0   # position of next output on the upsampled grid,
                           # relative to the first unconsumed input sample

    def process(self, x: np.ndarray) -> np.ndarray:
        """x: [channels, n] float32 -> [channels, m] resampled block."""
        x = np.asarray(x, dtype=np.float32)
        n = x.shape[-1]
        xp = np.concatenate([self._hist, x], axis=-1)
        # outputs at upsampled positions t = next_t, next_t+down, ... while
        # input index i = t // up < n
        t = self._next_t + self.down * np.arange(
            max(0, (n * self.up - self._next_t + self.down - 1) // self.down))
        t = t[t < n * self.up]
        i = t // self.up                     # input sample index in x
        ph = t % self.up                     # polyphase phase
        # window ends at xp index i + nph - 1 (i is index into x)
        win = np.lib.stride_tricks.sliding_window_view(xp, self.nph, axis=-1)
        sel = win[:, i, :]                   # [c, m, nph]
        coeffs = self._bank[ph][:, ::-1]     # [m, nph]
        y = np.einsum("cmj,mj->cm", sel, coeffs)
        self._hist = xp[:, -(self.nph - 1):] if self.nph > 1 else self._hist
        self._next_t = (t[-1] + self.down - n * self.up) if t.size else \
            (self._next_t - n * self.up)
        return y.astype(np.float32)
