"""Polyphase filter-bank channelizer: wideband IQ -> N baseband channels.

The TPU-native replacement for SDR++'s per-sonde VFO channel extraction
(SURVEY.md C5: "wideband IQ -> thousands of narrowband channels in one
batched kernel"): where the reference creates one mixer+decimator VFO per
module instance (main.cpp:55-56), this computes ALL channels at once with a
critically-sampled DFT filter bank:

    u_p[m]   = sum_j h[jN+p] * x[(m-j)N - p]        (polyphase branches)
    y_k[m]   = sum_p u_p[m] * exp(-2j*pi*k*p/N)      (DFT across branches)

Everything runs on real I/Q planes (no complex64 in compiled programs); the
DFT across branches is two real matmuls that land on the MXU. Channel k is
centered at k * fs_chan (k interpreted mod N, negative above N/2) — the
channel-grid analogue of the reference's 1 kHz VFO snap (main.cpp:56);
residual per-channel offsets are absorbed downstream by the FM demod's DC
block (runtime/pipeline.py).

Streaming: a tail of N*taps_per_phase wideband samples carries across
blocks, so chunked channelization equals unchunked exactly.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from sondetpu.dsp.fir import design_lowpass


class ChannelizerState(NamedTuple):
    tail_i: jax.Array    # [L] last wideband I samples
    tail_q: jax.Array    # [L] last wideband Q samples


class PFBChannelizer:
    """Critically-sampled N-channel analysis filter bank."""

    def __init__(self, n_channels: int, taps_per_phase: int = 8,
                 cutoff_frac: float = 0.45):
        self.n = int(n_channels)
        self.tpp = int(taps_per_phase)
        L = self.n * self.tpp
        # prototype lowpass at the channel Nyquist, unity passband
        proto = design_lowpass(cutoff_frac, float(self.n), L + 1)[:L] * self.n
        self._hbank = proto.reshape(self.tpp, self.n).T.astype(np.float32)  # [N, tpp]
        p = np.arange(self.n)
        k = np.arange(self.n)
        ang = 2.0 * np.pi * np.outer(p, k) / self.n
        self._cos = np.cos(ang).astype(np.float32)     # [p, k]
        self._sin = np.sin(ang).astype(np.float32)

    @property
    def history(self) -> int:
        return self.n * self.tpp

    def init_state(self) -> ChannelizerState:
        return ChannelizerState(tail_i=np.zeros(self.history, np.float32),
                                tail_q=np.zeros(self.history, np.float32))

    def center_freqs(self, fs_wide: float) -> np.ndarray:
        """Center frequency of each output channel (Hz, negative above N/2)."""
        k = np.arange(self.n)
        k = np.where(k < self.n / 2, k, k - self.n)
        return k * fs_wide / self.n

    def __call__(self, state: ChannelizerState, x_i: jax.Array, x_q: jax.Array):
        """One block: wideband planes [W] (W % N == 0) ->
        (state, y_i [N, W/N], y_q [N, W/N])."""
        n, tpp = self.n, self.tpp
        L = self.history
        w = x_i.shape[-1]
        m_out = w // n

        def branches(tail, x):
            xp = jnp.concatenate([tail, x])            # [L + W]
            # branch p, frame m taps xp at L + m*N - p - j*N
            # build per-branch decimated streams with conv over frames
            base = L - jnp.arange(n)                   # start index per branch
            idx = base[:, None] + jnp.arange(-tpp + 1, m_out)[None, :] * n
            xb = xp[idx]                               # [N, m_out + tpp - 1]
            u = jax.lax.conv_general_dilated(
                xb[None, :, :], self._hbank[:, None, ::-1],
                window_strides=(1,), padding="VALID",
                dimension_numbers=("NCH", "OIH", "NCH"),
                feature_group_count=n)
            return u[0]                                # [N, m_out]

        u_i = branches(state.tail_i, x_i)
        u_q = branches(state.tail_q, x_q)
        # DFT across branches via two real matmuls (MXU); the +j convention
        # maps a tone at +k*fs_chan into output channel k
        c, s = self._cos, self._sin
        y_i = jnp.einsum("pm,pk->km", u_i, c) - jnp.einsum("pm,pk->km", u_q, s)
        y_q = jnp.einsum("pm,pk->km", u_q, c) + jnp.einsum("pm,pk->km", u_i, s)
        new_state = ChannelizerState(
            tail_i=jnp.concatenate([state.tail_i, x_i])[-L:],
            tail_q=jnp.concatenate([state.tail_q, x_q])[-L:])
        return new_state, y_i, y_q
