"""Streaming automatic gain control (SURVEY.md S0 "AGC").

Per-channel one-pole envelope tracker with separate attack/decay, carried
across blocks. Note the default decode chain does NOT need AGC: the FM
quadrature discriminator (atan2 of a complex ratio) is amplitude-invariant,
which is why the reference runs its FM demod straight off the VFO as well
(main.cpp:57). AGC is provided for magnitude-sensitive front ends (AFSK
energy detection on widely varying input levels) and external consumers.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class AGCState(NamedTuple):
    env: jax.Array   # [channels] tracked envelope


def agc_init(channels: int) -> AGCState:
    return AGCState(env=np.ones((channels,), np.float32))


def agc_apply(state: AGCState, x_i: jax.Array, x_q: jax.Array,
              target: float = 1.0, attack: float = 0.1, decay: float = 0.01):
    """Normalize I/Q planes toward a target RMS.

    The envelope updates once per block (block-averaged power with
    attack/decay asymmetry); within-block gain is constant, so the operation
    is exactly invertible and phase-transparent. Returns
    (state, y_i, y_q, gain [channels]).
    """
    power = jnp.mean(x_i * x_i + x_q * x_q, axis=-1)
    rms = jnp.sqrt(power + 1e-20)
    up = rms > state.env
    alpha = jnp.where(up, attack, decay)
    env = state.env + alpha * (rms - state.env)
    gain = target / jnp.maximum(env, 1e-10)
    return (AGCState(env=env), x_i * gain[:, None], x_q * gain[:, None], gain)
