"""Channel sharding and time-block halo exchange (SURVEY.md §2.4, §5.7).

Channel parallelism: the pipeline state and IQ blocks carry their channel
axis sharded over the mesh ('chip'); the jitted step then runs SPMD with no
collectives (channels are independent — the TPU analogue of the reference's
"one module instance per sonde", main.cpp:23).

Time/sequence parallelism: long streams split into time blocks across
devices; FIR/correlator boundary state travels to the right neighbor via
``ppermute`` under ``shard_map`` — the DSP analogue of context-parallel halo
exchange (BASELINE.json:5 "overlap-save filter boundaries ... exchanged via
collectives").
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from sondetpu.dsp.fir import _apply_windows


def channel_spec(leaf: Any, axis: str = "chip") -> P:
    """PartitionSpec sharding the leading (channel) axis of a state leaf."""
    ndim = jnp.ndim(leaf)
    return P(axis, *([None] * (ndim - 1)))


def shard_channels(tree: Any, mesh: Mesh, axis: str = "chip") -> Any:
    """device_put every leaf of a pytree with its channel axis sharded."""
    return jax.tree.map(
        lambda leaf: jax.device_put(
            leaf, NamedSharding(mesh, channel_spec(leaf, axis))), tree)


def sharded_pipeline_step(pipeline, mesh: Mesh, axis: str = "chip"):
    """Compile the pipeline step with channel-sharded inputs/outputs.

    Returns (step_fn, shard_fn): ``shard_fn`` places state/iq onto the mesh;
    ``step_fn(state, iq)`` is the SPMD-compiled block step.
    """
    def spec_tree(tree):
        return jax.tree.map(
            lambda leaf: NamedSharding(mesh, channel_spec(leaf, axis)), tree)

    def step(state, iq_i, iq_q):
        return pipeline._step_impl(state, iq_i, iq_q)

    # shardings are inferred from the annotated inputs; outputs follow
    step_fn = jax.jit(step)

    def shard_fn(tree):
        return shard_channels(tree, mesh, axis)

    return step_fn, shard_fn


def time_parallel_fir(x: jax.Array, taps: jax.Array, mesh: Mesh,
                      axis: str = "chip") -> jax.Array:
    """FIR over a stream whose TIME axis is sharded across devices.

    x: [channels, n] with n divisible by mesh.shape[axis]. Each device
    filters its time block after receiving the ``ntaps-1``-sample halo from
    its left neighbor via ppermute (device 0 uses zero initial state).
    Result equals the unsharded causal FIR exactly.
    """
    taps = jnp.asarray(taps)
    ntaps = taps.shape[0]
    ndev = mesh.shape[axis]
    perm = [(i, (i + 1) % ndev) for i in range(ndev)]

    def local(x_blk):
        tail = x_blk[:, -(ntaps - 1):]
        halo = jax.lax.ppermute(tail, axis, perm)
        idx = jax.lax.axis_index(axis)
        halo = jnp.where(idx == 0, jnp.zeros_like(halo), halo)
        xp = jnp.concatenate([halo, x_blk], axis=-1)
        return _apply_windows(xp, taps)

    fn = shard_map(local, mesh=mesh,
                   in_specs=P(None, axis), out_specs=P(None, axis))
    return fn(x)
