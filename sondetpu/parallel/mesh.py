"""Device mesh construction and multi-host runtime init (SURVEY.md §5.8).

The communication backend of this framework IS the JAX multi-host runtime:
one process per host, a global ('host', 'chip') mesh, XLA-compiled
collectives over ICI within a slice and DCN across slices. No NCCL/MPI
analogue exists or is needed (SURVEY.md §2.4 "Distributed backend").
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh


def distributed_init(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Initialize the multi-host runtime (no-op for single-process runs).

    Call once per process before device use on N>=2 host fleets
    (SURVEY.md §5.8: jax.distributed.initialize).
    """
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def make_mesh(axis_names: Sequence[str] = ("chip",),
              shape: Optional[Sequence[int]] = None,
              devices=None) -> Mesh:
    """Build a mesh over available devices.

    Default: 1-D 'chip' mesh over all devices (channel sharding). Pass
    axis_names=('host', 'chip') with a 2-D shape for explicit multi-host
    layouts where the channel axis rides ICI and telemetry fan-in rides DCN.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (devices.size,) if len(axis_names) == 1 else None
    if shape is None:
        raise ValueError("shape required for multi-axis meshes")
    return Mesh(devices.reshape(tuple(shape)), tuple(axis_names))
