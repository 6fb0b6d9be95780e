"""Multi-chip / multi-host scale-out (SURVEY.md §2.4, §5.7, §5.8).

The reference has no distributed layer (single-process plugin); scale-out is
this framework's own first-class component: channels shard over a
``jax.sharding.Mesh`` (the dominant axis, BASELINE.json:5), long streams
shard over time blocks with overlap-save halos exchanged via ``ppermute``
(the ring/context-parallel analogue for DSP), and multi-host runs
initialize through ``jax.distributed`` with XLA collectives over ICI/DCN
replacing a NCCL-style backend.
"""

from sondetpu.parallel.mesh import make_mesh, distributed_init
from sondetpu.parallel.sharding import (
    frontend_serial, shard_channels, sharded_pipeline_step,
    time_parallel_fir, time_parallel_frontend)

__all__ = ["make_mesh", "distributed_init", "shard_channels",
           "sharded_pipeline_step", "time_parallel_fir",
           "time_parallel_frontend", "frontend_serial"]
