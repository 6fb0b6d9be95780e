"""Pallas TPU kernels for the hot pipeline stages.

BASELINE.json:5 names the FIR, correlator and demod stages as the Pallas
targets. The fused front-end kernel (FM discriminator + DC removal +
matched FIR in one VMEM-resident pass) removes two HBM round-trips between
the stages XLA would otherwise materialize; the correlator kernel keeps the
chip ring buffer in VMEM across the 64-tap shifted-MAC loop.

All kernels have jnp reference implementations (the default pipeline path);
equivalence is property-tested in interpret mode on CPU and the TPU default
is chosen by measurement (bench.py --pallas).
"""

from sondetpu.pallas.frontend import (
    fused_demod_fir, fused_frontend, frontend_chunk, fast_atan2)
from sondetpu.pallas.corr import corr_kernel

__all__ = ["fused_demod_fir", "fused_frontend",
           "frontend_chunk", "fast_atan2", "corr_kernel"]
