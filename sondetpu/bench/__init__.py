"""Benchmarks: throughput (bench.py at repo root) and FER-vs-SNR sweeps."""

from sondetpu.bench.fer import fer_sweep

__all__ = ["fer_sweep"]
