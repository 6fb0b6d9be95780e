"""Cross-process telemetry/metrics fan-in (SURVEY.md §5.8).

In an N>=2-process fleet each process host-reads only ITS addressable
channel shards (runtime/session.py) and therefore holds telemetry for a
subset of channels. These helpers move the small per-process results over
the collectives SURVEY.md §5.8 names: ``all_gather`` for telemetry rows
(display/sink fan-in on a head process) and a summed gather for metrics
counters (the psum of per-process counts). Both degrade to the identity in
a single-process run, so the same code path is exercised by the CPU-mesh
unit tests and by real multi-host fleets.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

# telemetry row schema for the numeric fan-in (channel + the numeric core
# of SondeTelemetry; strings like serial ride the JSONL sinks per process)
ROW_FIELDS = ("channel", "lat", "lon", "alt", "spd", "hdg", "climb",
              "temp", "rh", "pressure", "time", "seq")


def _allgather(x: np.ndarray) -> np.ndarray:
    """Stack x across processes -> [n_processes, *x.shape]."""
    import jax
    if jax.process_count() <= 1:
        return np.asarray(x)[None]
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(x, tiled=False))


def allgather_rows(rows: np.ndarray, cap: int = 256) -> np.ndarray:
    """Gather variable-count per-process float rows: [n_local, F] ->
    [n_total, F] on every process (rows beyond ``cap`` per process drop)."""
    rows = np.atleast_2d(np.asarray(rows, np.float32))
    n, f = rows.shape if rows.size else (0, len(ROW_FIELDS))
    buf = np.zeros((cap, f + 1), np.float32)
    k = min(n, cap)
    if k:
        buf[:k, 0] = 1.0
        buf[:k, 1:] = rows[:k]
    g = _allgather(buf).reshape(-1, f + 1)
    return g[g[:, 0] > 0.5, 1:]


def sum_counts(vec) -> np.ndarray:
    """Sum a per-process counter vector across all processes (metrics
    psum: frames seen/decoded, updates, blocks)."""
    v = np.asarray(vec, np.float64)
    return _allgather(v).reshape(-1, v.size).sum(axis=0)


def telemetry_rows(telemetry: Dict[int, object]) -> np.ndarray:
    """Encode a session's {channel: SondeTelemetry} as fan-in rows."""
    rows = np.zeros((len(telemetry), len(ROW_FIELDS)), np.float32)
    for i, (ch, t) in enumerate(sorted(telemetry.items())):
        rows[i] = (ch, t.lat, t.lon, t.alt, t.spd, t.hdg, t.climb,
                   t.temp, t.rh, t.pressure, t.time, t.seq)
    return rows


def rows_to_dict(rows: np.ndarray) -> Dict[int, Dict[str, float]]:
    """Decode fan-in rows into {channel: {field: value}} (head-process
    display/aggregation form)."""
    out: Dict[int, Dict[str, float]] = {}
    for r in np.atleast_2d(rows):
        d = dict(zip(ROW_FIELDS[1:], (float(x) for x in r[1:])))
        out[int(r[0])] = d
    return out
