"""Cross-process telemetry/metrics fan-in (SURVEY.md §5.8).

In an N>=2-process fleet each process host-reads only ITS addressable
channel shards (runtime/session.py) and therefore holds telemetry for a
subset of channels. These helpers move the small per-process results over
the collectives SURVEY.md §5.8 names: ``all_gather`` for telemetry rows
(display/sink fan-in on a head process) and a summed gather for metrics
counters (the psum of per-process counts). Both degrade to the identity in
a single-process run, so the same code path is exercised by the CPU-mesh
unit tests and by real multi-host fleets.

Wire precision: multihost collectives canonicalize to 32-bit types when
x64 is disabled (the JAX default), so values that exceed float32's exact
range are SPLIT before the gather — epoch times into (days, second-of-day)
and counters into 20-bit limbs — and recombined after. Without this, a
1.7e9 epoch quantizes to ~128 s steps and cluster frame counters stop
incrementing past 2^24.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

# telemetry row schema for the numeric fan-in (channel + the numeric core
# of SondeTelemetry; strings like serial ride the JSONL sinks per process).
# "time" is carried as (time_day, time_sod): day index since epoch + second
# of day — both exact in float32 (sod ulp at 86400 is ~8 ms).
ROW_FIELDS = ("channel", "lat", "lon", "alt", "spd", "hdg", "climb",
              "temp", "rh", "pressure", "time_day", "time_sod", "seq")
_LIMB = 1 << 20      # counter limb base: both limbs exact in float32/int32


def _allgather(x: np.ndarray) -> np.ndarray:
    """Stack x across processes -> [n_processes, *x.shape]."""
    import jax
    if jax.process_count() <= 1:
        return np.asarray(x)[None]
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(x, tiled=False))


def allgather_rows(rows: np.ndarray, cap: int = 256) -> np.ndarray:
    """Gather variable-count per-process float rows: [n_local, F] ->
    [n_total, F] on every process.

    ``cap`` is the fixed per-process wire width (collectives need static
    shapes); every process must pass the SAME cap. Size it from the
    session's channel count (DecoderSession.telemetry_fanin does) — rows
    beyond it drop WITH a warning, never silently."""
    rows = np.atleast_2d(np.asarray(rows, np.float32))
    n, f = rows.shape if rows.size else (0, len(ROW_FIELDS))
    if n > cap:
        import logging
        logging.getLogger(__name__).warning(
            "telemetry fan-in dropping %d of %d local rows (cap=%d; raise "
            "the cap to the channel count)", n - cap, n, cap)
    buf = np.zeros((cap, f + 1), np.float32)
    k = min(n, cap)
    if k:
        buf[:k, 0] = 1.0
        buf[:k, 1:] = rows[:k]
    g = _allgather(buf).reshape(-1, f + 1)
    return g[g[:, 0] > 0.5, 1:]


def sum_counts(vec) -> np.ndarray:
    """Sum a per-process counter vector across all processes (metrics
    psum: frames seen/decoded, updates, blocks). Counters are split into
    20-bit limbs before the 32-bit wire and recombined after, so totals
    stay integer-exact far beyond float32/int32 single-value range."""
    v = np.asarray(vec)
    ints = np.asarray([int(round(float(x))) for x in np.ravel(v)], object)
    lo = np.asarray([c % _LIMB for c in ints], np.int32)
    hi = np.asarray([c // _LIMB for c in ints], np.int32)
    g = _allgather(np.stack([hi, lo]))          # [P, 2, n]
    g = g.reshape(-1, 2, lo.size).astype(np.int64)
    return (g[:, 0, :] * _LIMB + g[:, 1, :]).sum(axis=0)


def telemetry_rows(telemetry: Dict[int, object]) -> np.ndarray:
    """Encode a session's {channel: SondeTelemetry} as fan-in rows."""
    rows = np.zeros((len(telemetry), len(ROW_FIELDS)), np.float32)
    for i, (ch, t) in enumerate(sorted(telemetry.items())):
        day, sod = divmod(float(t.time), 86400.0)
        rows[i] = (ch, t.lat, t.lon, t.alt, t.spd, t.hdg, t.climb,
                   t.temp, t.rh, t.pressure, day, sod, t.seq)
    return rows


def rows_to_dict(rows: np.ndarray) -> Dict[int, Dict[str, float]]:
    """Decode fan-in rows into {channel: {field: value}} (head-process
    display/aggregation form); (time_day, time_sod) recombine to "time"."""
    out: Dict[int, Dict[str, float]] = {}
    for r in np.atleast_2d(rows):
        d = dict(zip(ROW_FIELDS[1:], (float(x) for x in r[1:])))
        d["time"] = d.pop("time_day") * 86400.0 + d.pop("time_sod")
        out[int(r[0])] = d
    return out
