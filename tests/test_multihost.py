"""True N=2-process multi-host tests (SURVEY.md §5.8, VERDICT r2 item 3).

Two real OS processes, 4 virtual CPU devices each, form a global
('host', 'chip') = (2, 4) mesh via jax.distributed. These tests FAIL if the
session assumes single-process global addressability: the packed output is
not host-addressable, each process must read only its own channel shards,
and telemetry/metrics must cross hosts via the fan-in collectives."""

import json
import os
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "_mp_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_shard_readback_and_fanin():
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)           # worker sets its own device count
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(WORKER))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(i), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        env=env, cwd=os.path.dirname(os.path.dirname(WORKER)))
        for i in range(2)]
    results = {}
    for p in procs:
        out, err = p.communicate(timeout=540)
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        line = [ln for ln in out.strip().splitlines() if ln.startswith("{")][-1]
        r = json.loads(line)
        results[r["pid"]] = r

    # each process decoded EXACTLY its own channel shard (4 of 8)
    assert results[0]["local_telemetry"] == [0, 1, 2, 3]
    assert results[1]["local_telemetry"] == [4, 5, 6, 7]
    for pid in (0, 1):
        assert results[pid]["expected_local"] == results[pid]["local_telemetry"]
        # the all_gather fan-in shows every channel on BOTH processes
        assert results[pid]["fan_channels"] == list(range(8))
        assert abs(results[pid]["fan_lat0"] - 45.0) < 1e-3
        assert results[pid]["serial0"] == "S1234567"
        # metrics psum: both processes agree on cluster totals
        assert results[pid]["metrics"]["frames_decoded"] >= 8
    assert results[0]["metrics"] == results[1]["metrics"]

    # wideband fleet over the same mesh: each process decodes only its
    # channel shard of the rs41 group; fan-in sees all 8 on both
    assert results[0]["fleet_local"] == [0, 1, 2, 3]
    assert results[1]["fleet_local"] == [4, 5, 6, 7]
    for pid in (0, 1):
        assert results[pid]["fleet_fan"] == list(range(8))
        # since r5 the PFB runs INSIDE the fused mesh program (one
        # executable per block per process, VERDICT r4 missing #4), so the
        # channelized planes never exist as a host-visible feed at all —
        # stronger than the r3 device-resident-feed property this stat
        # used to check; zero per-block host uploads must still hold
        st = results[pid]["fleet_shard_stats"]
        assert st["host_uploads"] == 0, st
        assert results[pid]["fleet_fused_mesh"] is True
