"""Worker process for the N=2-process multi-host test (SURVEY.md §5.8).

Each process owns 4 virtual CPU devices; the two processes form a global
('host', 'chip') = (2, 4) mesh. The decode session's channel axis shards
over the host x chip product, so the packed output is NOT fully addressable
from either host — the per-process shard readback and the telemetry/metrics
fan-in collectives are the code under test.
"""

import json
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

pid, port = int(sys.argv[1]), sys.argv[2]
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=pid)

import numpy as np  # noqa: E402

from sondetpu.parallel import make_mesh  # noqa: E402
from sondetpu.runtime.pipeline import PipelineConfig  # noqa: E402
from sondetpu.runtime.session import DecoderSession  # noqa: E402
from sondetpu.sondes.rs41 import RS41Modulator, RS41Truth  # noqa: E402

assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4

mesh = make_mesh(axis_names=("host", "chip"), shape=(2, 4))
mod = RS41Modulator()
iq1 = mod.modulate([RS41Truth(frame_no=5 + i) for i in range(3)])
iq = np.stack([iq1] * 8)

cfg = PipelineConfig(sonde="rs41", channels=8, block_len=48000)
sess = DecoderSession(cfg, mesh=mesh)

# the global state must NOT be host-addressable from one process — this is
# what forces the per-shard readback path
assert not sess.state.chipbuf.is_fully_addressable

for i in range(0, iq.shape[1] - 48000 + 1, 48000):
    sess.process_block(iq[:, i:i + 48000])

fan = sess.telemetry_fanin()
met = sess.metrics_fanin()
print(json.dumps({
    "pid": pid,
    "local_telemetry": sorted(sess.telemetry),
    "expected_local": sess.local_channels(),
    "fan_channels": sorted(fan),
    "fan_lat0": fan.get(0, {}).get("lat"),
    "serial0": (sess.telemetry.get(min(sess.telemetry), None) or
                type("x", (), {"serial": ""})).serial,
    "metrics": met,
}))
