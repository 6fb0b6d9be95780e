"""Checkpoint / resume of streaming decode state (SURVEY.md §5.4).

The reference loses its in-memory calibration tables on restart
(decoder.hpp:85-86) and re-accumulates them over the following minutes of
frames. Here the complete per-channel carry-over — device pipeline state
(filter tails, demod prev sample, symbol clock, chip ring buffer), host
decoder state (calibration blobs, subframe reassembly), and running
telemetry — serializes to one file so a long multi-host run resumes
seamlessly at a block boundary.

Format: a single pickle of plain NumPy/py objects (the state is produced and
consumed only by this framework; treat checkpoint files as trusted input).
"""

from __future__ import annotations

import pickle
import numpy as np
import jax

FORMAT_VERSION = 1


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_session(session, path: str) -> None:
    """Snapshot a DecoderSession (device state is pulled to host)."""
    payload = {
        "version": FORMAT_VERSION,
        "sonde": session.config.sonde,
        "channels": session.config.channels,
        "block_len": session.config.block_len,
        "pipeline_state": _to_host(session.state),
        "decoder": session.decoder.__dict__,
        "telemetry": session.telemetry,
        "frames_seen": session.frames_seen,
        "blocks_seen": session.blocks_seen,
    }
    with open(path, "wb") as f:
        pickle.dump(payload, f)


def load_session(session, path: str) -> None:
    """Restore a snapshot into a freshly constructed DecoderSession with a
    matching config; raises on sonde/shape mismatch."""
    with open(path, "rb") as f:
        payload = pickle.load(f)
    if payload["version"] != FORMAT_VERSION:
        raise ValueError(f"checkpoint version {payload['version']} unsupported")
    for key in ("sonde", "channels", "block_len"):
        have = getattr(session.config, key)
        want = payload[key]
        if have != want:
            raise ValueError(f"checkpoint {key}={want!r} != session {key}={have!r}")
    session.state = payload["pipeline_state"]
    session.decoder.__dict__.update(payload["decoder"])
    session.telemetry = payload["telemetry"]
    session.frames_seen = payload["frames_seen"]
    session.blocks_seen = payload["blocks_seen"]
