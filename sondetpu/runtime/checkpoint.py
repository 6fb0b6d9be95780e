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


def save_fleet(fleet, path: str) -> None:
    """Snapshot a FleetSession: the PFB channelizer carry plus every
    per-type group's full session payload (keyed by sonde type)."""
    groups = {}
    for sonde, (idxs, sess) in fleet.groups.items():
        groups[sonde] = {
            "idxs": list(idxs),
            "pipeline_state": _to_host(sess.state),
            "decoder": sess.decoder.__dict__,
            "telemetry": sess.telemetry,
            "frames_seen": sess.frames_seen,
            "blocks_seen": sess.blocks_seen,
        }
    payload = {
        "version": FORMAT_VERSION,
        "fleet": True,
        "n_bins": fleet.n_bins,
        "block_len": fleet.block_len,
        "pfb_state": _to_host(fleet.pfb_state),
        "groups": groups,
    }
    with open(path, "wb") as f:
        pickle.dump(payload, f)


def load_fleet(fleet, path: str) -> None:
    """Restore a fleet snapshot into a freshly constructed FleetSession
    with the same channel map; raises on layout mismatch."""
    with open(path, "rb") as f:
        payload = pickle.load(f)
    if payload.get("version") != FORMAT_VERSION or not payload.get("fleet"):
        raise ValueError("not a fleet checkpoint of a supported version")
    for key in ("n_bins", "block_len"):
        if payload[key] != getattr(fleet, key):
            raise ValueError(f"checkpoint {key}={payload[key]!r} != fleet "
                             f"{key}={getattr(fleet, key)!r}")
    if set(payload["groups"]) != set(fleet.groups):
        raise ValueError(f"checkpoint groups {sorted(payload['groups'])} != "
                         f"fleet groups {sorted(fleet.groups)}")
    fleet.pfb_state = payload["pfb_state"]
    for sonde, g in payload["groups"].items():
        idxs, sess = fleet.groups[sonde]
        if list(idxs) != g["idxs"]:
            raise ValueError(f"channel layout changed for group {sonde!r}")
        sess.state = g["pipeline_state"]
        sess.decoder.__dict__.update(g["decoder"])
        sess.telemetry = g["telemetry"]
        sess.frames_seen = g["frames_seen"]
        sess.blocks_seen = g["blocks_seen"]
