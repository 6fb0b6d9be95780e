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

FORMAT_VERSION = 2    # v2: TrackedSonde carries (pfb_bin, seed_offset_hz)
                      # identity; fleet group payloads record layout


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def _check_state_layout(saved, current, what: str) -> None:
    """The pipeline state layout is config-dependent (AFSK aux tails, DDC
    phase, AFC frequency) — a checkpoint saved under one config must not
    silently restore into another (e.g. --afc toggled between runs)."""
    s_leaves, s_def = jax.tree.flatten(saved)
    c_leaves, c_def = jax.tree.flatten(current)
    if s_def != c_def:
        raise ValueError(
            f"{what}: checkpoint state layout {s_def} != session {c_def} "
            "(config mismatch — e.g. afc/fine_offsets toggled?)")
    for i, (s, c) in enumerate(zip(s_leaves, c_leaves)):
        if np.shape(s) != np.shape(c):
            raise ValueError(
                f"{what}: state leaf {i} shape {np.shape(s)} != "
                f"{np.shape(c)} (config mismatch — e.g. afc/fine_offsets "
                "toggled, or a pre-r4 checkpoint of a dual-tone family: "
                "the m10/ims100/mrzn1 front end now carries 4 mixed "
                "planes per channel in fir.tail, so old checkpoints of "
                "those families cannot restore)")
        s_dt, c_dt = np.asarray(s).dtype, np.asarray(c).dtype
        if s_dt != c_dt:
            raise ValueError(
                f"{what}: state leaf {i} dtype {s_dt} != {c_dt} "
                "(compute_dtype mismatch?)")


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
    # v1 single-session payloads are layout-identical to v2 (only the fleet/
    # autofleet payloads gained fields in v2); _check_state_layout below
    # guards real mismatches, so accept both.
    if payload["version"] not in (1, FORMAT_VERSION):
        raise ValueError(f"checkpoint version {payload['version']} unsupported")
    for key in ("sonde", "channels", "block_len"):
        have = getattr(session.config, key)
        want = payload[key]
        if have != want:
            raise ValueError(f"checkpoint {key}={want!r} != session {key}={have!r}")
    _check_state_layout(payload["pipeline_state"], session.state, "session")
    session.state = payload["pipeline_state"]
    session.decoder.__dict__.update(payload["decoder"])
    session.telemetry = payload["telemetry"]
    session.frames_seen = payload["frames_seen"]
    session.blocks_seen = payload["blocks_seen"]


def _fleet_payload(fleet) -> dict:
    groups = {}
    for sonde, (idxs, sess) in fleet.groups.items():
        groups[sonde] = {
            "idxs": list(idxs),
            "layout": [(fleet.channels[i].pfb_bin, fleet.channels[i].offset_hz)
                       for i in idxs],
            "pipeline_state": _to_host(sess.state),
            "decoder": sess.decoder.__dict__,
            "telemetry": sess.telemetry,
            "frames_seen": sess.frames_seen,
            "blocks_seen": sess.blocks_seen,
        }
    return {
        "version": FORMAT_VERSION,
        "fleet": True,
        "n_bins": fleet.n_bins,
        "block_len": fleet.block_len,
        "pfb_state": _to_host(fleet.pfb_state),
        "groups": groups,
    }


def save_fleet(fleet, path: str) -> None:
    """Snapshot a FleetSession: the PFB channelizer carry plus every
    per-type group's full session payload (keyed by sonde type)."""
    with open(path, "wb") as f:
        pickle.dump(_fleet_payload(fleet), f)


def load_fleet(fleet, path: str) -> None:
    """Restore a fleet snapshot into a freshly constructed FleetSession
    with the same channel map; raises on layout mismatch."""
    with open(path, "rb") as f:
        payload = pickle.load(f)
    _restore_fleet(fleet, payload)


def _restore_fleet(fleet, payload: dict) -> None:
    if payload.get("version") != FORMAT_VERSION or not payload.get("fleet"):
        raise ValueError("not a fleet checkpoint of a supported version")
    for key in ("n_bins", "block_len"):
        if payload[key] != getattr(fleet, key):
            raise ValueError(f"checkpoint {key}={payload[key]!r} != fleet "
                             f"{key}={getattr(fleet, key)!r}")
    if set(payload["groups"]) != set(fleet.groups):
        raise ValueError(f"checkpoint groups {sorted(payload['groups'])} != "
                         f"fleet groups {sorted(fleet.groups)}")
    # validate EVERY group before mutating anything: a half-restored fleet
    # (pfb carry + some groups new, others old) would run desynced if the
    # caller catches the error and carries on
    for sonde, g in payload["groups"].items():
        idxs, sess = fleet.groups[sonde]
        layout = [(fleet.channels[i].pfb_bin, fleet.channels[i].offset_hz)
                  for i in idxs]
        if list(idxs) != g["idxs"] or layout != g.get("layout", layout):
            raise ValueError(f"channel layout changed for group {sonde!r}")
        _check_state_layout(g["pipeline_state"], sess.state,
                            f"fleet group {sonde!r}")
    fleet.pfb_state = payload["pfb_state"]
    for sonde, g in payload["groups"].items():
        idxs, sess = fleet.groups[sonde]
        sess.state = g["pipeline_state"]
        sess.decoder.__dict__.update(g["decoder"])
        sess.telemetry = g["telemetry"]
        sess.frames_seen = g["frames_seen"]
        sess.blocks_seen = g["blocks_seen"]


def save_autofleet(auto, path: str) -> None:
    """Snapshot an AutoFleet: the tracked-carrier list (with last-known
    telemetry) plus the underlying fleet's full payload."""
    payload = {
        "version": FORMAT_VERSION,
        "autofleet": True,
        "n_bins": auto.n_bins,
        "block_len": auto.block_len,
        "blocks_seen": auto.blocks_seen,
        "tracked": list(auto.tracked),    # TrackedSonde dataclasses pickle
        "fleet_payload": _fleet_payload(auto.fleet)
        if auto.fleet is not None else None,
    }
    with open(path, "wb") as f:
        pickle.dump(payload, f)


def load_autofleet(auto, path: str) -> None:
    """Restore an AutoFleet snapshot into a freshly constructed AutoFleet
    with matching n_bins/block_len: rebuilds the fleet from the tracked
    list, then restores every group's state."""
    with open(path, "rb") as f:
        payload = pickle.load(f)
    if payload.get("version") != FORMAT_VERSION or not payload.get("autofleet"):
        raise ValueError("not an autofleet checkpoint of a supported version")
    for key in ("n_bins", "block_len"):
        if payload[key] != getattr(auto, key):
            raise ValueError(f"checkpoint {key}={payload[key]!r} != autofleet "
                             f"{key}={getattr(auto, key)!r}")
    auto.tracked = list(payload["tracked"])
    auto.blocks_seen = payload["blocks_seen"]
    auto._rebuild()
    if payload["fleet_payload"] is not None:
        _restore_fleet(auto.fleet, payload["fleet_payload"])
