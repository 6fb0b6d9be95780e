"""Mixed-fleet decoding: heterogeneous sonde types over one wideband input.

BASELINE.json:11 ("Mixed-fleet wideband: 1000+ heterogeneous channels"):
the reference handles multiple sondes by running one module instance per
sonde, each with its own VFO and threads (main.cpp:23); here ONE PFB
channelizer splits the wideband stream and channels are grouped by sonde
type, each group advancing through its type's compiled pipeline as a
batch. Each per-type step is an independent device program, so groups
pipeline naturally on the device queue.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Sequence, Tuple

import numpy as np

from sondetpu.dsp.channelizer import PFBChannelizer
from sondetpu.runtime.pipeline import PipelineConfig
from sondetpu.sondes.base import get_sonde
from sondetpu.runtime.session import DecoderSession
from sondetpu.telemetry import SondeTelemetry


@dataclass
class FleetChannel:
    """One logical channel: which PFB bin, which protocol, and the fine
    frequency offset below the PFB grid (the reference VFO's free tuning,
    main.cpp:56)."""

    pfb_bin: int
    sonde: str
    offset_hz: float = 0.0


class FleetSession:
    """Wideband IQ -> channelize -> per-type batched decode sessions."""

    def __init__(self, channels: Sequence[FleetChannel], n_bins: int,
                 fs_chan: float = 48000.0, block_len: int = 48000,
                 sync_threshold: float = 0.55, use_pallas: bool = None,
                 on_update=None, mesh=None, compute_dtype: str = "f32",
                 afc: bool = False, pipelined: bool = False,
                 fused: bool = None):
        import jax as _jax
        import jax.numpy as _jnp
        self.channels = list(channels)
        self.pfb = PFBChannelizer(n_bins)
        self.pfb_state = self.pfb.init_state()
        self.block_len = block_len
        self.n_bins = n_bins
        self.fs_chan = fs_chan
        # use_pallas defaults to the backend: every family has a fused
        # kernel path since r5, so a real TPU engages them; CPU (tests,
        # dev) keeps the XLA twins unless interpret-mode kernels are
        # explicitly requested with use_pallas=True
        if use_pallas is None:
            use_pallas = _jax.default_backend() in ("tpu", "axon")
        self.use_pallas = bool(use_pallas)

        # group logical channels by sonde type; remember their PFB bins
        groups: Dict[str, List[int]] = {}
        for idx, ch in enumerate(self.channels):
            groups.setdefault(ch.sonde, []).append(idx)
        self.groups: Dict[str, Tuple[List[int], DecoderSession]] = {}
        self._group_pad: Dict[str, int] = {}
        for sonde, idxs in groups.items():
            offs = tuple(self.channels[i].offset_hz for i in idxs)
            spec = get_sonde(sonde)["spec"]
            # kernel channel tiles need the group size to divide by 8; a
            # real fleet's mix is arbitrary, so PAD the group with dummy
            # channels (duplicates of its first bin) rather than silently
            # dropping the whole group to the jnp path. Dummy rows decode
            # garbage that is discarded by the local-index guards in
            # _wrap/telemetry; their cost is <= 7 channels per group.
            pad = (-len(idxs)) % 8 if use_pallas else 0
            self._group_pad[sonde] = pad
            offs_p = offs + (0.0,) * pad
            # bf16 applies per group: AFSK groups fall back to f32
            group_cdt = ("f32" if spec.modulation == "afsk" or use_pallas
                         else compute_dtype)
            # afc applies per group (AFSK included: the discriminator-DC
            # loop tracks carrier offset for tone pairs too — pipeline.py);
            # since r5 it also coexists with the fused Pallas kernels
            # (they export the DC / rotation sums the loop feeds on)
            group_afc = afc
            cfg = PipelineConfig(sonde=sonde, channels=len(idxs) + pad,
                                 fs=fs_chan, block_len=block_len,
                                 sync_threshold=sync_threshold,
                                 use_pallas=use_pallas,
                                 compute_dtype=group_cdt,
                                 afc=group_afc,
                                 fine_offsets=offs_p if any(offs_p) else None)
            # shard a group over the mesh when its channel count divides the
            # mesh size; smaller groups stay single-device (heterogeneous
            # fleets mix both, BASELINE.json:11)
            group_mesh = mesh if (mesh is not None
                                  and len(idxs) % mesh.devices.size == 0) else None
            # pipelined groups: every group's next step is dispatched before
            # any packed readback, so the (RTT-dominated) readbacks of block
            # k overlap the device's block k+1 across ALL groups
            sess = DecoderSession(cfg, on_update=self._wrap(sonde, idxs, on_update),
                                  mesh=group_mesh, pipelined=pipelined)
            self.groups[sonde] = (idxs, sess)
        # per-group device-side bin gathers: the channelized planes never
        # round-trip through the host (the PFB output stays device-resident
        # and each group takes its rows with a baked-constant jnp.take)
        self._gathers = {}
        for sonde, (idxs, _sess) in self.groups.items():
            bins = self._group_bins(sonde, idxs)

            def take(yi, yq, _b=bins):
                k = _jnp.asarray(_b)
                return _jnp.take(yi, k, axis=0), _jnp.take(yq, k, axis=0)

            self._gathers[sonde] = _jax.jit(take)

        # FUSED fleet step: PFB + every group's bin gather + every group's
        # front end traced into ONE device program, with all groups' packed
        # outputs concatenated into ONE flat readback buffer. The unfused
        # path costs ~(1 + 2 * n_groups) dispatches and n_groups
        # synchronizing readbacks per block; over an RTT-dominated device
        # link (23 ms floor here) those dominated the measured fleet step
        # (VERDICT r3: 18x per-sample gap vs the single-type path). With
        # pipelined=True the fused readback additionally overlaps the next
        # block's compute (updates then lag one block; pipelined=False
        # keeps same-block updates and reads back synchronously).
        if fused is None:
            fused = mesh is None and _jax.process_count() == 1
        self._fused = bool(fused) and mesh is None and _jax.process_count() == 1
        self.pipelined = bool(pipelined)
        self._pending = None
        if self._fused:
            self._order = []                      # [(sonde, bins, sess)]
            for sonde, (idxs, sess) in self.groups.items():
                self._order.append((sonde, self._group_bins(sonde, idxs),
                                    sess))
            pfb = self.pfb

            def fused_impl(pfb_state, states, wi, wq):
                # single tile-selection authority (PFBChannelizer): a
                # duplicated copy desynced once and the fused path
                # silently took the XLA slice-sum twin on TPU
                tile = pfb.select_tile(wi.shape[-1] // pfb.n)
                pfb_state, yi, yq = pfb._impl(pfb_state, wi, wq, tile=tile)
                new_states, packeds, frames = [], [], []
                for (sonde, bins, sess), st in zip(self._order, states):
                    k = _jnp.asarray(bins)
                    gi = _jnp.take(yi, k, axis=0)
                    gq = _jnp.take(yq, k, axis=0)
                    st2, out = sess.pipeline._step_impl(
                        st, gi.astype(_jnp.float32), gq.astype(_jnp.float32))
                    new_states.append(st2)
                    packeds.append(out.packed)
                    frames.append(out.frames)
                return (pfb_state, tuple(new_states),
                        _jnp.concatenate(packeds), tuple(frames))

            self._fused_step = _jax.jit(fused_impl, donate_argnums=(0, 1))
            self._states = tuple(sess.state for _, _, sess in self._order)

    def _group_bins(self, sonde: str, idxs: List[int]) -> np.ndarray:
        """PFB bin indices a group gathers, padded with duplicates of its
        first bin for the dummy kernel-tile channels (_group_pad)."""
        bins = [self.channels[i].pfb_bin for i in idxs]
        bins += [bins[0]] * self._group_pad.get(sonde, 0)
        return np.asarray(bins, np.int32)

    def _wrap(self, sonde: str, idxs: List[int], on_update):
        if on_update is None:
            return None

        def inner(local_ch: int, telem: SondeTelemetry):
            if local_ch < len(idxs):       # dummy pad channels are dropped
                on_update(idxs[local_ch], sonde, telem)

        return inner

    @property
    def telemetry(self) -> Dict[int, SondeTelemetry]:
        """Telemetry keyed by logical (fleet) channel index."""
        out = {}
        for sonde, (idxs, sess) in self.groups.items():
            for local, t in sess.telemetry.items():
                if local < len(idxs):      # dummy pad channels are dropped
                    out[idxs[local]] = t
        return out

    def flush(self) -> int:
        """Drain every pipelined group's pending block (call at end of
        stream — without it the final block's frames are dropped)."""
        if self._fused:
            pending, self._pending = self._pending, None
            return self._consume(pending) if pending is not None else 0
        return sum(len(sess.flush()) for _, sess in self.groups.values())

    def _consume(self, pending) -> int:
        """Read one fused block's concatenated packed buffer (ONE device ->
        host transfer for the whole fleet) and run every group's host-side
        FEC/parse/merge on its slice."""
        import time as _time
        packed_all, frames = pending
        host = np.asarray(packed_all)
        updates = 0
        off = 0
        for (sonde, bins, sess), frames_k in zip(self._order, frames):
            t0 = _time.perf_counter()
            c = sess.config
            nbytes = c.channels * c.packed_row_bytes
            from sondetpu.runtime.pipeline import BlockOutput
            out = BlockOutput(frames=frames_k, frame_valid=None,
                              frame_score=None, soft_rms=None, rs_clean=None,
                              packed=host[off:off + nbytes])
            off += nbytes
            sess.blocks_seen += 1
            ups, frames_raw, decoded, soft_rms = sess._handle_output(out)
            sess.metrics.on_block(c.block_len, _time.perf_counter() - t0,
                                  frames_raw, decoded, len(ups), soft_rms)
            updates += len(ups)
        return updates

    def process_wideband(self, iq: np.ndarray) -> int:
        """One wideband block [n_bins * block_len] complex64 (or plane
        pair). Returns total telemetry updates."""
        if isinstance(iq, tuple):
            wi, wq = iq
        else:
            from sondetpu.io.iq import c64_to_planes
            wi, wq = c64_to_planes(np.asarray(iq))   # native deinterleaver
        if self._fused:
            # read each group's CURRENT session state (not a cached tuple):
            # a reset_channel / checkpoint-restore between blocks replaces
            # sess.state, and the fused step must see the replacement
            self._states = tuple(sess.state for _, _, sess in self._order)
            self.pfb_state, self._states, packed_all, frames = \
                self._fused_step(self.pfb_state, self._states, wi, wq)
            # sessions see their live state (checkpoint/afc introspection)
            for (sonde, bins, sess), st in zip(self._order, self._states):
                sess.state = st
            if not self.pipelined:
                return self._consume((packed_all, frames))
            # pipelined: block k's (RTT-dominated) readback overlaps the
            # device's block k+1 — updates lag the input by one block
            pending, self._pending = self._pending, (packed_all, frames)
            return self._consume(pending) if pending is not None else 0
        self.pfb_state, yi, yq = self.pfb(self.pfb_state, wi, wq)
        # yi/yq stay ON DEVICE: each group's rows are gathered device-side
        # and fed straight into its compiled step — the only host transfer
        # per block is each group's packed frame readback
        updates = 0
        for sonde, (idxs, sess) in self.groups.items():
            # N>=2 processes: the PFB runs process-locally (every process
            # ingests the same wideband stream); shard_channels assembles
            # the cross-process global array from these local DEVICE
            # planes with make_array_from_single_device_arrays — the
            # channelized samples never round-trip through the host
            gi, gq = self._gathers[sonde](yi, yq)
            updates += len(sess.process_block((gi, gq)))
        return updates
