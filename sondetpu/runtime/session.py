"""Host-side decode session: device pipeline driver + telemetry aggregation.

Plays the role of the reference's decoder adapter + module glue
(decoder.hpp:53-119 run loop and main.cpp:321-331 sondeDataHandler): pulls
framed chips off the device, runs byte-level FEC/parse, merges fragments
into per-channel running telemetry, and fans out to sinks (GPX/PTU/JSONL).
"""

from __future__ import annotations

from dataclasses import replace
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from sondetpu.runtime.pipeline import BlockOutput, Pipeline, PipelineConfig
from sondetpu.sondes.base import get_sonde
from sondetpu.telemetry import SondeTelemetry, TelemetryFragment


class DecoderSession:
    """Streaming decode of [channels, block] IQ into telemetry updates."""

    def __init__(self, config: PipelineConfig,
                 on_update: Optional[Callable[[int, SondeTelemetry], None]] = None):
        self.config = config
        self.pipeline = Pipeline(config)
        self.state = self.pipeline.init_state()
        self.decoder = get_sonde(config.sonde)["decoder"]()
        self.telemetry: Dict[int, SondeTelemetry] = {}
        self.on_update = on_update
        self.frames_seen = 0
        self.blocks_seen = 0

    def reset_channel(self, channel: int) -> None:
        """Drop a channel's host state (elastic recovery, SURVEY.md §5.3);
        device state re-syncs on the next frames by itself."""
        self.decoder.reset_channel(channel)
        self.telemetry.pop(channel, None)

    def process_block(self, iq: np.ndarray) -> List[Tuple[int, SondeTelemetry]]:
        """iq: [channels, block_len] complex64. Returns telemetry updates."""
        self.state, out = self.pipeline.step(self.state, jnp.asarray(iq))
        self.blocks_seen += 1
        return self._handle_output(out)

    def _handle_output(self, out: BlockOutput) -> List[Tuple[int, SondeTelemetry]]:
        valid = np.asarray(out.frame_valid)
        if not valid.any():
            return []
        ch_idx, slot_idx = np.nonzero(valid)
        frames = np.asarray(out.frames)[ch_idx, slot_idx]     # [n, frame_chips]
        self.frames_seen += frames.shape[0]
        # frames arrive as descrambled bytes (packed + de-whitened on device)
        frags = self.decoder.decode_byte_frames(frames, ch_idx)
        updates: List[Tuple[int, SondeTelemetry]] = []
        for ch, frag in frags:
            telem = self.telemetry.setdefault(int(ch), SondeTelemetry())
            if telem.merge(frag):
                # snapshot: the live object keeps mutating on later frames
                snap = replace(telem)
                updates.append((int(ch), snap))
                if self.on_update:
                    self.on_update(int(ch), snap)
        return updates
