"""Protocol spec, decoder/modulator base classes, and the sonde registry.

The registry is the framework's analogue of the reference's supported-types
table (main.hpp:44-52: display name + channel bandwidth + decoder block).
Each sonde module defines:

- ``SPEC``: static physical/framing parameters the pipeline builder uses to
  compile the per-type device chain (rates, syncword, frame size, line code);
- a decoder class (host-side byte/parse stage; per-channel calibration
  state), consuming hard chips gathered on-device;
- a modulator (synthesizes golden IQ for tests/benchmarks, SURVEY.md §4).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from sondetpu.telemetry import TelemetryFragment


@dataclass(frozen=True)
class ProtocolSpec:
    name: str                 # registry key, e.g. "rs41"
    display_name: str         # UI name, matching main.hpp:44-52
    bandwidth: float          # channel bandwidth, Hz (main.hpp:44-52)
    baud: float               # symbol rate on air, Bd
    modulation: str           # "gfsk" | "fsk" | "afsk"
    syncword: bytes           # on-air sync pattern (scrambled domain)
    lsb_first: bool           # on-air bit order within bytes
    frame_bytes: int          # frame length in bytes incl. syncword
    line_code: str = "nrz"    # "nrz" | "manchester" | "biphase_m"
    deviation: Optional[float] = None   # FSK deviation; default bandwidth/2
    afsk_mark: Optional[float] = None   # AFSK tone frequencies
    afsk_space: Optional[float] = None
    extra: dict = field(default_factory=dict)

    @property
    def dev(self) -> float:
        return self.deviation if self.deviation is not None else self.bandwidth / 2.0

    @property
    def chips_per_frame(self) -> int:
        """On-air chips per frame (after any line-code expansion)."""
        mult = 2 if self.line_code in ("manchester", "biphase_m") else 1
        return self.frame_bytes * 8 * mult

    def sync_chip_template(self, syncword: "bytes | None" = None,
                           bits: "np.ndarray | None" = None) -> "np.ndarray":
        """+/-1 chip-domain correlation template for the syncword.

        For line-coded protocols the template is the chip expansion of the
        sync bytes; biphase-M is polarity-ambiguous (level-dependent), so
        its users also set extra['abs_corr'] and the correlator thresholds
        on |corr|. Pass ``syncword`` to build the template of a subtype's
        alternate sync (extra['alt_syncword'], e.g. M20 on the M10 channel),
        or ``bits`` for a raw on-air bit pattern that is not byte-aligned
        (extra['sync_bits'], e.g. iMet-4's async-serial packet headers).
        """
        from sondetpu.sync.coding import np_bytes_to_bits

        if bits is None and syncword is None:
            bits = self.extra.get("sync_bits")
        if bits is not None:
            bits = np.asarray(bits, dtype=np.float32)
        else:
            bits = np_bytes_to_bits(
                np.frombuffer(syncword or self.syncword, dtype=np.uint8),
                self.lsb_first)
        if self.line_code == "manchester":
            chips = np.empty(bits.size * 2, dtype=np.float32)
            chips[0::2] = bits
            chips[1::2] = 1 - bits
        elif self.line_code == "biphase_m":
            chips = np.empty(bits.size * 2, dtype=np.float32)
            level = 0
            for k, b in enumerate(bits):
                level ^= 1
                chips[2 * k] = level
                if b:
                    level ^= 1
                chips[2 * k + 1] = level
        else:
            chips = bits.astype(np.float32)
        return chips * 2.0 - 1.0


class SondeDecoderBase:
    """Host-side frame decoder: chips -> bytes -> telemetry fragments.

    Subclasses hold per-channel calibration/reassembly state, mirroring how
    sondedump decoders accumulate calibration subframes across many frames
    (reference decoder.hpp:85-86).
    """

    spec: ProtocolSpec

    def decode_chip_frames(self, chips: np.ndarray, channels: np.ndarray
                           ) -> List[Tuple[int, TelemetryFragment]]:
        """chips: [n_frames, chips_per_frame] uint8 hard decisions aligned at
        the syncword; channels: [n_frames] channel ids. Returns a list of
        (channel, fragment)."""
        raise NotImplementedError

    def reset_channel(self, channel: int) -> None:
        """Drop per-channel state (failure recovery, SURVEY.md §5.3)."""


_REGISTRY: Dict[str, dict] = {}


def register_sonde(name: str, spec: ProtocolSpec, decoder_cls, modulator_cls):
    _REGISTRY[name] = {"spec": spec, "decoder": decoder_cls, "modulator": modulator_cls}


def get_sonde(name: str) -> dict:
    if name not in _REGISTRY:
        raise KeyError(f"unknown sonde type {name!r}; have {sorted(_REGISTRY)}")
    return _REGISTRY[name]
