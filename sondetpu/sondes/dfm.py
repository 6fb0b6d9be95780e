"""GRAW DFM06/09 protocol: Manchester + Hamming(8,4) + multi-subframe GPS.

Re-creates sondedump's DFM decoder capability (SURVEY.md S2; reference API
decoder.hpp:8; 2500 Bd + Hamming + multi-subframe per BASELINE.json:9;
channel bandwidth 15 kHz per main.hpp:46; GPS+T only, no RH, README.md:12).

Physical layer as implemented (structure follows the public DFM protocol
description — 2500 chips/s Manchester, Hamming(8,4)-protected nibbles,
GPS fields split across numbered data subframes; byte-level offsets are this
framework's own definition, exactly shared by modulator and parser, and
marked for re-verification against recorded IQ per SURVEY.md §7):

  frame (63 bytes decoded, 1008 chips on air):
    0x00  4B  sync 0x9A 0x99 0x5A 0x55
    0x04  7B  CONF: Hamming(8,4) codewords of 7 nibbles:
              [channel u4][value u24]  (measurement channels, see below)
    0x0B 26B  DAT1: Hamming codewords of 26 nibbles = 13 data bytes:
              [subframe u4][pad u4][data 12B]
    0x25 26B  DAT2: same structure
  CONF channels: 0 = temperature sensor counts u24, 1 = reference low,
    2 = reference high; T = -40 + 100 * (c0-c1)/(c2-c1) degC [framework
    definition]. No humidity (README.md:12).
  DAT subframes: 0: [frame_no u32][status u32][spare]
                 1: [utc_epoch_ms u48][spare]
                 2: [lat 1e-7 deg i32][hspeed cm/s u16]...
                 3: [lon 1e-7 deg i32][heading cdeg u16]
                 4: [alt cm i32][climb cm/s i16]
                 5: [serial 8 ASCII][spare]
"""

from __future__ import annotations

import struct
from typing import Dict, List, Optional, Tuple

import numpy as np

from sondetpu.fec.hamming import hamming84_decode, hamming84_encode
from sondetpu.sondes.base import ProtocolSpec, SondeDecoderBase, register_sonde
from sondetpu.sondes.modulate import gfsk_modulate
from sondetpu.sync.coding import np_bytes_to_bits
from sondetpu.telemetry import Fields, TelemetryFragment

CHIP_RATE = 2500.0            # on-air Manchester chip rate (BASELINE.json:9)
FRAME_BYTES = 63
SYNCWORD = bytes([0x9A, 0x99, 0x5A, 0x55])
CONF_OFF, DAT1_OFF, DAT2_OFF = 4, 11, 37

SPEC = ProtocolSpec(
    name="dfm",
    display_name="DFM06/09",
    bandwidth=1.5e4,          # main.hpp:46
    baud=CHIP_RATE,
    modulation="gfsk",
    syncword=SYNCWORD,
    lsb_first=False,
    frame_bytes=FRAME_BYTES,
    line_code="manchester",
    deviation=2500.0,
)

T_BASE, T_SPAN = -40.0, 100.0   # CONF temperature mapping [framework def.]


class DFMDecoder(SondeDecoderBase):
    """Host-side DFM frame decoder with per-channel subframe reassembly."""

    spec = SPEC

    def __init__(self):
        # per channel: accumulated GPS/PTU pieces (subframe reassembly is the
        # defining feature of the DFM protocol, BASELINE.json:9)
        self._conf: Dict[int, Dict[int, int]] = {}
        self._sub: Dict[int, Dict[int, bytes]] = {}

    def reset_channel(self, channel: int) -> None:
        self._conf.pop(channel, None)
        self._sub.pop(channel, None)

    def decode_byte_frames(self, frames: np.ndarray, channels
                           ) -> List[Tuple[int, TelemetryFragment]]:
        frames = np.atleast_2d(np.asarray(frames, dtype=np.uint8))
        out: List[Tuple[int, TelemetryFragment]] = []
        for fi in range(frames.shape[0]):
            ch = int(np.asarray(channels)[fi])
            frag = self._parse_frame(frames[fi], ch)
            if frag is not None and frag.fields:
                out.append((ch, frag))
        return out

    # -- internals ----------------------------------------------------------

    def _hamming_block(self, codewords: np.ndarray) -> Optional[np.ndarray]:
        nibbles, ok = hamming84_decode(codewords)
        if not ok.all():
            return None
        return nibbles

    def _parse_frame(self, f: np.ndarray, ch: int) -> Optional[TelemetryFragment]:
        if f[:4].tobytes() != SYNCWORD:
            return None
        frag = TelemetryFragment()
        conf = self._conf.setdefault(ch, {})
        subs = self._sub.setdefault(ch, {})

        cn = self._hamming_block(f[CONF_OFF:CONF_OFF + 7])
        if cn is not None:
            chan = int(cn[0])
            val = (int(cn[1]) << 20 | int(cn[2]) << 16 | int(cn[3]) << 12
                   | int(cn[4]) << 8 | int(cn[5]) << 4 | int(cn[6]))
            conf[chan] = val
            self._emit_ptu(conf, frag)

        for off in (DAT1_OFF, DAT2_OFF):
            dn = self._hamming_block(f[off:off + 26])
            if dn is None:
                continue
            data = bytes((int(dn[2 * i]) << 4) | int(dn[2 * i + 1]) for i in range(13))
            subs[data[0] >> 4] = data[1:]
        self._emit_gps(subs, frag)
        return frag

    def _emit_ptu(self, conf: Dict[int, int], frag: TelemetryFragment) -> None:
        if not all(k in conf for k in (0, 1, 2)):
            return
        c0, c1, c2 = conf[0], conf[1], conf[2]
        if c2 == c1:
            return
        temp = T_BASE + T_SPAN * (c0 - c1) / (c2 - c1)
        frag.temp = float(temp)
        frag.rh = float("nan")           # DFM has no humidity sensor
        frag.pressure = 0.0
        frag.calib_percent = 100.0 * len([k for k in (0, 1, 2) if k in conf]) / 3
        frag.fields |= Fields.PTU

    def _emit_gps(self, subs: Dict[int, bytes], frag: TelemetryFragment) -> None:
        if 0 in subs:
            frag.seq = struct.unpack("<I", subs[0][0:4])[0]
            frag.fields |= Fields.SEQ
        if 1 in subs:
            ms = int.from_bytes(subs[1][0:6], "little")
            frag.time = ms / 1000.0
            frag.fields |= Fields.TIME
        if 5 in subs:
            serial = subs[5][0:8].decode("ascii", errors="replace").strip("\x00 ")
            if serial:
                frag.serial = serial
                frag.fields |= Fields.SERIAL
        if all(k in subs for k in (2, 3, 4)):
            lat = struct.unpack("<i", subs[2][0:4])[0] * 1e-7
            hspd = struct.unpack("<H", subs[2][4:6])[0] / 100.0
            lon = struct.unpack("<i", subs[3][0:4])[0] * 1e-7
            hdg = struct.unpack("<H", subs[3][4:6])[0] / 100.0
            alt = struct.unpack("<i", subs[4][0:4])[0] / 100.0
            climb = struct.unpack("<h", subs[4][4:6])[0] / 100.0
            if not (lat == 0 and lon == 0):
                frag.lat, frag.lon, frag.alt = lat, lon, alt
                frag.speed, frag.heading, frag.climb = hspd, hdg, climb
                frag.fields |= Fields.POS | Fields.SPEED


class DFMTruth:
    def __init__(self, serial="D1234567", frame_no=1, lat=47.0, lon=8.5,
                 alt=8000.0, speed=12.0, heading=270.0, climb=3.5,
                 temp=-20.0, time_utc=1.7e9):
        self.serial, self.frame_no = serial, frame_no
        self.lat, self.lon, self.alt = lat, lon, alt
        self.speed, self.heading, self.climb = speed, heading, climb
        self.temp, self.time_utc = temp, time_utc


class DFMModulator:
    spec = SPEC

    REF_LOW, REF_HIGH = 100000, 900000

    def build_frame(self, truth: DFMTruth, conf_channel: int,
                    dat_pair: Tuple[int, int]) -> np.ndarray:
        """One frame carrying CONF channel ``conf_channel`` and the two DAT
        subframes in ``dat_pair`` (the protocol cycles through them)."""
        f = np.zeros(FRAME_BYTES, dtype=np.uint8)
        f[0:4] = np.frombuffer(SYNCWORD, np.uint8)

        vals = {0: int(self.REF_LOW + (truth.temp - T_BASE) / T_SPAN
                       * (self.REF_HIGH - self.REF_LOW)),
                1: self.REF_LOW, 2: self.REF_HIGH}
        v = vals.get(conf_channel, 0)
        nib = [conf_channel] + [(v >> s) & 0xF for s in (20, 16, 12, 8, 4, 0)]
        f[CONF_OFF:CONF_OFF + 7] = hamming84_encode(np.array(nib, np.uint8))

        for off, sub in zip((DAT1_OFF, DAT2_OFF), dat_pair):
            data = self._subframe(sub, truth)
            payload = bytes([sub << 4]) + data
            nibs = []
            for b in payload:
                nibs += [b >> 4, b & 0xF]
            f[off:off + 26] = hamming84_encode(np.array(nibs, np.uint8))
        return f

    def _subframe(self, idx: int, t: DFMTruth) -> bytes:
        d = bytearray(12)
        if idx == 0:
            d[0:4] = struct.pack("<I", t.frame_no)
        elif idx == 1:
            d[0:6] = int(round(t.time_utc * 1000)).to_bytes(6, "little")
        elif idx == 2:
            d[0:4] = struct.pack("<i", int(round(t.lat * 1e7)))
            d[4:6] = struct.pack("<H", int(round(t.speed * 100)))
        elif idx == 3:
            d[0:4] = struct.pack("<i", int(round(t.lon * 1e7)))
            d[4:6] = struct.pack("<H", int(round(t.heading * 100)) % 36000)
        elif idx == 4:
            d[0:4] = struct.pack("<i", int(round(t.alt * 100)))
            d[4:6] = struct.pack("<h", int(round(t.climb * 100)))
        elif idx == 5:
            d[0:8] = t.serial.encode("ascii")[:8].ljust(8)
        return bytes(d)

    def frames_to_chips(self, frames: np.ndarray) -> np.ndarray:
        bits = np_bytes_to_bits(np.atleast_2d(frames), lsb_first=False)
        chips = np.empty(bits.shape[:-1] + (bits.shape[-1] * 2,), np.uint8)
        chips[..., 0::2] = bits
        chips[..., 1::2] = 1 - bits
        return chips.reshape(-1)

    def modulate(self, truths: List[DFMTruth], fs: float = 48000.0,
                 bt: float = 0.5) -> np.ndarray:
        """Back-to-back frames cycling CONF channels and DAT subframes."""
        frames = []
        for k, t in enumerate(truths):
            frames.append(self.build_frame(t, conf_channel=k % 3,
                                           dat_pair=((2 * k) % 6, (2 * k + 1) % 6)))
        chips = self.frames_to_chips(np.stack(frames))
        return gfsk_modulate(chips, fs / CHIP_RATE, SPEC.dev / fs, bt=bt)


register_sonde("dfm", SPEC, DFMDecoder, DFMModulator)
