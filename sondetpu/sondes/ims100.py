"""Meisei iMS-100 / RS-11G protocol: GFSK + BCH(63,51) + interleaved halves.

Re-creates sondedump's Meisei decoder capability (SURVEY.md S4; reference
API decoder.hpp:10; BCH FEC per BASELINE.json:10; 20 kHz shared channel
entry "iMS100/RS-11G" per main.hpp:47; GPS+T+RH per README.md:14-15).

As implemented: 2400 Bd GFSK NRZ; each frame carries 6 BCH(63,51)
codewords (t=2 over GF(2^6), fec/bch.py) packed big-endian into 48 bytes
after a 4-byte sync; the 38-byte corrected payload alternates between EVEN
(position) and ODD (PTU/serial) half-frames — the protocol's interleaved
even/odd structure (SURVEY.md S4) — reassembled per channel across frames.
Field offsets are this framework's definition (modulator/parser-consistent;
re-verify against recorded IQ per SURVEY.md §7).

  frame (52B): 0x00 4B sync 0xAA 0xB4 0x2B 0x51; 0x04 48B = 6 x 63-bit BCH
    codewords (bit-packed, 378 bits + 6 pad bits).
  payload (38B, after BCH): [half u8] then:
    EVEN half: u32 tow_ms, u16 week, i32 lat 1e-7, i32 lon 1e-7, i32 alt cm,
      u16 speed cm/s, u16 heading cdeg, i16 climb cm/s, u16 frame_no
    ODD half:  8B serial ASCII, u16 temp cK*10, u16 rh c%, u16 frame_no
"""

from __future__ import annotations

import struct
from typing import Dict, List, Tuple

import numpy as np

from sondetpu.fec.bch import BCH_63_51
from sondetpu.sondes import geo
from sondetpu.sondes.base import ProtocolSpec, SondeDecoderBase, register_sonde
from sondetpu.sondes.modulate import gfsk_modulate
from sondetpu.sync.coding import np_bits_to_bytes, np_bytes_to_bits
from sondetpu.telemetry import Fields, TelemetryFragment

BAUD = 2400.0
FRAME_BYTES = 52
SYNCWORD = bytes([0xAA, 0xB4, 0x2B, 0x51])
N_CW = 6
PAYLOAD_BYTES = 38   # 6 * 51 = 306 bits -> 38 bytes (2 pad bits)

SPEC = ProtocolSpec(
    name="ims100",
    display_name="iMS100/RS-11G",
    bandwidth=2e4,            # main.hpp:47
    baud=BAUD,
    modulation="gfsk",
    syncword=SYNCWORD,
    lsb_first=False,
    frame_bytes=FRAME_BYTES,
    line_code="nrz",
    deviation=2400.0,
)


def payload_to_codeword_bits(payload: np.ndarray) -> np.ndarray:
    """38-byte payload -> [6, 63] BCH codeword bit matrix."""
    bits = np_bytes_to_bits(np.asarray(payload, np.uint8))  # 304 bits
    msg = np.zeros((N_CW, 51), dtype=np.uint8)
    flat = np.zeros(N_CW * 51, dtype=np.uint8)
    flat[:bits.size] = bits
    msg[:] = flat.reshape(N_CW, 51)
    return BCH_63_51.encode(msg)


def codeword_bits_to_payload(cw_bits: np.ndarray) -> Tuple[np.ndarray, bool]:
    """[6, 63] received codeword bits -> (payload 38B, ok)."""
    corrected, _, ok = BCH_63_51.decode(cw_bits)
    if not ok.all():
        return np.zeros(PAYLOAD_BYTES, np.uint8), False
    msg = corrected[:, :51].reshape(-1)[:PAYLOAD_BYTES * 8]
    return np_bits_to_bytes(msg), True


class IMS100Decoder(SondeDecoderBase):
    spec = SPEC

    def __init__(self):
        self._halves: Dict[int, Dict[int, bytes]] = {}

    def reset_channel(self, channel: int) -> None:
        self._halves.pop(channel, None)

    def decode_byte_frames(self, frames: np.ndarray, channels
                           ) -> List[Tuple[int, TelemetryFragment]]:
        frames = np.atleast_2d(np.asarray(frames, dtype=np.uint8))
        out = []
        for fi in range(frames.shape[0]):
            f = frames[fi]
            ch = int(np.asarray(channels)[fi])
            if f[:4].tobytes() != SYNCWORD:
                continue
            bits = np_bytes_to_bits(f[4:4 + 48])[: N_CW * 63].reshape(N_CW, 63)
            payload, ok = codeword_bits_to_payload(bits)
            if not ok:
                continue
            frag = self._parse_payload(payload, ch)
            if frag is not None and frag.fields:
                out.append((ch, frag))
        return out

    def _parse_payload(self, p: np.ndarray, ch: int) -> TelemetryFragment:
        frag = TelemetryFragment()
        half = int(p[0]) & 1
        halves = self._halves.setdefault(ch, {})
        halves[half] = p.tobytes()
        if half == 0:
            tow_ms, week = struct.unpack("<IH", p[1:7].tobytes())
            lat, lon, alt_cm = struct.unpack("<iii", p[7:19].tobytes())
            spd, hdg = struct.unpack("<HH", p[19:23].tobytes())
            climb, = struct.unpack("<h", p[23:25].tobytes())
            frag.time = float(geo.gps_time_to_utc(week, tow_ms / 1000.0))
            frag.fields |= Fields.TIME
            if not (lat == 0 and lon == 0):
                frag.lat, frag.lon, frag.alt = lat * 1e-7, lon * 1e-7, alt_cm / 100.0
                frag.speed = spd / 100.0
                frag.heading = hdg / 100.0
                frag.climb = climb / 100.0
                frag.fields |= Fields.POS | Fields.SPEED
            frag.seq, = struct.unpack("<H", p[25:27].tobytes())
            frag.fields |= Fields.SEQ
        else:
            serial = p[1:9].tobytes().decode("ascii", errors="replace").strip("\x00 ")
            if serial:
                frag.serial = serial
                frag.fields |= Fields.SERIAL
            t_raw, rh_raw = struct.unpack("<HH", p[9:13].tobytes())
            frag.temp = t_raw / 100.0 - 273.15
            frag.rh = rh_raw / 100.0          # iMS-100 carries RH (README.md:14)
            frag.pressure = 0.0
            frag.calib_percent = 100.0
            frag.fields |= Fields.PTU
            frag.seq, = struct.unpack("<H", p[13:15].tobytes())
            frag.fields |= Fields.SEQ
        return frag


class IMS100Truth:
    def __init__(self, serial="IMS10001", frame_no=1, lat=35.7, lon=139.7,
                 alt=18000.0, speed=20.0, heading=45.0, climb=4.0,
                 temp=-60.0, rh=8.0, time_utc=1.7e9):
        self.serial, self.frame_no = serial, frame_no
        self.lat, self.lon, self.alt = lat, lon, alt
        self.speed, self.heading, self.climb = speed, heading, climb
        self.temp, self.rh, self.time_utc = temp, rh, time_utc


class IMS100Modulator:
    spec = SPEC

    def build_frame(self, t: IMS100Truth, half: int) -> np.ndarray:
        p = np.zeros(PAYLOAD_BYTES, dtype=np.uint8)
        p[0] = half & 1
        if half % 2 == 0:
            week, tow = geo.utc_to_gps_time(t.time_utc)
            p[1:7] = np.frombuffer(struct.pack(
                "<IH", int(round(tow * 1000)), int(week)), np.uint8)
            p[7:19] = np.frombuffer(struct.pack(
                "<iii", int(round(t.lat * 1e7)), int(round(t.lon * 1e7)),
                int(round(t.alt * 100))), np.uint8)
            p[19:23] = np.frombuffer(struct.pack(
                "<HH", int(round(t.speed * 100)),
                int(round(t.heading * 100)) % 36000), np.uint8)
            p[23:25] = np.frombuffer(struct.pack("<h", int(round(t.climb * 100))), np.uint8)
            p[25:27] = np.frombuffer(struct.pack("<H", t.frame_no & 0xFFFF), np.uint8)
        else:
            p[1:9] = np.frombuffer(t.serial.encode("ascii")[:8].ljust(8), np.uint8)
            p[9:13] = np.frombuffer(struct.pack(
                "<HH", int(round((t.temp + 273.15) * 100)),
                int(round(t.rh * 100))), np.uint8)
            p[13:15] = np.frombuffer(struct.pack("<H", t.frame_no & 0xFFFF), np.uint8)
        cw = payload_to_codeword_bits(p)                   # [6, 63]
        bits = np.zeros(48 * 8, dtype=np.uint8)
        bits[: N_CW * 63] = cw.reshape(-1)
        f = np.zeros(FRAME_BYTES, dtype=np.uint8)
        f[0:4] = np.frombuffer(SYNCWORD, np.uint8)
        f[4:52] = np_bits_to_bytes(bits)
        return f

    def modulate(self, truths: List[IMS100Truth], fs: float = 48000.0,
                 bt: float = 0.5) -> np.ndarray:
        """Alternating even/odd half-frames (interleaved structure, S4)."""
        frames = []
        for k, t in enumerate(truths):
            frames.append(self.build_frame(t, half=k % 2))
        bits = np_bytes_to_bits(np.stack(frames)).reshape(-1)
        return gfsk_modulate(bits, fs / BAUD, SPEC.dev / fs, bt=bt)


register_sonde("ims100", SPEC, IMS100Decoder, IMS100Modulator)
