"""Meteomodem M10/M20 protocol: 9600 Bd biphase-M + checksum.

Re-creates sondedump's M10 decoder capability (SURVEY.md S3; reference API
decoder.hpp:11; 9600 Bd GFSK + Manchester/biphase deframe + checksum verify
per BASELINE.json:8; 50 kHz channel bandwidth per main.hpp:48; M10 has RH,
M20 does not, README.md:11,13).

As implemented: 9600 chips/s biphase-mark (polarity-free deframe), 101-byte
M10 frames / 70-byte M20 frames sharing a sync prefix; the publicly known
M10 header bytes 0x64 0x9F 0x20 identify the M10 subtype, 0x45 0x20 the M20
(rows verified against public decoder sources; field offsets below are this
framework's definition, modulator/parser-consistent, to re-verify against
recorded IQ per SURVEY.md §7). Checksum: the M10's rolling 16-bit checksum
(public algorithm, see :func:`m10_checksum`).

  M10 frame (101B): 0x00 2B sync 0xAA 0xAA; 0x02 0x64 0x9F 0x20 (type/len);
    0x05 u32 tow_ms; 0x09 u16 week; 0x0B i32 lat 1e-6 deg; 0x0F i32 lon;
    0x13 i32 alt cm; 0x17 3 x i16 vE,vN,vU cm/s; 0x1D u16 frame_no;
    0x1F 12B serial ASCII; 0x2B u16 temp centi-C + 273.15 offset;
    0x2D u16 rh centi-%; remainder spare; 0x63 u16 checksum.
  M20 frame (70B): 0x00 2B sync 0xAA 0xAA; 0x02 0x45 0x20 (type/len);
    same field layout through temp (0x2B); NO RH sensor (README.md:13);
    0x44 u16 checksum over 0x02..0x43. Both subtypes decode on the same
    "m10" channel — the gather window is 101 bytes and frames dispatch on
    the type bytes (mirroring the reference's single M10/M20 entry,
    main.hpp:48).
"""

from __future__ import annotations

import struct
from typing import List, Tuple

import numpy as np

from sondetpu.sondes import geo
from sondetpu.sondes.base import ProtocolSpec, SondeDecoderBase, register_sonde
from sondetpu.sondes.modulate import gfsk_modulate
from sondetpu.sync.coding import np_bytes_to_bits
from sondetpu.telemetry import Fields, TelemetryFragment

CHIP_RATE = 9600.0
FRAME_BYTES = 101
SYNCWORD = bytes([0xAA, 0xAA, 0x64, 0x9F, 0x20])
M10_TYPE = bytes([0x64, 0x9F, 0x20])
M20_TYPE = bytes([0x45, 0x20])

SPEC = ProtocolSpec(
    name="m10",
    display_name="M10/M20",
    bandwidth=5e4,            # main.hpp:48
    baud=CHIP_RATE,
    modulation="gfsk",
    syncword=SYNCWORD,
    lsb_first=False,
    frame_bytes=FRAME_BYTES,
    line_code="biphase_m",
    deviation=12000.0,
    extra={"abs_corr": True,     # biphase-M polarity ambiguity
           # M20 subtype shares the channel but has its own sync bytes
           "alt_syncword": bytes([0xAA, 0xAA, 0x45, 0x20])},
)


def m10_checksum(data: np.ndarray) -> int:
    """The M10's rolling 16-bit checksum.

    Per-byte update as publicly documented for the Meteomodem framing: the
    byte is rotated and self-XORed, the low state byte feeds back through a
    parity-tap permutation, the high state byte shifts down. Matches the
    algorithm in public M10 decoders; verify against recorded IQ
    (SURVEY.md §7).
    """
    c = 0
    for x in np.asarray(data, dtype=np.uint8):
        b = int(x)
        c1 = c & 0xFF
        b = ((b >> 1) | ((b & 1) << 7))
        b ^= (b >> 2) & 0xFF
        t6 = (c & 1) ^ ((c >> 2) & 1) ^ ((c >> 4) & 1)
        t7 = ((c >> 1) & 1) ^ ((c >> 3) & 1) ^ ((c >> 5) & 1)
        t = (c & 0x3F) | (t6 << 6) | (t7 << 7)
        s = (c >> 7) & 0xFF
        s ^= (s >> 2) & 0xFF
        c0 = b ^ t ^ s
        c = ((c1 << 8) | (c0 & 0xFF)) & 0xFFFF
    return c


class M10Decoder(SondeDecoderBase):
    spec = SPEC

    def reset_channel(self, channel: int) -> None:
        pass                                  # stateless per frame

    def decode_byte_frames(self, frames: np.ndarray, channels
                           ) -> List[Tuple[int, TelemetryFragment]]:
        frames = np.atleast_2d(np.asarray(frames, dtype=np.uint8))
        out = []
        for fi in range(frames.shape[0]):
            f = frames[fi]
            ch = int(np.asarray(channels)[fi])
            if f[0:2].tobytes() != b"\xaa\xaa":
                continue
            if f[2:5].tobytes() == M10_TYPE:
                want = struct.unpack("<H", f[0x63:0x65].tobytes())[0]
                if m10_checksum(f[2:0x63]) != want:
                    continue
                frag = self._parse(f, is_m20=False)
            elif f[2:4].tobytes() == M20_TYPE:
                want = struct.unpack("<H", f[0x44:0x46].tobytes())[0]
                if m10_checksum(f[2:0x44]) != want:
                    continue
                frag = self._parse(f, is_m20=True)
            else:
                continue
            if frag.fields:
                out.append((ch, frag))
        return out

    def _parse(self, f: np.ndarray, is_m20: bool = False) -> TelemetryFragment:
        frag = TelemetryFragment()
        tow_ms, = struct.unpack("<I", f[0x05:0x09].tobytes())
        week, = struct.unpack("<H", f[0x09:0x0B].tobytes())
        frag.time = float(geo.gps_time_to_utc(week, tow_ms / 1000.0))
        frag.fields |= Fields.TIME
        lat, lon, alt_cm = struct.unpack("<iii", f[0x0B:0x17].tobytes())
        ve, vn, vu = struct.unpack("<hhh", f[0x17:0x1D].tobytes())
        if not (lat == 0 and lon == 0):
            frag.lat, frag.lon, frag.alt = lat * 1e-6, lon * 1e-6, alt_cm / 100.0
            spd, hdg, climb = geo.speed_heading_climb(ve / 100.0, vn / 100.0, vu / 100.0)
            frag.speed, frag.heading, frag.climb = float(spd), float(hdg), float(climb)
            frag.fields |= Fields.POS | Fields.SPEED
        frag.seq, = struct.unpack("<H", f[0x1D:0x1F].tobytes())
        frag.fields |= Fields.SEQ
        serial = f[0x1F:0x2B].tobytes().decode("ascii", errors="replace").strip("\x00 ")
        if serial:
            frag.serial = serial
            frag.fields |= Fields.SERIAL
        t_raw, = struct.unpack("<H", f[0x2B:0x2D].tobytes())
        frag.temp = t_raw / 100.0 - 273.15
        if is_m20:
            frag.rh = float("nan")            # M20 has no RH (README.md:13)
        else:
            rh_raw, = struct.unpack("<H", f[0x2D:0x2F].tobytes())
            frag.rh = rh_raw / 100.0          # M10 carries RH (README.md:11)
        frag.pressure = 0.0
        frag.calib_percent = 100.0            # no calibration accumulation
        frag.fields |= Fields.PTU
        return frag


class M10Truth:
    def __init__(self, serial="ME10A00001", frame_no=1, lat=52.2, lon=21.0,
                 alt=15000.0, ve=-4.0, vn=9.0, vu=5.0, temp=-55.0, rh=12.0,
                 time_utc=1.7e9, m20=False):
        self.serial, self.frame_no = serial, frame_no
        self.lat, self.lon, self.alt = lat, lon, alt
        self.ve, self.vn, self.vu = ve, vn, vu
        self.temp, self.rh, self.time_utc = temp, rh, time_utc
        self.m20 = m20


class M10Modulator:
    spec = SPEC

    def build_frame(self, t: M10Truth) -> np.ndarray:
        if t.m20:
            return self._build_m20(t)
        f = np.zeros(FRAME_BYTES, dtype=np.uint8)
        f[0:2] = (0xAA, 0xAA)
        f[2:5] = np.frombuffer(M10_TYPE, np.uint8)
        f[0x05:0x09] = np.frombuffer(struct.pack(
            "<I", int(round(geo.utc_to_gps_time(t.time_utc)[1] * 1000))), np.uint8)
        f[0x09:0x0B] = np.frombuffer(struct.pack(
            "<H", int(geo.utc_to_gps_time(t.time_utc)[0])), np.uint8)
        f[0x0B:0x17] = np.frombuffer(struct.pack(
            "<iii", int(round(t.lat * 1e6)), int(round(t.lon * 1e6)),
            int(round(t.alt * 100))), np.uint8)
        f[0x17:0x1D] = np.frombuffer(struct.pack(
            "<hhh", int(round(t.ve * 100)), int(round(t.vn * 100)),
            int(round(t.vu * 100))), np.uint8)
        f[0x1D:0x1F] = np.frombuffer(struct.pack("<H", t.frame_no & 0xFFFF), np.uint8)
        f[0x1F:0x2B] = np.frombuffer(t.serial.encode("ascii")[:12].ljust(12), np.uint8)
        f[0x2B:0x2D] = np.frombuffer(struct.pack(
            "<H", int(round((t.temp + 273.15) * 100))), np.uint8)
        f[0x2D:0x2F] = np.frombuffer(struct.pack("<H", int(round(t.rh * 100))), np.uint8)
        f[0x63:0x65] = np.frombuffer(struct.pack("<H", m10_checksum(f[2:0x63])), np.uint8)
        return f

    def _build_m20(self, t: M10Truth) -> np.ndarray:
        """70-byte M20 frame, zero-padded to the 101-byte gather window so
        back-to-back M20 frames keep a fixed chip spacing on air."""
        f = np.zeros(FRAME_BYTES, dtype=np.uint8)
        f[0:2] = (0xAA, 0xAA)
        f[2:4] = np.frombuffer(M20_TYPE, np.uint8)
        week, tow = geo.utc_to_gps_time(t.time_utc)
        f[0x05:0x09] = np.frombuffer(struct.pack("<I", int(round(tow * 1000))), np.uint8)
        f[0x09:0x0B] = np.frombuffer(struct.pack("<H", int(week)), np.uint8)
        f[0x0B:0x17] = np.frombuffer(struct.pack(
            "<iii", int(round(t.lat * 1e6)), int(round(t.lon * 1e6)),
            int(round(t.alt * 100))), np.uint8)
        f[0x17:0x1D] = np.frombuffer(struct.pack(
            "<hhh", int(round(t.ve * 100)), int(round(t.vn * 100)),
            int(round(t.vu * 100))), np.uint8)
        f[0x1D:0x1F] = np.frombuffer(struct.pack("<H", t.frame_no & 0xFFFF), np.uint8)
        f[0x1F:0x2B] = np.frombuffer(t.serial.encode("ascii")[:12].ljust(12), np.uint8)
        f[0x2B:0x2D] = np.frombuffer(struct.pack(
            "<H", int(round((t.temp + 273.15) * 100))), np.uint8)
        f[0x44:0x46] = np.frombuffer(struct.pack(
            "<H", m10_checksum(f[2:0x44])), np.uint8)
        return f

    def frames_to_chips(self, frames: np.ndarray) -> np.ndarray:
        """Biphase-mark encode (continuous level across the whole stream)."""
        bits = np_bytes_to_bits(np.atleast_2d(frames), lsb_first=False).reshape(-1)
        chips = np.empty(bits.size * 2, dtype=np.uint8)
        level = 0
        for k, b in enumerate(bits):
            level ^= 1
            chips[2 * k] = level
            if b:
                level ^= 1
            chips[2 * k + 1] = level
        return chips

    def modulate(self, truths: List[M10Truth], fs: float = 48000.0,
                 bt: float = 0.7) -> np.ndarray:
        frames = np.stack([self.build_frame(t) for t in truths])
        chips = self.frames_to_chips(frames)
        return gfsk_modulate(chips, fs / CHIP_RATE, SPEC.dev / fs, bt=bt)


register_sonde("m10", SPEC, M10Decoder, M10Modulator)
