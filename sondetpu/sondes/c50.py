"""Meteolabor SRS-C50 protocol: AFSK 2-tone, short GPS+T frames.

Re-creates sondedump's SRS-C50 decoder capability (SURVEY.md S6; reference
API decoder.hpp:7; AFSK/FSK 2-tone; 20 kHz channel per main.hpp:50; GPS+T
per README.md:17). Shares the AFSK front end with iMet-4 (S5 machinery,
SURVEY.md S6 "[inferred]").

As implemented: 2400 Bd AFSK over FM, mark 3000 Hz / space 4800 Hz
[inferred tone plan; re-verify on recorded IQ per SURVEY.md §7]; compact
24-byte frames with an 8-bit XOR checksum:

  frame (24B): 0x00 2B sync 0x55 0xE6; 0x02 u16 frame_no; 0x04 u32 utc
    epoch s; 0x08 i32 lat 1e-6; 0x0C i32 lon 1e-6; 0x10 i24 alt dm;
    0x13 u16 temp cK; 0x15 u16 serial_num; 0x17 u8 xor checksum of 0x02..
"""

from __future__ import annotations

import struct
from typing import List, Tuple

import numpy as np

from sondetpu.sondes.base import ProtocolSpec, SondeDecoderBase, register_sonde
from sondetpu.sondes.modulate import afsk_modulate
from sondetpu.sync.coding import np_bytes_to_bits
from sondetpu.telemetry import Fields, TelemetryFragment

BAUD = 2400.0
F_MARK, F_SPACE = 3000.0, 4800.0
FRAME_BYTES = 24
SYNCWORD = bytes([0x55, 0xE6])

SPEC = ProtocolSpec(
    name="c50",
    display_name="SRS-C50",
    bandwidth=2e4,            # main.hpp:50
    baud=BAUD,
    modulation="afsk",
    syncword=SYNCWORD,
    lsb_first=False,
    frame_bytes=FRAME_BYTES,
    line_code="nrz",
    deviation=3000.0,
    afsk_mark=F_MARK,
    afsk_space=F_SPACE,
)


def xor_checksum(data: np.ndarray) -> int:
    return int(np.bitwise_xor.reduce(np.asarray(data, np.uint8)))


class C50Decoder(SondeDecoderBase):
    spec = SPEC

    def reset_channel(self, channel: int) -> None:
        pass

    def decode_byte_frames(self, frames: np.ndarray, channels
                           ) -> List[Tuple[int, TelemetryFragment]]:
        frames = np.atleast_2d(np.asarray(frames, dtype=np.uint8))
        out = []
        for fi in range(frames.shape[0]):
            f = frames[fi]
            ch = int(np.asarray(channels)[fi])
            if f[0:2].tobytes() != SYNCWORD:
                continue
            if xor_checksum(f[0x02:0x17]) != int(f[0x17]):
                continue
            frag = TelemetryFragment()
            frag.seq, = struct.unpack("<H", f[0x02:0x04].tobytes())
            frag.fields |= Fields.SEQ
            frag.time = float(struct.unpack("<I", f[0x04:0x08].tobytes())[0])
            frag.fields |= Fields.TIME
            lat, lon = struct.unpack("<ii", f[0x08:0x10].tobytes())
            alt_dm = int.from_bytes(f[0x10:0x13].tobytes(), "little", signed=True)
            if not (lat == 0 and lon == 0):
                frag.lat, frag.lon, frag.alt = lat * 1e-6, lon * 1e-6, alt_dm / 10.0
                frag.fields |= Fields.POS
            t_raw, = struct.unpack("<H", f[0x13:0x15].tobytes())
            frag.temp = t_raw / 100.0 - 273.15
            frag.rh = float("nan")            # C50 reports GPS+T only
            frag.pressure = 0.0
            frag.calib_percent = 100.0
            frag.fields |= Fields.PTU
            serial_num, = struct.unpack("<H", f[0x15:0x17].tobytes())
            frag.serial = f"C50-{serial_num:05d}"
            frag.fields |= Fields.SERIAL
            out.append((ch, frag))
        return out


class C50Truth:
    def __init__(self, serial_num=12345, frame_no=1, lat=46.8, lon=8.2,
                 alt=6000.0, temp=-15.0, time_utc=1.7e9):
        self.serial_num, self.frame_no = serial_num, frame_no
        self.lat, self.lon, self.alt = lat, lon, alt
        self.temp, self.time_utc = temp, time_utc


class C50Modulator:
    spec = SPEC

    def build_frame(self, t: C50Truth) -> np.ndarray:
        f = np.zeros(FRAME_BYTES, dtype=np.uint8)
        f[0:2] = np.frombuffer(SYNCWORD, np.uint8)
        f[0x02:0x04] = np.frombuffer(struct.pack("<H", t.frame_no & 0xFFFF), np.uint8)
        f[0x04:0x08] = np.frombuffer(struct.pack("<I", int(t.time_utc)), np.uint8)
        f[0x08:0x10] = np.frombuffer(struct.pack(
            "<ii", int(round(t.lat * 1e6)), int(round(t.lon * 1e6))), np.uint8)
        f[0x10:0x13] = np.frombuffer(int(round(t.alt * 10)).to_bytes(
            3, "little", signed=True), np.uint8)
        f[0x13:0x15] = np.frombuffer(struct.pack(
            "<H", int(round((t.temp + 273.15) * 100))), np.uint8)
        f[0x15:0x17] = np.frombuffer(struct.pack("<H", t.serial_num & 0xFFFF), np.uint8)
        f[0x17] = xor_checksum(f[0x02:0x17])
        return f

    def modulate(self, truths: List[C50Truth], fs: float = 48000.0) -> np.ndarray:
        frames = np.stack([self.build_frame(t) for t in truths])
        bits = np_bytes_to_bits(frames).reshape(-1)
        return afsk_modulate(bits, fs / BAUD, F_MARK, F_SPACE, fs,
                             deviation_norm=SPEC.dev / fs)


register_sonde("c50", SPEC, C50Decoder, C50Modulator)
