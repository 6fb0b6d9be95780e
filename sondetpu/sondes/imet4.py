"""InterMet iMet-1/4 protocol: AFSK packets + CRC16 + ozone XDATA.

Re-creates sondedump's iMet-4 decoder capability (SURVEY.md S5; reference
API decoder.hpp:9; AFSK per BASELINE.json:10; 20 kHz channel per
main.hpp:49; GPS+T+RH+XDATA ozone per README.md:16).

Physical layer: Bell-202 AFSK over FM — 1200 Bd, mark 1200 Hz / space
2200 Hz (the publicly documented iMet audio modem parameters); the device
pipeline demodulates with the dual-tone quadrature discriminator front end
(runtime/pipeline.py _afsk_frontend). Packet: SOH-framed, CRC16-CCITT
(crc.py) over the body. Field offsets are this framework's definition
(modulator/parser-consistent; re-verify on recorded IQ per SURVEY.md §7):

  frame (48B): 0x00 2B sync 0x01 0x30 ('SOH 0'); 0x02 u16 frame_no;
    0x04 u32 tow_ms; 0x08 u16 week; 0x0A i32 lat 1e-6; 0x0E i32 lon 1e-6;
    0x12 i32 alt cm; 0x16 u16 temp cK; 0x18 u16 rh c%; 0x1A u16 pressure
    dPa; 0x1C 8B serial; 0x24 u16 o3 centi-mPa; 0x26..0x2D spare;
    0x2E u16 crc16-ccitt over bytes 0x02..0x2D.

iMet frames carry no velocity; speed/heading/climb are not emitted (the
reference's field-bitmask protocol makes that explicit, decoder.hpp:74-79).
"""

from __future__ import annotations

import struct
from typing import List, Tuple

import numpy as np

from sondetpu.fec.crc import crc16_ccitt
from sondetpu.sondes import geo
from sondetpu.sondes.base import ProtocolSpec, SondeDecoderBase, register_sonde
from sondetpu.sondes.modulate import afsk_modulate
from sondetpu.sync.coding import np_bytes_to_bits
from sondetpu.telemetry import Fields, TelemetryFragment

BAUD = 1200.0
F_MARK, F_SPACE = 1200.0, 2200.0      # Bell-202
FRAME_BYTES = 48
SYNCWORD = bytes([0x01, 0x30])

SPEC = ProtocolSpec(
    name="imet4",
    display_name="iMet-4",
    bandwidth=2e4,            # main.hpp:49
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


class IMET4Decoder(SondeDecoderBase):
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
            want, = struct.unpack("<H", f[0x2E:0x30].tobytes())
            if crc16_ccitt(f[0x02:0x2E].tobytes()) != want:
                continue
            frag = self._parse(f)
            out.append((ch, frag))
        return out

    def _parse(self, f: np.ndarray) -> TelemetryFragment:
        frag = TelemetryFragment()
        frag.seq, = struct.unpack("<H", f[0x02:0x04].tobytes())
        frag.fields |= Fields.SEQ
        tow_ms, week = struct.unpack("<IH", f[0x04:0x0A].tobytes())
        frag.time = float(geo.gps_time_to_utc(week, tow_ms / 1000.0))
        frag.fields |= Fields.TIME
        lat, lon, alt_cm = struct.unpack("<iii", f[0x0A:0x16].tobytes())
        if not (lat == 0 and lon == 0):
            frag.lat, frag.lon, frag.alt = lat * 1e-6, lon * 1e-6, alt_cm / 100.0
            frag.fields |= Fields.POS
        t_raw, rh_raw, p_raw = struct.unpack("<HHH", f[0x16:0x1C].tobytes())
        frag.temp = t_raw / 100.0 - 273.15
        frag.rh = rh_raw / 100.0
        frag.pressure = p_raw / 10.0          # iMet has a pressure sensor
        frag.calib_percent = 100.0
        frag.fields |= Fields.PTU
        serial = f[0x1C:0x24].tobytes().decode("ascii", errors="replace").strip("\x00 ")
        if serial:
            frag.serial = serial
            frag.fields |= Fields.SERIAL
        o3_raw, = struct.unpack("<H", f[0x24:0x26].tobytes())
        if o3_raw:
            frag.o3_mpa = o3_raw / 100.0      # ozone XDATA (README.md:16)
            frag.fields |= Fields.OZONE
        return frag


class IMET4Truth:
    def __init__(self, serial="IMET4001", frame_no=1, lat=40.0, lon=-105.0,
                 alt=22000.0, temp=-58.0, rh=5.0, pressure=40.0,
                 o3_mpa=3.2, time_utc=1.7e9):
        self.serial, self.frame_no = serial, frame_no
        self.lat, self.lon, self.alt = lat, lon, alt
        self.temp, self.rh, self.pressure = temp, rh, pressure
        self.o3_mpa, self.time_utc = o3_mpa, time_utc


class IMET4Modulator:
    spec = SPEC

    def build_frame(self, t: IMET4Truth) -> np.ndarray:
        f = np.zeros(FRAME_BYTES, dtype=np.uint8)
        f[0:2] = np.frombuffer(SYNCWORD, np.uint8)
        f[0x02:0x04] = np.frombuffer(struct.pack("<H", t.frame_no & 0xFFFF), np.uint8)
        week, tow = geo.utc_to_gps_time(t.time_utc)
        f[0x04:0x0A] = np.frombuffer(struct.pack(
            "<IH", int(round(tow * 1000)), int(week)), np.uint8)
        f[0x0A:0x16] = np.frombuffer(struct.pack(
            "<iii", int(round(t.lat * 1e6)), int(round(t.lon * 1e6)),
            int(round(t.alt * 100))), np.uint8)
        f[0x16:0x1C] = np.frombuffer(struct.pack(
            "<HHH", int(round((t.temp + 273.15) * 100)),
            int(round(t.rh * 100)), int(round(t.pressure * 10))), np.uint8)
        f[0x1C:0x24] = np.frombuffer(t.serial.encode("ascii")[:8].ljust(8), np.uint8)
        f[0x24:0x26] = np.frombuffer(struct.pack(
            "<H", int(round((t.o3_mpa or 0) * 100))), np.uint8)
        f[0x2E:0x30] = np.frombuffer(struct.pack(
            "<H", crc16_ccitt(f[0x02:0x2E].tobytes())), np.uint8)
        return f

    def modulate(self, truths: List[IMET4Truth], fs: float = 48000.0) -> np.ndarray:
        frames = np.stack([self.build_frame(t) for t in truths])
        bits = np_bytes_to_bits(frames).reshape(-1)
        return afsk_modulate(bits, fs / BAUD, F_MARK, F_SPACE, fs,
                             deviation_norm=SPEC.dev / fs)


register_sonde("imet4", SPEC, IMET4Decoder, IMET4Modulator)
