"""Meisei iMS-100 / RS-11G protocol: GFSK + shortened BCH + even/odd halves.

Re-creates sondedump's Meisei decoder capability (SURVEY.md S4; reference
API decoder.hpp:10; BCH FEC per BASELINE.json:10; 20 kHz shared channel
entry "iMS100/RS-11G" per main.hpp:47; GPS+T+RH per README.md:14-15).

On-air structure (the public parts — sync word, code, block layout — are
real; the field map inside the corrected payload is framework-defined;
provenance audit in PROTOCOLS.md "ims100"):

  physical: 2400 Bd GFSK NRZ.
  subframe (576 bits = 72 bytes, ~4.2/s):
    bits  0- 23  sync 0xFB6230
    bits 24-575  12 blocks of 46 bits, each a SHORTENED BCH(63,51) t=2
                 codeword (the first 17 message bits are an implicit zero
                 prefix, not transmitted): 34 data bits + 12 parity bits.
  payload (12 x 34 = 408 bits -> 51 bytes): alternating EVEN (position) /
  ODD (PTU/serial) half-frames keyed by the frame counter's parity — the
  protocol's interleaved even/odd structure (SURVEY.md S4) — reassembled
  per channel across subframes:
    0x00 u16 frame_no (parity selects the half)
    EVEN: 0x02 u32 tow_ms | 0x06 u16 week | 0x08 i32 lat 1e-7 |
          0x0C i32 lon 1e-7 | 0x10 i32 alt cm | 0x14 u16 speed cm/s |
          0x16 u16 heading cdeg | 0x18 i16 climb cm/s
    ODD:  0x02 8B serial ASCII | 0x0A u16 temp cK | 0x0C u16 rh c%
  (little-endian; [framework] — modulator/parser-consistent, to re-verify
  against recorded IQ per SURVEY.md §7.)
"""

from __future__ import annotations

import struct
from typing import List, Tuple

import numpy as np

from sondetpu.fec.bch import BCH_63_51
from sondetpu.sondes import geo
from sondetpu.sondes.base import ProtocolSpec, SondeDecoderBase, register_sonde
from sondetpu.sondes.modulate import gfsk_modulate
from sondetpu.sync.coding import np_bits_to_bytes, np_bytes_to_bits
from sondetpu.telemetry import Fields, TelemetryFragment

BAUD = 2400.0
FRAME_BYTES = 72
SYNCWORD = bytes([0xFB, 0x62, 0x30])
N_BLOCKS = 12
SHORT = 17                    # zero bits removed from each (63,51) codeword
DATA_BITS = 34                # 51 - SHORT
BLOCK_BITS = 46               # 63 - SHORT
PAYLOAD_BYTES = 51            # 12 * 34 = 408 bits

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
    extra={"dc_mode": "midpoint"},   # unwhitened NRZ: data-dc-immune slicer
)


def bch_46_34_encode(msg_bits: np.ndarray) -> np.ndarray:
    """[batch, 34] data bits -> [batch, 46] shortened codewords."""
    msg = np.atleast_2d(np.asarray(msg_bits, np.uint8))
    full = np.zeros((msg.shape[0], 51), np.uint8)
    full[:, SHORT:] = msg                  # implicit zero prefix
    return BCH_63_51.encode(full)[:, SHORT:]


def bch_46_34_decode(recv_bits: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """[batch, 46] received -> ([batch, 34] data, [batch] ok)."""
    recv = np.atleast_2d(np.asarray(recv_bits, np.uint8))
    full = np.zeros((recv.shape[0], 63), np.uint8)
    full[:, SHORT:] = recv
    corrected, _, ok = BCH_63_51.decode(full)
    # a "correction" inside the zero prefix means the codeword was bad
    ok = ok & ~corrected[:, :SHORT].any(axis=1)
    return corrected[:, SHORT:51], ok


def payload_to_block_bits(payload: np.ndarray) -> np.ndarray:
    """51-byte payload -> [12, 46] shortened-codeword bit matrix."""
    bits = np_bytes_to_bits(np.asarray(payload, np.uint8))  # 408 bits
    return bch_46_34_encode(bits.reshape(N_BLOCKS, DATA_BITS))


def block_bits_to_payload(blk_bits: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """[12, 46] received block bits -> (payload 51B, ok [12] per block).

    Bad blocks zero their data bits; the parser accepts a half-frame when
    the blocks covering ITS fields decoded (per-block erasure tolerance —
    a frame with a corrupt tail block still yields telemetry)."""
    data, ok = bch_46_34_decode(blk_bits)
    data = np.where(ok[:, None], data, 0).astype(np.uint8)
    bits = np.zeros(PAYLOAD_BYTES * 8, np.uint8)
    bits[: N_BLOCKS * DATA_BITS] = data.reshape(-1)
    return np_bits_to_bytes(bits), ok


# blocks whose 34-bit spans cover each half's fields (bit ranges above)
_EVEN_BLOCKS = slice(0, 7)    # bytes 0x00-0x19 -> bits 0..207 -> blocks 0-6
_ODD_BLOCKS = slice(0, 4)     # bytes 0x00-0x0D -> bits 0..111 -> blocks 0-3


class IMS100Decoder(SondeDecoderBase):
    spec = SPEC

    def reset_channel(self, channel: int) -> None:
        pass                                  # stateless per subframe

    def decode_byte_frames(self, frames: np.ndarray, channels
                           ) -> List[Tuple[int, TelemetryFragment]]:
        frames = np.atleast_2d(np.asarray(frames, dtype=np.uint8))
        out = []
        for fi in range(frames.shape[0]):
            f = frames[fi]
            ch = int(np.asarray(channels)[fi])
            if f[:3].tobytes() != SYNCWORD:
                continue
            bits = np_bytes_to_bits(f)[24:24 + N_BLOCKS * BLOCK_BITS]
            payload, ok = block_bits_to_payload(bits.reshape(N_BLOCKS, BLOCK_BITS))
            if not ok[0]:                  # frame counter block
                continue
            half = int(payload[0]) & 1
            need = _EVEN_BLOCKS if half == 0 else _ODD_BLOCKS
            if not ok[need].all():
                continue
            frag = self._parse_payload(payload, ch)
            if frag is not None and frag.fields:
                out.append((ch, frag))
        return out

    def _parse_payload(self, p: np.ndarray, ch: int) -> TelemetryFragment:
        frag = TelemetryFragment()
        frag.seq, = struct.unpack("<H", p[0:2].tobytes())
        frag.fields |= Fields.SEQ
        half = frag.seq & 1
        if half == 0:
            tow_ms, week = struct.unpack("<IH", p[2:8].tobytes())
            lat, lon, alt_cm = struct.unpack("<iii", p[8:20].tobytes())
            spd, hdg = struct.unpack("<HH", p[20:24].tobytes())
            climb, = struct.unpack("<h", p[24:26].tobytes())
            frag.time = float(geo.gps_time_to_utc(week, tow_ms / 1000.0))
            frag.fields |= Fields.TIME
            if not (lat == 0 and lon == 0):
                frag.lat, frag.lon, frag.alt = lat * 1e-7, lon * 1e-7, alt_cm / 100.0
                frag.speed = spd / 100.0
                frag.heading = hdg / 100.0
                frag.climb = climb / 100.0
                frag.fields |= Fields.POS | Fields.SPEED
        else:
            serial = p[2:10].tobytes().decode("ascii", errors="replace").strip("\x00 ")
            if serial:
                frag.serial = serial
                frag.fields |= Fields.SERIAL
            t_raw, rh_raw = struct.unpack("<HH", p[10:14].tobytes())
            frag.temp = t_raw / 100.0 - 273.15
            frag.rh = rh_raw / 100.0          # iMS-100 carries RH (README.md:14)
            frag.pressure = 0.0
            frag.calib_percent = 100.0
            frag.fields |= Fields.PTU
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
        # frame counter parity selects the half
        fn = (t.frame_no & ~1) | (half & 1)
        p[0:2] = np.frombuffer(struct.pack("<H", fn & 0xFFFF), np.uint8)
        if half % 2 == 0:
            week, tow = geo.utc_to_gps_time(t.time_utc)
            p[2:8] = np.frombuffer(struct.pack(
                "<IH", int(round(tow * 1000)), int(week)), np.uint8)
            p[8:20] = np.frombuffer(struct.pack(
                "<iii", int(round(t.lat * 1e7)), int(round(t.lon * 1e7)),
                int(round(t.alt * 100))), np.uint8)
            p[20:24] = np.frombuffer(struct.pack(
                "<HH", int(round(t.speed * 100)),
                int(round(t.heading * 100)) % 36000), np.uint8)
            p[24:26] = np.frombuffer(struct.pack("<h", int(round(t.climb * 100))), np.uint8)
        else:
            p[2:10] = np.frombuffer(t.serial.encode("ascii")[:8].ljust(8), np.uint8)
            p[10:14] = np.frombuffer(struct.pack(
                "<HH", int(round((t.temp + 273.15) * 100)),
                int(round(t.rh * 100))), np.uint8)
        blk = payload_to_block_bits(p)                     # [12, 46]
        bits = np.zeros(FRAME_BYTES * 8, dtype=np.uint8)
        bits[0:24] = np_bytes_to_bits(np.frombuffer(SYNCWORD, np.uint8))
        bits[24:24 + N_BLOCKS * BLOCK_BITS] = blk.reshape(-1)
        return np_bits_to_bytes(bits)

    def modulate(self, truths: List[IMS100Truth], fs: float = 48000.0,
                 bt: float = 0.5) -> np.ndarray:
        """Alternating even/odd half-frames (interleaved structure, S4)."""
        frames = []
        for k, t in enumerate(truths):
            frames.append(self.build_frame(t, half=k % 2))
        bits = np_bytes_to_bits(np.stack(frames)).reshape(-1)
        return gfsk_modulate(bits, fs / BAUD, SPEC.dev / fs, bt=bt)


register_sonde("ims100", SPEC, IMS100Decoder, IMS100Modulator)
