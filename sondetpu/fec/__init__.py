"""Forward error correction and integrity checks.

Re-implements the FEC inventory of sondedump (SURVEY.md S1-S4):
Reed-Solomon RS(255,231) for RS41, Hamming(8,4) for DFM, BCH for Meisei
iMS-100/RS-11G, and the CRC/checksum family. Encoders exist for every code
(the modulators need them to synthesize golden IQ, SURVEY.md §4 item 1).

Decoders are vectorized NumPy over a batch axis of codewords (host-side
path; frames are a few kB/s even at 1000 channels) with fixed iteration
counts so the same structure can move on-device later (SURVEY.md §7 "decide
by measuring").
"""

from sondetpu.fec.crc import crc16_ccitt, crc16_ccitt_batch
from sondetpu.fec.gf256 import GF256
from sondetpu.fec.rs import ReedSolomon, RS255_231
from sondetpu.fec.hamming import hamming84_encode, hamming84_decode
from sondetpu.fec.bch import BCH, BCH_63_51

__all__ = [
    "crc16_ccitt", "crc16_ccitt_batch", "GF256",
    "ReedSolomon", "RS255_231",
    "hamming84_encode", "hamming84_decode",
    "BCH", "BCH_63_51",
]
