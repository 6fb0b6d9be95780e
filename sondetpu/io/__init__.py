"""IO: IQ sources and telemetry sinks."""

from sondetpu.io.gpx import GPXWriter, MultiGPXWriter
from sondetpu.io.ptu import PTUWriter
from sondetpu.io.jsonl import JSONLWriter
from sondetpu.io.iq import IQFileSource, iq_from_file, write_iq

__all__ = [
    "GPXWriter", "MultiGPXWriter",
    "PTUWriter",
    "JSONLWriter",
    "IQFileSource",
    "iq_from_file",
    "write_iq",
]
