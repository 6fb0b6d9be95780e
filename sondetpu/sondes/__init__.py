"""Per-sonde protocol implementations.

Re-creates the capability surface of sondedump's per-type decoders
(SURVEY.md §2.3, S1-S7): frame specs, parsers, calibration accumulators and
— because the framework must synthesize its own golden IQ (SURVEY.md §4) —
matching modulators for every family.

Registry mirrors the reference's supported-types table (main.hpp:44-52).
"""

from sondetpu.sondes.base import ProtocolSpec, SondeDecoderBase, get_sonde, register_sonde

# importing a sonde module registers it (families added in build order,
# SURVEY.md §7 step 8)
from sondetpu.sondes import rs41 as _rs41  # noqa: F401
from sondetpu.sondes import m10 as _m10  # noqa: F401
from sondetpu.sondes import dfm as _dfm  # noqa: F401
from sondetpu.sondes import ims100 as _ims100  # noqa: F401
from sondetpu.sondes import imet4 as _imet4  # noqa: F401
from sondetpu.sondes import c50 as _c50  # noqa: F401
from sondetpu.sondes import mrzn1 as _mrzn1  # noqa: F401

from sondetpu.sondes.base import _REGISTRY

SUPPORTED_TYPES = tuple(sorted(_REGISTRY))

__all__ = ["ProtocolSpec", "SondeDecoderBase", "get_sonde", "register_sonde",
           "SUPPORTED_TYPES"]
