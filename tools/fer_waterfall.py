#!/usr/bin/env python
"""Per-round FER-vs-SNR waterfall artifact (SURVEY.md §4 item 3).

Sweeps every registered family over an SNR grid with >= 50 frames per
point through the full pipeline and writes FER_rNN.json — a diffable
artifact so waterfall regressions (timing changes, filter changes, slicer
changes) are visible round over round.

Usage: python tools/fer_waterfall.py FER_r03.json [n_frames]
Runs on CPU (jax_platforms forced) — the waterfall is a numerics property,
not a hardware one; bf16-vs-f32 parity is gated separately in
tests/test_fer_acceptance.py.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# one COMMON grid for every family (VERDICT r3 weak item 4: the shifted
# AFSK grid made rows incomparable); the AFSK chains additionally sweep 14
# dB because their waterfalls sit ~2 dB right of the GFSK families
COMMON = [4.0, 6.0, 8.0, 10.0, 12.0]
EXTRA = {"imet4": [14.0], "c50": [14.0]}
FAMILIES = ["rs41", "dfm", "m10", "ims100", "mrzn1", "imet4", "c50"]


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "FER_waterfall.json"
    n_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    from sondetpu.bench.fer import fer_sweep

    result = {
        "snr_definition": "total signal power over noise power in the "
                          "full 48 kHz channel (unit-amplitude FSK)",
        "fer_definition": "1 - decoded/clean_units; the denominator is the "
                          "family's CLEAN-signal UNIQUE decode-unit count "
                          "(see per-family decode_unit), and the noisy "
                          "numerator counts only units present in the "
                          "clean set — decoded <= denominator by "
                          "construction (duplicate acceptances and "
                          "corrupted-but-accepted novel content never "
                          "inflate it)",
        "families": {},
    }
    for sonde in FAMILIES:
        snrs = COMMON + EXTRA.get(sonde, [])
        r = fer_sweep(sonde, snrs, n_frames=n_frames, seed=1)
        result["families"][sonde] = r
        print(sonde, [(p["snr_db"], p["fer"]) for p in r["points"]],
              file=sys.stderr, flush=True)
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
