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

GRID = {
    "rs41": [4.0, 6.0, 8.0, 10.0, 12.0],
    "dfm": [4.0, 6.0, 8.0, 10.0, 12.0],
    "m10": [4.0, 6.0, 8.0, 10.0, 12.0],
    "ims100": [4.0, 6.0, 8.0, 10.0, 12.0],
    "mrzn1": [4.0, 6.0, 8.0, 10.0, 12.0],
    "imet4": [6.0, 8.0, 10.0, 12.0, 14.0],   # AFSK chain: ~2 dB right
    "c50": [6.0, 8.0, 10.0, 12.0, 14.0],
}


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "FER_waterfall.json"
    n_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    from sondetpu.bench.fer import fer_sweep

    result = {"n_frames": n_frames, "families": {}}
    for sonde, snrs in GRID.items():
        r = fer_sweep(sonde, snrs, n_frames=n_frames, seed=1)
        result["families"][sonde] = r["points"]
        print(sonde, [(p["snr_db"], p["fer"]) for p in r["points"]],
              file=sys.stderr, flush=True)
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
