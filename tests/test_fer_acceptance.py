"""FER acceptance gates (BASELINE.json:5: 'FER matching the CPU reference
at 10 dB SNR', generalized to every family).

The reference publishes no FER figures (SURVEY.md §6), so the gate is
absolute: at 10 dB in-channel SNR a production decoder loses at most a
fraction of frames; each family must hold two points of its waterfall
(knee + floor) over >= 24 synthesized frames through the full pipeline,
and the bf16 compute mode must match f32 on the same noisy stream for
every GFSK family (its quantization sits ~40 dB under this noise floor).
The full >= 50-frame waterfall is tracked per round in FER_rNN.json
(tools/fer_waterfall.py) — these gates only hold the line.
"""

import numpy as np
import pytest

from sondetpu.bench.fer import fer_sweep

GFSK_FAMILIES = ["rs41", "dfm", "m10", "ims100", "mrzn1"]
AFSK_FAMILIES = ["imet4", "c50"]
N_FRAMES = 24


@pytest.mark.parametrize("sonde", GFSK_FAMILIES)
def test_fer_waterfall_gfsk(sonde):
    """Knee (10 dB) and floor (14 dB) of the GFSK waterfall."""
    res = fer_sweep(sonde, [10.0, 14.0], n_frames=N_FRAMES, seed=1)
    knee, floor = (p["fer"] for p in res["points"])
    # measured reality (FER_r04/r05): every GFSK family sits at 0.0 by
    # 10 dB — hold the measured waterfall with margin so a silent 0.2-FER
    # regression cannot pass CI (VERDICT r4 weak #7)
    assert knee <= 0.05, f"{sonde}: FER {knee} at 10 dB"
    assert floor <= 0.05, f"{sonde}: FER {floor} at 14 dB"


@pytest.mark.parametrize("sonde", AFSK_FAMILIES)
def test_fer_waterfall_afsk(sonde):
    # AFSK's dual-tone discriminator needs the full audio bandwidth; its
    # waterfall sits a couple dB above the GFSK chain's
    res = fer_sweep(sonde, [12.0, 16.0], n_frames=N_FRAMES, seed=1)
    knee, floor = (p["fer"] for p in res["points"])
    # measured floors are 0.0 at 12 dB (FER_r04/r05) — hold with margin
    assert knee <= 0.05, f"{sonde}: FER {knee} at 12 dB"
    assert floor <= 0.05, f"{sonde}: FER {floor} at 16 dB"


@pytest.mark.parametrize("sonde", GFSK_FAMILIES)
def test_fer_bf16_matches_f32_at_10db(sonde):
    """Same noisy stream through f32 and bf16 pipelines: decoded-frame
    counts match for EVERY GFSK family (the bf16 acceptance evidence)."""
    import sys

    from sondetpu.runtime.pipeline import PipelineConfig
    from sondetpu.runtime.session import DecoderSession
    from sondetpu.sondes.base import get_sonde
    from sondetpu.sondes.modulate import add_awgn

    modcls = get_sonde(sonde)["modulator"]
    mod = modcls()
    tmod = sys.modules[modcls.__module__]
    truth_cls = next(getattr(tmod, a) for a in dir(tmod)
                     if a.endswith("Truth"))
    truths = []
    for i in range(10):
        t = truth_cls()
        if hasattr(t, "frame_no"):
            t.frame_no = 50 + i
        truths.append(t)
    iq = mod.modulate(truths, fs=48000.0)
    iq = add_awgn(iq, 10.0, rng=np.random.default_rng(7))
    iq = np.pad(iq, (0, (-iq.size) % 48000))
    counts = {}
    for cdt in ("f32", "bf16"):
        cfg = PipelineConfig(sonde=sonde, channels=1, block_len=48000,
                             compute_dtype=cdt)
        sess = DecoderSession(cfg)
        for i in range(0, iq.size - 48000 + 1, 48000):
            sess.process_block(iq[None, i:i + 48000])
        counts[cdt] = sess.metrics.frames_decoded
    assert counts["f32"] >= 5, counts
    assert counts["bf16"] == counts["f32"], counts
