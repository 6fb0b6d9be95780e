"""Experiment: step time vs channels / pallas / block size on the real chip."""
import sys
sys.path.insert(0, "/root/repo")
import time

import numpy as np
import jax

from sondetpu.runtime.pipeline import Pipeline, PipelineConfig


def timeit(channels, block_secs, use_pallas):
    block_len = 48000 * block_secs
    cfg = PipelineConfig(sonde="rs41", channels=channels, block_len=block_len,
                         use_pallas=use_pallas)
    pipe = Pipeline(cfg)
    state = pipe.init_state()
    rng = np.random.default_rng(0)
    iq_i = jax.device_put(rng.normal(size=(channels, block_len)).astype(np.float32))
    iq_q = jax.device_put(rng.normal(size=(channels, block_len)).astype(np.float32))
    state, out = pipe.step(state, (iq_i, iq_q))
    jax.block_until_ready(out)
    times = []
    for _ in range(6):
        t0 = time.perf_counter()
        state, out = pipe.step(state, (iq_i, iq_q))
        np.asarray(out.packed[:1])  # forces execution on the tunneled backend
        times.append(time.perf_counter() - t0)
    dt = min(times)
    rt = channels * (block_len / 48000.0) / dt
    print(f"ch={channels:5d} secs={block_secs} pallas={int(use_pallas)} "
          f"step={dt*1e3:8.2f} ms  rt_ch={rt:10.1f}")


if __name__ == "__main__":
    for ch, bs, up in [(2048, 4, False), (2048, 4, True),
                       (4096, 4, False), (4096, 4, True),
                       (8192, 2, False), (4096, 8, False)]:
        timeit(ch, bs, up)
