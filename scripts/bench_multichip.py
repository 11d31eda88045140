"""Multi-chip serving benchmark: DP replica-per-chip batched AR decode + NAR.

BASELINE config #5 ("across v5e-8"): shards the batch axis of the decode
engine over all visible chips (mesh from parallel/mesh.py) and reports
seconds-of-audio generated per second per chip. On a single chip this degrades
to dp=1 (the plain batched engine); on a v5e-8 it runs one replica per chip
with zero cross-chip collectives in the decode loop.

Usage:  python scripts/bench_multichip.py            # all visible devices
        MC_TP=2 python scripts/bench_multichip.py    # dp x tp mesh
        MC_REQS=16 MC_FRAMES=400 ...                 # workload shape
Prints one JSON line.
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/mars5_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def main():
    from mars5_tts_tpu.models.ar import CodecLMConfig, init_codeclm
    from mars5_tts_tpu.models.ar_decode import ArSampling
    from mars5_tts_tpu.parallel import make_mesh
    from mars5_tts_tpu.serving.multichip import ShardedARDecoder

    tp = int(os.environ.get("MC_TP", "1"))
    n_dev = len(jax.devices())
    mesh = make_mesh(dp=n_dev // tp, tp=tp)
    dp = n_dev // tp

    n_req = int(os.environ.get("MC_REQS", str(2 * dp)))
    gen_frames = int(os.environ.get("MC_FRAMES", "375"))  # 5 s of audio each

    n_vocab, n_text = 24_000, 4_096
    cfg = CodecLMConfig.mars5(n_vocab)
    params = init_codeclm(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    text_len, prompt_frames = 40, 225  # 3 s reference
    prompts = [np.concatenate([rng.integers(0, n_text, text_len),
                               rng.integers(0, 1024, prompt_frames) + n_text])
               for _ in range(n_req)]
    spks = [rng.integers(0, 1024, (prompt_frames, 8)) for _ in range(n_req)]
    max_len = len(prompts[0]) + gen_frames
    s = ArSampling(temperature=0.7, top_k=200, top_p=0.2,
                   alpha_frequency=3.0, alpha_presence=0.4, penalty_window=80,
                   n_phones_gen=10_000, eos_idx=0, valid_start=n_text,
                   valid_end=n_text + (n_vocab - n_text) + 1, max_len=max_len)

    dec = ShardedARDecoder(params, cfg, s, mesh=mesh)
    outs = dec.generate(prompts, spks)  # warmup/compile
    t0 = time.perf_counter()
    outs = dec.generate(prompts, spks)
    wall = time.perf_counter() - t0
    total_frames = sum(n for _, n in outs)
    audio_s = total_frames / 75.0
    print(json.dumps({
        "metric": "multichip_ar_throughput",
        "value": round(audio_s / wall / n_dev, 3),
        "unit": "s-audio/s/chip",
        "detail": {"devices": n_dev, "mesh": f"dp={dp} tp={tp}",
                   "n_req": n_req, "wall_s": round(wall, 2),
                   "audio_s": round(audio_s, 1),
                   "agg_s_audio_per_s": round(audio_s / wall, 2)},
    }))


if __name__ == "__main__":
    main()
