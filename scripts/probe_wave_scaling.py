"""On-chip NAR wave batch-scaling curve (VERDICT r4 #1a).

Times the production wave configuration — int8 NAR, fused tail, deep clone
(450-frame prompt prepended), bucketed gen length, T steps — at wave sizes
bs = 1, 2, 4, 8 (PROBE_BS to override) and one geometry, to find where the
diffusion scan saturates the MXU. Reports, per bs:

  * steady wave seconds (post-compile, best of PROBE_REPS)
  * ms per diffusion step
  * throughput in seconds-of-audio per second per chip (bs * gen/75 / wave_s)
  * us per decoder-row-frame (CFG doubles rows: 2*bs*(prompt+gen) rows/step) —
    comparable across bs and against the solo bench path's ~4 us.

The scaling verdict drives the continuous-serving wave_size choice
(serving/nar_waves.py). Protocol: one axon client at a time; each bs is a
fresh full-scan compile on a cold cache (budget ~10 min each).

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

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/mars5_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def main():
    from mars5_tts_tpu.config import DSH
    from mars5_tts_tpu.diffusion import (MultinomialDiffusion,
                                         perform_simple_inference)
    from mars5_tts_tpu.models.nar import ResidualTransformerConfig, init_nar
    from mars5_tts_tpu.ops.quant import quantize_nar

    T = int(os.environ.get("PROBE_T", "200"))
    bss = [int(b) for b in os.environ.get("PROBE_BS", "1,2,4,8").split(",")]
    reps = int(os.environ.get("PROBE_REPS", "2"))
    # r4 continuous-serving geometry: ~820 gen frames -> 896 bucket, 450 prompt
    l_gen = int(os.environ.get("PROBE_GEN", "820"))
    gen_bucket = -(-l_gen // 128) * 128
    n_prompt, text_len = 450, 60

    nar_cfg = ResidualTransformerConfig.mars5(n_text_vocab=4_096)
    nar = quantize_nar(init_nar(jax.random.PRNGKey(1), nar_cfg,
                                dtype=jax.numpy.bfloat16))
    rng = np.random.default_rng(0)
    diff = MultinomialDiffusion(1025, timesteps=T)
    dsh = DSH(last_greedy=True, x_0_temp=0.7, guidance_w=3.0, deep_clone=True,
              jump_len=1, jump_n_sample=1, q0_override_steps=min(20, T // 10),
              enable_kevin_scaled_inference=True)

    # shapes mimic NarWaveScheduler._run_wave exactly (text_bucket=128,
    # pre-padded gen axis, True padding mask on the pad) so the compiled wave
    # graphs here are cache hits for bench_continuous.py's scheduler waves
    text_bucket = int(os.environ.get("PROBE_TEXT_BUCKET", "128"))

    def run(bs, seed):
        c_text = np.zeros((bs, text_bucket), np.int64)
        c_text[:, :text_len] = rng.integers(0, 4096, (bs, text_len))
        c_codes = rng.integers(0, 1024, (bs, n_prompt, 8)).astype(np.int64)
        x = np.zeros((bs, gen_bucket, 8), np.int64)
        x[:, :l_gen] = np.repeat(
            rng.integers(0, 1024, (bs, l_gen))[..., None], 8, axis=2)
        xpm = np.ones((bs, gen_bucket), bool)
        xpm[:, :l_gen] = False
        batch = (c_text, c_codes, np.full((bs,), text_len, np.int64),
                 np.full((bs,), n_prompt, np.int64), x, xpm)
        t0 = time.perf_counter()
        grid = np.asarray(perform_simple_inference(
            nar, nar_cfg, batch, diff, T, dsh,
            key=jax.random.key(seed, impl="rbg")))
        assert grid.shape == (bs, gen_bucket, 8), grid.shape
        return time.perf_counter() - t0

    rows = {}
    for bs in bss:
        compile_s = run(bs, 0)                     # compile + first run
        steady = min(run(bs, 1 + r) for r in range(reps))
        audio_s = bs * l_gen / 75.0
        rows_per_step = 2 * bs * (n_prompt + gen_bucket)   # CFG batch-2
        rows[f"bs{bs}"] = {
            "compile_plus_first_s": round(compile_s, 2),
            "wave_s": round(steady, 3),
            "ms_per_step": round(1e3 * steady / T, 2),
            "audio_s_per_s": round(audio_s / steady, 3),
            "us_per_row_frame": round(1e6 * steady / T / rows_per_step, 3),
        }
        print(json.dumps({"partial": f"bs{bs}", **rows[f"bs{bs}"]}),
              flush=True)

    best = max(rows, key=lambda k: rows[k]["audio_s_per_s"])
    print(json.dumps({
        "metric": "nar_wave_batch_scaling", "T": T, "gen": l_gen,
        "gen_bucket": gen_bucket, "prompt": n_prompt,
        "best_bs": best, "rows": rows}))


if __name__ == "__main__":
    main()
