"""On-chip proof of the NAR geometry buckets (serving compile-count control).

Times the full-geometry 200-step diffusion scan at two different generated
lengths that share one 64-frame bucket (710 and 730 both round up to 768;
an earlier revision used 695, which lands in the 704 bucket and measured a
real compile — r5 result recorded in PROBE_BUCKETS_r05.json):

  A. first call at gen=730, bucket=64  -> pays the (one) scan compile
  B. second call at gen=730            -> steady-state step time
  C. first call at gen=710, bucket=64  -> same 768-frame bucket: NO compile,
                                          should land at ~B's time
  D. (optional, PROBE_EXACT=1) first call at gen=710, bucket=0 -> exact shape,
     pays a fresh compile — the per-utterance cost unbucketed serving eats.

Prints one JSON line. Protocol: one axon client at a time (CLAUDE.md).
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
    nar_cfg = ResidualTransformerConfig.mars5(n_text_vocab=4_096)
    nar = quantize_nar(init_nar(jax.random.PRNGKey(1), nar_cfg,
                                dtype=jax.numpy.bfloat16))
    rng = np.random.default_rng(0)
    n_prompt, text_len = 450, 60
    c_text = rng.integers(0, 4096, (1, text_len))
    c_codes = rng.integers(0, 1024, (1, n_prompt, 8))
    diff = MultinomialDiffusion(1025, timesteps=T)
    dsh = DSH(last_greedy=True, x_0_temp=0.7, guidance_w=3.0, deep_clone=True,
              jump_len=1, jump_n_sample=1, q0_override_steps=20,
              enable_kevin_scaled_inference=True)

    def run(l_gen, bucket, seed=1):
        x = np.repeat(rng.integers(0, 1024, l_gen)[None, :, None], 8, axis=2)
        t0 = time.perf_counter()
        grid = np.asarray(perform_simple_inference(
            nar, nar_cfg, (c_text, c_codes, np.asarray([text_len]),
                           np.asarray([n_prompt]), x, np.zeros((1, l_gen), bool)),
            diff, T, dsh, key=jax.random.key(seed, impl="rbg"),
            gen_bucket=bucket))
        assert grid.shape == (1, l_gen, 8), grid.shape
        return time.perf_counter() - t0

    out = {
        "first_gen730_b64_s": round(run(730, 64), 2),    # compile + run
        "steady_gen730_b64_s": round(run(730, 64, 2), 2),
        "first_gen710_b64_s": round(run(710, 64), 2),    # same bucket: no compile
    }
    if os.environ.get("PROBE_EXACT") == "1":
        out["first_gen710_exact_s"] = round(run(710, 0), 2)  # fresh compile
    out["bucket_reuse_ok"] = bool(
        out["first_gen710_b64_s"] < 2.0 * out["steady_gen730_b64_s"])
    print(json.dumps({"metric": "nar_bucket_probe", "T": T, **out}))


if __name__ == "__main__":
    main()
