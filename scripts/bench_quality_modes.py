"""Latency across quality modes: DDPM step count x AR precision.

The reference pins T=200 (and silently ignores its own ``timesteps`` knob); this
framework honors it, making T the primary quality-latency dial for serving. This
script measures the 10 s deep-clone RTF at T in {200, 100, 50} with bf16 and
int8 AR weights. T=200/bf16 is the parity configuration; reduced-T modes trade
refinement steps for latency (quality characterization needs real weights).

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

AUDIO_SECONDS = 10.0


def main():
    import bench

    from mars5_tts_tpu.config import DSH
    from mars5_tts_tpu.diffusion import MultinomialDiffusion, perform_simple_inference
    from mars5_tts_tpu.models.ar_decode import ArSampling, ar_generate
    from mars5_tts_tpu.models.encodec import encodec_encode
    from mars5_tts_tpu.ops.quant import quantize_codeclm

    cfgs, params = bench.build()
    ar_cfg, nar_cfg, enc_cfg, voc_cfg = cfgs
    ar, nar, enc, voc = params
    ar_int8 = quantize_codeclm(ar)
    rng = np.random.default_rng(0)

    ref_audio = (rng.standard_normal(int(6 * 24000)) * 0.1).astype(np.float32)
    prompt_codec = np.asarray(encodec_encode(enc, enc_cfg, jnp.asarray(ref_audio)[None, None]))
    n_prompt = prompt_codec.shape[-1]
    gen_frames = int(AUDIO_SECONDS * 75)
    n_text = 4096
    text_len = 60
    prompt = np.concatenate([rng.integers(0, n_text, text_len),
                             prompt_codec[0, 0] + n_text])
    max_len = len(prompt) + gen_frames
    sampling = ArSampling(temperature=0.7, top_k=200, top_p=0.2,
                          alpha_frequency=3.0, alpha_presence=0.4,
                          penalty_window=80, eos_penalty_decay=0.5,
                          eos_penalty_factor=1.0, n_phones_gen=10_000, eos_idx=0,
                          valid_start=n_text, valid_end=24_001, max_len=max_len)

    def ar_stage(p):
        t0 = time.perf_counter()
        tokens, _ = ar_generate(p, ar_cfg, prompt, prompt_codec[0].T,
                                sampling=sampling, seed=1)
        return time.perf_counter() - t0, tokens

    def nar_stage(l0, T):
        diff = MultinomialDiffusion(1025, timesteps=T)
        dsh = DSH(last_greedy=True, x_0_temp=0.7, guidance_w=3.0, deep_clone=True,
                  q0_override_steps=min(20, T // 10),
                  enable_kevin_scaled_inference=True)
        _x = np.repeat(l0[None, :, None], 8, axis=2)
        t0 = time.perf_counter()
        grid = perform_simple_inference(
            nar, nar_cfg,
            (rng.integers(0, n_text, (1, text_len)), prompt_codec.transpose(0, 2, 1),
             np.asarray([text_len]), np.asarray([n_prompt]), _x,
             np.zeros((1, gen_frames), bool)),
            diff, T, dsh, key=jax.random.key(1, impl="rbg"))
        grid = np.asarray(grid)
        return time.perf_counter() - t0

    results = {}
    for name, p in [("bf16", ar), ("int8", ar_int8)]:
        # warm + measure AR
        ar_stage(p)
        t_ar, tokens = ar_stage(p)
        l0 = (tokens[len(prompt):] - n_text).clip(0, 1023)
        for T in (200, 100, 50):
            nar_stage(l0, T)  # warm/compile
            t_nar = nar_stage(l0, T)
            rtf = (t_ar + t_nar + 0.2) / AUDIO_SECONDS  # +0.2 codec stages
            results[f"{name}_T{T}"] = round(rtf, 3)

    print(json.dumps({"metric": "rtf_quality_modes", "unit": "s/s",
                      "value": results["bf16_T200"], "modes": results}))


if __name__ == "__main__":
    main()
