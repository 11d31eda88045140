"""Throughput benchmark: batched deep-clone serving on one chip (configs #3/#5).

Synthesizes BATCH utterances of AUDIO_SECONDS each (one shared reference voice)
through the batched AR decode engine, the batched NAR diffusion, and batched
Vocos decode, and reports seconds-of-audio per second per chip.

Usage: python scripts/bench_batched.py  [BATCH=4 BENCH_RUNS=2 BENCH_INT8=0]
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

BATCH = int(os.environ.get("BATCH", "4"))
BENCH_RUNS = int(os.environ.get("BENCH_RUNS", "2"))
AUDIO_SECONDS = 10.0
REF_SECONDS = 6.0
# "xla" (bf16 batched engine) | "fused4" | "fused8" (batched megakernel)
AR_ENGINE = os.environ.get("AR_ENGINE", "xla")


def main():
    import bench  # reuse the model builders

    from mars5_tts_tpu.config import DSH
    from mars5_tts_tpu.diffusion import MultinomialDiffusion, perform_simple_inference
    from mars5_tts_tpu.models.ar_decode import ArSampling, ar_generate_batched
    from mars5_tts_tpu.models.encodec import encodec_encode
    from mars5_tts_tpu.models.vocos import codes_to_features, vocos_decode

    cfgs, params = bench.build()
    ar_cfg, nar_cfg, enc_cfg, voc_cfg = cfgs
    ar, nar, enc, voc, _ = params
    rng = np.random.default_rng(0)

    ref_audio = (rng.standard_normal(int(REF_SECONDS * 24000)) * 0.1).astype(np.float32)
    prompt_codec = np.asarray(encodec_encode(enc, enc_cfg, jnp.asarray(ref_audio)[None, None]))
    n_prompt = prompt_codec.shape[-1]
    gen_frames = int(AUDIO_SECONDS * 75)
    n_text = 4_096

    text_lens = [50 + 5 * i for i in range(BATCH)]
    prompts = [np.concatenate([rng.integers(0, n_text, tl),
                               prompt_codec[0, 0] + n_text]) for tl in text_lens]
    spks = [prompt_codec[0].T] * BATCH
    max_len = max(len(p) for p in prompts) + gen_frames
    sampling = ArSampling(
        temperature=0.7, top_k=200, top_p=0.2, alpha_frequency=3.0,
        alpha_presence=0.4, penalty_window=80, eos_penalty_decay=0.5,
        eos_penalty_factor=1.0, n_phones_gen=10_000, eos_idx=0,
        valid_start=n_text, valid_end=24_001, max_len=max_len)

    fused = None
    if AR_ENGINE != "xla":
        from mars5_tts_tpu.models.ar_decode_fused import (
            ar_generate_fused_batched, prepare_fused)
        fused = prepare_fused(ar, ar_cfg, max_len=max_len,
                              wbits=4 if AR_ENGINE == "fused4" else 8,
                              batch=BATCH)

    def run_once(seed):
        t0 = time.perf_counter()
        if fused is not None:
            outs = ar_generate_fused_batched(ar, fused[0], ar_cfg, fused[1],
                                             prompts, spks, sampling=sampling,
                                             seed=seed)
        else:
            outs = ar_generate_batched(ar, ar_cfg, prompts, spks,
                                       sampling=sampling, seed=seed)
        l0 = np.stack([
            np.pad((seq[len(p):] - n_text).clip(0, 1023), (0, max_len - len(seq)))[:gen_frames]
            for (seq, _), p in zip(outs, prompts)])
        t_ar = time.perf_counter() - t0

        t0 = time.perf_counter()
        c_text = rng.integers(0, n_text, (BATCH, max(text_lens)))
        c_codes = np.repeat(prompt_codec.transpose(0, 2, 1), BATCH, axis=0)
        _x = np.repeat(l0[:, :, None], 8, axis=2)
        xpm = np.zeros((BATCH, gen_frames), bool)
        diff = MultinomialDiffusion(1025, timesteps=200)
        dsh = DSH(last_greedy=True, x_0_temp=0.7, guidance_w=3.0, deep_clone=True,
                  jump_len=1, jump_n_sample=1, q0_override_steps=20,
                  enable_kevin_scaled_inference=True)
        grid = perform_simple_inference(
            nar, nar_cfg, (c_text, c_codes, np.asarray(text_lens),
                           np.full((BATCH,), n_prompt), _x, xpm),
            diff, 200, dsh, key=jax.random.key(seed, impl="rbg"))
        grid = np.asarray(grid)
        t_nar = time.perf_counter() - t0

        t0 = time.perf_counter()
        feats = codes_to_features(jnp.asarray(voc["codebook_weights"]),
                                  jnp.asarray(grid.transpose(2, 0, 1)))
        audio = np.asarray(vocos_decode(voc, voc_cfg, feats, 1))
        t_voc = time.perf_counter() - t0
        return t_ar + t_nar + t_voc, {"ar": t_ar, "nar": t_nar, "vocode": t_voc}

    run_once(0)  # warmup/compile
    results = [run_once(i + 1) for i in range(BENCH_RUNS)]
    totals = [r[0] for r in results]
    p50 = float(np.median(totals))
    audio_total = BATCH * AUDIO_SECONDS
    print(json.dumps({
        "metric": "batched_throughput_audio_s_per_s",
        "value": round(audio_total / p50, 3),
        "unit": "s/s/chip",
        "batch": BATCH,
        "detail": {"p50_total_s": round(p50, 3),
                   "stages_s": {k: round(float(np.median([r[1][k] for r in results])), 3)
                                for k in results[0][1]},
                   "int8": os.environ.get("BENCH_INT8") == "1",
                   "ar_engine": AR_ENGINE},
    }))


if __name__ == "__main__":
    main()
