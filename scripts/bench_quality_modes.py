"""Latency AND quality-proxy across serving modes: AR precision x DDPM steps.

The reference pins T=200 (and silently ignores its own ``timesteps`` knob); this
framework honors it, making T the primary quality-latency dial for serving, and
adds weight precision (bf16 / fused int8 / fused int4 AR, W8A8 NAR) as a second
dial.

Quality evidence (VERDICT r1 #9): every mode is scored against the parity
configuration (bf16 AR + bf16 NAR + T=200) with SHARED randomness — the AR
modes consume one injected uniform stream, the NAR modes one PRNG key — and the
JSON reports token/grid agreement fractions next to each RTF. With random bench
weights these are divergence proxies (real-weight WER needs released
checkpoints, blocked by zero egress); the tiny-model divergence gates live in
tests/test_quant.py.

Prints one JSON line.
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("BENCH_AR", "bf16")   # build() leaves params unquantized;
os.environ.setdefault("BENCH_NAR", "bf16")  # this script quantizes explicitly

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
    from mars5_tts_tpu.models.ar_decode_fused import ar_generate_fused, prepare_fused
    from mars5_tts_tpu.models.encodec import encodec_encode
    from mars5_tts_tpu.ops.quant import quantize_nar

    cfgs, params = bench.build()
    ar_cfg, nar_cfg, enc_cfg, voc_cfg = cfgs
    ar, nar, enc, voc, _ = params
    nar_int8 = quantize_nar(nar)
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
    # one shared uniform stream -> AR modes are comparable token-for-token
    ar_uniforms = np.random.default_rng(7).random((max_len, 1)).astype(np.float32)

    ar_modes = [m for m in os.environ.get("QMODES_AR", "bf16,fused8,fused4")
                .split(",") if m]
    fused = {w: prepare_fused(ar, ar_cfg, max_len=max_len, wbits=w)
             for w in (8, 4) if f"fused{w}" in ar_modes}

    def ar_stage(mode, uniforms=None):
        uniforms = ar_uniforms if uniforms is None else uniforms
        t0 = time.perf_counter()
        if mode == "bf16":
            tokens, _ = ar_generate(ar, ar_cfg, prompt, prompt_codec[0].T,
                                    sampling=sampling, uniforms=uniforms)
        else:
            fp, dims = fused[int(mode[5:])]  # "fused8" | "fused4"
            tokens, _ = ar_generate_fused(ar, fp, ar_cfg, dims, prompt,
                                          prompt_codec[0].T, sampling=sampling,
                                          uniforms=uniforms, interpret=False)
        return time.perf_counter() - t0, np.asarray(tokens)

    def nar_stage(nar_p, l0, T, env=None, seed=1, gi=(0.0, 1.0)):
        diff = MultinomialDiffusion(1025, timesteps=T)
        dsh = DSH(last_greedy=True, x_0_temp=0.7, guidance_w=3.0, deep_clone=True,
                  q0_override_steps=min(20, T // 10),
                  enable_kevin_scaled_inference=True, guidance_interval=gi)
        _x = np.repeat(l0[None, :, None], 8, axis=2)
        old = {k: os.environ.get(k) for k in (env or {})}
        os.environ.update(env or {})
        try:
            t0 = time.perf_counter()
            grid = np.asarray(perform_simple_inference(
                nar_p, nar_cfg,
                (base_text, prompt_codec.transpose(0, 2, 1),
                 np.asarray([text_len]), np.asarray([n_prompt]), _x,
                 np.zeros((1, gen_frames), bool)),
                diff, T, dsh, key=jax.random.key(seed, impl="rbg")))
            return time.perf_counter() - t0, grid
        finally:
            for k, v in old.items():
                os.environ.pop(k, None) if v is None else os.environ.__setitem__(k, v)

    base_text = rng.integers(0, n_text, (1, text_len))

    # --- AR modes: latency + token agreement vs bf16 (shared uniforms) ------
    # QMODES_AR / QMODES_NAR_ROWS filter the mode grid for incremental
    # on-chip measurement (each NAR row is a full diffusion-scan compile on a
    # cold cache); the recorded full-grid run lives in QMODES_r04.json. The
    # first listed AR mode is the token-agreement reference (bf16 canonical).
    ar_out = {}
    for mode in ar_modes:
        ar_stage(mode)                       # warm/compile
        t_ar, tokens = ar_stage(mode)
        ar_out[mode] = (t_ar, tokens)
    ref_tokens = ar_out[ar_modes[0]][1][len(prompt):]

    # --- NAR modes: latency + grid agreement vs bf16/T=200 (shared key) ----
    from mars5_tts_tpu.models.vocos import codes_to_features

    def vocos_proxy(grid, ref):
        """Grid-free quality proxy: relative per-frame L2 in Vocos feature
        space (the exact features the vocoder consumes — reduced-T rows
        follow different trajectories, so token agreement is uninformative
        for them; VERDICT r2 #8). 0 = identical audio input features."""
        fa = np.asarray(codes_to_features(voc["codebook_weights"], grid[0].T))
        fb = np.asarray(codes_to_features(voc["codebook_weights"], ref[0].T))
        num = np.linalg.norm(fa - fb, axis=1)        # (B, T) per-frame L2
        den = np.linalg.norm(fb, axis=1).mean()
        return float(num.mean() / max(den, 1e-9))

    l0 = (ar_out[ar_modes[0]][1][len(prompt):] - n_text).clip(0, 1023)
    nar_stage(nar, l0, 200)                  # warm
    t_ref, ref_grid = nar_stage(nar, l0, 200)
    nar_out = {"bf16_T200": (t_ref, 1.0, 0.0)}
    # --- noise-floor calibration (VERDICT r3 #3): the SAME parity config at a
    # different PRNG seed. Two equally-valid trajectories through the same
    # model define how far apart "perfect quality" runs naturally land, in
    # both grid agreement and Vocos-feature distance; a reduced-T or quantized
    # mode whose feature distance is within this floor is indistinguishable
    # from reseeding and passes.
    _, reseed_grid = nar_stage(nar, l0, 200, seed=2)
    reseed_agree = float((reseed_grid[..., 1:] == ref_grid[..., 1:]).mean())
    noise_floor = vocos_proxy(reseed_grid, ref_grid)
    nar_out["bf16_T200_reseed"] = (t_ref, round(reseed_agree, 4),
                                   round(noise_floor, 4))
    # per-K-group (gsize=128) weight+act scales on the fused-GEMM sites —
    # the round-3 fidelity dial (ops/quant.quantize_weight_grouped)
    from mars5_tts_tpu.models.layers import nar_w_group_keys
    gsize = int(os.environ.get("QMODES_GSIZE", "128"))
    nar_g = quantize_nar(nar, w_gsize=gsize, w_group_keys=nar_w_group_keys())
    genv = {"MARS5_NARF_GSIZE": str(gsize)}
    # guidance-interval rows (DSH.guidance_interval): CFG only while t/T is
    # inside the interval — cond-only steps run half the decoder batch.
    # Both 50% orientations are scored; the timing win is identical, the
    # reseed-floor verdict decides which (if either) to promote.
    row_filter = [r for r in os.environ.get("QMODES_NAR_ROWS", "").split(",") if r]
    for name, nar_p, T, env, gi in [
            ("int8_T200", nar_int8, 200, None, (0.0, 1.0)),
            (f"int8_g{gsize}_T200", nar_g, 200, genv, (0.0, 1.0)),
            ("int8_T100", nar_int8, 100, None, (0.0, 1.0)),
            ("int8_T50", nar_int8, 50, None, (0.0, 1.0)),
            ("int8_cfghi50_T200", nar_int8, 200, None, (0.5, 1.0)),
            ("int8_cfglo50_T200", nar_int8, 200, None, (0.0, 0.5)),
            # combined throughput tier: reduced T x guidance interval (the
            # continuous-serving wave configuration, VERDICT r4 #1c)
            ("int8_cfglo50_T100", nar_int8, 100, None, (0.0, 0.5)),
            ("int8_cfghi50_T100", nar_int8, 100, None, (0.5, 1.0))]:
        if row_filter and name not in row_filter:
            continue
        nar_stage(nar_p, l0, T, env, gi=gi)  # warm
        t_nar, grid = nar_stage(nar_p, l0, T, env, gi=gi)
        agree = float((grid[..., 1:] == ref_grid[..., 1:]).mean())
        nar_out[name] = (t_nar, round(agree, 4),
                         round(vocos_proxy(grid, ref_grid), 4))

    # --- AR criterion, symmetric with the NAR's (VERDICT r4 #3): token
    # agreement vs bf16 is chaotically uninformative (one flip re-seeds the
    # suffix), so the fused engines are scored by FULL-PIPELINE feature
    # distance — their tokens through a fixed-seed bf16 NAR + Vocos features,
    # against the bf16 pipeline — and judged against an AR reseed floor: the
    # same bf16 engine consuming an independent uniform stream, through the
    # identical NAR. A fused engine whose pipeline output is no further from
    # parity than an honest AR reseed is quality-indistinguishable from it.
    ar_scored = {}
    ar_floor = None
    if os.environ.get("QMODES_AR_SCORE", "1") == "1" and len(ar_modes) > 1:
        ar_uniforms2 = np.random.default_rng(8).random((max_len, 1)).astype(np.float32)
        _, tokens_rs = ar_stage(ar_modes[0], uniforms=ar_uniforms2)
        l0_rs = (tokens_rs[len(prompt):] - n_text).clip(0, 1023)
        _, grid_rs = nar_stage(nar, l0_rs, 200)
        ar_floor = round(vocos_proxy(grid_rs, ref_grid), 4)
        ar_scored[f"{ar_modes[0]}_reseed"] = {
            "pipeline_feat_rel_l2": ar_floor, "pass": None}
        for mode in ar_modes[1:]:
            l0_m = (ar_out[mode][1][len(prompt):] - n_text).clip(0, 1023)
            _, grid_m = nar_stage(nar, l0_m, 200)
            d = round(vocos_proxy(grid_m, ref_grid), 4)
            ar_scored[mode] = {"pipeline_feat_rel_l2": d,
                               "pass": bool(d <= 1.1 * ar_floor)}

    # accept/reject: a mode passes when its Vocos-feature distance to the
    # parity run is within 1.1x the reseed noise floor — i.e. swapping the
    # mode in moves the vocoder input no further than an honest reseed does.
    # (Token agreement is reported alongside but is NOT the criterion for
    # reduced-T rows: different trajectories are expected to disagree
    # token-wise exactly as reseeded runs do.)
    margin = float(os.environ.get("QMODES_MARGIN", "1.1"))
    nar_verdicts = {
        name: (None if feat_l2 is None or name.startswith("bf16")
               else bool(feat_l2 <= margin * noise_floor))
        for name, (_, _, feat_l2) in nar_out.items()}

    modes = {}
    for ar_mode, (t_ar, tokens) in ar_out.items():
        gen = tokens[len(prompt):]
        agree = float((gen == ref_tokens).mean())
        mism = np.nonzero(gen != ref_tokens)[0]
        # on random bench weights (near-uniform logits) one flipped token
        # re-seeds the whole suffix, so the PREFIX length is the informative
        # divergence statistic; elementwise agreement is reported alongside
        first_div = int(mism[0]) if mism.size else len(gen)
        for nar_mode, (t_nar, grid_agree, feat_l2) in nar_out.items():
            modes[f"{ar_mode}+{nar_mode}"] = {
                "rtf": round((t_ar + t_nar + 0.2) / AUDIO_SECONDS, 3),
                "ar_token_agree_vs_bf16": round(agree, 4),
                "ar_first_divergence": first_div,
                "nar_grid_agree_vs_bf16_T200": grid_agree,
                "nar_vocos_feature_rel_l2": feat_l2,
                "nar_pass_vs_noise_floor": nar_verdicts[nar_mode],
            }

    print(json.dumps({
        "metric": "rtf_quality_modes", "unit": "s/s",
        "value": modes["bf16+bf16_T200"]["rtf"],
        "criterion": (f"nar_vocos_feature_rel_l2 <= {margin} x reseed noise "
                      f"floor ({round(noise_floor, 4)}); reseed grid "
                      f"agreement {round(reseed_agree, 4)} is the agreement "
                      f"scale, not a target"),
        "ar_criterion": (None if ar_floor is None else
                         f"full-pipeline (tokens -> fixed-seed bf16 NAR -> "
                         f"Vocos features) rel L2 <= 1.1 x AR reseed floor "
                         f"({ar_floor})"),
        "ar_scored": ar_scored,
        "modes": modes}))


if __name__ == "__main__":
    main()
