"""On-chip scoring for intra-utterance progressive streaming (serving/progressive.py).

Two questions, answered with the QMODES methodology:

1. QUALITY — is the segmented RePaint-continuation trajectory within the
   one-shot reseed noise floor? Score: Vocos-feature rel-L2 of the
   progressive grid vs the one-shot grid (same AR codes, fixed seeds),
   judged against the floor set by two one-shot runs that differ only in
   seed. Both context policies are scored (speaker prompt in every segment
   vs first segment only).
2. LATENCY — time-to-first-audio *within* the utterance (AR + first-segment
   NAR + vocode) vs the one-shot pipeline's full wall, plus the total-wall
   price of streaming (each segment re-processes its context frames).

Run on the TPU (axon) host: `python scripts/bench_progressive.py`.
Writes one JSON line (recorded as PROGRESSIVE_r05.json).
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

os.environ.setdefault("BENCH_AR", "bf16")
os.environ.setdefault("BENCH_NAR", "bf16")

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/mars5_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

SEG = int(os.environ.get("PROG_SEG", "192"))
CTX = int(os.environ.get("PROG_CTX", "192"))
T = int(os.environ.get("PROG_T", "200"))
_BASE = "The quick brown fox jumps over the lazy dog near the river bank today. "
# PROG_TEXT_CHARS scales the utterance (~5 codec frames/char on runaway bench
# weights) — e.g. 150 chars ≈ 750 gen frames = the 10-s production length,
# where windowed segments' quadratic-attention savings beat the one-shot wall
TEXT = (_BASE * 10)[: int(os.environ.get("PROG_TEXT_CHARS", str(len(_BASE) - 1)))].strip()
MAXLEN_BUCKET = 256


def build_model():
    import dataclasses

    import bench
    from mars5_tts_tpu.pipeline import Mars5TTS
    from tests.fixtures import make_tokenizer_strings

    cfgs, params = bench.build()
    ar_cfg, nar_cfg, enc_cfg, voc_cfg = cfgs
    ar, nar, enc, voc, _ = params
    texttok, speechtok, _, _ = make_tokenizer_strings()

    class ScaledMaxLen(Mars5TTS):
        def tts(self, text, ref_audio, ref_transcript=None, cfg=None, seed=0,
                max_retries=0):
            cfg = dataclasses.replace(cfg, generate_max_len_override=_maxlen(
                self, text, ref_transcript))
            return super().tts(text, ref_audio, ref_transcript=ref_transcript,
                               cfg=cfg, seed=seed, max_retries=max_retries)

        def _synthesize_codes(self, text, ref_audio, ref_transcript, cfg,
                              seed, timer):
            cfg = dataclasses.replace(cfg, generate_max_len_override=_maxlen(
                self, text, ref_transcript))
            return super()._synthesize_codes(text, ref_audio, ref_transcript,
                                             cfg, seed, timer)

    def _maxlen(model, text, ref_transcript):
        n = (len(model.texttok.encode(text))
             + (len(model.texttok.encode(ref_transcript)) if ref_transcript else 0)
             + 450 + 16 + 5 * len(text))
        return -(-n // MAXLEN_BUCKET) * MAXLEN_BUCKET

    return ScaledMaxLen.from_params(
        ar, nar, ar_cfg, nar_cfg, texttok=texttok, speechtok=speechtok,
        encodec_params=enc, vocos_params=voc,
        encodec_cfg=enc_cfg, vocos_cfg=voc_cfg,
        ar_backend=os.environ.get("PROG_AR", "fused4"),
        nar_backend=os.environ.get("PROG_NAR", "int8"),
        nar_gen_bucket=64, nar_text_bucket=16)


def feat_rel_l2(voc_weights, grid_a, grid_b):
    from mars5_tts_tpu.models.vocos import codes_to_features

    fa = np.asarray(codes_to_features(voc_weights, jnp.asarray(grid_a).T))
    fb = np.asarray(codes_to_features(voc_weights, jnp.asarray(grid_b).T))
    return float(np.linalg.norm(fa - fb) / max(np.linalg.norm(fb), 1e-9))


def oneshot_grid(model, text, ref, transcript, cfg, ar_seed, nar_seed):
    """The exact NAR call tts makes, returning the (cropped) grid + walls."""
    from mars5_tts_tpu.config import DSH
    from mars5_tts_tpu.diffusion import (MultinomialDiffusion,
                                         perform_simple_inference)
    from mars5_tts_tpu.utils.profiling import StageTimer

    timer = StageTimer()
    t0 = time.perf_counter()
    (text_tokens, prompt_codec, raw_len, gen_codes) = model._synthesize_codes(
        text, ref, transcript, cfg, ar_seed, timer)
    t_ar = time.perf_counter() - t0
    c_text = np.asarray(text_tokens, np.int64)[None]
    c_codes = prompt_codec.transpose(0, 2, 1)
    _x = np.repeat(np.asarray(gen_codes)[None, :, None], 8, axis=2)
    diff = MultinomialDiffusion(model.diffusion_n_classes, timesteps=T)
    dsh = DSH(last_greedy=True, x_0_temp=cfg.x_0_temp,
              guidance_w=cfg.nar_guidance_w, deep_clone=True,
              q0_override_steps=cfg.q0_override_steps,
              enable_kevin_scaled_inference=True,
              guidance_interval=model.guidance_interval)
    t0 = time.perf_counter()
    grid = np.asarray(perform_simple_inference(
        model.codecnar, model.nar_cfg,
        (c_text, c_codes, np.asarray([c_text.shape[1]]),
         np.asarray([c_codes.shape[1]]), _x, np.zeros((1, _x.shape[1]), bool)),
        diff, T, dsh, key=jax.random.key(nar_seed, impl="rbg"),
        gen_bucket=model.nar_gen_bucket, text_bucket=model.nar_text_bucket))[0]
    t_nar = time.perf_counter() - t0
    return grid[raw_len:], t_ar, t_nar


def run_progressive(model, text, ref, transcript, cfg, seed, keep_spk):
    from mars5_tts_tpu.serving import stream_tts

    t0 = time.perf_counter()
    ttfa = None
    grids, pcm = [], 0
    walls = []
    for ch in stream_tts(model, text, ref, ref_transcript=transcript, cfg=cfg,
                         seed=seed, seg_frames=SEG, ctx_frames=CTX,
                         keep_spk_prompt=keep_spk):
        now = time.perf_counter() - t0
        if ttfa is None:
            ttfa = now
        walls.append(round(now, 3))
        grids.append(ch.grid)
        pcm += len(ch.pcm)
    return (np.concatenate(grids, axis=0), ttfa, time.perf_counter() - t0,
            walls, pcm)


def main():
    from mars5_tts_tpu.config import InferenceConfig

    model = build_model()
    rng = np.random.default_rng(0)
    ref = (rng.standard_normal(6 * 24000) * 0.1).astype(np.float32)
    transcript = "a reference transcript for the deep clone prompt"
    cfg = InferenceConfig(deep_clone=True, timesteps=T, trim_db=200.0)
    vw = model.vocos["codebook_weights"]

    # one-shot parity grid + reseed floor: SAME AR codes (ar_seed pinned),
    # NAR key reseeded — exactly the QMODES bf16_T200_reseed construction
    grid_ref, t_ar, t_nar = oneshot_grid(model, TEXT, ref, transcript, cfg, 0, 1)
    grid_ref, t_ar, t_nar = oneshot_grid(model, TEXT, ref, transcript, cfg, 0, 1)  # warm
    grid_reseed, _, _ = oneshot_grid(model, TEXT, ref, transcript, cfg, 0, 2)
    same_l0 = bool((grid_ref[:, 0] == grid_reseed[:, 0]).all())
    assert same_l0, "floor must hold the AR codes fixed"

    floor = feat_rel_l2(vw, grid_reseed, grid_ref)

    results = {"oneshot": {"t_ar_s": round(t_ar, 3), "t_nar_s": round(t_nar, 3),
                           "frames": int(grid_ref.shape[0]),
                           "reseed_floor_feat_rel_l2": round(floor, 4),
                           "reseed_same_l0": same_l0}}
    margin = 1.1
    for keep_spk in (True, False):
        name = "spk_every_seg" if keep_spk else "spk_first_seg_only"
        # cold then warm
        run_progressive(model, TEXT, ref, transcript, cfg, 0, keep_spk)
        grid_p, ttfa, wall, walls, pcm = run_progressive(
            model, TEXT, ref, transcript, cfg, 0, keep_spk)
        d = feat_rel_l2(vw, grid_p, grid_ref)
        results[name] = {
            "feat_rel_l2_vs_oneshot": round(d, 4),
            "pass": bool(d <= margin * floor),
            "ttfa_s": round(ttfa, 3), "total_wall_s": round(wall, 3),
            "chunk_walls_s": walls, "segments": len(walls),
            "seg_frames": SEG, "ctx_frames": CTX, "pcm_samples": pcm,
        }
        print(json.dumps({"partial": name, **results[name]}), flush=True)

    best = "spk_every_seg"
    print(json.dumps({
        "metric": "progressive_stream_ttfa", "unit": "s",
        "value": results[best]["ttfa_s"],
        "criterion": f"feat rel-L2 vs one-shot <= {margin} x reseed floor "
                     f"({round(floor, 4)})",
        "detail": results}))


if __name__ == "__main__":
    main()
