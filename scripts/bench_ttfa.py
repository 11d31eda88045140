"""On-chip time-to-first-audio for streaming long-form narration (VERDICT r4 #4).

Builds the production serving pipeline at released-model geometry (fused int4
AR, W8A8 NAR, random bench weights) through ``Mars5TTS.from_params`` and
measures TTFA — request start to the first playable StreamChunk — for
``stream_longform`` under three configurations:

  * baseline      max_chars=300 (no ramp)
  * ramp          first_chunk_chars=FIRST_CHARS (default 60)
  * ramp+fastT    first_chunk_chars + first_chunk_timesteps=100 (the
                  throughput tier promoted PASS by the reseed-floor criterion)

Bench weights make the AR run away to max_len, so chunk length is pinned the
way production text would pin it: generate_max_len_override is scaled per
chunk at ~5 codec frames per character (≈15 chars/s speech), bucketed to 256
so the AR engine compiles once per bucket. NAR gen/text buckets keep the
diffusion scan at one compile per bucket too.

Each configuration streams twice: the first pass pays compiles (reported as
cold), the second is the warm serving number. One JSON line.
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

os.environ.setdefault("BENCH_AR", "bf16")   # build() raw params; the pipeline
os.environ.setdefault("BENCH_NAR", "bf16")  # quantizes via its own backends

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/mars5_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

FRAMES_PER_CHAR = 5          # ~15 chars/s narration at 75 frames/s
MAXLEN_BUCKET = 256
FIRST_CHARS = int(os.environ.get("TTFA_FIRST_CHARS", "60"))
FAST_T = int(os.environ.get("TTFA_FAST_T", "100"))

TEXT = ("The quick brown fox jumps over the lazy dog near the river bank. "
        * 14).strip()  # ~920 chars -> 3-4 chunks at 300


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
        """Pin AR length to the text the way real weights would: max_len
        scales with chunk characters (bench weights never emit <eos>)."""

        def tts(self, text, ref_audio, ref_transcript=None, cfg=None, seed=0,
                max_retries=0):
            n_prompt_tok = (len(self.texttok.encode(text))
                            + (len(self.texttok.encode(ref_transcript))
                               if ref_transcript else 0)
                            + 450 + 16)          # codec frames + specials slack
            total = n_prompt_tok + FRAMES_PER_CHAR * len(text)
            total = -(-total // MAXLEN_BUCKET) * MAXLEN_BUCKET
            cfg = dataclasses.replace(cfg, generate_max_len_override=total)
            return super().tts(text, ref_audio, ref_transcript=ref_transcript,
                               cfg=cfg, seed=seed, max_retries=max_retries)

    return ScaledMaxLen.from_params(
        ar, nar, ar_cfg, nar_cfg, texttok=texttok, speechtok=speechtok,
        encodec_params=enc, vocos_params=voc,
        encodec_cfg=enc_cfg, vocos_cfg=voc_cfg,
        ar_backend=os.environ.get("TTFA_AR", "fused4"),
        nar_backend=os.environ.get("TTFA_NAR", "int8"),
        nar_gen_bucket=64, nar_text_bucket=16)


def run_stream(model, ref_audio, transcript, cfg, **kw):
    from mars5_tts_tpu.serving import stream_longform

    t0 = time.perf_counter()
    ttfa = first_playable = None
    total = 0.0
    chunks = 0
    for chunk in stream_longform(model, TEXT, ref_audio,
                                 ref_transcript=transcript, cfg=cfg, **kw):
        if ttfa is None:
            ttfa = time.perf_counter() - t0
            first_playable = len(chunk.pcm) / model.sr
        total += len(chunk.pcm) / model.sr
        chunks += 1
    wall = time.perf_counter() - t0
    return {"ttfa_s": round(ttfa, 3),
            "first_playable_s": round(first_playable, 2),
            "chunks": chunks, "stream_audio_s": round(total, 2),
            "wall_s": round(wall, 2)}


def main():
    from mars5_tts_tpu.config import InferenceConfig

    model = build_model()
    rng = np.random.default_rng(0)
    ref_audio = (rng.standard_normal(6 * 24000) * 0.1).astype(np.float32)
    transcript = "a reference transcript for the deep clone prompt"
    cfg = InferenceConfig(deep_clone=True, timesteps=200, trim_db=200.0)

    configs = {
        "baseline_300": {},
        f"ramp_{FIRST_CHARS}": {"first_chunk_chars": FIRST_CHARS},
        f"ramp_{FIRST_CHARS}_T{FAST_T}": {"first_chunk_chars": FIRST_CHARS,
                                          "first_chunk_timesteps": FAST_T},
    }
    results = {}
    for name, kw in configs.items():
        cold = run_stream(model, ref_audio, transcript, cfg,
                          max_chars=300, seed=1, **kw)
        warm = run_stream(model, ref_audio, transcript, cfg,
                          max_chars=300, seed=2, **kw)
        results[name] = {"cold": cold, "warm": warm}
        print(json.dumps({"partial": name, **results[name]}), flush=True)

    base = results["baseline_300"]["warm"]["ttfa_s"]
    best_name = min(results, key=lambda k: results[k]["warm"]["ttfa_s"])
    print(json.dumps({
        "metric": "ttfa_stream_longform", "unit": "s",
        "value": results[best_name]["warm"]["ttfa_s"],
        "detail": {"config": best_name, "baseline_ttfa_s": base,
                   "speedup_vs_baseline": round(
                       base / results[best_name]["warm"]["ttfa_s"], 2),
                   "frames_per_char": FRAMES_PER_CHAR,
                   "results": results}}))


if __name__ == "__main__":
    main()
