"""Continuous-batching system throughput at released-model geometry.

Streams N_REQ deep-clone-shaped requests (staggered arrivals) through a
ROWS-row ContinuousBatcher, riding completed rows through shared NAR
diffusion waves (serving/nar_waves.py, W8A8 + fused tail) — reporting both the
AR-only and the END-TO-END system seconds-of-audio per second per chip
(VERDICT r2 #7). NAR_WAVE=0 skips the NAR stage (round-2 behavior).

Round-5 serving levers (VERDICT r4 #1):
  * OVERLAP=1 (default): waves run interleaved with AR chunk quanta as soon
    as a full cohort of finished rows exists (flush_full_waves) — the system
    wall is one span, not ar_wall + nar_wall, and host gaps hide behind
    device work.
  * WAVE_T: diffusion steps for the NAR tier (200 = parity; 100 = the
    throughput tier promoted PASS by the r4 reseed-floor criterion).
  * WAVE_ROWS: wave batch size (probe_wave_scaling.py measures the curve).
  * AR_ENGINE=fused4: the batched int4 megakernel pool (one weight stream
    shared across rows) — ~1.9x the XLA AR stage in r4's batched bench.

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

N_REQ = int(os.environ.get("N_REQ", "12"))
ROWS = int(os.environ.get("ROWS", "4"))
CHUNK = int(os.environ.get("CHUNK", "64"))
GEN_FRAMES = 750  # 10 s each
# AR pool engine: "xla" (bf16 XLA decode) | "fused4" | "fused8" (the batched
# int4/int8 megakernel pool — weight stream shared across rows)
AR_ENGINE = os.environ.get("AR_ENGINE", "xla")


def main():
    import bench

    from mars5_tts_tpu.models.ar_decode import ArSampling
    from mars5_tts_tpu.models.encodec import encodec_encode
    from mars5_tts_tpu.serving import ContinuousBatcher, Request
    from mars5_tts_tpu.serving.continuous import FusedContinuousBatcher

    cfgs, params = bench.build()
    ar_cfg, nar_cfg, enc_cfg, voc_cfg = cfgs
    ar, nar, enc, voc, _ = params
    rng = np.random.default_rng(0)

    ref = (rng.standard_normal(6 * 24000) * 0.1).astype(np.float32)
    prompt_codec = np.asarray(encodec_encode(enc, enc_cfg, jnp.asarray(ref)[None, None]))
    n_text = 4096
    spk = prompt_codec[0].T

    prompt_bucket = 576
    max_len = prompt_bucket + GEN_FRAMES
    sampling = ArSampling(temperature=0.7, top_k=200, top_p=0.2,
                          alpha_frequency=3.0, alpha_presence=0.4,
                          penalty_window=80, eos_penalty_decay=0.5,
                          eos_penalty_factor=1.0, n_phones_gen=10_000, eos_idx=0,
                          valid_start=n_text, valid_end=24_001, max_len=max_len)

    def make_request(i):
        text_len = 40 + (i % 5) * 8
        prompt = np.concatenate([rng.integers(0, n_text, text_len),
                                 prompt_codec[0, 0] + n_text])
        return Request(prompt=prompt, spk_codes=spk, seed=i)

    def make_batcher():
        if AR_ENGINE == "xla":
            return ContinuousBatcher(ar, ar_cfg, sampling, batch_size=ROWS,
                                     chunk_steps=CHUNK,
                                     prompt_bucket=prompt_bucket,
                                     spk_bucket=512, dtype=jnp.bfloat16)
        wbits = 4 if AR_ENGINE == "fused4" else 8
        return FusedContinuousBatcher(ar, ar_cfg, sampling, batch_size=ROWS,
                                      wbits=wbits, chunk_steps=CHUNK,
                                      prompt_bucket=prompt_bucket,
                                      spk_bucket=512)

    use_nar = os.environ.get("NAR_WAVE", "1") == "1"
    use_overlap = use_nar and os.environ.get("OVERLAP", "1") == "1"
    wave_t = int(os.environ.get("WAVE_T", "200"))
    wave_rows = int(os.environ.get("WAVE_ROWS", str(ROWS)))
    # gen length is bounded by max_len minus the shortest prompt -> one
    # static wave bucket known before any request completes
    min_prompt = 40 + prompt_codec.shape[-1]
    gen_bucket = -(-(max_len - min_prompt) // 128) * 128

    sched = None
    if use_nar:
        from mars5_tts_tpu.config import DSH
        from mars5_tts_tpu.diffusion import MultinomialDiffusion
        from mars5_tts_tpu.ops.quant import quantize_nar
        from mars5_tts_tpu.serving.nar_waves import NarRequest, NarWaveScheduler

        nar_q = quantize_nar(nar)
        diff = MultinomialDiffusion(1025, timesteps=wave_t)
        # WAVE_GI="lo,hi": guidance interval for the wave tier (CFG only while
        # t/T is inside [lo, hi) — cond-only steps run half the decoder batch).
        # Only promote values that pass the reseed-floor criterion in
        # QMODES_r05 (scripts/bench_quality_modes.py).
        gi = tuple(float(v) for v in
                   os.environ.get("WAVE_GI", "0,1").split(","))
        dsh = DSH(last_greedy=True, x_0_temp=0.7, guidance_w=3.0,
                  deep_clone=True, jump_len=1, jump_n_sample=1,
                  q0_override_steps=min(20, wave_t // 10),
                  enable_kevin_scaled_inference=True, guidance_interval=gi)

        def to_nar(r, i):
            l0 = (r.tokens[len(r.prompt):] - n_text).clip(0, 1023)
            text_len = len(r.prompt) - prompt_codec.shape[-1]
            return NarRequest(c_text=r.prompt[:text_len],
                              c_codes=prompt_codec[0].T, l0_codes=l0, seed=i)

        def make_sched():
            return NarWaveScheduler(nar_q, nar_cfg, diff, wave_t, dsh,
                                    wave_size=wave_rows,
                                    gen_buckets=(gen_bucket,), text_bucket=128)

    # warmup: compile AR prefill + chunk, then the wave shape (both BEFORE t0)
    warm = make_batcher()
    warm.submit(make_request(0))
    warm.step()
    warm.run(max_quanta=40)
    if use_nar:
        warm_sched = make_sched()
        for i in range(wave_rows):
            warm_sched.submit(to_nar(warm.completed[0], i))
        warm_sched.flush()
        sched = make_sched()

    batcher = make_batcher()
    reqs = [make_request(i + 1) for i in range(N_REQ)]
    # staggered arrivals: half up front, the rest fed as quanta complete
    for r in reqs[: N_REQ // 2]:
        batcher.submit(r)
    pending = list(reqs[N_REQ // 2:])

    t0 = time.perf_counter()
    ar_busy = nar_busy = 0.0
    n_sub = 0
    while True:
        if pending:
            batcher.submit(pending.pop(0))
        t1 = time.perf_counter()
        more = batcher.step()
        ar_busy += time.perf_counter() - t1
        if use_nar:
            while n_sub < len(batcher.completed):
                sched.submit(to_nar(batcher.completed[n_sub], n_sub))
                n_sub += 1
            if use_overlap and len(sched.queue) >= wave_rows:
                t1 = time.perf_counter()
                sched.flush_full_waves()
                nar_busy += time.perf_counter() - t1
        if not more and not pending:
            break
    if use_nar:
        t1 = time.perf_counter()
        done = sched.flush()          # leftover partial waves
        nar_busy += time.perf_counter() - t1
        assert len(done) == N_REQ
    wall = time.perf_counter() - t0

    assert len(batcher.completed) == N_REQ
    frames = sum(r.n_gen for r in batcher.completed)
    audio_s = frames / 75.0
    detail = {"requests": N_REQ, "rows": ROWS, "chunk_steps": CHUNK,
              "ar_engine": AR_ENGINE, "overlap": use_overlap,
              "ar_busy_s": round(ar_busy, 2), "quanta": batcher.chunks_run,
              "frames": int(frames),
              "ar_audio_s_per_s": round(audio_s / ar_busy, 3)}

    if use_nar:
        detail.update({"nar_busy_s": round(nar_busy, 2),
                       "nar_waves": sched.waves_run,
                       "wave_rows": wave_rows, "wave_t": wave_t,
                       "wave_gi": list(gi),
                       "gen_bucket": gen_bucket,
                       "nar_audio_s_per_s": round(audio_s / nar_busy, 3)})
        print(json.dumps({
            "metric": "continuous_system_throughput_audio_s_per_s",
            "value": round(audio_s / wall, 3), "unit": "s/s/chip",
            "detail": {**detail, "wall_s": round(wall, 2)}}))
        return

    print(json.dumps({
        "metric": "continuous_ar_throughput_audio_s_per_s",
        "value": round(audio_s / wall, 3),
        "unit": "s/s/chip",
        "detail": detail,
    }))


if __name__ == "__main__":
    main()
