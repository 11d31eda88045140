"""NAR diffusion stage probe at bench geometry (round-3 perf work).

Times ONLY the 200-step NAR trajectory from bench.py's configuration (rows=2
CFG, Lx = 450 prompt + 750 gen frames, 61-token memory) and reports ms/step.
This is the iteration harness for decoder-layer kernel work: every candidate
is evaluated by swapping it into the real scan and differencing stage times —
never by standalone microbenchmark (CLAUDE.md: isolated GEMMs are
unrepresentative on this stack).

Usage:
    python scripts/probe_nar.py                 # int8 production mode
    BENCH_NAR=bf16 python scripts/probe_nar.py  # parity mode
    PROBE_T=200 PROBE_RUNS=3 python scripts/probe_nar.py
Env knobs under test are read by the model code (MARS5_* in ops/ and models/).
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

PROBE_T = int(os.environ.get("PROBE_T", "200"))
PROBE_RUNS = int(os.environ.get("PROBE_RUNS", "3"))
BENCH_NAR = os.environ.get("BENCH_NAR", "int8")


def main():
    from mars5_tts_tpu.config import DSH
    from mars5_tts_tpu.diffusion import (MultinomialDiffusion,
                                         perform_simple_inference)
    from mars5_tts_tpu.models.nar import (ResidualTransformerConfig, init_nar)

    rng = np.random.default_rng(0)
    nar_cfg = ResidualTransformerConfig.mars5(n_text_vocab=4_096)
    nar = init_nar(jax.random.PRNGKey(1), nar_cfg, dtype=jnp.bfloat16)
    if BENCH_NAR == "int8":
        from mars5_tts_tpu.ops.quant import quantize_nar
        nar = quantize_nar(nar)

    text_len, n_prompt, n_gen = 60, 450, 750
    c_text = rng.integers(0, 4096, (1, text_len))
    c_codes = rng.integers(0, 1024, (1, n_prompt, 8))
    l0 = rng.integers(0, 1024, (n_gen,))
    _x = np.repeat(l0[None, :, None], 8, axis=2)
    xpm = np.zeros((1, n_gen), bool)
    diff = MultinomialDiffusion(1025, timesteps=PROBE_T)
    dsh = DSH(last_greedy=True, x_0_temp=0.7, guidance_w=3.0, deep_clone=True,
              jump_len=1, jump_n_sample=1, q0_override_steps=20,
              enable_kevin_scaled_inference=True)
    batch = (c_text, c_codes, np.asarray([text_len]), np.asarray([n_prompt]),
             _x, xpm)

    def run(seed):
        grid = perform_simple_inference(
            nar, nar_cfg, batch, diff, PROBE_T, dsh,
            key=jax.random.key(seed, impl="rbg"))
        return np.asarray(grid)  # host transfer = the only reliable sync

    t0 = time.perf_counter()
    run(0)  # warmup / compile
    compile_s = time.perf_counter() - t0
    prof_dir = os.environ.get("MARS5_PROFILE")
    if prof_dir:
        with jax.profiler.trace(prof_dir):
            run(99)
    ts = []
    for i in range(PROBE_RUNS):
        t0 = time.perf_counter()
        run(i + 1)
        ts.append(time.perf_counter() - t0)
    p50 = float(np.median(ts))
    print(json.dumps({
        "metric": "nar_stage_s", "value": round(p50, 4),
        "ms_per_step": round(p50 / PROBE_T * 1e3, 3),
        "T": PROBE_T, "mode": BENCH_NAR, "compile_s": round(compile_s, 1),
        "knobs": {k: v for k, v in os.environ.items()
                  if k.startswith("MARS5_")},
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
