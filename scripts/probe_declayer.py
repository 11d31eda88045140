"""Decoder-stack differential probe (round-3 GEMM/kernel iteration harness).

Scans N steps of the REAL 16-layer NAR decoder stack at bench geometry
(rows=2, L=1200, memory 61) with a tiny loop-carried feedback (no CSE), which
reproduces the in-graph op rates of the full diffusion scan (CLAUDE.md:
isolated GEMM benches are unrepresentative; the real-graph scan is the
trustworthy instrument) at a fraction of the compile time.

Usage:
    python scripts/probe_declayer.py                 # int8 W8A8 stack
    PROBE_STEPS=40 PROBE_RUNS=3 python scripts/probe_declayer.py

Interpretation: ms/step differences × 200 = NAR stage impact; per-layer
deltas are (difference / 16).
"""

import functools
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

STEPS = int(os.environ.get("PROBE_STEPS", "50"))
RUNS = int(os.environ.get("PROBE_RUNS", "3"))
MODE = os.environ.get("BENCH_NAR", "int8")


def main():
    from mars5_tts_tpu.models.layers import decoder_stack
    from mars5_tts_tpu.models.nar import ResidualTransformerConfig, init_nar

    cfg = ResidualTransformerConfig.mars5(n_text_vocab=4_096)
    nar = init_nar(jax.random.PRNGKey(1), cfg, dtype=jnp.bfloat16)
    if MODE == "int8":
        from mars5_tts_tpu.ops.quant import quantize_nar
        nar = quantize_nar(nar)
    dec = nar["decoder"]

    rows, L, lc, d = 2, 1200, 61, cfg.dim
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (rows, L, d), jnp.bfloat16)
    memory = jax.random.normal(jax.random.fold_in(key, 1), (rows, lc, d),
                               jnp.bfloat16)
    xpm = jnp.zeros((rows, L), bool)
    cpm = jnp.zeros((rows, lc), bool)

    @functools.partial(jax.jit, static_argnames=("n",))
    def run(p, x0, memory, n):
        def body(h, _):
            out = decoder_stack(p, h, memory, nhead=cfg.nhead,
                                tgt_key_padding_mask=xpm,
                                memory_key_padding_mask=cpm)
            # keep the output alive + perturb the next input so no step CSEs
            return x0 + (out * jnp.bfloat16(1e-8)), None

        h, _ = jax.lax.scan(body, x0, None, length=n)
        return h

    t0 = time.perf_counter()
    _ = np.asarray(run(dec, x0, memory, STEPS))
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        _ = np.asarray(run(dec, x0, memory, STEPS))
        ts.append(time.perf_counter() - t0)
    p50 = float(np.median(ts))
    print(json.dumps({
        "metric": "decoder_stack_ms_per_step",
        "value": round(p50 / STEPS * 1e3, 3),
        "per_layer_us": round(p50 / STEPS / 16 * 1e6, 1),
        "steps": STEPS, "mode": MODE, "compile_s": round(compile_s, 1),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
