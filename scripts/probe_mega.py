"""On-chip validation + differential probe for the NAR stack megakernel.

Stage 1 (compile sanity, per the axon protocol: validate new Pallas kernels
standalone BEFORE embedding them in big scans): one jitted mega_decoder_stack
call at bench geometry — reports compile seconds and single-call ms.

Stage 2 (numerics on real hardware): same inputs through the default
decoder_stack path (fused sites) vs the megakernel; reports max/mean abs diff
and cosine on the valid rows.

Stage 3 (the trustworthy instrument): probe_declayer-style N-step scan of the
real 16-layer stack with MARS5_NAR_MEGA on vs off — ms/step difference x 200
= NAR stage impact.

Usage:
    python scripts/probe_mega.py                  # all stages
    PROBE_STAGE=1 python scripts/probe_mega.py    # compile check only
    PROBE_STEPS=50 PROBE_RUNS=3 python scripts/probe_mega.py
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
STAGE = os.environ.get("PROBE_STAGE", "all")


def main():
    from mars5_tts_tpu.models.layers import decoder_stack
    from mars5_tts_tpu.models.nar import ResidualTransformerConfig, init_nar
    from mars5_tts_tpu.ops.quant import quantize_nar

    cfg = ResidualTransformerConfig.mars5(n_text_vocab=4_096)
    nar = init_nar(jax.random.PRNGKey(1), cfg, dtype=jnp.bfloat16)
    nar = quantize_nar(nar)
    dec = nar["decoder"]

    rows, L, lc, d = 2, 1200, 61, cfg.dim
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (rows, L, d), jnp.bfloat16)
    memory = jax.random.normal(jax.random.fold_in(key, 1), (rows, lc, d),
                               jnp.bfloat16)
    xpm = jnp.zeros((rows, L), bool)
    cpm = jnp.zeros((rows, lc), bool)

    if STAGE in ("all", "1", "2"):
        from mars5_tts_tpu.ops.pallas.nar_mega import mega_decoder_stack

        @jax.jit
        def one_call(p, x, m):
            return mega_decoder_stack(p["layers"], x, m, cfg.nhead, xpm, cpm)

        t0 = time.perf_counter()
        y_mega = np.asarray(one_call(dec, x0, memory))
        compile_s = time.perf_counter() - t0
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(one_call(dec, x0, memory))
            ts.append(time.perf_counter() - t0)
        print(json.dumps({"stage": 1, "metric": "mega_single_call_ms",
                          "value": round(float(np.median(ts)) * 1e3, 3),
                          "compile_s": round(compile_s, 1)}), flush=True)

        if STAGE in ("all", "2"):
            os.environ["MARS5_NAR_MEGA"] = "0"

            @jax.jit
            def base_call(p, x, m):
                return decoder_stack(p, x, m, nhead=cfg.nhead,
                                     tgt_key_padding_mask=xpm,
                                     memory_key_padding_mask=cpm)

            from mars5_tts_tpu.ops.norms import layer_norm
            from mars5_tts_tpu.models.layers import LAYERNORM_EPS
            y_base = np.asarray(base_call(dec, x0, memory), np.float32)
            y_m = np.asarray(
                layer_norm(jnp.asarray(y_mega), dec["norm_w"], dec["norm_b"],
                           LAYERNORM_EPS), np.float32)
            diff = np.abs(y_m - y_base)
            cos = float((y_m * y_base).sum()
                        / (np.linalg.norm(y_m) * np.linalg.norm(y_base)))
            print(json.dumps({"stage": 2, "max_abs_diff": float(diff.max()),
                              "mean_abs_diff": float(diff.mean()),
                              "scale": float(np.abs(y_base).max()),
                              "cosine": round(cos, 6)}), flush=True)

    if STAGE in ("all", "3"):
        @functools.partial(jax.jit, static_argnames=("n",))
        def run(p, x0, memory, n):
            def body(h, _):
                out = decoder_stack(p, h, memory, nhead=cfg.nhead,
                                    tgt_key_padding_mask=xpm,
                                    memory_key_padding_mask=cpm)
                return x0 + (out * jnp.bfloat16(1e-8)), None

            h, _ = jax.lax.scan(body, x0, None, length=n)
            return h

        profile_dir = os.environ.get("PROBE_PROFILE", "")
        results = {}
        for mode in ("0", "1"):
            os.environ["MARS5_NAR_MEGA"] = mode
            t0 = time.perf_counter()
            _ = np.asarray(run(dec, x0, memory, STEPS))
            compile_s = time.perf_counter() - t0
            ts = []
            for _ in range(RUNS):
                t0 = time.perf_counter()
                _ = np.asarray(run(dec, x0, memory, STEPS))
                ts.append(time.perf_counter() - t0)
            if profile_dir:
                with jax.profiler.trace(f"{profile_dir}/mega{mode}"):
                    _ = np.asarray(run(dec, x0, memory, STEPS))
            results[f"mega{mode}_ms_per_step"] = round(
                float(np.median(ts)) / STEPS * 1e3, 3)
            results[f"mega{mode}_compile_s"] = round(compile_s, 1)
            run.clear_cache()   # env knob is read at trace time
        results["stage"] = 3
        results["delta_nar_s_at_T200"] = round(
            (results["mega1_ms_per_step"] - results["mega0_ms_per_step"])
            * 200 / 1e3, 3)
        print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
