"""Kernel-level perf experiments on the real TPU chip (round-2 perf work).

Measures, inside real jitted graphs (loops in-graph, host-transfer sync — see
CLAUDE.md "Environment gotchas"):

  EXP=ar   AR decode-step variants at MARS5 geometry (26L, d1536, W=1261, bs=1):
           bf16 / int8-weight (fp32 acc) / W8A8 (int32 acc) via XLA.
  EXP=nar  NAR-shape matmul chain (2400x1024 @ 3072, CFG batch already folded in
           M): effective TOPS for bf16 XLA, int8 XLA (int32 acc), int8 Pallas
           tiled, bf16 Pallas tiled.

Run ONE experiment at a time (the single axon chip aborts on concurrency):
    python scripts/bench_kernels.py ar
    python scripts/bench_kernels.py nar
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


def timeit(fn, *args, reps=3):
    out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0])  # sync (block_until_ready is broken on axon)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = np.asarray(jax.tree.leaves(out)[0])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


# ---------------------------------------------------------------- AR decode

def exp_ar():
    from mars5_tts_tpu.models.ar import CodecLMConfig, init_codeclm
    from mars5_tts_tpu.models.ar_decode import _decode_backbone_step
    from mars5_tts_tpu.ops.quant import quantize_codeclm

    cfg = CodecLMConfig.mars5(24_000)
    key = jax.random.PRNGKey(0)
    params = init_codeclm(key, cfg, dtype=jnp.bfloat16)
    W, BS, STEPS = 1261, 1, 64

    @functools.partial(jax.jit, static_argnames=("n",))
    def run(p, ck, cv, n):
        def body(i, carry):
            tok, ck, cv = carry
            pos = jnp.full((BS,), 600, jnp.int32) + i
            logits, ck, cv = _decode_backbone_step(p, cfg, tok, pos, ck, cv)
            return jnp.argmax(logits, -1).astype(jnp.int32), ck, cv
        tok0 = jnp.full((BS,), 5000, jnp.int32)
        return jax.lax.fori_loop(0, n, body, (tok0, ck, cv))

    ck = jnp.zeros((cfg.n_layers, BS, W, cfg.n_kv_heads, cfg.head_dim), jnp.bfloat16)
    cv = jnp.zeros_like(ck)

    results = {}
    for name, p in [
        ("bf16", params),
        ("w8", quantize_codeclm(params)),
        ("w8a8", quantize_codeclm(params, act_int8=True)),
    ]:
        t = timeit(lambda pp: run(pp, ck, cv, STEPS), p)
        results[name] = round(t / STEPS * 1e3, 3)
        print(f"ar step {name}: {results[name]} ms", flush=True)
    print(json.dumps({"exp": "ar_decode_step_ms", **results}))


# ---------------------------------------------------------------- NAR matmul

def _pallas_matmul(x, w, out_dtype, bm=256, bn=256):
    """x (M, K) @ w (N, K).T -> (M, N); blocks (bm, K) x (bn, K)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    M, K = x.shape
    N = w.shape[0]

    def kernel(x_ref, w_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            x_ref[:], w_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=out_dtype)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        grid=(M // bm, N // bn),
        in_specs=[
            pl.BlockSpec((bm, K), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, K), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
    )(x, w)


def exp_nar():
    M, K, N, STEPS = 2432, 1024, 3072, 100
    key = jax.random.PRNGKey(0)
    flops = 2 * M * K * N + 2 * M * N * K  # two chained matmuls per iter

    x8 = jax.random.randint(key, (M, K), -127, 127, jnp.int8)
    w1_8 = jax.random.randint(key, (N, K), -127, 127, jnp.int8)
    w2_8 = jax.random.randint(key, (K, N), -127, 127, jnp.int8)
    xb = jax.random.normal(key, (M, K), jnp.bfloat16)
    w1_b = jax.random.normal(key, (N, K), jnp.bfloat16)
    w2_b = jax.random.normal(key, (K, N), jnp.bfloat16)

    def chain_xla_i8(x, w1, w2, n):
        def body(i, x):
            y = jax.lax.dot_general(x, w1, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            y = (y >> 8).astype(jnp.int8)
            z = jax.lax.dot_general(y, w2, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            return (z >> 8).astype(jnp.int8)
        return jax.lax.fori_loop(0, n, body, x)

    def chain_xla_bf16(x, w1, w2, n):
        def body(i, x):
            y = jax.lax.dot_general(x, w1, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            z = jax.lax.dot_general(y.astype(jnp.bfloat16), w2,
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            return z.astype(jnp.bfloat16) * 1e-3
        return jax.lax.fori_loop(0, n, body, x)

    def chain_pallas_i8(x, w1, w2, n):
        def body(i, x):
            y = (_pallas_matmul(x, w1, jnp.int32) >> 8).astype(jnp.int8)
            return (_pallas_matmul(y, w2, jnp.int32) >> 8).astype(jnp.int8)
        return jax.lax.fori_loop(0, n, body, x)

    def chain_pallas_bf16(x, w1, w2, n):
        def body(i, x):
            y = _pallas_matmul(x, w1, jnp.float32).astype(jnp.bfloat16)
            return (_pallas_matmul(y, w2, jnp.float32) * 1e-3).astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, n, body, x)

    results = {}
    for name, fn, args in [
        ("xla_bf16", chain_xla_bf16, (xb, w1_b, w2_b)),
        ("xla_int8_i32acc", chain_xla_i8, (x8, w1_8, w2_8)),
        ("pallas_bf16", chain_pallas_bf16, (xb, w1_b, w2_b)),
        ("pallas_int8_i32acc", chain_pallas_i8, (x8, w1_8, w2_8)),
    ]:
        jfn = jax.jit(functools.partial(fn, n=STEPS))
        t = timeit(jfn, *args)
        tops = flops * STEPS / t / 1e12
        results[name] = round(tops, 1)
        print(f"nar matmul {name}: {tops:.1f} TOPS  ({t/STEPS*1e3:.3f} ms/iter)",
              flush=True)
    print(json.dumps({"exp": "nar_matmul_tops", **results}))


if __name__ == "__main__":
    exp = sys.argv[1] if len(sys.argv) > 1 else "ar"
    print(f"device: {jax.devices()[0]}", flush=True)
    {"ar": exp_ar, "nar": exp_nar}[exp]()
