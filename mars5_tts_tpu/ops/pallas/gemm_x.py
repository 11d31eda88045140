"""Round-3 Mosaic GEMM experiments (not production; selected via MARS5_GEMM_X).

Each variant computes the NAR WV site y = x @ Wq.T * s (x bf16 (M,K),
Wq int8 torch-layout (N,K) with per-output scales) and is swapped into
models/layers.swiglu_ff by the MARS5_GEMM_X env knob, then measured by
differencing scripts/probe_nar.py stage times (CLAUDE.md: never standalone).

Round-2 finding under re-investigation: a naive blocked Pallas int8 GEMM ran
163 us vs XLA's 87 for the same shape, insensitive to blocking — 30.2 GFLOP /
163 us = 185 TOPS = exactly the bf16 MXU peak, suggesting Mosaic emits the
int8 dot at bf16 rate. Variants isolate: in-kernel act-quant cost, int8
emission, K-split accumulation, operand layouts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _quant_rows(xf):
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    xs = jnp.maximum(amax, 1e-8) / 127.0
    return jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8), xs


# ---------------------------------------------------------------- variants
# All take (x bf16 (M, K), wq (N, K) int8, ws (N,) f32, bias maybe) -> bf16.


def _v_prequant(x, wq, ws, b, *, bm, bn, kernel_dot):
    """Act-quant in XLA; kernel does ONLY the int8 dot + f32 epilogue."""
    M, K = x.shape
    N = wq.shape[0]
    xq, xs = _quant_rows(x.astype(jnp.float32))
    wt = wq.T  # (K, N) — XLA-side transpose, hoisted out of the scan by CSE?
    # NOTE: wq is a scan-carried constant; the transpose materializes once
    # per scan trip at most. For a fair production kernel we'd pre-transpose
    # at quantize time.

    def kern(xq_ref, w_ref, ws_ref, xs_ref, o_ref):
        y = kernel_dot(xq_ref[:], w_ref[:])
        o_ref[:] = (y.astype(jnp.float32) * xs_ref[:] * ws_ref[:]).astype(o_ref.dtype)

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        grid=(M // bm, N // bn),
        in_specs=[
            pl.BlockSpec((bm, K), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
    )(xq, wt, ws.reshape(1, N).astype(jnp.float32), xs)
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def _dot_i32(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)


def _dot_f32(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _v_bf16(x, wq, ws, b, *, bm, bn):
    """bf16 x bf16 dot at the same shape — isolates the int8-emission question."""
    M, K = x.shape
    N = wq.shape[0]
    wb = (wq.astype(jnp.float32) * ws[:, None]).astype(jnp.bfloat16).T  # (K, N)

    def kern(x_ref, w_ref, o_ref):
        o_ref[:] = _dot_f32(x_ref[:], w_ref[:]).astype(o_ref.dtype)

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        grid=(M // bm, N // bn),
        in_specs=[
            pl.BlockSpec((bm, K), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
    )(x, wb)
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def _v_naive(x, wq, ws, b, *, bm, bn):
    """Round-2 shape: quant in-kernel, int8 dot, f32 epilogue (gemm.py twin)."""
    M, K = x.shape
    N = wq.shape[0]
    wt = wq.T

    def kern(x_ref, w_ref, ws_ref, o_ref):
        xq, xs = _quant_rows(x_ref[:].astype(jnp.float32))
        y = _dot_i32(xq, w_ref[:])
        o_ref[:] = (y.astype(jnp.float32) * xs * ws_ref[:]).astype(o_ref.dtype)

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        grid=(M // bm, N // bn),
        in_specs=[
            pl.BlockSpec((bm, K), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
    )(x, wt, ws.reshape(1, N).astype(jnp.float32))
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def _v_nk(x, wq, ws, b, *, bm, bn):
    """int8 dot with w in (N, K) layout contracted on dim 1 (no transpose)."""
    M, K = x.shape
    N = wq.shape[0]
    xq, xs = _quant_rows(x.astype(jnp.float32))

    def kern(xq_ref, w_ref, ws_ref, xs_ref, o_ref):
        y = jax.lax.dot_general(xq_ref[:], w_ref[:], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.int32)
        o_ref[:] = (y.astype(jnp.float32) * xs_ref[:] * ws_ref[:]).astype(o_ref.dtype)

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        grid=(M // bm, N // bn),
        in_specs=[
            pl.BlockSpec((bm, K), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, K), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
    )(xq, wq, ws.reshape(1, N).astype(jnp.float32), xs)
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def _v_ksplit(x, wq, ws, b, *, bm, bn, bk):
    """K-split grid with f32 scratch accumulation; K innermost 'arbitrary'."""
    M, K = x.shape
    N = wq.shape[0]
    xq, xs = _quant_rows(x.astype(jnp.float32))
    wt = wq.T

    def kern(xq_ref, w_ref, ws_ref, xs_ref, o_ref, acc):
        ki = pl.program_id(2)

        @pl.when(ki == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        acc[:] += _dot_i32(xq_ref[:], w_ref[:])

        @pl.when(ki == pl.num_programs(2) - 1)
        def _():
            o_ref[:] = (acc[:].astype(jnp.float32) * xs_ref[:]
                        * ws_ref[:]).astype(o_ref.dtype)

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        grid=(M // bm, N // bn, K // bk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i, j, k: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(xq, wt, ws.reshape(1, N).astype(jnp.float32), xs)
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def _v_unroll(x, wq, ws, b, *, bm, bn, bk):
    """Full-K block, but the in-kernel dot manually unrolled over K chunks."""
    M, K = x.shape
    N = wq.shape[0]
    xq, xs = _quant_rows(x.astype(jnp.float32))
    wt = wq.T

    def kern(xq_ref, w_ref, ws_ref, xs_ref, o_ref):
        acc = jnp.zeros((xq_ref.shape[0], w_ref.shape[1]), jnp.int32)
        for k0 in range(0, K, bk):
            acc += _dot_i32(xq_ref[:, k0:k0 + bk], w_ref[k0:k0 + bk, :])
        o_ref[:] = (acc.astype(jnp.float32) * xs_ref[:] * ws_ref[:]).astype(o_ref.dtype)

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        grid=(M // bm, N // bn),
        in_specs=[
            pl.BlockSpec((bm, K), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
    )(xq, wt, ws.reshape(1, N).astype(jnp.float32), xs)
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def _padded(fn, bm):
    def run(x2, wq, ws, b):
        m = x2.shape[0]
        mp = -(-m // bm) * bm
        if mp != m:
            x2 = jnp.pad(x2, ((0, mp - m), (0, 0)))
        return fn(x2, wq, ws, b, bm=bm)[:m]
    return run


VARIANTS = {
    "naive": _padded(functools.partial(_v_naive, bn=1024), 800),
    "prequant": _padded(functools.partial(_v_prequant, bn=1024,
                                          kernel_dot=_dot_i32), 800),
    "prequant_f32acc": _padded(functools.partial(_v_prequant, bn=1024,
                                                 kernel_dot=_dot_f32), 800),
    "bf16": _padded(functools.partial(_v_bf16, bn=1024), 800),
    "nk": _padded(functools.partial(_v_nk, bn=1024), 800),
    "ksplit": _padded(functools.partial(_v_ksplit, bn=1536, bk=512), 1216),
    "unroll": _padded(functools.partial(_v_unroll, bn=1024, bk=256), 800),
    "bigm": _padded(functools.partial(_v_prequant, bn=768,
                                      kernel_dot=_dot_i32), 2432),
}


def wv_experiment(x3, wq, ws, b=None):
    """Entry used by swiglu_ff when MARS5_GEMM_X is set: (B, L, K) -> (B, L, N)."""
    import os
    name = os.environ["MARS5_GEMM_X"]
    bsz, l, k = x3.shape
    x2 = x3.reshape(bsz * l, k)
    out = VARIANTS[name](x2, wq, ws, b)
    return out.reshape(bsz, l, -1)
