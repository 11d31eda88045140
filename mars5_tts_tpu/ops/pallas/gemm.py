"""Fused W8A8 GEMM: per-token activation quant + int8 MXU dot + bf16 epilogue.

The NAR diffusion denoiser is compute-bound (SURVEY §2.7: 200 steps × 2 CFG
forwards of the 450M enc-dec). The chip's int8 MXU path is ~1.7× bf16 at NAR
shapes (scripts/bench_kernels.py probes: 134 TOP/s vs 80 TFLOP/s on
2400×1024×6144), but XLA's W8A8 recovers only ~1.16× end-to-end because the
dynamic activation quantization (extra HBM passes over the input) and the
int32→f32→scale→bf16 epilogue (4-byte intermediates) eat the win. This kernel
fuses the whole pipeline per tile: read x bf16, quantize rows in VMEM, dot
int8×int8→int32 on the MXU, apply (row scale × column scale) and optional bias,
write bf16 — int8/int32 tensors never touch HBM.

Weights are pre-transposed to (K, N) at quantize time (ops/quant.quantize_nar)
so the MXU consumes them natively. Falls back to the XLA path (ops/quant
.linear_w8a8) off-TPU and for shapes the grid can't tile (the 1025-class output
heads). Interpret mode runs on CPU for tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, ws_ref, o_ref):
    xf = x_ref[:].astype(jnp.float32)                     # (BM, K)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    xs = jnp.maximum(amax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(xq, w_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)   # (BM, BN)
    o_ref[:] = (y.astype(jnp.float32) * xs * ws_ref[:]).astype(o_ref.dtype)


def _kernel_bias(x_ref, w_ref, ws_ref, b_ref, o_ref):
    xf = x_ref[:].astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    xs = jnp.maximum(amax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(xq, w_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    o_ref[:] = (y.astype(jnp.float32) * xs * ws_ref[:]
                + b_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bm", "bn", "interpret"))
def w8a8_gemm(x, wq_t, ws, b=None, *, bm: int = 256, bn: int = 1024,
              interpret: bool = False):
    """y = quant_rows(x) @ wq_t * (row_scale ⊗ ws) [+ b], in x.dtype.

    Args:
        x: (..., K) bf16/f32 activations (leading dims flattened internally).
        wq_t: (K, N) int8 weights, already transposed to MXU-native layout.
        ws: (N,) f32 per-output-channel scales.
        b: optional (N,) bias.
    K and N must be multiples of 128; M is padded internally.
    """
    *lead, K = x.shape
    N = wq_t.shape[1]
    m = 1
    for s in lead:
        m *= s
    x2 = x.reshape(m, K)
    bm = min(bm, max(8, -(-m // 8) * 8))
    bn = min(bn, N)
    mp = -(-m // bm) * bm
    if mp != m:
        x2 = jnp.pad(x2, ((0, mp - m), (0, 0)))
    ws2 = ws.reshape(1, N).astype(jnp.float32)

    in_specs = [
        pl.BlockSpec((bm, K), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((K, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
    ]
    args = [x2, wq_t, ws2]
    kernel = _kernel
    if b is not None:
        in_specs.append(pl.BlockSpec((1, bn), lambda i, j: (0, j),
                                     memory_space=pltpu.VMEM))
        args.append(b.reshape(1, N).astype(jnp.float32))
        kernel = _kernel_bias

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((mp, N), x.dtype),
        grid=(mp // bm, N // bn),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*args)
    return out[:m].reshape(*lead, N)


def gemm_shapes_ok(k: int, n: int) -> bool:
    return k % 128 == 0 and n % 128 == 0
