"""Fused elementwise→int8 epilogues for the W8A8 NAR path (Pallas).

XLA cannot fuse a row-reduction (the dynamic per-token amax) into the producing
fusion AND the consuming quantize pass, so each LayerNorm→quant and
SwiGLU→quant site in the NAR decoder costs ~3 full passes over the activation
tensor (LN stats read, normed-copy + amax read/write, quant read). These
kernels do the whole chain in ONE read + one int8 write:

* ``ln_quant``:   x (B, L, D) bf16 → torch-LayerNorm (f32 stats, biased var,
                  bf16 round-trip to match ops/norms.layer_norm bitwise) →
                  per-row symmetric int8 + f32 row scale.
* ``silu_mul_quant``: wv (B, L, 2F) bf16 → silu(w)·v (bf16, matching
                  models/layers.swiglu_ff) → per-row int8 + scale.

At NAR bench geometry the two replace ~1.0 GB/step of fusion traffic with
~0.35 GB. Consumed through ops/quant.linear_any's pre-quantized input path;
gated to TPU (interpret mode covers CPU tests).

Reference being out-engineered: the torch layers run the whole chain in fp16
autocast with no quantization at all (mars5/model.py:205-229).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _quant_rows(yf):
    amax = jnp.max(jnp.abs(yf), axis=-1, keepdims=True)
    xs = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(yf / xs), -127, 127).astype(jnp.int8)
    return q, xs


def _ln_quant_kernel(x_ref, w_ref, b_ref, q_ref, s_ref, *, eps: float):
    xf = x_ref[0].astype(jnp.float32)                     # (BQ, D)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * w_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)
    # bf16 round-trip: the unfused path materializes layer_norm in x.dtype
    # before quantize_act — match it bitwise
    yf = y.astype(x_ref.dtype).astype(jnp.float32)
    q, xs = _quant_rows(yf)
    q_ref[0] = q
    s_ref[0] = xs


@functools.partial(jax.jit, static_argnames=("eps", "blk", "interpret"))
def ln_quant(x, w, b, eps: float = 4e-5, blk: int = 512,
             interpret: bool = False):
    """LayerNorm (torch semantics) + per-row int8 quant in one pass.

    Args:
        x: (B, L, D) activations (bf16/f32).
    Returns:
        (q int8 (B, L, D), scale f32 (B, L, 1)) with
        q * scale ≈ layer_norm(x, w, b).
    """
    bsz, l, d = x.shape
    blk = min(blk, -(-l // 8) * 8)
    lp = -(-l // blk) * blk
    if lp != l:
        x = jnp.pad(x, ((0, 0), (0, lp - l), (0, 0)))
    q, s = pl.pallas_call(
        functools.partial(_ln_quant_kernel, eps=eps),
        out_shape=(jax.ShapeDtypeStruct((bsz, lp, d), jnp.int8),
                   jax.ShapeDtypeStruct((bsz, lp, 1), jnp.float32)),
        grid=(bsz, lp // blk),
        in_specs=[pl.BlockSpec((1, blk, d), lambda i, j: (i, j, 0)),
                  pl.BlockSpec((1, d), lambda i, j: (0, 0)),
                  pl.BlockSpec((1, d), lambda i, j: (0, 0))],
        out_specs=(pl.BlockSpec((1, blk, d), lambda i, j: (i, j, 0)),
                   pl.BlockSpec((1, blk, 1), lambda i, j: (i, j, 0))),
        interpret=interpret,
    )(x, w.reshape(1, d), b.reshape(1, d))
    return q[:, :l], s[:, :l]


def _silu_mul_quant_kernel(wv_ref, q_ref, s_ref):
    f = wv_ref.shape[-1] // 2
    w = wv_ref[0, :, :f]
    v = wv_ref[0, :, f:]
    # silu in f32 with a bf16 round-trip (Mosaic cannot lower bf16 silu — a
    # f32 scalar broadcasts into the bf16 vector); one rounding step away from
    # swiglu_ff's bf16 chain, within the W8A8 quantization grid
    wf = w.astype(jnp.float32)
    sw = (wf * jax.nn.sigmoid(wf)).astype(wv_ref.dtype)
    u = (sw * v).astype(jnp.float32)
    q, xs = _quant_rows(u)
    q_ref[0] = q
    s_ref[0] = xs


@functools.partial(jax.jit, static_argnames=("blk", "interpret"))
def silu_mul_quant(wv, blk: int = 256, interpret: bool = False):
    """silu(w)·v + per-row int8 quant in one pass.

    Args:
        wv: (B, L, 2F) fused SwiGLU projections, W rows first (swiglu_ff).
    Returns:
        (q int8 (B, L, F), scale f32 (B, L, 1)).
    """
    bsz, l, f2 = wv.shape
    blk = min(blk, -(-l // 8) * 8)
    lp = -(-l // blk) * blk
    if lp != l:
        wv = jnp.pad(wv, ((0, 0), (0, lp - l), (0, 0)))
    q, s = pl.pallas_call(
        _silu_mul_quant_kernel,
        out_shape=(jax.ShapeDtypeStruct((bsz, lp, f2 // 2), jnp.int8),
                   jax.ShapeDtypeStruct((bsz, lp, 1), jnp.float32)),
        grid=(bsz, lp // blk),
        in_specs=[pl.BlockSpec((1, blk, f2), lambda i, j: (i, j, 0))],
        out_specs=(pl.BlockSpec((1, blk, f2 // 2), lambda i, j: (i, j, 0)),
                   pl.BlockSpec((1, blk, 1), lambda i, j: (i, j, 0))),
        interpret=interpret,
    )(wv)
    return q[:, :l], s[:, :l]
