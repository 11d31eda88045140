"""VMEM-resident bidirectional attention (Pallas) for the NAR self-attention.

The NAR decoder runs 16 layers of full self-attention over ~1.2k frames at CFG
batch 2: the XLA path materializes (B, H, L, L) fp32 score/prob tensors (20 TF/s
effective at NAR geometry); this kernel computes (q-block x all-keys) tiles
entirely in VMEM — scores, key bias, softmax and the PV contraction never touch
HBM.

Design notes (measured on v5e at (2, 16, 1200, 64)):
* Operates directly on the model's flattened (B, L, H*D) layout: one DMA per
  q-block covers every head, and the per-head (B, H, L, D) transpose copies +
  pads of an earlier version (~55 us/layer of XLA "data formatting") disappear.
  Heads are walked with static 64-lane slices inside the kernel.
* QK/PV dots keep the input dtype (bf16 -> f32 MXU accumulation); an earlier
  fp32-upcast version ran the MXU at 1/6 peak. At head_dim 64 the contraction
  is half the systolic depth, so ~98 TF/s is the attainable ceiling; softmax
  VPU work is the other half of the budget.
* Softmax normalization is deferred: PV contracts unnormalized exp weights and
  the output is divided by the row sum afterwards — one (BQ, D) divide instead
  of a (BQ, Lk) one.
* Key padding (both the lane-alignment pad to a multiple of 128 and the user's
  key_padding_mask) is applied in-kernel: an iota comparison for the alignment
  pad, a bias add for the user mask. q-side pad rows are garbage, sliced off by
  the caller.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu




def _quant_rows_f32(xf):
    """(R, C) f32 -> per-row symmetric int8 + f32 scale (R, 1)."""
    amax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
    xs = jnp.maximum(amax, 1e-8) / 127.0
    return jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8), xs


def _mha_kernel(q_ref, k_ref, v_ref, o_ref, *, heads_per_blk: int, lk: int,
                scale: float, bias_ref=None, quantized: bool = False):
    """Blocks: q/o (1, BQ, hpb*D); k/v (1, Lkp, hpb*D); bias (1, 8, Lkp).

    The lane axis carries ``heads_per_blk`` heads (chosen so hpb*D is a
    128-lane multiple); each head is a static 64-lane sub-slice.

    ``quantized``: int8 QK^T and PV dots (2x the MXU rate; the score/prob VPU
    math stays f32). q/k quantize per-row — the score is then exactly
    int32 * qs_i * ks_j — v per-output-channel, and the unnormalized exp
    weights map to int8 losslessly at fixed scale 127 (p in (0, 1]). Used by
    the W8A8 NAR path; divergence characterized in tests/test_quant.py.
    """
    hd = q_ref.shape[-1]
    d = hd // heads_per_blk
    lkp = k_ref.shape[1]
    for hi in range(heads_per_blk):
        sl = slice(hi * d, (hi + 1) * d)
        q = q_ref[0, :, sl]                        # (BQ, D)
        k = k_ref[0, :, sl]                        # (Lkp, D)
        if quantized:
            q8, qs = _quant_rows_f32(q.astype(jnp.float32))
            k8, ks = _quant_rows_f32(k.astype(jnp.float32))
            si = jax.lax.dot_general(q8, k8, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.int32)
            s = si.astype(jnp.float32) * (qs * scale) * ks.reshape(1, lkp)
            post_scale = 1.0
        else:
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            # 1/sqrt(D) folds into the exp argument below: softmax(s*c) =
            # exp((s - max s)*c) — one fewer full pass over the score tile
            # (the kernel is softmax-VPU-bound, not MXU-bound)
            post_scale = scale
        if bias_ref is not None:
            # the caller's bias already holds -inf on the lane-alignment pad
            # (sdpa_pallas pads the mask with True), so the iota pass is
            # only needed when no mask was given
            s = s + bias_ref[0, 0:1, :]
        elif lkp != lk:
            j = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(j < lk, s, -jnp.inf)
        m = jnp.max(s, axis=1, keepdims=True)
        # exp2 with the base change folded into the softmax scale: the kernel
        # is VPU-bound and 2^x is the VPU-native transcendental
        p = jnp.exp2((s - m) * (post_scale * 1.4426950408889634))
        r = jnp.sum(p, axis=1, keepdims=True)      # (BQ, 1)
        if quantized:
            vf = v_ref[0, :, sl].astype(jnp.float32)
            va = jnp.max(jnp.abs(vf), axis=0, keepdims=True)   # (1, D)
            vs = jnp.maximum(va, 1e-8) / 127.0
            v8 = jnp.clip(jnp.round(vf / vs), -127, 127).astype(jnp.int8)
            p8 = jnp.round(p * 127.0).astype(jnp.int8)         # p <= 1 exactly
            oi = jax.lax.dot_general(p8, v8, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.int32)
            o = oi.astype(jnp.float32) * (vs / 127.0)
        else:
            o = jax.lax.dot_general(p.astype(q.dtype), v_ref[0, :, sl],
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        o_ref[0, :, sl] = (o / r).astype(o_ref.dtype)


def _kernel_nobias(q_ref, k_ref, v_ref, o_ref, *, heads_per_blk, lk, scale,
                   quantized=False):
    _mha_kernel(q_ref, k_ref, v_ref, o_ref, heads_per_blk=heads_per_blk,
                lk=lk, scale=scale, quantized=quantized)


def _kernel_bias(q_ref, k_ref, v_ref, bias_ref, o_ref, *, heads_per_blk, lk,
                 scale, quantized=False):
    _mha_kernel(q_ref, k_ref, v_ref, o_ref, heads_per_blk=heads_per_blk,
                lk=lk, scale=scale, bias_ref=bias_ref, quantized=quantized)


@functools.partial(jax.jit, static_argnames=("nhead", "lk", "blk_q", "interpret",
                                             "quantized"))
def _call(q, k, v, bias, nhead: int, lk: int, blk_q: int, interpret: bool,
          quantized: bool = False):
    b, lqp, hd = q.shape
    lkp = k.shape[1]
    d = hd // nhead
    # lane block = smallest head group reaching a 128 multiple (2 heads at D=64)
    hpb = nhead
    for cand in range(1, nhead + 1):
        if nhead % cand == 0 and (cand * d) % 128 == 0:
            hpb = cand
            break
    scale = 1.0 / (d ** 0.5)
    grid = (b, nhead // hpb, lqp // blk_q)
    hb = hpb * d
    in_specs = [
        pl.BlockSpec((1, blk_q, hb), lambda bi, hi, qi: (bi, qi, hi)),
        pl.BlockSpec((1, lkp, hb), lambda bi, hi, qi: (bi, 0, hi)),
        pl.BlockSpec((1, lkp, hb), lambda bi, hi, qi: (bi, 0, hi)),
    ]
    args = [q, k, v]
    if bias is None:
        kernel = functools.partial(_kernel_nobias, heads_per_blk=hpb, lk=lk,
                                   scale=scale, quantized=quantized)
    else:
        kernel = functools.partial(_kernel_bias, heads_per_blk=hpb, lk=lk,
                                   scale=scale, quantized=quantized)
        in_specs.append(pl.BlockSpec((1, 8, lkp), lambda bi, hi, qi: (bi, 0, 0)))
        args.append(bias)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, blk_q, hb), lambda bi, hi, qi: (bi, qi, hi)),
        # the int8 mode's q8/k8/p8 temporaries overflow the 16 MB default
        # scoped-vmem budget at whole-seq q-blocks; the chip has headroom
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
    )(*args)


def sdpa_pallas(q, k, v, key_padding_mask=None, interpret: bool = False,
                quantized: bool = False):
    """Drop-in for ops.attention.sdpa (bidirectional self- OR cross-attention).

    Args:
        q: (B, Lq, H, D); k/v: (B, Lk, H, D) — Lk may differ from Lq (the NAR
            decoder's cross-attention reads a ~61-token memory; the XLA path
            would materialize (B, H, Lq, Lk) f32 score tensors in HBM).
        key_padding_mask: optional (B, Lk) bool, True = IGNORE (torch
            convention).
        quantized: run the QK^T/PV dots int8 (see _mha_kernel).
    Returns:
        (B, Lq, H, D) in q.dtype.
    """
    b, l, h, d = q.shape
    lk_in = k.shape[1]
    lkp = -(-lk_in // 128) * 128     # k rows: lane multiple for the score tile
    # Whole-sequence q-blocks measured fastest at NAR geometry (fewer programs,
    # 189 vs 204-224 us at (2,16,1200,64)); cap the block so the two live
    # (blk_q, lkp) fp32 score temporaries stay within ~14 MB of VMEM.
    max_blk = max(256, (14_000_000 // (lkp * 8) // 8) * 8)
    blk_q = min(-(-l // 8) * 8, max_blk)
    lqp = -(-l // blk_q) * blk_q     # q rows: pad to a whole q-block
    q2 = q.reshape(b, l, h * d)
    k2 = k.reshape(b, lk_in, h * d)
    v2 = v.reshape(b, lk_in, h * d)
    if lqp != l:
        q2 = jnp.pad(q2, ((0, 0), (0, lqp - l), (0, 0)))
    if lkp != lk_in:
        k2 = jnp.pad(k2, ((0, 0), (0, lkp - lk_in), (0, 0)))
        v2 = jnp.pad(v2, ((0, 0), (0, lkp - lk_in), (0, 0)))

    bias = None
    if key_padding_mask is not None:
        mask = jnp.pad(key_padding_mask, ((0, 0), (0, lkp - lk_in)),
                       constant_values=True)
        bias = jnp.where(mask, -jnp.inf, 0.0).astype(jnp.float32)
        bias = jnp.broadcast_to(bias[:, None, :], (b, 8, lkp))

    out = _call(q2, k2, v2, bias, nhead=h, lk=lk_in, blk_q=blk_q,
                interpret=interpret, quantized=quantized)
    return out[:, :l].reshape(b, l, h, d)
