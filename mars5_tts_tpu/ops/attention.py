"""Attention primitives: torch-MultiheadAttention-compatible MHA and banded causal SDPA.

Weight layout convention for the whole framework: linear kernels are stored in the
torch ``(out_features, in_features)`` layout and applied with a contracting
``dot_general`` — XLA folds the implied transpose into the matmul, so this costs
nothing on the MXU and makes checkpoint conversion a pure rename.

Softmax always runs in fp32 (TPU best practice; also bit-matches the fp32 parity
tests against the torch reference).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

# Measured-negative perf experiments, default OFF (v5e bench, 200-step NAR):
# int8 attention dots for W8A8 layers (+0.2s: the flash kernel is softmax-VPU-
# bound, so halving MXU time while adding quant passes loses) and routing
# long-q cross-attention through the Pallas kernel (tiny-Lk programs lose to
# XLA's batched einsum). Kept behind env knobs for re-evaluation on other
# geometries/hardware.
_QATTN = os.environ.get("MARS5_QATTN", "0") == "1"
_CROSS_PALLAS = os.environ.get("MARS5_CROSS_PALLAS", "0") == "1"

NEG_INF = float("-inf")


def linear(x, w, b=None):
    """y = x @ w.T (+ b), with w in torch (out, in) layout.

    Stacked kernels (e.g. the (3, D, D) fused attention in_proj) contract the
    last axis and keep the leading stack axes on the output: (..., 3, D).
    """
    y = jax.lax.dot_general(
        x, w,
        dimension_numbers=(((x.ndim - 1,), (w.ndim - 1,)), ((), ())),
        preferred_element_type=x.dtype if x.dtype == jnp.float32 else jnp.float32,
    ).astype(x.dtype)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def _scores_bf16() -> bool:
    import os
    return os.environ.get("MARS5_SDPA_BF16", "1") == "1"


def sdpa(q, k, v, mask=None):
    """Scaled dot-product attention.

    Args:
        q: (B, Lq, H, Dh); k/v: (B, Lk, H, Dh).
        mask: optional additive mask broadcastable to (B, H, Lq, Lk) (0 = keep,
            -inf = drop), or a bool mask (True = keep).
    Returns:
        (B, Lq, H, Dh) in q.dtype.
    """
    dh = q.shape[-1]
    scale = 1.0 / (dh ** 0.5)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if q.dtype == jnp.bfloat16 and _scores_bf16():
        # Serving fast path (bf16 inputs only — fp32 parity is untouched):
        # store the (B, H, Lq, Lk) score tensor bf16 instead of f32, halving
        # the dominant HBM traffic of the XLA attention path (the NAR
        # cross-attention writes+reads ~9.4 MB/layer/step of scores; the
        # 400-sequence encoder precompute ~95 MB/layer). The f32->bf16
        # rounding perturbs probs by ~2^-8 relative — well inside the W8A8
        # serving envelope (per-GEMM ~1.1%); scored by bench_quality_modes.
        # MARS5_SDPA_BF16=0 restores f32 scores.
        logits = logits.astype(jnp.bfloat16)
    if mask is not None:
        if mask.dtype == jnp.bool_:
            logits = jnp.where(mask, logits, NEG_INF)
        else:
            logits = logits + mask.astype(logits.dtype)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(q.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


_PALLAS_SELF_ATTN_MIN_LEN = 512


def torch_mha(p, q_in, kv_in, nhead: int, key_padding_mask=None):
    """torch ``nn.MultiheadAttention`` forward (batch_first, self- or cross-attention).

    Args:
        p: dict with ``in_proj_w`` (3, D, D) — torch's fused (3D, D) in_proj
           reshaped so the q/k/v thirds sit on a leading stack axis (the output
           D axis is then head-shardable with a plain PartitionSpec, see
           parallel/sharding.py) — ``in_proj_b`` (3, D), ``out_w`` (D, D),
           ``out_b`` (D,).
        q_in: (B, Lq, D) queries; kv_in: (B, Lk, D) keys/values source.
        key_padding_mask: optional (B, Lk) bool, True = IGNORE (torch convention).

    Long self-attention routes through the VMEM-resident Pallas kernel on TPU
    (scores never hit HBM; ~1.4x per layer at NAR geometry); short sequences and
    cross-attention stay on the fused XLA path.
    """
    from .quant import linear_any, slice_rows

    d = q_in.shape[-1]
    b, lq = q_in.shape[:2]
    lk = kv_in.shape[1]
    # One fused in_proj matmul for self-attention (XLA flattens the (3, D)
    # output axes into one GEMM, so this is bitwise-identical to the flat
    # (3D, D) kernel); for cross-attention, a q dot + one fused kv dot. Matmul
    # count matters: TPU op cost at these shapes is latency-bound.
    # Kernels may be int8 {"q","s"} dicts (weight-only or W8A8, ops/quant.py).
    if q_in is kv_in:
        qkv = linear_any(q_in, p["in_proj_w"], p["in_proj_b"])  # (B, L, 3, D)
        q, k, v = qkv[..., 0, :], qkv[..., 1, :], qkv[..., 2, :]
    else:
        q = linear_any(q_in, slice_rows(p["in_proj_w"], 0), p["in_proj_b"][0])
        kv = linear_any(kv_in, slice_rows(p["in_proj_w"], slice(1, None)),
                        p["in_proj_b"][1:])                     # (B, Lk, 2, D)
        k, v = kv[..., 0, :], kv[..., 1, :]
    q = q.reshape(b, lq, nhead, d // nhead)
    k = k.reshape(b, lk, nhead, d // nhead)
    v = v.reshape(b, lk, nhead, d // nhead)

    if lq >= _PALLAS_SELF_ATTN_MIN_LEN and (lq == lk or _CROSS_PALLAS):
        # long-q self OR cross attention: the Pallas kernel keeps the
        # (Lq, Lk) score tile in VMEM (cross-attention's XLA path would
        # materialize (B, H, Lq, Lk) f32 three times per layer)
        from .pallas import enabled as _pallas_enabled
        if _pallas_enabled():
            from .quant import is_quantized
            from .pallas.mha import sdpa_pallas
            # int8-weight layers also run the attention dots int8 (QK^T / PV
            # at 2x the MXU rate; softmax stays f32 — see mha._mha_kernel)
            out = sdpa_pallas(q, k, v, key_padding_mask,
                              quantized=_QATTN and is_quantized(p["in_proj_w"]))
            return linear_any(out.reshape(b, lq, d), p["out_w"], p["out_b"])

    mask = None
    if key_padding_mask is not None:
        mask = ~key_padding_mask[:, None, None, :]  # True = keep
    out = sdpa(q, k, v, mask)
    return linear_any(out.reshape(b, lq, d), p["out_w"], p["out_b"])


def banded_causal_mask(length: int, window: int, dtype=jnp.float32):
    """Additive (L, L) mask: position i attends to j in [i - window, i].

    Matches the reference's ``log(triu(tril(ones), -window))``
    (mars5/nn_future.py:380-392).
    """
    i = jnp.arange(length)[:, None]
    j = jnp.arange(length)[None, :]
    allowed = (j <= i) & (j >= i - window)
    return jnp.where(allowed, 0.0, NEG_INF).astype(dtype)
