"""Attention primitives: torch-MultiheadAttention-compatible MHA and banded causal SDPA.

Weight layout convention for the whole framework: linear kernels are stored in the
torch ``(out_features, in_features)`` layout and applied with a contracting
``dot_general`` — XLA folds the implied transpose into the matmul, so this costs
nothing on the MXU and makes checkpoint conversion a pure rename.

Softmax always runs in fp32 (TPU best practice; also bit-matches the fp32 parity
tests against the torch reference).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = float("-inf")


def linear(x, w, b=None):
    """y = x @ w.T (+ b), with w in torch (out, in) layout."""
    y = jax.lax.dot_general(
        x, w,
        dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=x.dtype if x.dtype == jnp.float32 else jnp.float32,
    ).astype(x.dtype)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


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
    if mask is not None:
        if mask.dtype == jnp.bool_:
            logits = jnp.where(mask, logits, NEG_INF)
        else:
            logits = logits + mask.astype(jnp.float32)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(q.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


_PALLAS_SELF_ATTN_MIN_LEN = 512


def torch_mha(p, q_in, kv_in, nhead: int, key_padding_mask=None):
    """torch ``nn.MultiheadAttention`` forward (batch_first, self- or cross-attention).

    Args:
        p: dict with ``in_proj_w`` (3D, D), ``in_proj_b`` (3D,), ``out_w`` (D, D),
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
    # One fused in_proj matmul for self-attention (output rows are independent,
    # so splitting after is bitwise-identical to three separate dots); for
    # cross-attention, a q dot + one fused kv dot. Matmul count matters: TPU
    # op cost at these shapes is latency-bound, not FLOP-bound.
    # Kernels may be int8 {"q","s"} dicts (weight-only or W8A8, ops/quant.py).
    if q_in is kv_in:
        qkv = linear_any(q_in, p["in_proj_w"], p["in_proj_b"])
        q, k, v = jnp.split(qkv, 3, axis=-1)
    else:
        q = linear_any(q_in, slice_rows(p["in_proj_w"], slice(None, d)),
                       p["in_proj_b"][:d])
        kv = linear_any(kv_in, slice_rows(p["in_proj_w"], slice(d, None)),
                        p["in_proj_b"][d:])
        k, v = jnp.split(kv, 2, axis=-1)
    q = q.reshape(b, lq, nhead, d // nhead)
    k = k.reshape(b, lk, nhead, d // nhead)
    v = v.reshape(b, lk, nhead, d // nhead)

    if lq == lk and lq >= _PALLAS_SELF_ATTN_MIN_LEN:
        from .pallas import enabled as _pallas_enabled
        if _pallas_enabled():
            from .pallas.mha import sdpa_pallas
            out = sdpa_pallas(q, k, v, key_padding_mask)
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
