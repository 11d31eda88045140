"""VMEM-resident bidirectional attention (Pallas) for the NAR self-attention.

The NAR decoder runs 16 layers of full self-attention over ~1.2k frames at CFG
batch 2: the XLA path materializes (B, H, L, L) fp32 score/prob tensors in HBM
(~190 MB each, several passes -> ~10 ms/step of pure traffic). Here each grid
program computes one (q-block x all-keys) tile entirely in VMEM: scores, key-
padding bias, softmax, and the PV contraction never touch HBM.

Layout contract: inputs arrive (B, H, Lp, D) with Lp padded to the q-block size;
the additive key bias arrives (B, 8, Lp) (8 copies on the sublane axis to satisfy
TPU tiling; row 0 is used). Padded queries produce garbage rows that the caller
slices off; padded keys carry -inf bias.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

BLK_Q = 256


def _kernel(q_ref, k_ref, v_ref, bias_ref, o_ref):
    """Blocks: q (1,1,BLK_Q,D); k/v (1,1,Lp,D); bias (1,8,Lp); out like q."""
    d = q_ref.shape[-1]
    q = q_ref[0, 0].astype(jnp.float32)           # (BLK_Q, D)
    k = k_ref[0, 0].astype(jnp.float32)           # (Lp, D)
    scale = 1.0 / (d ** 0.5)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    s = s + bias_ref[0, 0:1, :]                    # (1, Lp) broadcast
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=1, keepdims=True)
    v = v_ref[0, 0].astype(jnp.float32)
    o_ref[0, 0] = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def mha_padded_pallas(q, k, v, bias, interpret: bool = False):
    """Attention over padded inputs.

    Args:
        q/k/v: (B, H, Lp, D), Lp % BLK_Q == 0.
        bias: (B, 8, Lp) additive key bias (-inf at padded keys), fp32.
    Returns:
        (B, H, Lp, D) in q.dtype.
    """
    b, h, lp, d = q.shape
    grid = (b, h, lp // BLK_Q)
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, BLK_Q, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, lp, d), lambda bi, hi, qi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 1, lp, d), lambda bi, hi, qi: (bi, hi, 0, 0)),
            pl.BlockSpec((1, 8, lp), lambda bi, hi, qi: (bi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, BLK_Q, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
        interpret=interpret,
    )(q, k, v, bias)


def sdpa_pallas(q, k, v, key_padding_mask=None, interpret: bool = False):
    """Drop-in for ops.attention.sdpa on bidirectional self-attention.

    Args:
        q/k/v: (B, L, H, D) with Lq == Lk.
        key_padding_mask: optional (B, L) bool, True = IGNORE (torch convention).
    Returns:
        (B, L, H, D) in q.dtype.
    """
    b, l, h, d = q.shape
    lp = -(-l // BLK_Q) * BLK_Q
    pad = lp - l

    def prep(x):
        x = jnp.transpose(x, (0, 2, 1, 3))  # (B, H, L, D)
        if pad:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
        return x

    qt, kt, vt = prep(q), prep(k), prep(v)
    if key_padding_mask is None:
        key_padding_mask = jnp.zeros((b, l), bool)
    mask = jnp.pad(key_padding_mask, ((0, 0), (0, pad)), constant_values=True)
    bias = jnp.where(mask, -jnp.inf, 0.0).astype(jnp.float32)
    bias = jnp.broadcast_to(bias[:, None, :], (b, 8, lp))

    out = mha_padded_pallas(qt, kt, vt, bias, interpret=interpret)
    out = jnp.transpose(out, (0, 2, 1, 3))[:, :l]
    return out
