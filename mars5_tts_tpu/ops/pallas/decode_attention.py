"""Fused ring-cache decode attention as a Pallas TPU kernel.

One decode step's attention for one layer: each grid program handles a block of
8 heads — scores = q·Kᵀ over the ring-buffer window, slot-validity masking (ring
semantics from models/ar_decode.py), numerically-stable softmax, and the probs·V
contraction — all in VMEM, writing only the per-head outputs back. The XLA
fallback (einsum path) materializes the (H, W) score/prob tensors in HBM; here
they never leave the chip.

Mosaic cannot lower batch-dim dot_generals and block sublanes must be multiples
of 8, so heads are processed 8 per program with unrolled plain 2-D dots.

Status: numerically matches the XLA path (<=2e-7 interpret, bf16-exact on TPU)
but measured SLOWER inside the real decode loop (4.0 vs 3.0 ms/step at MARS5
geometry) — the per-head unrolled dots and grid overhead lose to XLA's fused
einsum, which already streams the 7.8 MB cache well. Kept, including the
self-column mode, as the tested seed for a future fused decode-LAYER kernel
(streamed weights + attention in one program); the engine uses the XLA path.
Runs in interpreter mode for CPU tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(hpp: int, self_column: bool):
    def _kernel(pos_ref, q_ref, k_ref, v_ref, *rest):
        """q (hpp, D); k/v (W, hpp, D); pos (1,) SMEM; out (hpp, D).

        With ``self_column``, k_new/v_new (hpp, D) follow and the cache is
        treated as NOT containing the current token (its stale ring slot is
        masked; the token contributes via an explicit self score) — matching
        models/ar_decode._decode_attention's copy-free formulation.
        """
        if self_column:
            knew_ref, vnew_ref, o_ref = rest
        else:
            (o_ref,) = rest
        w = k_ref.shape[0]
        d = q_ref.shape[-1]
        pos = pos_ref[0]

        # ring validity: slot s holds position pos - ((pos - s) mod W); < 0 means
        # unwritten (or ahead of the cursor). lax.rem is trunc-mod; shift the
        # dividend positive first.
        slots = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
        slot_pos = pos - jax.lax.rem(pos - slots + 4 * w, w)
        valid = slot_pos >= 0  # (1, W)
        if self_column:
            valid = valid & (slots != jax.lax.rem(pos, w))
        scale = 1.0 / (d ** 0.5)

        for h in range(hpp):  # static unroll: plain 2-D dots only
            q = q_ref[h:h + 1, :].astype(jnp.float32)      # (1, D)
            k = k_ref[:, h, :].astype(jnp.float32)          # (W, D)
            scores = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale  # (1, W)
            scores = jnp.where(valid, scores, -jnp.inf)
            if self_column:
                kn = knew_ref[h:h + 1, :].astype(jnp.float32)
                self_score = jnp.sum(q * kn, axis=1, keepdims=True) * scale  # (1,1)
                m = jnp.maximum(jnp.max(scores, axis=1, keepdims=True), self_score)
                p = jnp.exp(scores - m)
                p_self = jnp.exp(self_score - m)
                denom = jnp.sum(p, axis=1, keepdims=True) + p_self
                p = p / denom
                v = v_ref[:, h, :].astype(jnp.float32)
                out = jax.lax.dot_general(
                    p, v, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                out = out + (p_self / denom) * vnew_ref[h:h + 1, :].astype(jnp.float32)
                o_ref[h:h + 1, :] = out.astype(o_ref.dtype)
            else:
                m = jnp.max(scores, axis=1, keepdims=True)
                p = jnp.exp(scores - m)
                p = p / jnp.sum(p, axis=1, keepdims=True)
                v = v_ref[:, h, :].astype(jnp.float32)
                out = jax.lax.dot_general(
                    p, v, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                o_ref[h:h + 1, :] = out.astype(o_ref.dtype)

    return _kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_attention_pallas(q, k, v, pos, k_new=None, v_new=None,
                            interpret: bool = False):
    """Single-token ring-cache attention.

    Args:
        q: (bs, H, D); k/v: (bs, W, H, D); pos: (bs,) absolute positions.
        k_new/v_new: optional (bs, H, D) — self-column mode (cache excludes the
            current token; see models/ar_decode._decode_attention).
    Returns:
        (bs, H, D) in q.dtype.
    """
    h = q.shape[1]
    w = k.shape[1]
    d = q.shape[2]
    hpp = 8 if h % 8 == 0 else h  # heads per program (sublane multiple or full)
    self_column = k_new is not None

    def one(qb, kb, vb, posb, *new):
        head_spec = pl.BlockSpec((hpp, d), lambda i, *_: (i, 0))
        cache_spec = pl.BlockSpec((w, hpp, d), lambda i, *_: (0, i, 0))
        in_specs = [head_spec, cache_spec, cache_spec]
        if self_column:
            in_specs += [head_spec, head_spec]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(h // hpp,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((hpp, d), lambda i, *_: (i, 0)),
        )
        return pl.pallas_call(
            _make_kernel(hpp, self_column),
            out_shape=jax.ShapeDtypeStruct((h, d), qb.dtype),
            grid_spec=grid_spec,
            interpret=interpret,
        )(posb[None], qb, kb, vb, *new)

    if self_column:
        return jax.vmap(one)(q, k, v, pos, k_new, v_new)
    return jax.vmap(one)(q, k, v, pos)
