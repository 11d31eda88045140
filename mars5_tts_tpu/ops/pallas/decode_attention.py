"""Fused ring-cache decode attention as a Pallas TPU kernel.

One decode step's attention for one layer: each grid program handles a block of
8 heads — scores = q·Kᵀ over the ring-buffer window, slot-validity masking (ring
semantics from models/ar_decode.py), numerically-stable softmax, and the probs·V
contraction — all in VMEM, writing only the per-head outputs back. The XLA
fallback (einsum path) materializes the (H, W) score/prob tensors in HBM; here
they never leave the chip.

Mosaic cannot lower batch-dim dot_generals and block sublanes must be multiples
of 8, so heads are processed 8 per program with unrolled plain 2-D dots.

Status: bit-identical to the XLA path on TPU and measured at parity with it
(~190 us/call at MARS5 geometry — both are bandwidth-bound on the 7.8 MB cache
read, which XLA already streams well). Kept as the tested seed for the fused
decode-step kernel (QKV matmul + rope + cache write + attention in one program),
where the VMEM residency actually pays; the engine keeps the XLA path until
that fusion lands. Runs in interpreter mode for CPU tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_kernel(hpp: int):
    def _kernel(pos_ref, q_ref, k_ref, v_ref, o_ref):
        """q (hpp, D); k/v (W, hpp, D); pos (1,) SMEM; out (hpp, D)."""
        w = k_ref.shape[0]
        d = q_ref.shape[-1]
        pos = pos_ref[0]

        # ring validity: slot s holds position pos - ((pos - s) mod W); < 0 means
        # unwritten (or ahead of the cursor). lax.rem is trunc-mod; shift the
        # dividend positive first.
        slots = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
        slot_pos = pos - jax.lax.rem(pos - slots + 4 * w, w)
        valid = slot_pos >= 0  # (1, W)
        scale = 1.0 / (d ** 0.5)

        for h in range(hpp):  # static unroll: plain 2-D dots only
            q = q_ref[h:h + 1, :].astype(jnp.float32)      # (1, D)
            k = k_ref[:, h, :].astype(jnp.float32)          # (W, D)
            scores = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale  # (1, W)
            scores = jnp.where(valid, scores, -jnp.inf)
            m = jnp.max(scores, axis=1, keepdims=True)
            p = jnp.exp(scores - m)
            p = p / jnp.sum(p, axis=1, keepdims=True)
            v = v_ref[:, h, :].astype(jnp.float32)          # (W, D)
            out = jax.lax.dot_general(
                p, v, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)         # (1, D)
            o_ref[h:h + 1, :] = out.astype(o_ref.dtype)

    return _kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_attention_pallas(q, k, v, pos, interpret: bool = False):
    """Single-token ring-cache attention.

    Args:
        q: (bs, H, D); k/v: (bs, W, H, D); pos: (bs,) absolute positions.
    Returns:
        (bs, H, D) in q.dtype.
    """
    h = q.shape[1]
    w = k.shape[1]
    d = q.shape[2]
    hpp = 8 if h % 8 == 0 else h  # heads per program (sublane multiple or full)

    def one(qb, kb, vb, posb):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(h // hpp,),
            in_specs=[
                pl.BlockSpec((hpp, d), lambda i, *_: (i, 0)),
                pl.BlockSpec((w, hpp, d), lambda i, *_: (0, i, 0)),
                pl.BlockSpec((w, hpp, d), lambda i, *_: (0, i, 0)),
            ],
            out_specs=pl.BlockSpec((hpp, d), lambda i, *_: (i, 0)),
        )
        return pl.pallas_call(
            _make_kernel(hpp),
            out_shape=jax.ShapeDtypeStruct((h, d), qb.dtype),
            grid_spec=grid_spec,
            interpret=interpret,
        )(posb[None], qb, kb, vb)

    return jax.vmap(one)(q, k, v, pos)
