"""Normalization primitives.

Numerics follow the reference exactly:
* RMSNorm computes in fp32 then casts back (reference: mars5/nn_future.py:301-312).
* LayerNorm matches torch ``nn.LayerNorm`` (biased variance) — the MARS5 encoder/
  decoder stacks use eps=4e-5 (mars5/model.py:13), the NAR residual_decoder heads
  use the torch default eps=1e-5 (mars5/model.py:235-240).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x, weight, eps: float = 1e-5):
    """RMSNorm: fp32 internal math, cast back to x.dtype, then scale by weight."""
    xf = x.astype(jnp.float32)
    normed = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return normed.astype(x.dtype) * weight


def layer_norm(x, weight, bias, eps: float = 4e-5):
    """torch-compatible LayerNorm over the last axis (biased variance), fp32 math."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * weight.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x.dtype)
