"""Rotary position embeddings (interleaved-pair convention, θ=10000).

The reference applies RoPE via complex multiplication on adjacent float pairs
(mars5/nn_future.py:166-198): head-dim elements (0,1), (2,3), ... form the complex
pairs. We implement the equivalent real rotation. fp32 internally, cast back —
matching ``apply_rotary_emb``'s ``.float()`` / ``type_as`` behavior.
"""

from __future__ import annotations

import jax.numpy as jnp


def rope_angles(positions, head_dim: int, theta: float = 10000.0):
    """Per-position rotation angles.

    Args:
        positions: int array (...,) of absolute positions.
        head_dim: attention head dimension (even).

    Returns:
        (cos, sin) arrays of shape positions.shape + (head_dim // 2,), fp32.
    """
    freqs = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    ang = positions.astype(jnp.float32)[..., None] * freqs
    return jnp.cos(ang), jnp.sin(ang)


def apply_rope_halfsplit(x, cos, sin):
    """Rotate (first-half, second-half) pairs of the last axis of ``x``.

    TPU-friendly variant of interleaved RoPE: the framework permutes each head's
    wq/wk output rows at checkpoint conversion ([0,2,...,1,3,...] per head, see
    convert.permute_rope_rows) so that the reference's interleaved pairs (2i,2i+1)
    land at (i, i+D/2). Attention scores are invariant under a shared permutation
    of q and k, so outputs are bit-identical while the rotation becomes two
    contiguous-slice multiplies instead of a minor-dim-2 reshape/stack (which
    costs ~1.3 ms/step in the decode loop at MARS5 geometry).

    cos/sin broadcast rules match ``apply_rope``.
    """
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    half = xf.shape[-1] // 2
    x1, x2 = xf[..., :half], xf[..., half:]
    if x.ndim == cos.ndim + 2:  # x (..., L, H, D), cos (..., L, D/2)
        cos = cos[..., None, :]
        sin = sin[..., None, :]
    out = jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1)
    return out.astype(orig_dtype)


def apply_rope(x, cos, sin):
    """Rotate interleaved pairs of the last axis of ``x``.

    Args:
        x: (..., L, H, D) or (..., L, D); cos/sin must broadcast against
           x reshaped to (..., L, H, D/2) — typically (L, 1, D/2) or (L, D/2).

    Returns:
        Array of the same shape/dtype as x.
    """
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    x2 = xf.reshape(*xf.shape[:-1], -1, 2)
    xr, xi = x2[..., 0], x2[..., 1]
    # broadcast cos/sin: add head axis if x has one
    if x.ndim == cos.ndim + 2:  # x (..., L, H, D), cos (..., L, D/2)
        cos = cos[..., None, :]
        sin = sin[..., None, :]
    out_r = xr * cos - xi * sin
    out_i = xr * sin + xi * cos
    out = jnp.stack([out_r, out_i], axis=-1).reshape(xf.shape)
    return out.astype(orig_dtype)
