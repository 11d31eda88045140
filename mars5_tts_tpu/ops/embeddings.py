"""Embedding primitives: sinusoidal position, diffusion timestep, chunked codebook.

References:
* SinePositionalEmbedding — mars5/nn_future.py:35-83 (``x * 1.0 + alpha * pe``,
  learnable scalar alpha; classic sin/cos table).
* timestep_embedding — mars5/model.py:18-35 (OpenAI guided-diffusion; note the
  ``[cos, sin]`` concatenation order).
* ChunkedEmbedding — mars5/model.py:147-159 (one embedding table per codebook,
  outputs concatenated along the feature axis).
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def sine_pe_table(length: int, dim: int, dtype=jnp.float32):
    """(length, dim) sinusoidal table: pe[:, 0::2]=sin, pe[:, 1::2]=cos."""
    position = jnp.arange(length, dtype=jnp.float32)[:, None]
    div_term = jnp.exp(jnp.arange(0, dim, 2, dtype=jnp.float32) * -(math.log(10000.0) / dim))
    ang = position * div_term
    pe = jnp.stack([jnp.sin(ang), jnp.cos(ang)], axis=-1).reshape(length, -1)
    if dim % 2:
        pe = pe[:, :dim]
    return pe.astype(dtype)


def add_sine_pe(x, alpha):
    """``x + alpha * pe[:L]`` with x of shape (..., L, dim); alpha is a (1,) scalar."""
    L, dim = x.shape[-2], x.shape[-1]
    pe = sine_pe_table(L, dim, dtype=jnp.float32)
    return (x.astype(jnp.float32) + alpha.astype(jnp.float32) * pe).astype(x.dtype)


def timestep_embedding(timesteps, dim: int, max_period: float = 10000.0, dtype=jnp.float32):
    """Sinusoidal diffusion timestep embedding: concat([cos, sin]) over half-dim freqs.

    Args:
        timesteps: (N,) possibly-fractional timesteps.
    Returns:
        (N, dim) embedding.
    """
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb.astype(dtype)


def chunked_embed(tables, x):
    """Embed per-codebook indices and concatenate.

    Args:
        tables: (n_q, codebook_size, dim // n_q) stacked embedding tables.
        x: (..., n_q) integer codes.
    Returns:
        (..., dim) embeddings.
    """
    n_q = tables.shape[0]
    parts = [tables[i][x[..., i]] for i in range(n_q)]
    return jnp.concatenate(parts, axis=-1)
