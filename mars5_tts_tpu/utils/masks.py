"""Padding/validity mask helpers (JAX).

TPU-native equivalents of the reference helpers in mars5/utils.py:4-42.
All return boolean masks where True marks positions to IGNORE (torch
key-padding-mask convention), so converted checkpoints behave identically.
"""

from __future__ import annotations

import jax.numpy as jnp


def length_to_mask(length, offsets, max_len: int):
    """True outside the half-open valid span ``[offset, length)`` per row.

    Mirrors reference mars5/utils.py:4-38, except ``max_len`` is required here:
    under jit all shapes must be static, so the caller supplies the padded length.

    Args:
        length: (bs,) int array of sequence lengths.
        offsets: (bs,) int array of leading positions to mask.
        max_len: static int, the padded sequence length.

    Returns:
        (bs, max_len) bool array; True = masked/ignored.
    """
    rng = jnp.arange(max_len)[None, :]
    return (rng < offsets[:, None]) | ~(rng < length[:, None])


def construct_padding_mask(x, pad_token: int):
    """True at and after the first occurrence of ``pad_token`` in each row.

    Mirrors reference mars5/utils.py:41-42 (``(x == pad).cumsum(1) > 0``).
    """
    return jnp.cumsum((x == pad_token).astype(jnp.int32), axis=1) > 0
