"""Pallas TPU kernels (with XLA fallbacks everywhere they're used)."""

import os

import jax

from .decode_attention import decode_attention_pallas


def enabled() -> bool:
    """Use Pallas kernels: on a TPU backend unless MARS5_PALLAS=0."""
    if os.environ.get("MARS5_PALLAS", "1") == "0":
        return False
    try:
        return jax.default_backend() not in ("cpu",)
    except RuntimeError:  # pragma: no cover
        return False


__all__ = ["decode_attention_pallas", "enabled"]
