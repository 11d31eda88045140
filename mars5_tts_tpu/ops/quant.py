"""Weight-only int8 quantization for HBM-bound decode.

The AR decode step is bandwidth-bound on the ~1.4 GB of bf16 weights it streams
per token; symmetric per-output-channel int8 halves that traffic. Kernels stay in
the torch (out, in) layout: ``w ≈ w_int8 * scale[:, None]``. Matmuls run
int8-weight x bf16-activation on the MXU with fp32 accumulation, then scale.

Quality: per-channel symmetric quantization of transformer weights is the
standard serving recipe (≈0.1% perplexity delta); sampling logits stay fp32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_weight(w, axis: int = -1):
    """Symmetric per-output-channel int8: w (..., out, in) -> (q, scale).

    ``axis`` is the reduction (input) axis; scales keep the other dims.
    """
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=axis, keepdims=True)
    scale = (amax / 127.0).astype(jnp.float32)
    q = jnp.round(w.astype(jnp.float32) / jnp.maximum(scale, 1e-12))
    q = jnp.clip(q, -127, 127).astype(jnp.int8)
    return q, scale.squeeze(axis)


def linear_q8(x, q, scale, b=None):
    """y = x @ (q * scale).T — int8 weights dequantized on the fly.

    x: (..., in) bf16/fp32; q: (out, in) int8 (or stacked (L, out, in) consumed
    per-layer); scale: (out,).
    """
    y = jax.lax.dot_general(
        x, q,
        dimension_numbers=(((x.ndim - 1,), (q.ndim - 1,)), ((), ())),
        preferred_element_type=jnp.float32)
    y = y * scale.astype(jnp.float32)
    if b is not None:
        y = y + b
    return y.astype(x.dtype)


_AR_QUANT_KEYS = ("wq", "wk", "wv", "wo", "w1", "w2", "w3")


def quantize_codeclm(params):
    """Quantize the AR backbone's block weights + output head to int8.

    Returns a new pytree where each quantized kernel leaf ``w`` becomes a dict
    ``{"q": int8, "s": scales}``; everything else (norms, embeddings, speaker
    encoder) is untouched. Consumed by the decode engine's quantized path.
    """
    out = jax.tree.map(lambda x: x, params)  # shallow-ish copy
    layers = dict(params["ar"]["layers"])
    for k in _AR_QUANT_KEYS:
        q, s = quantize_weight(layers[k], axis=-1)  # (L, out, in) -> scale (L, out)
        layers[k] = {"q": q, "s": s}
    ar = dict(params["ar"])
    ar["layers"] = layers
    q, s = quantize_weight(params["ar"]["output"], axis=-1)
    ar["output"] = {"q": q, "s": s}
    out = dict(out)
    out["ar"] = ar
    return out


def is_quantized(w) -> bool:
    return isinstance(w, dict) and "q" in w


def linear_any(x, w, b=None):
    """linear() that accepts either a plain kernel or a {"q","s"} int8 dict."""
    if is_quantized(w):
        return linear_q8(x, w["q"], w["s"], b)
    from .attention import linear
    return linear(x, w, b)
