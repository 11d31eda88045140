"""int4 output-head GEMM for the fused AR decode path.

The decode step's output head reads the (n_vocab, dim) projection every token
— at MARS5 geometry (24k x 1536) that is 37 MB/token as int8, the second
largest stream after the backbone pack (reference: the output Linear of
mars5/model.py CodecLM). With the backbone already nibble-packed (wbits=4),
the head is the next bandwidth line item: packing it int4 halves the stream
(~18.5 MB/token, ~30 ms over a 750-token bench decode).

M is tiny (the 8-row sublane block), so the GEMM is pure weight streaming —
exactly what the Pallas grid pipeline double-buffers automatically; Mosaic's
lower MXU matmul rate (CLAUDE.md) is irrelevant here. Layout follows
decode_layer's nibble convention: byte low nibble = LEFT half of the K axis,
high nibble = RIGHT half, one int4 scale per output channel per half (the
"free 2-group scale grid"), per-row int8 activation scales (W4A8).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ..quant import quantize_act, quantize_weight_mse
from .decode_layer import _pack4, _unpack4


def pack_head4(w, *, bn: int = 2048):
    """(V, K) weight -> nibble-packed head bundle.

    Returns (wp (Vp, K//2) int8, ws (2, Vp) f32) with V padded up to a
    multiple of 128 that the block size divides; padded channels have scale 0.
    """
    V, K = w.shape
    assert K % 256 == 0, f"head K={K} must split into two 128-lane halves"
    bn = min(bn, _pad_to(V, 128))
    Vp = _pad_to(V, bn)
    wf = jnp.asarray(w, jnp.float32)
    if Vp != V:
        wf = jnp.concatenate([wf, jnp.zeros((Vp - V, K), jnp.float32)], axis=0)
    left, right = wf[:, : K // 2], wf[:, K // 2:]
    ql, sl = quantize_weight_mse(left, levels=7, axis=-1)
    qr, sr = quantize_weight_mse(right, levels=7, axis=-1)
    wp = _pack4(ql, qr)                                   # (Vp, K//2)
    ws = jnp.stack([sl, sr], axis=0).astype(jnp.float32)  # (2, Vp)
    return wp, ws


def _pad_to(n: int, m: int) -> int:
    return -(-n // m) * m


def _head4_kernel(x8_ref, xs_ref, wp_ref, ws_ref, out_ref):
    low, high = _unpack4(wp_ref[...])                     # (bn, K//2) int8 x2
    kh = low.shape[1]
    x8 = x8_ref[...]
    yl = jax.lax.dot_general(x8[:, :kh], low, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.int32)
    yh = jax.lax.dot_general(x8[:, kh:], high, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.int32)
    ws = ws_ref[...]                                      # (2, bn)
    y = (yl.astype(jnp.float32) * ws[0][None]
         + yh.astype(jnp.float32) * ws[1][None])
    out_ref[...] = y * xs_ref[...]                        # (B, bn) * (B, 1)


@functools.partial(jax.jit, static_argnames=("n_vocab", "bn", "interpret"))
def head4_logits(x, wp, ws, *, n_vocab: int, bn: int = 2048,
                 interpret: bool = False):
    """(B, K) bf16 activations -> (B, n_vocab) f32 logits via the int4 head.

    Activations are dynamically per-row int8 quantized (same W*A8 convention
    as the backbone kernel); weights stream through the Pallas grid pipeline
    one (bn, K//2) block per step.
    """
    B, K = x.shape
    Vp = wp.shape[0]
    bn = min(bn, Vp)
    assert Vp % bn == 0, (Vp, bn)
    x8, xs = quantize_act(x)
    out = pl.pallas_call(
        _head4_kernel,
        grid=(Vp // bn,),
        in_specs=[
            pl.BlockSpec((B, K), lambda i: (0, 0)),
            pl.BlockSpec((B, 1), lambda i: (0, 0)),
            pl.BlockSpec((bn, K // 2), lambda i: (i, 0)),
            pl.BlockSpec((2, bn), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((B, bn), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((B, Vp), jnp.float32),
        interpret=interpret,
    )(x8, xs.astype(jnp.float32), wp, ws)
    return out[:, :n_vocab]


def head4_logits_emulation(x, wp, ws, *, n_vocab: int):
    """Exact jnp twin of head4_logits (CPU test oracle)."""
    x8, xs = quantize_act(x)
    low, high = _unpack4(wp)
    kh = low.shape[1]
    yl = jax.lax.dot_general(x8[:, :kh], low, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.int32)
    yh = jax.lax.dot_general(x8[:, kh:], high, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.int32)
    y = (yl.astype(jnp.float32) * ws[0][None]
         + yh.astype(jnp.float32) * ws[1][None]) * xs.astype(jnp.float32)
    return y[:, :n_vocab]
