"""Fused NAR decoder-layer GEMM kernels (Pallas, W8A8).

Round-3 headline kernels: each W8A8 GEMM site in the NAR decoder layer runs as
ONE Pallas program that fuses its surrounding elementwise chain —

* ``fused_linear``: [LayerNorm ->] per-row int8 act-quant -> int8x int8 dot ->
  f32 rescale [+ bias] [+ residual] -> bf16.  Covers the self-attention QKV
  projection (LN1 prologue), the cross-attention q projection (LN2 prologue),
  and both attention out-projections (residual epilogue).
* ``fused_ffn``: LayerNorm -> quant -> WV dot (2F outputs) -> silu(w)*v ->
  re-quant -> lin2 dot -> bias + residual -> bf16.  The (M, 2F) SwiGLU
  intermediate never touches HBM (~59 MB/layer/step of traffic at bench
  geometry).

Key measured facts behind the design (scripts/probe_declayer.py sweep, v5e):
* int8 Mosaic dots must contract BOTH operands on the minor axis: with weights
  kept in the torch (N, K) layout the Pallas WV GEMM runs ~75 us vs XLA's 85
  (the round-2 "1.9x Mosaic gap" was entirely the (K, N) transposed layout).
* int8 dots must accumulate in int32 (f32 acc is unsupported: "float acc with
  int lhs"); the per-group rescale therefore accumulates scaled f32 partials
  OUTSIDE the dot when ``groups > 1``.
* Scoped VMEM is limited (~17 MB default): M is blocked (weights stay resident
  across the grid), and the block size keeps int32/f32 temporaries in budget.

Numerics contract: with ``groups=1`` every fused op computes the SAME chain
as the unfused W8A8 path (ops/quant.linear_w8a8 chains) — LN replicates the
bf16 round-trip of ops/norms.layer_norm, act-quant is exact, int8 dots are
exact int32, and the rescale/bias/residual order is identical; outputs differ
only where compiler fusion (FMA) flips a borderline f32 rounding (bounded to
~2 bf16 ulp, tests/test_nar_fused.py).  ``groups > 1`` is the
finer-grained activation-quant quality mode (per-K-group scales, affordable
only inside the kernel — an XLA split-dot pays ~0.6 ms/GEMM in HBM rescale
traffic); it has no unfused twin and is tested against ``*_ref`` emulations.

Reference being out-engineered: torch nn.TransformerDecoderLayer in fp16
autocast, one op at a time (/root/reference/mars5/model.py:205-229).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# M-block rows. Multiples of 32 (int8 sublane tile); defaults keep the FFN
# kernel's int32/f32 (bm, 2F) temporaries inside the scoped-VMEM budget.
_BM_FFN = int(os.environ.get("MARS5_NARF_BM_FFN", "480"))
_BM_LIN = int(os.environ.get("MARS5_NARF_BM_LIN", "800"))
_VMEM_LIMIT = 100 * 1024 * 1024


def _ln_bf16_f32(xf, w, b, eps):
    """torch LayerNorm in f32 + bf16 round-trip, returned as f32.

    Matches ops/norms.layer_norm (which materializes in x.dtype) followed by
    quantize_act's f32 upcast — bitwise.
    """
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * w + b
    return y.astype(jnp.bfloat16).astype(jnp.float32)


def _quant_rows(xf):
    """Per-row symmetric int8: exact twin of ops/quant.quantize_act."""
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    xs = jnp.maximum(amax, 1e-8) / 127.0
    return jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8), xs


def _qdot(xf, w_ref, s_ref, groups: int):
    """quant -> int8 nk-dot -> f32 rescale, optionally per-K-group.

    xf: (bm, K) f32; w_ref: (N, K) int8 ref; s_ref: (wG, N) f32 ref — wG = 1
    for per-row weight scales, or wG == groups for per-K-group weight scales
    (quantize_weight_grouped dicts; each group's int32 partial is rescaled by
    its own weight scale before accumulation). Returns f32 (bm, N).
    """
    K = xf.shape[-1]
    wG = s_ref.shape[0]
    if groups == 1:
        if wG != 1:
            raise ValueError("grouped weight scales require groups == wG")
        xq, xs = _quant_rows(xf)
        acc = jax.lax.dot_general(xq, w_ref[:], (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * (xs * s_ref[:])
    if K % groups:
        raise ValueError(f"groups {groups} does not divide K={K}")
    if wG not in (1, groups):
        raise ValueError(f"weight scale groups {wG} != act groups {groups}")
    gs = K // groups
    out = None
    for g in range(groups):
        sl = slice(g * gs, (g + 1) * gs)
        xq, xs = _quant_rows(xf[:, sl])
        acc = jax.lax.dot_general(xq, w_ref[:, sl], (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        part = acc.astype(jnp.float32) * xs
        if wG > 1:
            part = part * s_ref[g:g + 1, :]
        out = part if out is None else out + part
    return out if wG > 1 else out * s_ref[:]


def _lin_kernel(refs, *, eps, groups, has_ln, has_bias, has_res):
    it = iter(refs)
    x_ref, w_ref, s_ref = next(it), next(it), next(it)
    nw_ref = next(it) if has_ln else None
    nb_ref = next(it) if has_ln else None
    b_ref = next(it) if has_bias else None
    r_ref = next(it) if has_res else None
    o_ref = next(it)

    xf = x_ref[:].astype(jnp.float32)
    if has_ln:
        xf = _ln_bf16_f32(xf, nw_ref[:], nb_ref[:], eps)
    y = _qdot(xf, w_ref, s_ref, groups)
    if has_bias:
        y = y + b_ref[:]
    yb = y.astype(o_ref.dtype)
    if has_res:
        yb = r_ref[:] + yb          # residual add in bf16, matching x + mha(...)
    o_ref[:] = yb


def _silu_mul_bf16(wv):
    """silu(w) * v in bf16 arithmetic, computed in f32 with explicit bf16
    round-trips (Mosaic's logistic can't lower on bf16 vectors; a product of
    two bf16 values rounded to bf16 equals the f32 product rounded to bf16,
    so this matches the unfused bf16 chain to transcendental-impl level)."""
    f = wv.shape[-1] // 2
    wf = wv[:, :f].astype(jnp.float32)
    vf = wv[:, f:].astype(jnp.float32)
    s = (wf * jax.lax.logistic(wf)).astype(jnp.bfloat16).astype(jnp.float32)
    return (s * vf).astype(jnp.bfloat16)


def _ffn_kernel(x_ref, wv_ref, wvs_ref, nw_ref, nb_ref, l2_ref, l2s_ref,
                l2b_ref, o_ref, *, eps, groups, groups2):
    xf = x_ref[:].astype(jnp.float32)
    h = _ln_bf16_f32(xf, nw_ref[:], nb_ref[:], eps)
    wv = _qdot(h, wv_ref, wvs_ref, groups).astype(jnp.bfloat16)  # (bm, 2F)
    u = _silu_mul_bf16(wv)
    y = _qdot(u.astype(jnp.float32), l2_ref, l2s_ref, groups2)
    y = y + l2b_ref[:]
    o_ref[:] = x_ref[:] + y.astype(o_ref.dtype)


def _flatten_w(w):
    """Quant dict -> ((N, K) int8, (wG, N) f32 scales); stacked kernels flatten.

    Per-row dicts yield wG = 1; grouped dicts ("sg" (…, G, N)) yield wG = G
    (the (S, G, D) stacked in_proj case flattens group-major to (G, S*D),
    matching the q flatten order)."""
    q = w["q"]
    if "sg" in w:
        sg = w["sg"]
        if q.ndim == 3:                  # (3, D, D) + (3, G, D)
            q = q.reshape(-1, q.shape[-1])
            sg = jnp.transpose(sg, (1, 0, 2)).reshape(sg.shape[1], -1)
        return q, sg.astype(jnp.float32)
    s = w["s"]
    if q.ndim == 3:                      # (3, D, D) attention in_proj
        q = q.reshape(-1, q.shape[-1])
        s = s.reshape(-1)
    return q, s.reshape(1, -1).astype(jnp.float32)


def _pad_rows(x2, bm):
    m = x2.shape[0]
    mp = -(-m // bm) * bm
    if mp != m:
        x2 = jnp.pad(x2, ((0, mp - m), (0, 0)))
    return x2, m, mp


@functools.partial(jax.jit, static_argnames=("eps", "groups", "bm", "interpret",
                                             "has_ln", "has_bias", "has_res"))
def _lin_call(x2, wq, ws, nw, nb, bias, res, *, eps, groups, bm, interpret,
              has_ln, has_bias, has_res):
    mp = x2.shape[0]
    n = wq.shape[0]
    row = lambda i: (i, 0)
    fix = lambda i: (0, 0)
    in_specs = [pl.BlockSpec((bm, x2.shape[1]), row, memory_space=pltpu.VMEM),
                pl.BlockSpec(wq.shape, fix, memory_space=pltpu.VMEM),
                pl.BlockSpec(ws.shape, fix, memory_space=pltpu.VMEM)]
    args = [x2, wq, ws]
    if has_ln:
        in_specs += [pl.BlockSpec(nw.shape, fix, memory_space=pltpu.VMEM),
                     pl.BlockSpec(nb.shape, fix, memory_space=pltpu.VMEM)]
        args += [nw, nb]
    if has_bias:
        in_specs.append(pl.BlockSpec(bias.shape, fix, memory_space=pltpu.VMEM))
        args.append(bias)
    if has_res:
        in_specs.append(pl.BlockSpec((bm, n), row, memory_space=pltpu.VMEM))
        args.append(res)
    kernel = functools.partial(
        lambda *refs, eps, groups, has_ln, has_bias, has_res: _lin_kernel(
            refs, eps=eps, groups=groups, has_ln=has_ln, has_bias=has_bias,
            has_res=has_res),
        eps=eps, groups=groups, has_ln=has_ln, has_bias=has_bias,
        has_res=has_res)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((mp, n), x2.dtype),
        grid=(mp // bm,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, n), row, memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(*args)


def fused_linear(x3, w, *, ln=None, bias=None, residual=None, eps: float = 4e-5,
                 groups: int = 1, bm: int | None = None,
                 interpret: bool = False):
    """[LN ->] quant -> int8 GEMM -> rescale [+bias] [+residual] as one kernel.

    Args:
        x3: (B, L, K) bf16 activations.
        w: quant dict {"q": (N, K) or (S, D, K) int8, "s": matching scales}.
        ln: optional (weight, bias) tuple — LayerNorm prologue on x3.
        bias: optional (N,)-flattenable GEMM bias.
        residual: optional (B, L, N) tensor added AFTER the bf16 cast
            (bit-matching ``res + linear_w8a8(...)``).
    Returns:
        (B, L, N) bf16.
    """
    b, l, k = x3.shape
    wq, ws = _flatten_w(w)
    n = wq.shape[0]
    bm = bm or _BM_LIN
    x2, m, mp = _pad_rows(x3.reshape(b * l, k), bm)
    nw = nb = bvec = res2 = None
    if ln is not None:
        nw = ln[0].reshape(1, k).astype(jnp.float32)
        nb = ln[1].reshape(1, k).astype(jnp.float32)
    if bias is not None:
        bvec = bias.reshape(1, n).astype(jnp.float32)
    if residual is not None:
        res2, _, _ = _pad_rows(residual.reshape(b * l, n), bm)
    out = _lin_call(x2, wq, ws, nw, nb, bvec, res2, eps=eps, groups=groups,
                    bm=bm, interpret=interpret, has_ln=ln is not None,
                    has_bias=bias is not None, has_res=residual is not None)
    return out[:m].reshape(b, l, n)


@functools.partial(jax.jit, static_argnames=("eps", "groups", "groups2", "bm",
                                             "interpret"))
def _ffn_call(x2, wvq, wvs, nw, nb, l2q, l2s, l2b, *, eps, groups, groups2, bm,
              interpret):
    mp, k = x2.shape
    row = lambda i: (i, 0)
    fix = lambda i: (0, 0)
    kernel = functools.partial(_ffn_kernel, eps=eps, groups=groups,
                               groups2=groups2)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((mp, k), x2.dtype),
        grid=(mp // bm,),
        in_specs=[
            pl.BlockSpec((bm, k), row, memory_space=pltpu.VMEM),
            pl.BlockSpec(wvq.shape, fix, memory_space=pltpu.VMEM),
            pl.BlockSpec(wvs.shape, fix, memory_space=pltpu.VMEM),
            pl.BlockSpec(nw.shape, fix, memory_space=pltpu.VMEM),
            pl.BlockSpec(nb.shape, fix, memory_space=pltpu.VMEM),
            pl.BlockSpec(l2q.shape, fix, memory_space=pltpu.VMEM),
            pl.BlockSpec(l2s.shape, fix, memory_space=pltpu.VMEM),
            pl.BlockSpec(l2b.shape, fix, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, k), row, memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(x2, wvq, wvs, nw, nb, l2q, l2s, l2b)


def fused_ffn(x3, norm_w, norm_b, wv, lin2, lin2_b, *, eps: float = 4e-5,
              groups: int = 1, groups2: int | None = None,
              bm: int | None = None, interpret: bool = False):
    """x + lin2(silu(w)*v) with LN/quant chains fused; (M, 2F) stays in VMEM.

    Bit-matches ``x + swiglu_ff(p, layer_norm(x))`` on the W8A8 path when
    ``groups == 1`` (see module docstring). ``groups`` covers the WV dot
    (K = model dim), ``groups2`` the lin2 dot (K = FFN dim; defaults to
    ``groups`` — pass both when deriving counts from one group SIZE).
    """
    b, l, k = x3.shape
    wvq, wvs = _flatten_w(wv)
    l2q, l2s = _flatten_w(lin2)
    bm = bm or _BM_FFN
    x2, m, mp = _pad_rows(x3.reshape(b * l, k), bm)
    out = _ffn_call(
        x2, wvq, wvs,
        norm_w.reshape(1, k).astype(jnp.float32),
        norm_b.reshape(1, k).astype(jnp.float32),
        l2q, l2s, lin2_b.reshape(1, k).astype(jnp.float32),
        eps=eps, groups=groups,
        groups2=groups if groups2 is None else groups2,
        bm=bm, interpret=interpret)
    return out[:m].reshape(b, l, k)


# ------------------------------------------------------------- emulations
# jnp twins of the kernels (same op order/dtypes), used by the grouped-quant
# tests where no unfused path exists.

def _qdot_ref(xf, wq, ws, groups):
    class _W:                                    # mimic ref[:] / ref[:, sl]
        def __init__(self, a):
            self.a = a
            self.shape = a.shape

        def __getitem__(self, sl):
            return self.a[sl]
    # ws arrives from _flatten_w already shaped (wG, N)
    return _qdot(xf, _W(wq), _W(ws.astype(jnp.float32)), groups)


def fused_linear_ref(x3, w, *, ln=None, bias=None, residual=None,
                     eps: float = 4e-5, groups: int = 1):
    b, l, k = x3.shape
    wq, ws = _flatten_w(w)
    xf = x3.reshape(b * l, k).astype(jnp.float32)
    if ln is not None:
        xf = _ln_bf16_f32(xf, ln[0].reshape(1, k).astype(jnp.float32),
                          ln[1].reshape(1, k).astype(jnp.float32), eps)
    y = _qdot_ref(xf, wq, ws, groups)
    if bias is not None:
        y = y + bias.reshape(1, -1).astype(jnp.float32)
    yb = y.astype(jnp.bfloat16)
    if residual is not None:
        yb = residual.reshape(b * l, -1) + yb
    return yb.reshape(b, l, -1)


def fused_ffn_ref(x3, norm_w, norm_b, wv, lin2, lin2_b, *, eps: float = 4e-5,
                  groups: int = 1, groups2: int | None = None):
    b, l, k = x3.shape
    wvq, wvs = _flatten_w(wv)
    l2q, l2s = _flatten_w(lin2)
    x2 = x3.reshape(b * l, k)
    h = _ln_bf16_f32(x2.astype(jnp.float32),
                     norm_w.reshape(1, k).astype(jnp.float32),
                     norm_b.reshape(1, k).astype(jnp.float32), eps)
    wv_o = _qdot_ref(h, wvq, wvs, groups).astype(jnp.bfloat16)
    u = _silu_mul_bf16(wv_o)
    y = _qdot_ref(u.astype(jnp.float32), l2q, l2s,
                  groups if groups2 is None else groups2)
    y = y + lin2_b.reshape(1, k).astype(jnp.float32)
    return (x2 + y.astype(jnp.bfloat16)).reshape(b, l, k)
