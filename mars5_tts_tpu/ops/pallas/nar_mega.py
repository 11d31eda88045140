"""Whole-STACK NAR decoder megakernel: 16 layers in ONE Pallas program.

Round-3 structural lever (VERDICT r2 #1). The per-site fused GEMM programs
(ops/pallas/nar_fused.py) took the NAR step from 12.18 to 11.45 ms standalone,
but every remaining op sits at its differential-probe floor (CLAUDE.md budget)
— the residue is BETWEEN ops: activation round-trips to HBM at each layer
boundary and each op seam, per-program dispatch, and weight DMA that cannot
overlap compute across XLA op boundaries. This kernel removes the seams
entirely: the full decoder stack (16 layers at MARS5 geometry) runs as one
Pallas program in which

* the (B, L, D) activation stream lives in VMEM for all layers — zero
  activation HBM traffic between the input embed and the final stack LN;
* int8 weights stream from one packed HBM buffer, (Nl * (8D + 3F), D), in 7
  per-layer stages [sa_in(3D) | sa_out(D) | ca_q(D) | ca_kv(2D) | ca_out(D) |
  WV(2F) | lin2(F, as F/D exact int32 K-chunks)], manually double-buffered so
  the DMA engine runs ahead of the MXU (the AR megakernel's proven recipe,
  decode_layer.py: 442 GB/s with dots overlapped);
* every inner loop is ROLLED (lax.fori_loop) with attention state in
  head-pair-major scratch — see _make_kernel's docstring for why (Mosaic
  allocates spill slots per unrolled iteration; the unrolled first cut
  spilled 170 MB);
* every weight matrix is stored (N, K) with the contraction on the minor axis
  — the layout that makes Mosaic int8 GEMMs beat the XLA emitter (nar_fused.py
  measurement: 75 vs 85 us for the WV shape; the round-2 "1.9x Mosaic gap" was
  entirely the transposed layout);
* per-row weight scales, biases and LayerNorm affines are small (~2 MB total
  for 16 layers) and stay VMEM-resident as three stacked vectors.

Numerics contract: GEMM sites and the SwiGLU FFN are bit-identical to the
nar_fused groups=1 programs (same LN bf16 round-trip, same per-row act quant,
same int32 accumulation and f32 rescale order — lin2's K-chunked dots sum in
int32, which is exact). Self-attention is the sdpa_pallas math (bf16 QK/PV
dots, deferred normalization, exp2 with the softmax scale folded into the
exponent). Cross-attention uses the SAME flash formulation in-kernel — this is
the one deliberate numerics change vs decoder_layer_fused (which calls the XLA
softmax at tiny Lk); the divergence is f32-rounding-level per layer and is
characterized in tests/test_nar_mega.py. A pure-jnp emulation twin
(mega_decoder_stack_ref) reproduces the kernel op-for-op for bit-level CPU
validation.

Reference being out-engineered: 16 torch nn.TransformerDecoderLayer blocks in
fp16 autocast, one op at a time (/root/reference/mars5/model.py:205-229,
mars5/diffuser.py:451-465 — 200 x 2 CFG forwards of the 450M model per
generation).
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .nar_fused import _ln_bf16_f32, _quant_rows, _silu_mul_bf16

NBUF = int(os.environ.get("MARS5_MEGA_NBUF", "2"))   # weight-stage buffers
_VMEM_LIMIT = 112 * 1024 * 1024
_LOG2E = 1.4426950408889634


def _pick_bm(L: int, lp: int) -> int:
    """Row-block size for the rolled GEMM-stage loops: multiple of 32 (int8
    sublane tile), block count covers L without exceeding the 128-aligned
    attention pad (every computed row needs a VMEM slot). MARS5_MEGA_BM picks
    the preferred size (default 128 — measured safe for Mosaic's spill-slot
    budget since each stage loop is ROLLED and its block temporaries are
    reused across iterations); falls back to a search when the preferred size
    doesn't tile the geometry."""
    want = int(os.environ.get("MARS5_MEGA_BM", "128"))
    if want % 32 == 0 and 0 < want and -(-L // want) * want <= lp:
        return want
    best = None
    for bm in range(608, 31, -32):
        lqc = -(-L // bm) * bm
        if lqc > lp:
            continue
        pad = lqc - L
        if best is None or pad < best[0] or (pad == best[0] and bm > best[1]):
            best = (pad, bm)
    return best[1]


@dataclass(frozen=True)
class MegaDims:
    """Static geometry of the fused decoder stack."""

    n_layers: int
    dim: int            # D, multiple of 128
    nhead: int
    head_dim: int       # 64 at MARS5 geometry (and all supported configs)
    hidden: int         # F; D must divide F (lin2 K-chunking)
    batch: int          # B (2 for CFG inference)
    seq: int            # L, true decoder length
    mem_len: int        # Lk, true memory length

    @property
    def lp(self) -> int:            # attention pad: score-tile lane multiple
        return -(-self.seq // 128) * 128

    @property
    def bm(self) -> int:
        return _pick_bm(self.seq, self.lp)

    @property
    def lqc(self) -> int:           # computed rows (mult of bm, >= seq)
        return -(-self.seq // self.bm) * self.bm

    @property
    def lkp(self) -> int:
        return -(-self.mem_len // 128) * 128

    @property
    def rpl(self) -> int:           # pack rows per layer
        return 8 * self.dim + 3 * self.hidden

    @property
    def stage_offsets(self):
        D, F = self.dim, self.hidden
        return (0, 3 * D, 4 * D, 5 * D, 7 * D, 8 * D, 8 * D + 2 * F)

    @property
    def stage_rows(self):
        D, F = self.dim, self.hidden
        return (3 * D, D, D, 2 * D, D, 2 * F, F)

    # svec lane offsets/widths: [sa_in 3D | sa_out D | ca_q D | ca_kv 2D |
    # ca_out D | wv 2F | lin2 D]
    @property
    def s_offsets(self):
        D, F = self.dim, self.hidden
        return (0, 3 * D, 4 * D, 5 * D, 7 * D, 8 * D, 8 * D + 2 * F)

    @property
    def s_widths(self):
        D, F = self.dim, self.hidden
        return (3 * D, D, D, 2 * D, D, 2 * F, D)

    # bvec lane offsets: [sa_in 3D | sa_out D | ca_q D | ca_kv 2D | ca_out D |
    # lin2 D] (WV has no bias)
    @property
    def b_offsets(self):
        D = self.dim
        return (0, 3 * D, 4 * D, 5 * D, 7 * D, 8 * D)


_VMEM_GATE = 96 * 1024 * 1024    # reject geometries whose scratch won't fit


def _vmem_estimate(dims: "MegaDims") -> int:
    """Rough peak scoped-VMEM bytes: persistent scratch + the SUM of every
    rolled loop body's SSA transients (pessimistic: assumes Mosaic shares no
    spill slots across distinct fori_loop regions — the observed round-3
    failure mode was zero reuse across unrolled code)."""
    B, Lp, D, F = dims.batch, dims.lp, dims.dim, dims.hidden
    streams = 7 * B * Lp * D * 2      # x_s + q/k/v + tmp (pair-major) + in/out
    wbuf = min(NBUF, 6) * max(3 * D, 2 * F) * D
    ckv = B * dims.lkp * (2 * D * 2 + D + 4)
    small = dims.n_layers * (9 * D + 2 * F + 9 * D + 6 * D) * 4
    t_attn = 2 * dims.lqc * Lp * 4                   # scores + probs, f32
    t_cross = 2 * dims.lqc * dims.lkp * 4
    t_gemms = dims.bm * (126 * D + 13 * F)           # s0+s1+s2+s4+ffn bodies
    return streams + wbuf + ckv + small + t_attn + t_cross + t_gemms


def mega_supported(layers, x, nhead: int) -> bool:
    """Geometry + quantization + VMEM gate for the megakernel path."""
    from ..quant import is_quantized
    wv = layers.get("WV")
    if not (is_quantized(wv) and "a8" in wv and "sg" not in wv):
        return False
    for k in ("sa_in_w", "sa_out_w", "ca_in_w", "ca_out_w", "lin2_w"):
        w = layers.get(k)
        if not (is_quantized(w) and "sg" not in w and "qt" not in w):
            return False
    b, l, d = x.shape
    f = layers["lin2_w"]["q"].shape[-1]
    hd = d // nhead
    if not (d % 128 == 0 and hd == 64 and nhead % 2 == 0 and f % d == 0
            and (2 * f) % 128 == 0):
        return False
    if os.environ.get("MARS5_MEGA_FORCE") == "1":   # bm/VMEM sweep escape
        return True
    dims = MegaDims(n_layers=layers["norm1_w"].shape[0], dim=d, nhead=nhead,
                    head_dim=hd, hidden=f, batch=b, seq=l, mem_len=1)
    return _vmem_estimate(dims) <= _VMEM_GATE


def build_mega_pack(layers):
    """Stacked quantized decoder layers -> megakernel operand bundle.

    Args:
        layers: ``p["decoder"]["layers"]`` after quantize_nar (per-row scales).
    Returns:
        {"pack": (Nl*RPL, D) int8, "svec": (Nl, 9D+2F) f32 weight scales,
         "bvec": (Nl, 9D) f32 biases, "lnvec": (Nl, 6D) f32 LN affines}.
    Pure jnp — under jit it is loop-invariant and XLA hoists it out of the
    diffusion scan.
    """
    q3 = layers["sa_in_w"]["q"]                       # (Nl, 3, D, D)
    nl, _, d, _ = q3.shape
    f = layers["lin2_w"]["q"].shape[-1]
    nc = f // d
    lin2 = layers["lin2_w"]["q"]                      # (Nl, D, F)
    lin2c = jnp.concatenate([lin2[:, :, c * d:(c + 1) * d] for c in range(nc)],
                            axis=1)                   # (Nl, F, D)
    ca = layers["ca_in_w"]["q"]                       # (Nl, 3, D, D)
    pack = jnp.concatenate([
        q3.reshape(nl, 3 * d, d),
        layers["sa_out_w"]["q"],
        ca[:, 0],
        ca[:, 1:].reshape(nl, 2 * d, d),
        layers["ca_out_w"]["q"],
        layers["WV"]["q"],
        lin2c,
    ], axis=1).reshape(nl * (8 * d + 3 * f), d)

    cas = layers["ca_in_w"]["s"]                      # (Nl, 3, D)
    svec = jnp.concatenate([
        layers["sa_in_w"]["s"].reshape(nl, 3 * d),
        layers["sa_out_w"]["s"],
        cas[:, 0],
        cas[:, 1:].reshape(nl, 2 * d),
        layers["ca_out_w"]["s"],
        layers["WV"]["s"],
        layers["lin2_w"]["s"],
    ], axis=1).astype(jnp.float32)

    bvec = jnp.concatenate([
        layers["sa_in_b"].reshape(nl, 3 * d),
        layers["sa_out_b"],
        layers["ca_in_b"][:, 0],
        layers["ca_in_b"][:, 1:].reshape(nl, 2 * d),
        layers["ca_out_b"],
        layers["lin2_b"],
    ], axis=1).astype(jnp.float32)

    lnvec = jnp.concatenate([
        layers["norm1_w"], layers["norm1_b"],
        layers["norm2_w"], layers["norm2_b"],
        layers["norm3_w"], layers["norm3_b"],
    ], axis=1).astype(jnp.float32)

    return {"pack": pack, "svec": svec, "bvec": bvec, "lnvec": lnvec}


def _make_kernel(dims: MegaDims, eps: float):
    """Mosaic spill-slot discipline (the round-3 compile lesson): every inner
    loop is a lax.fori_loop, NEVER an unrolled Python loop — unrolled
    iterations each get their OWN register-allocator spill slots (16 unrolled
    flash-attention heads alone spilled 170 MB > the 128 MB VMEM). Rolled
    bodies reuse one set. That forbids 64-lane dynamic head slices (Mosaic
    dynamic indexing must stay off the minor/lane dim), so Q/K/V and the
    attention tmp live in HEAD-PAIR-MAJOR scratch (HP, B, Lp, 2*Dh=128): the
    loop index lands on untiled leading axes and the two heads inside a pair
    are STATIC 64-lane sub-slices of one loaded (rows, 128) value."""
    Nl, D, H, Dh, F = (dims.n_layers, dims.dim, dims.nhead, dims.head_dim,
                       dims.hidden)
    B, Lp, Lqc, Lkp = dims.batch, dims.lp, dims.lqc, dims.lkp
    bm = dims.bm
    nmb = Lqc // bm
    NC = F // D
    HP = H // 2
    RPL = dims.rpl
    offs, rows = dims.stage_offsets, dims.stage_rows
    s_offs, s_w = dims.s_offsets, dims.s_widths
    b_offs = dims.b_offsets
    nbuf = min(NBUF, 6)
    n_steps = Nl * 7
    scale = 1.0 / (Dh ** 0.5)
    c2 = scale * _LOG2E

    def kernel(x_ref, mem_ref, sbias_ref, mbias_ref, pack_ref,
               svec_ref, bvec_ref, lnvec_ref, o_ref,
               wbuf, x_s, q_s, k_s, v_s, tmp_s, ck_s, cv_s, m8_s, ms_s, wsem):

        def wdma(c, slot, l):
            return pltpu.make_async_copy(
                pack_ref.at[pl.ds(l * RPL + offs[c], rows[c])],
                wbuf.at[slot, pl.ds(0, rows[c])], wsem.at[slot])

        # prologue: first nbuf weight stages of layer 0
        for i in range(nbuf):
            wdma(i, i, 0).start()

        x_s[:] = x_ref[:]
        if Lqc < Lp:
            # k/v alignment-pad rows are never written by the QKV GEMM; zero
            # them once so the masked score lanes stay finite
            k_s[:, :, Lqc:, :] = jnp.zeros((HP, B, Lp - Lqc, 2 * Dh),
                                           k_s.dtype)
            v_s[:, :, Lqc:, :] = jnp.zeros((HP, B, Lp - Lqc, 2 * Dh),
                                           v_s.dtype)

        # memory activations quantize once — identical every layer (the XLA
        # path re-derives the same per-row scales in each linear_w8a8 call)
        for b in range(B):
            q8, qs = _quant_rows(mem_ref[b].astype(jnp.float32))
            m8_s[b] = q8
            ms_s[b] = qs

        def body(l, _):
            base = l * 7
            sv = svec_ref[pl.ds(l, 1)]                # (1, 9D+2F)
            bv = bvec_ref[pl.ds(l, 1)]                # (1, 9D)
            lnv = lnvec_ref[pl.ds(l, 1)]              # (1, 6D)

            def stage_s(c):
                return sv[:, s_offs[c]:s_offs[c] + s_w[c]]

            def stage_b(ci):
                return bv[:, b_offs[ci]:b_offs[ci] + s_w[(0, 1, 2, 3, 4, 6)[ci]]]

            def ln_of(i):
                return (lnv[:, 2 * i * D:(2 * i + 1) * D],
                        lnv[:, (2 * i + 1) * D:(2 * i + 2) * D])

            def swait(c):
                slot = jax.lax.rem(base + c, nbuf)
                wdma(c, slot, l).wait()
                return slot

            def start_ahead(c, slot):
                ncs = (c + nbuf) % 7
                nl_ = l + (c + nbuf) // 7

                @pl.when(base + c + nbuf < n_steps)
                def _():
                    wdma(ncs, slot, nl_).start()

            def rowblocks(stage_body):
                """Rolled loop over (batch, row-block)."""
                def wrap(t, carry):
                    b = t // nmb
                    r0 = (t - b * nmb) * bm
                    stage_body(b, r0)
                    return carry
                jax.lax.fori_loop(0, B * nmb, wrap, 0)

            def gemm_rows(xf, slot, n, c, ci):
                xq, xs = _quant_rows(xf)
                acc = jax.lax.dot_general(
                    xq, wbuf[slot, :n], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32)
                y = acc.astype(jnp.float32) * (xs * stage_s(c))
                return y + stage_b(ci) if ci is not None else y

            def scatter_pairs(dst, b, r0, yb, lane0):
                for hp in range(HP):
                    dst[hp, b, pl.ds(r0, bm), :] = (
                        yb[:, lane0 + 2 * Dh * hp:lane0 + 2 * Dh * (hp + 1)])

            def gather_pairs(src, b, r0):
                return jnp.concatenate(
                    [src[hp, b, pl.ds(r0, bm), :] for hp in range(HP)], axis=1)

            def flash_pair(q2, k2, v2, bias):
                """Two heads packed in 128 lanes -> (rows, 128) bf16 out."""
                outs = []
                for hh in range(2):
                    sl = slice(hh * Dh, (hh + 1) * Dh)
                    s = jax.lax.dot_general(
                        q2[:, sl], k2[:, sl], (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    s = s + bias
                    m = jnp.max(s, axis=1, keepdims=True)
                    p = jnp.exp2((s - m) * c2)
                    r = jnp.sum(p, axis=1, keepdims=True)
                    o = jax.lax.dot_general(
                        p.astype(q2.dtype), v2[:, sl], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    outs.append((o / r).astype(q2.dtype))
                return jnp.concatenate(outs, axis=1)

            # ---- stage 0: LN1 -> quant -> QKV GEMM (all rows) ----
            slot0 = swait(0)
            ln1w, ln1b = ln_of(0)

            def s0(b, r0):
                xf = x_s[b, pl.ds(r0, bm), :].astype(jnp.float32)
                hf = _ln_bf16_f32(xf, ln1w, ln1b, eps)
                yb = gemm_rows(hf, slot0, 3 * D, 0, 0).astype(jnp.bfloat16)
                scatter_pairs(q_s, b, r0, yb, 0)
                scatter_pairs(k_s, b, r0, yb, D)
                scatter_pairs(v_s, b, r0, yb, 2 * D)
            rowblocks(s0)
            start_ahead(0, slot0)

            # ---- self-attention (sdpa_pallas math, head pairs rolled) ----
            def sa(u, carry):
                b = u // HP
                hp = u - b * HP
                bias = sbias_ref[b, 0:1, :]           # (1, Lp)
                out = flash_pair(q_s[hp, b, :Lqc, :], k_s[hp, b],
                                 v_s[hp, b], bias)
                tmp_s[hp, b, pl.ds(0, Lqc), :] = out
                return carry
            jax.lax.fori_loop(0, B * HP, sa, 0)

            # ---- stage 1: sa_out + residual ----
            slot1 = swait(1)

            def s1(b, r0):
                af = gather_pairs(tmp_s, b, r0).astype(jnp.float32)
                y = gemm_rows(af, slot1, D, 1, 1)
                x_s[b, pl.ds(r0, bm), :] = (x_s[b, pl.ds(r0, bm), :]
                                            + y.astype(x_s.dtype))
            rowblocks(s1)
            start_ahead(1, slot1)

            # ---- stage 2: LN2 -> ca_q -> tmp ----
            slot2 = swait(2)
            ln2w, ln2b = ln_of(1)

            def s2(b, r0):
                xf = x_s[b, pl.ds(r0, bm), :].astype(jnp.float32)
                hf = _ln_bf16_f32(xf, ln2w, ln2b, eps)
                yb = gemm_rows(hf, slot2, D, 2, 2).astype(jnp.bfloat16)
                scatter_pairs(tmp_s, b, r0, yb, 0)
            rowblocks(s2)
            start_ahead(2, slot2)

            # ---- stage 3: ca_kv from the once-quantized memory ----
            slot3 = swait(3)
            for b in range(B):
                acc = jax.lax.dot_general(
                    m8_s[b], wbuf[slot3, :2 * D], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32)
                y = acc.astype(jnp.float32) * (ms_s[b] * stage_s(3)) + stage_b(3)
                yb = y.astype(jnp.bfloat16)
                for hp in range(HP):
                    ck_s[hp, b] = yb[:, 2 * Dh * hp:2 * Dh * (hp + 1)]
                    cv_s[hp, b] = yb[:, D + 2 * Dh * hp:D + 2 * Dh * (hp + 1)]
            start_ahead(3, slot3)

            # ---- cross-attention (flash formulation at tiny Lk) ----
            def ca(u, carry):
                b = u // HP
                hp = u - b * HP
                bias = mbias_ref[b, 0:1, :]           # (1, Lkp)
                out = flash_pair(tmp_s[hp, b, :Lqc, :], ck_s[hp, b],
                                 cv_s[hp, b], bias)
                tmp_s[hp, b, pl.ds(0, Lqc), :] = out
                return carry
            jax.lax.fori_loop(0, B * HP, ca, 0)

            # ---- stage 4: ca_out + residual ----
            slot4 = swait(4)

            def s4(b, r0):
                af = gather_pairs(tmp_s, b, r0).astype(jnp.float32)
                y = gemm_rows(af, slot4, D, 4, 4)
                x_s[b, pl.ds(r0, bm), :] = (x_s[b, pl.ds(r0, bm), :]
                                            + y.astype(x_s.dtype))
            rowblocks(s4)
            start_ahead(4, slot4)

            # ---- stages 5+6: SwiGLU FFN, (bm, 2F) never leaves VMEM ----
            slot5 = swait(5)
            slot6 = swait(6)
            ln3w, ln3b = ln_of(2)

            def s56(b, r0):
                xf = x_s[b, pl.ds(r0, bm), :].astype(jnp.float32)
                hf = _ln_bf16_f32(xf, ln3w, ln3b, eps)
                wv = gemm_rows(hf, slot5, 2 * F, 5, None).astype(jnp.bfloat16)
                u = _silu_mul_bf16(wv)                # (bm, F) bf16
                uq, us = _quant_rows(u.astype(jnp.float32))
                acc2 = None
                for c in range(NC):
                    part = jax.lax.dot_general(
                        uq[:, c * D:(c + 1) * D],
                        wbuf[slot6, c * D:(c + 1) * D],
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.int32)
                    acc2 = part if acc2 is None else acc2 + part
                y = acc2.astype(jnp.float32) * (us * stage_s(6)) + stage_b(5)
                x_s[b, pl.ds(r0, bm), :] = (x_s[b, pl.ds(r0, bm), :]
                                            + y.astype(x_s.dtype))
            rowblocks(s56)
            start_ahead(5, slot5)
            start_ahead(6, slot6)
            return 0

        jax.lax.fori_loop(0, Nl, body, 0)
        o_ref[:] = x_s[:]

    return kernel


@functools.partial(jax.jit, static_argnames=("dims", "eps", "interpret"))
def _mega_call(x, mem, sbias, mbias, pack, svec, bvec, lnvec, *,
               dims: MegaDims, eps: float, interpret: bool):
    B, Lp, D = x.shape
    F = dims.hidden
    HP = dims.nhead // 2
    PW = 2 * dims.head_dim                           # 128 lanes per head pair
    kernel = _make_kernel(dims, eps)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, Lp, D), x.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # x
            pl.BlockSpec(memory_space=pltpu.VMEM),   # memory
            pl.BlockSpec(memory_space=pltpu.VMEM),   # self bias
            pl.BlockSpec(memory_space=pltpu.VMEM),   # memory bias
            pl.BlockSpec(memory_space=pl.ANY),       # weight pack (HBM)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # weight scales
            pl.BlockSpec(memory_space=pltpu.VMEM),   # biases
            pl.BlockSpec(memory_space=pltpu.VMEM),   # LN affines
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((min(NBUF, 6), max(3 * D, 2 * F), D),
                       jnp.int8),                               # weight stages
            pltpu.VMEM((B, Lp, D), jnp.bfloat16),               # x stream
            pltpu.VMEM((HP, B, Lp, PW), jnp.bfloat16),          # q (pair-major)
            pltpu.VMEM((HP, B, Lp, PW), jnp.bfloat16),          # k
            pltpu.VMEM((HP, B, Lp, PW), jnp.bfloat16),          # v
            pltpu.VMEM((HP, B, Lp, PW), jnp.bfloat16),          # attn/hq tmp
            pltpu.VMEM((HP, B, dims.lkp, PW), jnp.bfloat16),    # cross k
            pltpu.VMEM((HP, B, dims.lkp, PW), jnp.bfloat16),    # cross v
            pltpu.VMEM((B, dims.lkp, D), jnp.int8),             # memory int8
            pltpu.VMEM((B, dims.lkp, 1), jnp.float32),          # memory scales
            pltpu.SemaphoreType.DMA((min(NBUF, 6),)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(x, mem, sbias, mbias, pack, svec, bvec, lnvec)


def _biases_from_mask(mask, b, true_len, padded_len):
    """(B, true_len) bool torch-convention mask -> (B, 8, padded_len) f32 bias
    with -inf on masked and alignment-pad lanes."""
    if mask is None:
        mask = jnp.zeros((b, true_len), bool)
    mask = jnp.pad(mask, ((0, 0), (0, padded_len - true_len)),
                   constant_values=True)
    bias = jnp.where(mask, -jnp.inf, 0.0).astype(jnp.float32)
    return jnp.broadcast_to(bias[:, None, :], (b, 8, padded_len))


def mega_decoder_stack(layers, x, memory, nhead: int,
                       tgt_key_padding_mask=None, memory_key_padding_mask=None,
                       eps: float = 4e-5, interpret: bool = False):
    """Run the whole quantized decoder stack through the megakernel.

    Args:
        layers: stacked quantized layer pytree (``p["decoder"]["layers"]``).
        x: (B, L, D) decoder stream (bf16).
        memory: (B, Lk, D) encoder memory.
    Returns:
        (B, L, D) bf16 — pre-final-LN output (the stack LN stays outside,
        matching decoder_stack's op order).
    """
    b, l, d = x.shape
    lk = memory.shape[1]
    f = layers["lin2_w"]["q"].shape[-1]
    dims = MegaDims(n_layers=layers["norm1_w"].shape[0], dim=d, nhead=nhead,
                    head_dim=d // nhead, hidden=f, batch=b, seq=l, mem_len=lk)
    mp = build_mega_pack(layers)
    xp = x.astype(jnp.bfloat16)
    if dims.lp != l:
        xp = jnp.pad(xp, ((0, 0), (0, dims.lp - l), (0, 0)))
    memp = memory.astype(jnp.bfloat16)
    if dims.lkp != lk:
        memp = jnp.pad(memp, ((0, 0), (0, dims.lkp - lk), (0, 0)))
    sbias = _biases_from_mask(tgt_key_padding_mask, b, l, dims.lp)
    mbias = _biases_from_mask(memory_key_padding_mask, b, lk, dims.lkp)
    out = _mega_call(xp, memp, sbias, mbias, mp["pack"], mp["svec"],
                     mp["bvec"], mp["lnvec"], dims=dims, eps=eps,
                     interpret=interpret)
    return out[:, :l].astype(x.dtype)


# ------------------------------------------------------------- emulation
# Pure-jnp twin: identical op order and dtypes to the kernel, consuming the
# SAME pack bundle (validates both the math and the pack layout bit-level).

def _attn_ref(q, k, v, bias, c2):
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    s = s + bias
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp2((s - m) * c2)
    r = jnp.sum(p, axis=1, keepdims=True)
    o = jax.lax.dot_general(p.astype(q.dtype), v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return (o / r).astype(q.dtype)


def mega_decoder_stack_ref(layers, x, memory, nhead: int,
                           tgt_key_padding_mask=None,
                           memory_key_padding_mask=None, eps: float = 4e-5):
    """jnp emulation of mega_decoder_stack (same padding, same op order)."""
    b, l, d = x.shape
    lk = memory.shape[1]
    f = layers["lin2_w"]["q"].shape[-1]
    dims = MegaDims(n_layers=layers["norm1_w"].shape[0], dim=d, nhead=nhead,
                    head_dim=d // nhead, hidden=f, batch=b, seq=l, mem_len=lk)
    D, Dh, H, F = dims.dim, dims.head_dim, dims.nhead, dims.hidden
    NC = F // D
    c2 = (1.0 / (Dh ** 0.5)) * _LOG2E
    mp = build_mega_pack(layers)
    pack = mp["pack"].reshape(dims.n_layers, dims.rpl, d)
    offs, rows = dims.stage_offsets, dims.stage_rows
    s_offs, s_w = dims.s_offsets, dims.s_widths
    b_offs = dims.b_offsets

    xs_ = x.astype(jnp.bfloat16)
    if dims.lp != l:
        xs_ = jnp.pad(xs_, ((0, 0), (0, dims.lp - l), (0, 0)))
    memp = memory.astype(jnp.bfloat16)
    if dims.lkp != lk:
        memp = jnp.pad(memp, ((0, 0), (0, dims.lkp - lk), (0, 0)))
    sbias = _biases_from_mask(tgt_key_padding_mask, b, l, dims.lp)[:, 0:1, :]
    mbias = _biases_from_mask(memory_key_padding_mask, b, lk,
                              dims.lkp)[:, 0:1, :]

    m8, ms = [], []
    for bi in range(b):
        q8, qs = _quant_rows(memp[bi].astype(jnp.float32))
        m8.append(q8)
        ms.append(qs)

    Lqc = dims.lqc

    def gemm(xf, w, s, bias):
        xq, xs2 = _quant_rows(xf)
        acc = jax.lax.dot_general(xq, w, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * (xs2 * s)
        return y + bias if bias is not None else y

    for li in range(dims.n_layers):
        w = lambda c: pack[li, offs[c]:offs[c] + rows[c]]
        sv = lambda c: mp["svec"][li:li + 1, s_offs[c]:s_offs[c] + s_w[c]]
        bvi = lambda ci, c: mp["bvec"][li:li + 1,
                                       b_offs[ci]:b_offs[ci] + s_w[c]]
        lnv = lambda i: (mp["lnvec"][li:li + 1, 2 * i * D:(2 * i + 1) * D],
                         mp["lnvec"][li:li + 1,
                                     (2 * i + 1) * D:(2 * i + 2) * D])

        new = []
        for bi in range(b):
            xb = xs_[bi, :Lqc]
            ln1w, ln1b = lnv(0)
            hf = _ln_bf16_f32(xb.astype(jnp.float32), ln1w, ln1b, eps)
            qkv = gemm(hf, w(0), sv(0), bvi(0, 0)).astype(jnp.bfloat16)
            kfull = jnp.pad(qkv[:, D:2 * D], ((0, dims.lp - Lqc), (0, 0)))
            vfull = jnp.pad(qkv[:, 2 * D:], ((0, dims.lp - Lqc), (0, 0)))
            a = jnp.concatenate([
                _attn_ref(qkv[:, h * Dh:(h + 1) * Dh],
                          kfull[:, h * Dh:(h + 1) * Dh],
                          vfull[:, h * Dh:(h + 1) * Dh], sbias[bi], c2)
                for h in range(H)], axis=1)
            xb = xb + gemm(a.astype(jnp.float32), w(1), sv(1),
                           bvi(1, 1)).astype(jnp.bfloat16)

            ln2w, ln2b = lnv(1)
            hf = _ln_bf16_f32(xb.astype(jnp.float32), ln2w, ln2b, eps)
            hq = gemm(hf, w(2), sv(2), bvi(2, 2)).astype(jnp.bfloat16)
            acc = jax.lax.dot_general(m8[bi], w(3), (((1,), (1,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            ckv = (acc.astype(jnp.float32) * (ms[bi] * sv(3))
                   + bvi(3, 3)).astype(jnp.bfloat16)
            ca = jnp.concatenate([
                _attn_ref(hq[:, h * Dh:(h + 1) * Dh],
                          ckv[:, h * Dh:(h + 1) * Dh],
                          ckv[:, D + h * Dh:D + (h + 1) * Dh], mbias[bi], c2)
                for h in range(H)], axis=1)
            xb = xb + gemm(ca.astype(jnp.float32), w(4), sv(4),
                           bvi(4, 4)).astype(jnp.bfloat16)

            ln3w, ln3b = lnv(2)
            hf = _ln_bf16_f32(xb.astype(jnp.float32), ln3w, ln3b, eps)
            xq, xs2 = _quant_rows(hf)
            acc = jax.lax.dot_general(xq, w(5), (((1,), (1,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            wv = (acc.astype(jnp.float32) * (xs2 * sv(5))).astype(jnp.bfloat16)
            u = _silu_mul_bf16(wv)
            uq, us = _quant_rows(u.astype(jnp.float32))
            acc2 = None
            for c in range(NC):
                part = jax.lax.dot_general(
                    uq[:, c * D:(c + 1) * D],
                    w(6)[c * D:(c + 1) * D], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32)
                acc2 = part if acc2 is None else acc2 + part
            y = acc2.astype(jnp.float32) * (us * sv(6)) + bvi(5, 6)
            xb = xb + y.astype(jnp.bfloat16)
            new.append(xb)

        xs_ = xs_.at[:, :Lqc].set(jnp.stack(new))

    return xs_[:, :l].astype(x.dtype)
