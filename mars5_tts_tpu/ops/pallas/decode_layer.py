"""Fused int8 decode-LAYER megakernel: one Pallas program per AR decode step.

The reference's decode hot path is a Python per-token loop over 26 torch
transformer blocks (mars5/nn_future.py:235-274, mars5/ar_generate.py:62-157).
The XLA redesign (models/ar_decode.py) made that one jitted while_loop; this
kernel attacks the remaining per-step HBM traffic. Measured on the target chip
(see scripts/bench_kernels.py): practical HBM read bandwidth is ~470 GB/s, XLA's
bf16 step streams 1.62 GB (3.36 ms) and its int8-weight step still needs 2.6 ms
because dequant + separate dots leave the DMA engine idle between ops. Here the
whole 26-layer step is ONE Pallas program:

* all block weights live in HBM as ONE packed int8 buffer, (L*16896, 1536):
  per layer [wq | wk | wv | wo | w1 | w3 | w2ᵀ] rows, every matmul stored with
  its contraction axis along columns (w2 transposed) so the stream is uniform;
* the program runs a fori_loop over the L layers with the 10 chunk-stages of
  each layer statically unrolled (stage ids, DMA descriptors, and buffer-slot
  arithmetic resolve at compile time — the earlier 10-way-predicated L*10
  chunk-step loop paid ~0.3 ms/token of scalar-core dispatch), manually
  double-buffering chunk DMAs (measured 442 GB/s with int8 dots overlapped vs
  290 GB/s for the automatic grid pipeline at the same shapes);
* chunk sizes are stage-exact (1536 rows for q/k/v/wo, hidden/2=1792 for the
  FFN pieces) — zero padding, zero wasted bytes;
* matmuls are W8A8: activations are dynamically quantized per token and dotted
  int8×int8→int32 on the MXU, so weights are never dequantized (no VPU pass
  over 675 MB) and scales apply to the tiny (8, out) results;
* the ring-buffer KV cache (layer-flat (L, W_pad, d) bf16) is DMA'd one layer
  ahead (K/V of layer l+1 start right after layer l's attention consumed them);
* attention is transpose-free: scoresᵀ(H, W) = (H_maskᵀ ⊙ q_flat) @ Kᵀ in one
  MXU dot, softmax along lanes, out_all(H, d) = pᵀ @ V in a second dot, then a
  per-head mask-fold collapses the block diagonal — no (W, d) temporaries, no
  per-head unrolled dots (the round-1 attention-only kernel lost to XLA on
  exactly those);
* the current token contributes via an explicit self column (cache slot masked)
  matching models/ar_decode._decode_attention, and the new K/V rows are returned
  as (L, d) outputs for a single dynamic_update_slice outside.

The kernel computes hidden states only; embedding, final RMSNorm, the output
head (int8, XLA), and the sampling pipeline stay outside. Runs in interpret
mode on CPU for tests; numerics are validated against a pure-jnp emulation
(fused_step_emulation) implementing bit-identical quantized math.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

NBUF = int(os.environ.get("MARS5_AR_NBUF", "4"))  # weight-chunk buffering depth
# KV cache rows are DMA'd in prefix chunks of this many rows: whenever the ring
# has not wrapped (pos < window — always true when window >= max_len+1, the
# shipped configs), the valid slots are exactly [0, pos] and rows beyond pos
# stay un-DMA'd VMEM garbage that the -inf slot-validity mask already excludes
# (the KV stream shrinks ~2x on average over a generation). A wrapped pos >= W
# falls back to copying every chunk. 0 disables chunking; w_pad must divide
# evenly or chunking is dropped at make_dims time.
KV_CHUNK = int(os.environ.get("MARS5_AR_KV_CHUNK", "256"))


@dataclass(frozen=True)
class FusedDims:
    """Static geometry of the fused decode step."""

    n_layers: int
    dim: int            # model dim (multiple of 128)
    hidden: int         # FFN hidden dim (hidden/2 multiple of 128)
    n_heads: int
    head_dim: int       # dim == n_heads * head_dim; even
    window: int         # ring window (logical)
    w_pad: int          # cache leading dim, window rounded up to 128
    wbits: int = 8      # backbone weight precision: 8 (int8) or 4 (nibble-packed)
    kv_chunk: int = 0   # KV prefix-chunk rows (0 = whole-layer DMA)
    batch: int = 1      # decode rows per step (<= 8: rides the sublane tile
                        # the GEMM stages already process; only attention and
                        # the KV stream scale with batch)

    @property
    def fch(self) -> int:
        return self.hidden // 2

    @property
    def rows_per_layer(self) -> int:
        return 4 * self.dim + 2 * self.hidden + self.hidden  # qkv+wo, w1+w3, w2t

    # pack row offsets of the 10 chunk stages within a layer
    @property
    def stage_offsets(self):
        d, f = self.dim, self.fch
        return (0, d, 2 * d, 3 * d,                       # wq wk wv wo
                4 * d, 4 * d + f, 4 * d + 2 * f, 4 * d + 3 * f,  # w1a w1b w3a w3b
                4 * d + 4 * f, 4 * d + 5 * f)             # w2t a, b

    @property
    def stage_rows(self):
        d, f = self.dim, self.fch
        return (d, d, d, d, f, f, f, f, f, f)


def _quant_rows(x):
    """Per-row dynamic int8 quantization of a (rows, d) f32 block."""
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    xs = jnp.maximum(amax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x / xs), -127, 127).astype(jnp.int8)
    return xq, xs


def _rms(x, w, eps):
    n = x * jax.lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True) + eps)
    return n * w


def _unpack4(b):
    """Split nibble-packed int4 pairs: int8 (R, C) -> (low, high) int8 (R, C).

    Byte layout (build_fused_pack): low nibble = column c of the LEFT half of
    the original matrix, high nibble = column c of the RIGHT half. Runs on the
    VPU via int32 shifts (int8 shifts don't lower in Mosaic); measured
    ~0.8 us per (1536, 768) chunk — fully hidden behind the weight DMA.
    """
    w32 = b.astype(jnp.int32)
    low = jax.lax.shift_right_arithmetic(jax.lax.shift_left(w32, 28), 28)
    high = jax.lax.shift_right_arithmetic(w32, 4)
    return low.astype(jnp.int8), high.astype(jnp.int8)


def _pack4(qa, qb):
    """Inverse of _unpack4: two int8-valued int4 matrices -> packed bytes."""
    b = ((qb.astype(jnp.int32) & 15) << 4) | (qa.astype(jnp.int32) & 15)
    return ((b + 128) % 256 - 128).astype(jnp.int8)


def _make_kernel(dims: FusedDims, norm_eps: float):
    L, d, H, Dh = dims.n_layers, dims.dim, dims.n_heads, dims.head_dim
    f, fch = dims.hidden, dims.fch
    W, Wp = dims.window, dims.w_pad
    RPL = dims.rows_per_layer
    offs, rows = dims.stage_offsets, dims.stage_rows
    n_steps = L * 10
    scale = 1.0 / (Dh ** 0.5)
    W4 = dims.wbits == 4
    B = dims.batch

    def kernel(pos_ref, x_ref, cosf_ref, sinf_ref, hmask_ref,
               pack_ref, scales_ref, w2s_ref, attn_n_ref, ffn_n_ref,
               ck_ref, cv_ref, kvs_ref,
               h_out_ref, knew_ref, vnew_ref,
               wbuf, sbuf, kbuf, vbuf,
               h, qb, kb, vb, w1b, w3b, uq, us, acc,
               wsem, ssem, ksem, vsem):
        if B == 1:
            pos = pos_ref[0, 0]
        else:
            poss = [pos_ref[0, b] for b in range(B)]

        def wdma_c(c_static, slot, l):
            off = l * RPL + offs[c_static]
            r = rows[c_static]
            return pltpu.make_async_copy(
                pack_ref.at[pl.ds(off, r)], wbuf.at[slot, pl.ds(0, r)],
                wsem.at[slot])

        def sdma_c(slot, chunk_idx):
            return pltpu.make_async_copy(
                scales_ref.at[chunk_idx], sbuf.at[slot], ssem.at[slot])

        # KV cache DMA in prefix chunks: only rows [0, pos] are valid ring
        # slots (window >= max_len+1 in every shipped config, so no wrap; a
        # wrapped pos >= W falls back to copying everything). Start/wait pairs
        # are guarded by the SAME pos-dependent predicate, so semaphore
        # signals and waits always match.
        KVC = dims.kv_chunk
        if KVC and Wp % KVC == 0 and Wp // KVC > 1:
            kv_chunks = Wp // KVC

            def _kv_needed(c, b=0):
                p = pos if B == 1 else poss[b]
                return jnp.logical_or(c * KVC <= p, p >= W)

            def _kv_each(cache_ref, buf, sem, l, op):
                for c in range(kv_chunks):
                    if B == 1:
                        @pl.when(_kv_needed(c))
                        def _(c=c):
                            cp = pltpu.make_async_copy(
                                cache_ref.at[l, pl.ds(c * KVC, KVC)],
                                buf.at[pl.ds(c * KVC, KVC)], sem)
                            (cp.start if op == "start" else cp.wait)()
                    else:
                        for b in range(B):
                            @pl.when(_kv_needed(c, b))
                            def _(c=c, b=b):
                                cp = pltpu.make_async_copy(
                                    cache_ref.at[l, b, pl.ds(c * KVC, KVC)],
                                    buf.at[b, pl.ds(c * KVC, KVC)], sem)
                                (cp.start if op == "start" else cp.wait)()
        else:
            kv_chunks = 1

            def _kv_each(cache_ref, buf, sem, l, op):
                if B == 1:
                    cp = pltpu.make_async_copy(cache_ref.at[l], buf, sem)
                    (cp.start if op == "start" else cp.wait)()
                else:
                    for b in range(B):
                        cp = pltpu.make_async_copy(
                            cache_ref.at[l, b], buf.at[b], sem)
                        (cp.start if op == "start" else cp.wait)()

        def kv_start(l):
            _kv_each(ck_ref, kbuf, ksem, l, "start")
            _kv_each(cv_ref, vbuf, vsem, l, "start")

        def kv_wait(l):
            _kv_each(ck_ref, kbuf, ksem, l, "wait")
            _kv_each(cv_ref, vbuf, vsem, l, "wait")

        # prologue: first NBUF weight chunks + layer-0 cache
        for i in range(NBUF):
            wdma_c(i, i, 0).start()
            sdma_c(i, i).start()
        kv_start(0)

        h[:] = x_ref[:].astype(jnp.float32)

        # ring-slot validity, shared across layers: slot s holds position
        # pos - ((pos - s) mod W); negative = unwritten. Slots >= W are padding.
        slots = jax.lax.broadcasted_iota(jnp.int32, (1, Wp), 1)

        def _valid_for(p):
            sp = p - jax.lax.rem(p - slots + 4 * W, W)
            return (sp >= 0) & (slots < W) & (slots != jax.lax.rem(p, W))

        if B == 1:
            valid = _valid_for(pos)                              # (1, Wp)
        else:
            valid_rows = [_valid_for(p) for p in poss]           # B x (1, Wp)

        lane = jax.lax.broadcasted_iota(jnp.int32, (8, d), 1)
        first_half = jax.lax.rem(lane, Dh) < (Dh // 2)

        def rope(x_flat):
            # halfsplit RoPE on a flat (8, d) block: pair(c) = c±Dh/2 within
            # each head's Dh-wide column block; global rolls + select are exact
            # because wrapped lanes always belong to the other (masked) half.
            s = Dh // 2
            rolled_l = jnp.concatenate([x_flat[:, s:], x_flat[:, :s]], -1)
            rolled_r = jnp.concatenate([x_flat[:, -s:], x_flat[:, :-s]], -1)
            pair = jnp.where(first_half, rolled_l, rolled_r)
            sgn = jnp.where(first_half, -1.0, 1.0)
            return x_flat * cosf_ref[:] + pair * sgn * sinf_ref[:]

        def body(l, _):
            # All 10 chunk-stages of one layer, statically unrolled: no
            # per-chunk pl.when dispatch (the 10-way predicated form cost
            # ~0.3 ms/token of scalar-core overhead over the DMA floor), and
            # the attn/ffn RMS+act-quant prologues run once per layer instead
            # of once per consuming chunk (bitwise-identical: h is unchanged
            # between the stages that shared them).
            base = l * 10

            def wslot(c):
                return jax.lax.rem(base + c, NBUF)

            def stage_wait(c, slot):
                wdma_c(c, slot, l).wait()
                sdma_c(slot, base + c).wait()

            def start_ahead(c, slot):
                # chunk base+c+NBUF reuses this slot; its stage index is
                # static ((c+NBUF)%10), only the layer offset is dynamic
                ncs = (c + NBUF) % 10
                nl = l + (c + NBUF) // 10

                @pl.when(base + c + NBUF < n_steps)
                def _():
                    wdma_c(ncs, slot, nl).start()
                    sdma_c(slot, base + c + NBUF).start()

            def dot_rows(xq8, xs, rows, slot):
                """xq8 (8, d) @ chunk rows -> scaled f32 (8, rows).

                wbits=4: two half-contraction int8 dots against the unpacked
                nibble planes, each with its own per-output-channel scale (the
                column split doubles as a free 2-group quantization grid).
                Multiply order matches fused_step_emulation bit-for-bit.
                """
                if W4:
                    low, high = _unpack4(wbuf[slot, :rows])
                    ya = jax.lax.dot_general(
                        xq8[:, : d // 2], low, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.int32)
                    yb = jax.lax.dot_general(
                        xq8[:, d // 2:], high, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.int32)
                    return (ya.astype(jnp.float32) * sbuf[slot, 0:1, :rows]
                            + yb.astype(jnp.float32) * sbuf[slot, 1:2, :rows]) * xs
                y = jax.lax.dot_general(
                    xq8, wbuf[slot, :rows], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32)
                return y.astype(jnp.float32) * xs * sbuf[slot, 0:1, :rows]

            # ---- stages 0-2: q/k/v projections (shared attn-norm prologue) --
            hn = _rms(h[:], attn_n_ref[l], norm_eps)
            xq8a, xsa = _quant_rows(hn)
            for c, dest in ((0, qb), (1, kb), (2, vb)):
                slot = wslot(c)
                stage_wait(c, slot)
                dest[:] = dot_rows(xq8a, xsa, d, slot)
                start_ahead(c, slot)

            # ---- stage 3: attention + wo projection ----
            def stage3_attn_wo():
                slot = wslot(3)
                stage_wait(3, slot)
                # ---- attention (kernel-resident), then the wo projection ----
                # K/V live int8 (per-position scales in the VMEM-resident
                # kvs_ref): the score dot runs int8 x int8 against a per-head
                # quantized q, and the per-key V scale folds into the softmax
                # weights before an int8 PV dot — halves the dominant cache
                # stream (7.9 -> 3.9 MB/layer/token).
                kv_wait(l)
                q = rope(qb[:])                     # (8, d), rows [0, B) real
                k_new = rope(kb[:])

                def attn_one(qrow, knew_row, vrow, kmat, vmat, ks, vs, vmask):
                    """One row's ring attention: (1, d) out via the mask-fold."""
                    qmat_t = hmask_ref[:] * qrow    # (H, d)
                    qm8, qms = _quant_rows(qmat_t)
                    scores_t = jax.lax.dot_general(
                        qm8, kmat, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.int32
                    ).astype(jnp.float32) * qms * ks * scale     # (H, Wp)
                    scores_t = jnp.where(vmask, scores_t, -jnp.inf)
                    self_s = jnp.sum(qmat_t * knew_row, axis=-1,
                                     keepdims=True) * scale      # (H, 1)
                    m = jnp.maximum(jnp.max(scores_t, axis=-1, keepdims=True),
                                    self_s)
                    p_t = jnp.exp(scores_t - m)
                    p_self = jnp.exp(self_s - m)
                    denom = jnp.sum(p_t, axis=-1, keepdims=True) + p_self
                    pv8, ps = _quant_rows(p_t * vs)
                    out_all = jax.lax.dot_general(
                        pv8, vmat, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32
                    ).astype(jnp.float32) * ps                   # (H, d)
                    fold = jnp.sum(out_all / denom * hmask_ref[:], axis=0,
                                   keepdims=True)                # (1, d)
                    return fold + jnp.sum(
                        hmask_ref[:] * (p_self / denom), axis=0,
                        keepdims=True) * vrow

                if B == 1:
                    knew_ref[l] = k_new[0:1].astype(knew_ref.dtype)
                    vnew_ref[l] = vb[0:1].astype(vnew_ref.dtype)
                    attn = attn_one(q[0:1], k_new[0:1], vb[0:1], kbuf[:],
                                    vbuf[:], kvs_ref[l, 0:1, :],
                                    kvs_ref[l, 1:2, :], valid)
                    a8, ascale = _quant_rows(jnp.broadcast_to(attn, (8, d)))
                else:
                    # per-row attention vs the row's own cache; results land in
                    # the (dead) qb scratch, pad rows zeroed
                    knew_ref[l] = k_new.astype(knew_ref.dtype)
                    vnew_ref[l] = vb[:].astype(vnew_ref.dtype)
                    qb[:] = jnp.zeros((8, d), jnp.float32)
                    for b in range(B):
                        qb[b:b + 1] = attn_one(
                            q[b:b + 1], k_new[b:b + 1], vb[b:b + 1],
                            kbuf[b], vbuf[b],
                            kvs_ref[l, b:b + 1, :],
                            kvs_ref[l, B + b:B + b + 1, :], valid_rows[b])
                    a8, ascale = _quant_rows(qb[:])
                h[:] += dot_rows(a8, ascale, d, slot)
                start_ahead(3, slot)

            stage3_attn_wo()

            # ---- stages 4-7: FFN in-projections (shared ffn-norm prologue) --
            hn2 = _rms(h[:], ffn_n_ref[l], norm_eps)
            xq8f, xsf = _quant_rows(hn2)
            for c, dest, lane_off in ((4, w1b, 0), (5, w1b, fch),
                                      (6, w3b, 0), (7, w3b, fch)):
                slot = wslot(c)
                stage_wait(c, slot)
                dest[:, lane_off:lane_off + fch] = dot_rows(xq8f, xsf, fch, slot)
                if c == 4:
                    # cache prefetch for the next layer (attention released it)
                    @pl.when(l + 1 < L)
                    def _():
                        kv_start(l + 1)
                start_ahead(c, slot)

            u = jax.nn.silu(w1b[:]) * w3b[:]
            q8u, qsu = _quant_rows(u)
            uq[:] = q8u
            us[:] = qsu

            def stage_w2(c_static, lane_off, add_out, slot):
                u_sl = uq[:, lane_off:lane_off + fch]
                if W4:
                    # w2t nibbles split the OUTPUT columns (d/2 | d/2): two
                    # row-contraction dots, outputs concatenated on lanes.
                    low, high = _unpack4(wbuf[slot, :fch])
                    y = jnp.concatenate([
                        jax.lax.dot_general(u_sl, low, (((1,), (0,)), ((), ())),
                                            preferred_element_type=jnp.int32),
                        jax.lax.dot_general(u_sl, high, (((1,), (0,)), ((), ())),
                                            preferred_element_type=jnp.int32),
                    ], axis=1)
                else:
                    y = jax.lax.dot_general(
                        u_sl, wbuf[slot, :fch], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
                if add_out:
                    y = acc[:] + y
                    h[:] += y.astype(jnp.float32) * us[:] * w2s_ref[l]
                else:
                    acc[:] = y

            # ---- stages 8-9: the two w2 half-contractions ----
            for c, lane_off, add_out in ((8, 0, False), (9, fch, True)):
                slot = wslot(c)
                stage_wait(c, slot)  # w2t per-chunk scales unused (zeros)
                stage_w2(c, lane_off, add_out, slot)
                start_ahead(c, slot)
            return 0

        jax.lax.fori_loop(0, L, body, 0)
        h_out_ref[:] = h[:]

    return kernel


@functools.partial(jax.jit, static_argnames=("dims", "norm_eps", "interpret"))
def fused_decode_layers(fp, x, pos, cache_k, cache_v, kv_scales, *,
                        dims: FusedDims, norm_eps: float = 1e-5,
                        interpret: bool = False):
    """Run all transformer layers for one decode token through the megakernel.

    Args:
        fp: fused param bundle from build_fused_pack (pack/scales/norms/...).
        x: (8, d) bf16 embedded token(s) (rows [0, batch) real, rest zeros).
        pos: () int32 absolute position of this token — or, when
            ``dims.batch > 1``, a (batch,) int32 vector of per-row positions.
        cache_k/cache_v: (L, W_pad, d) int8 ring caches (layer-flat layout);
            (L, batch, W_pad, d) when batched.
        kv_scales: (L, 2, W_pad) f32 per-position dequant scales (row 0 = K,
            row 1 = V); small enough to stay VMEM-resident. When batched:
            (L, 2 * batch, W_pad) — rows [0, B) = K scales, [B, 2B) = V.
    Returns:
        (h (8, d) f32 pre-final-norm, k_new (L, R, d) f32, v_new (L, R, d)
        f32) where R = 1 (bs=1) or 8 (batched; rows [0, batch) real) — the
        caller quantizes the new rows into the caches.
    """
    d = dims.dim
    B = dims.batch
    if B == 1:
        cos, sin = _rope_flat(pos, dims)
        pos_arg = jnp.reshape(pos.astype(jnp.int32), (1, 1))
    else:
        cos, sin = _rope_flat_rows(pos, dims)
        pos_arg = jnp.zeros((1, 8), jnp.int32).at[0, :B].set(
            pos.astype(jnp.int32))
    kernel = _make_kernel(dims, norm_eps)
    maxch = max(dims.stage_rows)
    rr = 1 if B == 1 else 8
    out = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((8, d), jnp.float32),
            jax.ShapeDtypeStruct((dims.n_layers, rr, d), jnp.float32),
            jax.ShapeDtypeStruct((dims.n_layers, rr, d), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # pos (1,1)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # x
            pl.BlockSpec(memory_space=pltpu.VMEM),   # cosf
            pl.BlockSpec(memory_space=pltpu.VMEM),   # sinf
            pl.BlockSpec(memory_space=pltpu.VMEM),   # hmask
            pl.BlockSpec(memory_space=pl.ANY),       # pack
            pl.BlockSpec(memory_space=pl.ANY),       # scales
            pl.BlockSpec(memory_space=pltpu.VMEM),   # w2 scales
            pl.BlockSpec(memory_space=pltpu.VMEM),   # attn norms
            pl.BlockSpec(memory_space=pltpu.VMEM),   # ffn norms
            pl.BlockSpec(memory_space=pl.ANY),       # cache_k
            pl.BlockSpec(memory_space=pl.ANY),       # cache_v
            pl.BlockSpec(memory_space=pltpu.VMEM),   # kv scales
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((NBUF, maxch, d // (2 if dims.wbits == 4 else 1)),
                       jnp.int8),                          # weight chunks
            pltpu.VMEM((NBUF, 2, maxch), jnp.float32),     # chunk scales (2 grp)
            pltpu.VMEM((dims.w_pad, d) if B == 1 else (B, dims.w_pad, d),
                       jnp.int8),                          # K layer (int8)
            pltpu.VMEM((dims.w_pad, d) if B == 1 else (B, dims.w_pad, d),
                       jnp.int8),                          # V layer (int8)
            pltpu.VMEM((8, d), jnp.float32),               # h
            pltpu.VMEM((8, d), jnp.float32),               # q raw
            pltpu.VMEM((8, d), jnp.float32),               # k raw
            pltpu.VMEM((8, d), jnp.float32),               # v raw
            pltpu.VMEM((8, dims.hidden), jnp.float32),     # w1 out
            pltpu.VMEM((8, dims.hidden), jnp.float32),     # w3 out
            pltpu.VMEM((8, dims.hidden), jnp.int8),        # u quantized
            pltpu.VMEM((8, 1), jnp.float32),               # u scale
            pltpu.VMEM((8, d), jnp.int32),                 # w2 accumulator
            pltpu.SemaphoreType.DMA((NBUF,)),
            pltpu.SemaphoreType.DMA((NBUF,)),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # deep chunk buffering (NBUF) overflows the 16 MB default budget;
            # batched mode adds the (B, Wp, d) K/V layer buffers
            vmem_limit_bytes=(32 if B == 1 else 96) * 1024 * 1024),
    )(pos_arg, x, cos, sin, fp["hmask"],
      fp["pack"], fp["scales"], fp["w2_scales"], fp["attn_norms"],
      fp["ffn_norms"], cache_k, cache_v, kv_scales)
    return out


def quantize_kv_rows(x):
    """Per-position int8 quantization of K/V rows: (..., P, d) -> (q, scales).

    Scales have shape x.shape[:-1] (one per position); zero rows quantize to
    zeros with the clamped minimum scale.
    """
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    s = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
    return q, s[..., 0]


def _rope_flat(pos, dims: FusedDims):
    """cos/sin in flat per-head layout: block [h*Dh, h*Dh+Dh) = [cos|cos] halves."""
    Dh = dims.head_dim
    freqs = 1.0 / (10000.0 ** (jnp.arange(0, Dh, 2, dtype=jnp.float32) / Dh))
    ang = pos.astype(jnp.float32) * freqs              # (Dh/2,)
    cos = jnp.tile(jnp.concatenate([jnp.cos(ang), jnp.cos(ang)]), (dims.n_heads,))
    sin = jnp.tile(jnp.concatenate([jnp.sin(ang), jnp.sin(ang)]), (dims.n_heads,))
    return (jnp.broadcast_to(cos, (8, dims.dim)),
            jnp.broadcast_to(sin, (8, dims.dim)))


def _rope_flat_rows(pos_vec, dims: FusedDims):
    """Per-row _rope_flat: (B,) positions -> (8, d) cos/sin, pad rows at pos 0."""
    Dh = dims.head_dim
    B = pos_vec.shape[0]
    freqs = 1.0 / (10000.0 ** (jnp.arange(0, Dh, 2, dtype=jnp.float32) / Dh))
    ang = pos_vec.astype(jnp.float32)[:, None] * freqs          # (B, Dh/2)
    cos = jnp.tile(jnp.concatenate([jnp.cos(ang), jnp.cos(ang)], -1),
                   (1, dims.n_heads))                           # (B, d)
    sin = jnp.tile(jnp.concatenate([jnp.sin(ang), jnp.sin(ang)], -1),
                   (1, dims.n_heads))
    pad = ((0, 8 - B), (0, 0))
    return jnp.pad(cos, pad), jnp.pad(sin, pad)


# ---------------------------------------------------------------------------
# pack construction + jnp emulation (test oracle / CPU fallback)

def make_dims(cfg, max_len: int, wbits: int = 8, batch: int = 1) -> FusedDims:
    if not 1 <= batch <= 8:
        raise ValueError(f"fused decode batch must be in [1, 8], got {batch}")
    window = min(cfg.sliding_window, max_len + 1)
    w_pad = -(-window // 128) * 128
    kv_chunk = KV_CHUNK if KV_CHUNK and w_pad % KV_CHUNK == 0 else 0
    return FusedDims(
        n_layers=cfg.n_layers, dim=cfg.dim, hidden=cfg.hidden_dim,
        n_heads=cfg.n_heads, head_dim=cfg.head_dim,
        window=window, w_pad=w_pad, wbits=wbits, kv_chunk=kv_chunk,
        batch=batch)


def build_fused_pack(params, cfg, dims: FusedDims):
    """Quantize + pack the AR backbone for the megakernel.

    Accepts raw (bf16) params; the head/embed/norm handling for the engine
    wrapper lives in models/ar_decode_fused.py. RoPE row permutation is assumed
    already applied at conversion (ops/rope.apply_rope_halfsplit convention).

    wbits=8: chunks are plain int8 (rows, d) with per-output-channel scales in
    scale row 0. wbits=4: each byte packs the int4 for column c (low nibble,
    left half of the matrix) and column c + d/2 (high nibble, right half); the
    two halves are quantized independently (scale rows 0/1 — a free 2-group
    grid along the contraction). w2t packs its OUTPUT columns the same way and
    keeps its single per-output scale in w2_scales.
    """
    from ..quant import quantize_weight

    layers = params["ar"]["layers"]
    d, fch = dims.dim, dims.fch
    L = dims.n_layers
    w4 = dims.wbits == 4

    def q(w):  # (L, out, in) -> int8 (L, out, in), scales (L, out)
        qq, s = quantize_weight(w, axis=-1)
        return qq, s.astype(jnp.float32)

    def q4(w):
        """(L, out, in) -> packed (L, out, in/2), scales (L, 2, out).

        int4 scales come from a per-row MSE-optimal clip search (amax wastes
        the 15-level grid on the row tail at 4 bits; see quantize_weight_mse)
        — pack-time only, the kernel math is unchanged. MARS5_INT4_MSE=0
        reverts to plain amax scales (A/B knob; the clip search trades a
        slightly larger max per-row error for a lower mean error)."""
        d2 = w.shape[-1] // 2
        if os.environ.get("MARS5_INT4_MSE", "1") == "1":
            from ..quant import quantize_weight_mse
            qa, sa = quantize_weight_mse(w[..., :d2], levels=7)
            qb, sb = quantize_weight_mse(w[..., d2:], levels=7)
        else:
            qa, sa = quantize_weight(w[..., :d2], axis=-1, levels=7)
            qb, sb = quantize_weight(w[..., d2:], axis=-1, levels=7)
        return _pack4(qa, qb), jnp.stack([sa, sb], axis=1).astype(jnp.float32)

    if w4:
        wq, sq = q4(layers["wq"])
        wk, sk = q4(layers["wk"])
        wv, sv = q4(layers["wv"])
        wo, so = q4(layers["wo"])
        w1, s1 = q4(layers["w1"])
        w3, s3 = q4(layers["w3"])
        # w2: per-output (d) int4 scale, nibble-pack the transposed OUTPUT cols
        if os.environ.get("MARS5_INT4_MSE", "1") == "1":
            from ..quant import quantize_weight_mse
            w2q, s2 = quantize_weight_mse(layers["w2"], levels=7)
        else:
            w2q, s2 = quantize_weight(layers["w2"], axis=-1, levels=7)
        s2 = s2.astype(jnp.float32)
        w2t_full = jnp.transpose(w2q, (0, 2, 1))       # (L, hidden, d)
        w2t = _pack4(w2t_full[..., : d // 2], w2t_full[..., d // 2:])
    else:
        wq, sq = q(layers["wq"])
        wk, sk = q(layers["wk"])
        wv, sv = q(layers["wv"])
        wo, so = q(layers["wo"])
        w1, s1 = q(layers["w1"])
        w3, s3 = q(layers["w3"])
        w2, s2 = q(layers["w2"])              # (L, d, hidden), scale (L, d)
        w2t = jnp.transpose(w2, (0, 2, 1))    # (L, hidden, d): rows = contraction

    pw = d // 2 if w4 else d
    pack = jnp.concatenate([wq, wk, wv, wo, w1, w3, w2t], axis=1)
    pack = pack.reshape(L * dims.rows_per_layer, pw)

    maxch = max(dims.stage_rows)
    if w4:
        zeros_f = jnp.zeros((L, 2, fch), jnp.float32)
        per_chunk = [sq, sk, sv, so,
                     s1[:, :, :fch], s1[:, :, fch:],
                     s3[:, :, :fch], s3[:, :, fch:],
                     zeros_f, zeros_f]
    else:
        zeros_f = jnp.zeros((L, fch), jnp.float32)
        per_chunk = [sq, sk, sv, so,
                     s1[:, :fch], s1[:, fch:], s3[:, :fch], s3[:, fch:],
                     zeros_f, zeros_f]
    chunks = []
    for l in range(L):
        for c in range(10):
            row = per_chunk[c][l]
            if not w4:
                row = row[None]                      # (1, rows)
            if row.shape[-1] < maxch:
                row = jnp.pad(row, ((0, 0), (0, maxch - row.shape[-1])))
            if row.shape[0] < 2:
                row = jnp.pad(row, ((0, 2 - row.shape[0]), (0, 0)))
            chunks.append(row)
    scales = jnp.stack(chunks).reshape(L * 10, 2, maxch)

    hd = dims.head_dim
    hmask = (np.arange(d)[None, :] // hd == np.arange(dims.n_heads)[:, None])
    return {
        "pack": pack,
        "scales": scales,
        "w2_scales": s2[:, None, :],                      # (L, 1, d)
        "attn_norms": layers["attention_norm"][:, None, :].astype(jnp.float32),
        "ffn_norms": layers["ffn_norm"][:, None, :].astype(jnp.float32),
        "hmask": jnp.asarray(hmask, jnp.float32),
    }


def fused_step_emulation_batched(fp, x, pos_vec, cache_k, cache_v, kv_scales, *,
                                 dims: FusedDims, norm_eps: float = 1e-5):
    """Batched oracle: per-row single-row emulations (the kernel's quantized
    math is exactly row-independent — per-row act quant, per-row attention
    against the row's own cache), assembled to the kernel's output shapes.

    Args mirror fused_decode_layers with ``dims.batch > 1``:
    cache_k/cache_v (L, B, Wp, d) int8, kv_scales (L, 2B, Wp) f32.
    Returns (h (8, d) f32, k_new (L, 8, d) f32, v_new (L, 8, d) f32).
    """
    import dataclasses

    B = dims.batch
    d1 = dataclasses.replace(dims, batch=1)
    hs, kns, vns = [], [], []
    for b in range(B):
        xb = jnp.zeros((8, dims.dim), x.dtype).at[0].set(x[b])
        kvs_b = jnp.stack([kv_scales[:, b], kv_scales[:, B + b]], axis=1)
        h, kn, vn = fused_step_emulation(
            fp, xb, pos_vec[b], cache_k[:, b], cache_v[:, b], kvs_b,
            dims=d1, norm_eps=norm_eps)
        hs.append(h[0:1])
        kns.append(kn[:, 0])
        vns.append(vn[:, 0])
    pad = jnp.zeros((8 - B, dims.dim), jnp.float32)
    h8 = jnp.concatenate(hs + [pad], axis=0)
    k8 = jnp.stack(kns, axis=1)                        # (L, B, d)
    v8 = jnp.stack(vns, axis=1)
    zpad = jnp.zeros((dims.n_layers, 8 - B, dims.dim), jnp.float32)
    return h8, jnp.concatenate([k8, zpad], 1), jnp.concatenate([v8, zpad], 1)


def fused_step_emulation(fp, x, pos, cache_k, cache_v, kv_scales=None, *,
                         dims: FusedDims, norm_eps: float = 1e-5,
                         quantized: bool = True):
    """Pure-jnp emulation of the megakernel's exact quantized math (oracle).

    ``quantized=True`` expects int8 caches + ``kv_scales`` (L, 2, W_pad) and
    mirrors the kernel's int8-KV attention bit-for-bit. ``quantized=False``
    replaces every W8A8 dot with an fp32 dot against the dequantized weights
    and takes raw f32/bf16 caches — used by tests to check the kernel's
    STRUCTURE (pack layout, flat RoPE, mask-fold attention, ring masking)
    against the XLA decode path with identical weights, isolating layout bugs
    from quant noise.
    """
    L, d, H, Dh = dims.n_layers, dims.dim, dims.n_heads, dims.head_dim
    fch, W, Wp = dims.fch, dims.window, dims.w_pad
    RPL = dims.rows_per_layer
    offs, rows = dims.stage_offsets, dims.stage_rows
    scale = 1.0 / (Dh ** 0.5)
    cos, sin = _rope_flat(pos, dims)
    hmask = fp["hmask"]

    lane = jnp.arange(d)
    first_half = (lane % Dh) < (Dh // 2)

    def rope(xf):
        s = Dh // 2
        rolled_l = jnp.concatenate([xf[:, s:], xf[:, :s]], -1)
        rolled_r = jnp.concatenate([xf[:, -s:], xf[:, :-s]], -1)
        pair = jnp.where(first_half, rolled_l, rolled_r)
        sgn = jnp.where(first_half, -1.0, 1.0)
        return xf * cos + pair * sgn * sin

    W4 = dims.wbits == 4
    if W4 and not quantized:
        raise NotImplementedError("structure (unquantized) oracle is wbits=8 only")
    pw = d // 2 if W4 else d

    def get_chunk(l, c):
        off = l * RPL + offs[c]
        w = jax.lax.dynamic_slice(fp["pack"], (off, 0), (rows[c], pw))
        if W4:
            return w, fp["scales"][l * 10 + c, :, : rows[c]]      # (2, rows)
        return w, fp["scales"][l * 10 + c, 0, : rows[c]]

    slots = jnp.arange(Wp)[None, :]
    slot_pos = pos - jnp.mod(pos - slots, W)
    cur_slot = jnp.mod(pos, W)
    valid = (slot_pos >= 0) & (slots < W) & (slots != cur_slot)

    h = x.astype(jnp.float32)
    k_news, v_news = [], []
    for l in range(L):
        hn = _rms(h, fp["attn_norms"][l], norm_eps)
        if quantized:
            xq8, xs = _quant_rows(hn)
        else:
            xq8, xs = hn, jnp.ones((hn.shape[0], 1), jnp.float32)

        def dot8(xq, xsc, w8, ws):
            if not quantized:
                return jax.lax.dot_general(
                    xq, w8.astype(jnp.float32) * ws[:, None],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
            if W4:
                # multiply order matches the kernel: (ya*sA + yb*sB) * xs
                low, high = _unpack4(w8)
                ya = jax.lax.dot_general(xq[:, : d // 2], low,
                                         (((1,), (1,)), ((), ())),
                                         preferred_element_type=jnp.int32)
                yb = jax.lax.dot_general(xq[:, d // 2:], high,
                                         (((1,), (1,)), ((), ())),
                                         preferred_element_type=jnp.int32)
                return (ya.astype(jnp.float32) * ws[0:1]
                        + yb.astype(jnp.float32) * ws[1:2]) * xsc
            # multiply order matches the kernel exactly: (y * xs) * ws
            y = jax.lax.dot_general(xq, w8, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            return y.astype(jnp.float32) * xsc * ws

        (wq8, sq), (wk8, sk), (wv8, sv) = (get_chunk(l, c) for c in range(3))
        q = dot8(xq8, xs, wq8, sq)
        kx = dot8(xq8, xs, wk8, sk)
        v = dot8(xq8, xs, wv8, sv)
        q, k_new = rope(q), rope(kx)
        k_news.append(k_new[0:1].astype(jnp.float32))
        v_news.append(v[0:1].astype(jnp.float32))

        qmat_t = hmask * q[0:1]
        if quantized:
            qm8, qms = _quant_rows(qmat_t)
            ks = kv_scales[l, 0:1, :]
            scores_t = jax.lax.dot_general(
                qm8, cache_k[l], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32
            ).astype(jnp.float32) * qms * ks * scale
        else:
            scores_t = jax.lax.dot_general(
                qmat_t.astype(jnp.bfloat16), cache_k[l], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
        scores_t = jnp.where(valid, scores_t, -jnp.inf)
        self_s = jnp.sum(qmat_t * k_new[0:1], axis=-1, keepdims=True) * scale
        m = jnp.maximum(jnp.max(scores_t, axis=-1, keepdims=True), self_s)
        p_t = jnp.exp(scores_t - m)
        p_self = jnp.exp(self_s - m)
        denom = jnp.sum(p_t, axis=-1, keepdims=True) + p_self
        if quantized:
            vs = kv_scales[l, 1:2, :]
            pv8, ps = _quant_rows(p_t * vs)
            out_all = jax.lax.dot_general(
                pv8, cache_v[l], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.float32) * ps
        else:
            out_all = jax.lax.dot_general(
                p_t.astype(jnp.bfloat16), cache_v[l], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        fold = jnp.sum(out_all / denom * hmask, axis=0, keepdims=True)
        attn = fold + jnp.sum(hmask * (p_self / denom), axis=0,
                              keepdims=True) * v[0:1]

        wo8, so = get_chunk(l, 3)
        attn_b = jnp.broadcast_to(attn, (8, d))
        if quantized:
            a8, ascale = _quant_rows(attn_b)
        else:
            a8, ascale = attn_b, jnp.ones((8, 1), jnp.float32)
        h = h + dot8(a8, ascale, wo8, so)

        hn2 = _rms(h, fp["ffn_norms"][l], norm_eps)
        if quantized:
            x2, x2s = _quant_rows(hn2)
        else:
            x2, x2s = hn2, jnp.ones((8, 1), jnp.float32)
        w1a, s1a = get_chunk(l, 4)
        w1c, s1c = get_chunk(l, 5)
        w3a, s3a = get_chunk(l, 6)
        w3c, s3c = get_chunk(l, 7)
        a = jnp.concatenate([dot8(x2, x2s, w1a, s1a), dot8(x2, x2s, w1c, s1c)], -1)
        b = jnp.concatenate([dot8(x2, x2s, w3a, s3a), dot8(x2, x2s, w3c, s3c)], -1)
        u = jax.nn.silu(a) * b
        w2a, _ = get_chunk(l, 8)
        w2b, _ = get_chunk(l, 9)
        if quantized:
            uq8, us = _quant_rows(u)

            def w2dot(u_sl, w):
                if W4:
                    low, high = _unpack4(w)
                    return jnp.concatenate([
                        jax.lax.dot_general(u_sl, low, (((1,), (0,)), ((), ())),
                                            preferred_element_type=jnp.int32),
                        jax.lax.dot_general(u_sl, high, (((1,), (0,)), ((), ())),
                                            preferred_element_type=jnp.int32),
                    ], axis=1)
                return jax.lax.dot_general(u_sl, w, (((1,), (0,)), ((), ())),
                                           preferred_element_type=jnp.int32)

            y = w2dot(uq8[:, :fch], w2a) + w2dot(uq8[:, fch:], w2b)
            h = h + y.astype(jnp.float32) * us * fp["w2_scales"][l]
        else:
            w2f = jnp.concatenate([w2a, w2b], 0).astype(jnp.float32)
            y = jax.lax.dot_general(u, w2f * fp["w2_scales"][l],
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            h = h + y

    return h, jnp.stack(k_news, 0), jnp.stack(v_news, 0)
