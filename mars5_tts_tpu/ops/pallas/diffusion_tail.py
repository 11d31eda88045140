"""Fused diffusion-step tail: CFG combine + tempered log-softmax + RePaint
posterior + Gumbel-max sampling in ONE Pallas pass (W8A8 serving path).

Per reverse step the engine turns head logits into sampled x_{t-1} indices for
the generated-region lanes (diffusion/engine.py reverse()):

    z       = w·cond + (1-w)·uncond                     (bf16, CFG)
    log_x0  = log_softmax(z / temp)                     (f32)
    log_ev  = log_add_exp(log_x0 + ā, b̄);  log_x0 if t==0
    unnorm  = log_ev + two_scalar_select(x_t; hot, cold)
    idx     = argmax(unnorm + gumbel(u0))

In XLA this chain costs ~10 materializations of the (750, 7, 1025) f32 grid
(~0.7-0.9 ms/step at bench geometry). Here each (frames × classes) tile is
read once — cond/uncond logits bf16, uniforms f32 — and only the int32 indices
leave VMEM. The uniforms stay host-of-kernel (drawn from the same PRNG stream
as the parity path, preserving the shared-randomness quality harness).

Class axis is padded to 1152 lanes by fold_quant_heads(pad_to=1152): pad
columns carry bias -1e30 (softmax-transparent) and are re-masked to -inf
before the argmax, so the sampled distribution is exactly the 1025-class one.
Argmax ties break to the lowest index (same as jnp.argmax / the reference's
torch.argmax, mars5/diffuser.py:219-228).

Reference being out-engineered: reverse_diffusion materializes every
intermediate at fp32 on the full grid per step (mars5/diffuser.py:176-235).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -3.0e38


def _tail_kernel(scal_ref, zc_ref, zu_ref, u_ref, xt_ref, o_ref, *,
                 n_classes: int, w: float, temp: float):
    """Blocks: zc/zu (1, BL, KP) bf16; u (1, BL, KP) f32; xt/o (1, BL, 1) i32.

    scal_ref (SMEM, (8,)): [ā, b̄, hot, cold, is_t0, use_gumbel, _, _] — the
    per-step posterior scalars, computed in XLA with the same float ops as
    multinomial.q_posterior_indexed so the kernel is a pure re-fusion.
    """
    a = scal_ref[0]
    b1 = scal_ref[1]
    hot = scal_ref[2]
    cold = scal_ref[3]
    is_t0 = scal_ref[4]
    use_g = scal_ref[5]

    zc = zc_ref[0].astype(jnp.float32)
    if w == 1.0:
        z = zc
    else:
        # CFG combine in f32, matching the engine (model_x0_gen upcasts the
        # bf16 head logits before combining)
        z = w * zc + (1.0 - w) * zu_ref[0].astype(jnp.float32)
    s = z / temp
    m = jnp.max(s, axis=1, keepdims=True)
    lse = jnp.log(jnp.sum(jnp.exp(s - m), axis=1, keepdims=True))
    log_x0 = s - m - lse

    # log_add_exp(log_x0 + ā, b̄) with the scalar leg constant per step
    la = log_x0 + a
    mx = jnp.maximum(la, b1)
    lev = mx + jnp.log(jnp.exp(la - mx) + jnp.exp(b1 - mx))
    lev = jnp.where(is_t0 > 0.5, log_x0, lev)

    col = jax.lax.broadcasted_iota(jnp.int32, lev.shape, 1)
    xt = xt_ref[0, 0]                                # (BL, 1) int32
    un = lev + jnp.where(col == xt, hot, cold)

    u = u_ref[0]
    g = -jnp.log(jnp.maximum(-jnp.log(jnp.maximum(u, 1e-7)), 1e-7))
    y = un + g * use_g
    y = jnp.where(col < n_classes, y, _NEG)

    ymax = jnp.max(y, axis=1, keepdims=True)
    idx = jnp.min(jnp.where(y == ymax, col, jnp.int32(2 ** 30)), axis=1,
                  keepdims=True)
    o_ref[0, 0] = idx.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("n_classes", "w", "temp", "bl",
                                             "interpret"))
def diffusion_tail(y, u0p, x_t, scalars, *, n_classes: int, w: float,
                   temp: float, bl: int = 128, interpret: bool = False):
    """Sample x_{t-1} indices for the generated-region lanes.

    Args:
        y: (rows, Lp, n_lanes*KP) bf16 padded head logits from
            nar_heads_folded (rows = 2*bs under CFG — cond rows then uncond —
            or bs when w == 1); Lp must be a multiple of ``bl``.
        u0p: (bs, Lp, n_lanes*KP) f32 uniforms (class axis padded to KP).
        x_t: (bs, Lp, n_lanes) int32 current grid (the x_t posterior leg).
        scalars: (8,) f32 per-step scalars (see _tail_kernel).
        n_classes: true class count (1025); KP is inferred from shapes.
    Returns:
        (bs, Lp, n_lanes) int32 sampled indices.
    """
    rows, lp, nkp = y.shape
    n_lanes = x_t.shape[-1]
    kp = nkp // n_lanes
    bs = u0p.shape[0]
    assert lp % bl == 0 and kp % 128 == 0 and rows in (bs, 2 * bs)
    cfg2 = rows == 2 * bs

    # Mosaic requires the last two block dims be 8/128-divisible or span the
    # array, so the lane-indexed x_t/out go through a lane-major layout where
    # the lane is a leading (untiled) dim; the transposes are ~20 KB of int32.
    xt_t = x_t.transpose(0, 2, 1)[..., None]          # (bs, n_lanes, Lp, 1)

    grid = (bs, n_lanes, lp // bl)
    zc_spec = pl.BlockSpec((1, bl, kp), lambda b, h, i: (b, i, h),
                           memory_space=pltpu.VMEM)
    zu_spec = pl.BlockSpec((1, bl, kp),
                           (lambda b, h, i: (bs + b, i, h)) if cfg2 else
                           (lambda b, h, i: (b, i, h)),
                           memory_space=pltpu.VMEM)
    kernel = functools.partial(_tail_kernel, n_classes=n_classes,
                               w=w if cfg2 else 1.0, temp=temp)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bs, n_lanes, lp, 1), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            zc_spec,
            zu_spec,
            pl.BlockSpec((1, bl, kp), lambda b, h, i: (b, i, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bl, 1), lambda b, h, i: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, bl, 1), lambda b, h, i: (b, h, i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
        interpret=interpret,
    )(scalars, y, y, u0p, xt_t)
    return out[..., 0].transpose(0, 2, 1)             # (bs, Lp, n_lanes)


def _heads_tail_kernel(scal_ref, xc_ref, xsc_ref, xu_ref, xsu_ref, q_ref,
                       s_ref, b_ref, u_ref, xt_ref, o_ref, *,
                       n_classes: int, w: float, temp: float):
    """Heads GEMM + tail in one pass: blocks xc/xu (1, BL, D) int8 activations
    (cond/uncond rows), xsc/xsu (1, BL, 1) f32 act scales, q (1, KP, D) int8
    folded head weights for THIS lane, s/b (1, KP) f32 scales/biases.

    Replicates nar_heads_folded's op chain bit-for-bit (int32 dot -> f32 *
    (act_scale * w_scale) + bias -> bf16 cast) so the sampled indices match
    the two-program path exactly; the (frames x classes) logits never leave
    VMEM (saves the ~25 MB/step HBM round trip plus the pad copies).

    s_ref/b_ref hold ALL lanes (n_lanes, KP) — 32 KB each, VMEM-resident —
    indexed by the lane grid id (a (1, KP) block would violate Mosaic's
    second-minor divisibility rule).
    """
    q = q_ref[0]                                      # (KP, D) int8
    h = pl.program_id(1)
    s_row = s_ref[h]
    b_row = b_ref[h]

    def head_z(x_ref, xs_ref):
        y = jax.lax.dot_general(x_ref[0], q, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * (xs_ref[0] * s_row[None])
        y = y + b_row[None]
        return y.astype(jnp.bfloat16)                 # match XLA yflat dtype

    zc = head_z(xc_ref, xsc_ref).astype(jnp.float32)
    if w == 1.0:
        z = zc
    else:
        z = w * zc + (1.0 - w) * head_z(xu_ref, xsu_ref).astype(jnp.float32)

    a = scal_ref[0]
    b1 = scal_ref[1]
    hot = scal_ref[2]
    cold = scal_ref[3]
    is_t0 = scal_ref[4]
    use_g = scal_ref[5]

    s = z / temp
    m = jnp.max(s, axis=1, keepdims=True)
    lse = jnp.log(jnp.sum(jnp.exp(s - m), axis=1, keepdims=True))
    log_x0 = s - m - lse
    la = log_x0 + a
    mx = jnp.maximum(la, b1)
    lev = mx + jnp.log(jnp.exp(la - mx) + jnp.exp(b1 - mx))
    lev = jnp.where(is_t0 > 0.5, log_x0, lev)
    col = jax.lax.broadcasted_iota(jnp.int32, lev.shape, 1)
    xt = xt_ref[0, 0]
    un = lev + jnp.where(col == xt, hot, cold)
    u = u_ref[0]
    g = -jnp.log(jnp.maximum(-jnp.log(jnp.maximum(u, 1e-7)), 1e-7))
    y = un + g * use_g
    y = jnp.where(col < n_classes, y, _NEG)
    ymax = jnp.max(y, axis=1, keepdims=True)
    idx = jnp.min(jnp.where(y == ymax, col, jnp.int32(2 ** 30)), axis=1,
                  keepdims=True)
    o_ref[0, 0] = idx.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("n_classes", "w", "temp", "bl",
                                             "interpret"))
def heads_diffusion_tail(x8, xs, folded, u0p, x_t, scalars, *, n_classes: int,
                         w: float, temp: float, bl: int = 128,
                         interpret: bool = False):
    """Folded-heads GEMM + CFG + posterior + Gumbel argmax in ONE program.

    Args:
        x8: (rows, Lp, D) int8 — LN-normalized, act-quantized decoder output
            (rows = 2*bs cond-then-uncond under CFG, bs otherwise).
        xs: (rows, Lp, 1) f32 activation scales.
        folded: fold_quant_heads(pad_to=KP) dict — q (n_lanes, KP, D) int8,
            s/b (n_lanes, KP) f32.
        u0p/x_t/scalars: as diffusion_tail.
    Returns:
        (bs, Lp, n_lanes) int32 sampled indices, bit-identical to
        nar_heads_folded(flat=True) -> diffusion_tail.
    """
    rows, lp, d = x8.shape
    n_lanes, kp, _ = folded["q"].shape
    bs = u0p.shape[0]
    assert lp % bl == 0 and kp % 128 == 0 and rows in (bs, 2 * bs)
    cfg2 = rows == 2 * bs

    xt_t = x_t.transpose(0, 2, 1)[..., None]          # (bs, n_lanes, Lp, 1)
    grid = (bs, n_lanes, lp // bl)
    xc_spec = pl.BlockSpec((1, bl, d), lambda b, h, i: (b, i, 0),
                           memory_space=pltpu.VMEM)
    xsc_spec = pl.BlockSpec((1, bl, 1), lambda b, h, i: (b, i, 0),
                            memory_space=pltpu.VMEM)
    xu_spec = pl.BlockSpec((1, bl, d),
                           (lambda b, h, i: (bs + b, i, 0)) if cfg2 else
                           (lambda b, h, i: (b, i, 0)),
                           memory_space=pltpu.VMEM)
    xsu_spec = pl.BlockSpec((1, bl, 1),
                            (lambda b, h, i: (bs + b, i, 0)) if cfg2 else
                            (lambda b, h, i: (b, i, 0)),
                            memory_space=pltpu.VMEM)
    kernel = functools.partial(_heads_tail_kernel, n_classes=n_classes,
                               w=w if cfg2 else 1.0, temp=temp)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bs, n_lanes, lp, 1), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            xc_spec, xsc_spec, xu_spec, xsu_spec,
            pl.BlockSpec((1, kp, d), lambda b, h, i: (h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_lanes, kp), lambda b, h, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_lanes, kp), lambda b, h, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bl, kp), lambda b, h, i: (b, i, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bl, 1), lambda b, h, i: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, bl, 1), lambda b, h, i: (b, h, i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(scalars, x8, xs, x8, xs, folded["q"], folded["s"], folded["b"],
      u0p, xt_t)
    return out[..., 0].transpose(0, 2, 1)             # (bs, Lp, n_lanes)


def tail_scalars(diff, t_last, log_num_classes: float):
    """Per-step posterior scalars, bit-matching multinomial's scalar math.

    Args:
        diff: MultinomialDiffusion (tables as jnp arrays).
        t_last: traced int32 scalar timestep.
    Returns:
        (8,) f32: [ā, b̄, hot, cold, is_t0, use_gumbel placeholder=1, 0, 0].
    """
    from ...diffusion.multinomial import MIN_LOG_ARG, log_add_exp

    tm1 = jnp.maximum(t_last - 1, 0)
    a = diff.log_cumprod_alpha[tm1]
    b1 = diff.log_1_min_cumprod_alpha[tm1] - log_num_classes
    a2 = diff.log_alpha[t_last]
    b2 = diff.log_1_min_alpha[t_last] - log_num_classes
    hot = log_add_exp(a2, b2)
    cold = log_add_exp(jnp.log(jnp.float32(MIN_LOG_ARG)) + a2, b2)
    is_t0 = (t_last == 0).astype(jnp.float32)
    return jnp.stack([a, b1, hot, cold, is_t0,
                      jnp.float32(1.0), jnp.float32(0.0), jnp.float32(0.0)])
