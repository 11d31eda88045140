"""Fused diffusion-tail kernel + folded-heads tests (CPU: interpret mode).

The serving path replaces the XLA chain (CFG combine -> tempered log_softmax
-> RePaint posterior -> Gumbel-max) with one Pallas pass
(ops/pallas/diffusion_tail.py) fed by LN-affine-folded quantized heads
(models/nar.fold_quant_heads). These tests pin:

* kernel == dense engine math, index-exact, across timesteps/CFG/greedy;
* folded heads == unfolded quantized heads within quantization tolerance,
  and argmax-equivalent at the distribution level;
* the engine produces identical grids with MARS5_FUSED_TAIL forced on
  (interpret) vs off, quantized params, shared key.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mars5_tts_tpu.diffusion.multinomial import MultinomialDiffusion
from mars5_tts_tpu.models.nar import (ResidualTransformerConfig,
                                      fold_quant_heads, init_nar, nar_heads,
                                      nar_heads_folded)
from mars5_tts_tpu.ops.pallas.diffusion_tail import diffusion_tail, tail_scalars
from mars5_tts_tpu.ops.quant import quantize_nar

K, KP, NL = 1025, 1152, 7


def _dense_reference(diff, cond, uncond, u0, xt, t_val, w, temp,
                     greedy_t0=False):
    t = jnp.full((cond.shape[0],), t_val, jnp.int32)
    if w == 1.0:
        z = cond.astype(jnp.float32)
    else:
        z = w * cond.astype(jnp.float32) + (1.0 - w) * uncond.astype(jnp.float32)
    log_x0 = jax.nn.log_softmax(z / temp, axis=-1)
    log_pred = diff.q_posterior_indexed(log_x0, xt, t, normalize=False)
    out = diff.log_sample_categorical(log_pred, u0)
    if greedy_t0 and t_val == 0:
        out = jnp.argmax(log_pred, axis=-1).astype(jnp.int32)
    return out


def _kernel(diff, cond, uncond, u0, xt, t_val, w, temp, greedy_t0=False):
    bs, L = cond.shape[:2]
    pad4 = ((0, 0), (0, 0), (0, 0), (0, KP - K))
    y = cond if w == 1.0 else jnp.concatenate([cond, uncond], 0)
    ypad = jnp.pad(y.astype(jnp.float32), pad4,
                   constant_values=-1e30).astype(jnp.bfloat16)
    yflat = ypad.reshape(y.shape[0], L, NL * KP)
    u0p = jnp.pad(u0, pad4).reshape(bs, L, NL * KP)
    scal = tail_scalars(diff, jnp.int32(t_val), diff.log_num_classes)
    if greedy_t0:
        scal = scal.at[5].set(jnp.where(t_val == 0, 0.0, 1.0))
    return diffusion_tail(yflat, u0p, xt, scal, n_classes=K, w=w, temp=temp,
                          bl=64, interpret=True)


@pytest.mark.parametrize("t_val", [pytest.param(0, marks=pytest.mark.slow), 1, 9, 19])
@pytest.mark.parametrize("w", [3.0, 1.0])
def test_tail_kernel_matches_dense(t_val, w):
    BS, L = 1, 128
    diff = MultinomialDiffusion(K, timesteps=20)
    key = jax.random.PRNGKey(t_val)
    cond = jax.random.normal(key, (BS, L, NL, K), jnp.bfloat16) * 3
    uncond = jax.random.normal(jax.random.fold_in(key, 1),
                               (BS, L, NL, K), jnp.bfloat16) * 3
    u0 = jax.random.uniform(jax.random.fold_in(key, 2), (BS, L, NL, K))
    xt = jax.random.randint(jax.random.fold_in(key, 3), (BS, L, NL), 0, K,
                            jnp.int32)
    ref = _dense_reference(diff, cond, uncond, u0, xt, t_val, w, 0.7)
    got = _kernel(diff, cond, uncond, u0, xt, t_val, w, 0.7)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_tail_kernel_greedy_t0():
    BS, L = 1, 64
    diff = MultinomialDiffusion(K, timesteps=20)
    key = jax.random.PRNGKey(7)
    cond = jax.random.normal(key, (BS, L, NL, K), jnp.bfloat16) * 3
    uncond = jax.random.normal(jax.random.fold_in(key, 1),
                               (BS, L, NL, K), jnp.bfloat16) * 3
    u0 = jax.random.uniform(jax.random.fold_in(key, 2), (BS, L, NL, K))
    xt = jax.random.randint(jax.random.fold_in(key, 3), (BS, L, NL), 0, K,
                            jnp.int32)
    ref = _dense_reference(diff, cond, uncond, u0, xt, 0, 3.0, 0.7,
                           greedy_t0=True)
    got = _kernel(diff, cond, uncond, u0, xt, 0, 3.0, 0.7, greedy_t0=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


@pytest.mark.slow
def test_tail_kernel_batched_rows():
    BS, L = 2, 64
    diff = MultinomialDiffusion(K, timesteps=20)
    key = jax.random.PRNGKey(11)
    cond = jax.random.normal(key, (BS, L, NL, K), jnp.bfloat16) * 3
    uncond = jax.random.normal(jax.random.fold_in(key, 1),
                               (BS, L, NL, K), jnp.bfloat16) * 3
    u0 = jax.random.uniform(jax.random.fold_in(key, 2), (BS, L, NL, K))
    xt = jax.random.randint(jax.random.fold_in(key, 3), (BS, L, NL), 0, K,
                            jnp.int32)
    ref = _dense_reference(diff, cond, uncond, u0, xt, 5, 3.0, 0.7)
    got = _kernel(diff, cond, uncond, u0, xt, 5, 3.0, 0.7)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


# ---------------------------------------------------------------- folded heads

def _nar_with_affines():
    cfg = ResidualTransformerConfig.tiny()
    p = init_nar(jax.random.PRNGKey(0), cfg)
    k = jax.random.PRNGKey(5)
    rd = dict(p["residual_decoder"])
    # init leaves LN affines at identity (folding would be a no-op); randomize
    rd["ln_w"] = jax.random.uniform(k, rd["ln_w"].shape, jnp.float32, 0.3, 1.8)
    rd["ln_b"] = jax.random.normal(jax.random.fold_in(k, 1),
                                   rd["ln_b"].shape) * 0.2
    rd["lin_b"] = jax.random.normal(jax.random.fold_in(k, 2),
                                    rd["lin_b"].shape) * 0.1
    p["residual_decoder"] = rd
    return cfg, p


@pytest.mark.slow
def test_folded_heads_match_unfolded():
    cfg, p = _nar_with_affines()
    pq = quantize_nar(p)
    out = jax.random.normal(jax.random.PRNGKey(1), (2, 9, cfg.dim), jnp.float32)
    ref = np.asarray(nar_heads(pq, cfg, out, lanes=range(1, 8)), np.float32)
    folded = fold_quant_heads(pq, cfg, tuple(range(1, 8)))
    got = np.asarray(nar_heads_folded(folded, out), np.float32)
    oracle = np.asarray(nar_heads(p, cfg, out, lanes=range(1, 8)), np.float32)
    # folding changes the quantization grid, so compare both against the fp
    # oracle: folded must be no worse than ~1.25x the unfolded quant error
    err_ref = np.abs(ref - oracle).mean()
    err_fold = np.abs(got - oracle).mean()
    assert err_fold < 1.25 * err_ref + 1e-4, (err_fold, err_ref)
    agree = (ref.argmax(-1) == got.argmax(-1)).mean()
    assert agree > 0.95, agree


@pytest.mark.heavy
def test_folded_heads_padded_classes():
    cfg, p = _nar_with_affines()
    pq = quantize_nar(p)
    out = jax.random.normal(jax.random.PRNGKey(2), (1, 5, cfg.dim), jnp.float32)
    folded = fold_quant_heads(pq, cfg, tuple(range(1, 8)), pad_to=KP)
    flat = np.asarray(nar_heads_folded(folded, out, flat=True), np.float32)
    grid = flat.reshape(1, 5, 7, KP)
    unpadded = fold_quant_heads(pq, cfg, tuple(range(1, 8)))
    want = np.asarray(nar_heads_folded(unpadded, out), np.float32)
    np.testing.assert_allclose(grid[..., :K], want, rtol=0, atol=0)
    assert (grid[..., K:] <= -1e29).all()


@pytest.mark.parametrize("w", [1.0, 3.0])
def test_heads_tail_matches_two_program(w):
    """heads_diffusion_tail (GEMM in-kernel) == nar_heads_folded ->
    diffusion_tail, index-exact: the fused program replicates the XLA heads
    chain (int32 dot, f32 scale+bias, bf16 cast) bit-for-bit."""
    from mars5_tts_tpu.models.nar import nar_heads_prequant
    from mars5_tts_tpu.ops.pallas.diffusion_tail import heads_diffusion_tail

    cfg = ResidualTransformerConfig.tiny(n_text_vocab=32)
    p = quantize_nar(init_nar(jax.random.PRNGKey(2), cfg, dtype=jnp.float32))
    folded = fold_quant_heads(p, cfg, tuple(range(1, 8)), pad_to=KP)
    rng = np.random.default_rng(3)
    bs, L = 1, 128
    rows = bs if w == 1.0 else 2 * bs
    out = jnp.asarray(rng.standard_normal((rows, L, cfg.dim)), jnp.bfloat16)
    u0 = jnp.asarray(rng.random((bs, L, NL, K)), jnp.float32)
    u0p = jnp.pad(u0, ((0, 0), (0, 0), (0, 0), (0, KP - K))).reshape(
        bs, L, NL * KP)
    xt = jnp.asarray(rng.integers(0, K, (bs, L, NL)), jnp.int32)
    diff = MultinomialDiffusion(K, timesteps=8)
    for t_val in (0, 3, 7):
        scal = tail_scalars(diff, jnp.int32(t_val), diff.log_num_classes)
        yflat = nar_heads_folded(folded, out, flat=True)
        idx_two = diffusion_tail(yflat, u0p, xt, scal, n_classes=K, w=w,
                                 temp=0.7, bl=64, interpret=True)
        x8, xs = nar_heads_prequant(out)
        idx_one = heads_diffusion_tail(x8, xs, folded, u0p, xt, scal,
                                       n_classes=K, w=w, temp=0.7, bl=64,
                                       interpret=True)
        np.testing.assert_array_equal(np.asarray(idx_one), np.asarray(idx_two),
                                      err_msg=f"t={t_val} w={w}")


@pytest.mark.slow
def test_engine_fused_tail_matches_dense(monkeypatch):
    """Whole-engine check: fused-tail grids == dense-path grids (quantized)."""
    from mars5_tts_tpu.config import DSH
    from mars5_tts_tpu.diffusion import perform_simple_inference
    import mars5_tts_tpu.ops.pallas as pk
    import mars5_tts_tpu.ops.pallas.diffusion_tail as dt

    cfg, p = _nar_with_affines()
    pq = quantize_nar(p)
    rng = np.random.default_rng(0)
    batch = (rng.integers(0, 32, (1, 5)), rng.integers(0, 1024, (1, 6, 8)),
             np.asarray([5]), np.asarray([6]),
             rng.integers(0, 1024, (1, 8, 8)), np.zeros((1, 8), bool))
    diff = MultinomialDiffusion(K, timesteps=8)
    dsh = DSH(deep_clone=True, jump_len=1, jump_n_sample=1, guidance_w=3.0,
              x_0_temp=0.7, q0_override_steps=2,
              enable_kevin_scaled_inference=True)
    key = jax.random.key(3, impl="rbg")

    from mars5_tts_tpu.diffusion.engine import (_diffusion_scan,
                                                _diffusion_scan_serving)

    def _clear():
        _diffusion_scan.clear_cache()
        _diffusion_scan_serving.clear_cache()

    monkeypatch.setenv("MARS5_FUSED_TAIL", "0")
    _clear()  # env knobs are read at trace time
    dense = np.asarray(perform_simple_inference(pq, cfg, batch, diff, 8, dsh,
                                                key=key))

    # force the fused path on CPU: enabled() -> True + interpret-mode kernels
    monkeypatch.setenv("MARS5_FUSED_TAIL", "1")
    monkeypatch.setattr(pk, "enabled", lambda: True)
    orig = dt.diffusion_tail
    orig_ht = dt.heads_diffusion_tail

    def interp_tail(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    def interp_heads_tail(*args, **kw):
        kw["interpret"] = True
        return orig_ht(*args, **kw)

    monkeypatch.setattr(dt, "diffusion_tail", interp_tail)
    monkeypatch.setattr(dt, "heads_diffusion_tail", interp_heads_tail)
    _clear()
    fused = np.asarray(perform_simple_inference(pq, cfg, batch, diff, 8, dsh,
                                                key=key))
    _clear()  # don't leak the interpret trace to others
    np.testing.assert_array_equal(dense, fused)


@pytest.mark.slow
def test_engine_fused_tail_guidance_interval(monkeypatch):
    """Fused tail == dense path under a restrictive guidance interval: the
    cond-only steps feed the kernels bs rows (w forced to 1 in-kernel)."""
    from mars5_tts_tpu.config import DSH
    from mars5_tts_tpu.diffusion import perform_simple_inference
    import mars5_tts_tpu.ops.pallas as pk
    import mars5_tts_tpu.ops.pallas.diffusion_tail as dt

    cfg, p = _nar_with_affines()
    pq = quantize_nar(p)
    rng = np.random.default_rng(4)
    batch = (rng.integers(0, 32, (1, 5)), rng.integers(0, 1024, (1, 6, 8)),
             np.asarray([5]), np.asarray([6]),
             rng.integers(0, 1024, (1, 8, 8)), np.zeros((1, 8), bool))
    diff = MultinomialDiffusion(K, timesteps=8)
    dsh = DSH(deep_clone=True, jump_len=1, jump_n_sample=1, guidance_w=3.0,
              x_0_temp=0.7, q0_override_steps=2, guidance_interval=(0.5, 1.0),
              enable_kevin_scaled_inference=True)
    key = jax.random.key(6, impl="rbg")

    from mars5_tts_tpu.diffusion.engine import (_diffusion_scan,
                                                _diffusion_scan_serving)

    def _clear():
        _diffusion_scan.clear_cache()
        _diffusion_scan_serving.clear_cache()

    monkeypatch.setenv("MARS5_FUSED_TAIL", "0")
    _clear()
    dense = np.asarray(perform_simple_inference(pq, cfg, batch, diff, 8, dsh,
                                                key=key))

    monkeypatch.setenv("MARS5_FUSED_TAIL", "1")
    monkeypatch.setattr(pk, "enabled", lambda: True)
    orig = dt.diffusion_tail
    orig_ht = dt.heads_diffusion_tail

    def interp_tail(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    def interp_heads_tail(*args, **kw):
        kw["interpret"] = True
        return orig_ht(*args, **kw)

    monkeypatch.setattr(dt, "diffusion_tail", interp_tail)
    monkeypatch.setattr(dt, "heads_diffusion_tail", interp_heads_tail)
    _clear()
    fused = np.asarray(perform_simple_inference(pq, cfg, batch, diff, 8, dsh,
                                                key=key))
    _clear()
    np.testing.assert_array_equal(dense, fused)
