"""Whole-stack NAR decoder megakernel (ops/pallas/nar_mega.py).

Contract under test:
* the Pallas kernel (interpret mode) matches its jnp emulation twin
  bit-for-bit — same pack layout, same op order, same dtypes;
* the megakernel semantics track the standard W8A8 decoder stack (XLA path):
  GEMM/FFN chains are the identical quantized math, self-attention is the
  sdpa_pallas math, cross-attention swaps the XLA softmax for the flash
  formulation — so outputs agree to f32-rounding level, not bitwise;
* padding masks behave: masked rows don't influence valid rows;
* the real diffusion engine runs through the kernel end-to-end
  (MARS5_NAR_MEGA_INTERPRET=1) and stays deterministic.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mars5_tts_tpu.models.layers import LAYERNORM_EPS, decoder_stack
from mars5_tts_tpu.ops.quant import quantize_weight

D, F, NH, LK = 256, 768, 4, 19
NLAYERS = 2


def _qd(w):
    q, s = quantize_weight(jnp.asarray(w), axis=-1)
    return {"q": q, "s": s, "a8": jnp.zeros(q.shape[:-2] if q.ndim > 2 else ())}


def _make_stack(n_layers: int, seed: int = 11):
    """A small-but-tileable quantized decoder stack (stacked-layer pytree)."""
    rng = np.random.default_rng(seed)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.05)

    def one():
        return {
            "norm1_w": mk(D) + 1, "norm1_b": mk(D),
            "norm2_w": mk(D) + 1, "norm2_b": mk(D),
            "norm3_w": mk(D) + 1, "norm3_b": mk(D),
            "sa_in_w": _qd(rng.standard_normal((3, D, D)) * 0.05),
            "sa_in_b": mk(3, D),
            "sa_out_w": _qd(rng.standard_normal((D, D)) * 0.05),
            "sa_out_b": mk(D),
            "ca_in_w": _qd(rng.standard_normal((3, D, D)) * 0.05),
            "ca_in_b": mk(3, D),
            "ca_out_w": _qd(rng.standard_normal((D, D)) * 0.05),
            "ca_out_b": mk(D),
            "WV": _qd(rng.standard_normal((2 * F, D)) * 0.05),
            "lin2_w": _qd(rng.standard_normal((D, F)) * 0.05),
            "lin2_b": mk(D),
        }

    layers = jax.tree.map(lambda *xs: jnp.stack(xs),
                          *[one() for _ in range(n_layers)])
    x = jnp.asarray(rng.standard_normal((2, 100, D)).astype(np.float32),
                    jnp.bfloat16)
    memory = jnp.asarray(rng.standard_normal((2, LK, D)).astype(np.float32),
                         jnp.bfloat16)
    kpm = jnp.zeros((2, 100), bool).at[1, 90:].set(True)
    mpm = jnp.zeros((2, LK), bool).at[0, 15:].set(True)
    return layers, x, memory, kpm, mpm


@pytest.fixture(scope="module")
def stack():
    return _make_stack(NLAYERS)


@pytest.mark.heavy
def test_mega_supported_gate(stack):
    from mars5_tts_tpu.ops.pallas.nar_mega import mega_supported

    layers, x, _, _, _ = stack
    assert mega_supported(layers, x, NH)
    # wrong head_dim
    assert not mega_supported(layers, x, NH * 2)
    # unquantized
    plain = dict(layers)
    plain["WV"] = jnp.zeros((NLAYERS, 2 * F, D), jnp.bfloat16)
    assert not mega_supported(plain, x, NH)
    # grouped (sg) dicts have no unfused twin in the kernel yet: must reject
    # so the per-layer fused path (which supports them) takes over
    grouped = dict(layers)
    wv = dict(layers["WV"])
    wv["sg"] = wv.pop("s")
    grouped["WV"] = wv
    assert not mega_supported(grouped, x, NH)
    # oversized geometry: scratch estimate exceeds the VMEM budget
    big = jnp.zeros((8, 1280, D), jnp.bfloat16)
    from mars5_tts_tpu.ops.pallas.nar_mega import MegaDims, _vmem_estimate
    assert _vmem_estimate(MegaDims(16, 1024, 16, 64, 3072, 4, 1200, 61)) \
        > _vmem_estimate(MegaDims(16, 1024, 16, 64, 3072, 2, 1200, 61))


def _ref_jit(layers, x, memory, kpm, mpm):
    """The emulation twin, jitted. Jitting matters: the interpret-mode kernel
    executes inside a jit where XLA CPU fuses mul-add chains into FMAs; the
    eager emulation rounds every op separately, which flips ~10% of elements
    by one bf16 ulp (then act-quant row scales amplify). Under jit the two
    jaxprs fuse identically and the match is BITWISE."""
    import functools
    from mars5_tts_tpu.ops.pallas.nar_mega import mega_decoder_stack_ref
    fn = jax.jit(functools.partial(mega_decoder_stack_ref, nhead=NH,
                                   eps=LAYERNORM_EPS))
    return fn(layers, x, memory, tgt_key_padding_mask=kpm,
              memory_key_padding_mask=mpm)


@pytest.mark.slow
def test_mega_kernel_matches_emulation_1layer():
    """ONE layer, all segments active: tight bounded match vs the jitted
    emulation. (Bitwise holds only per isolated segment — with every branch
    live, XLA re-fuses the emulation's reductions differently from the
    kernel's jaxpr, flipping ulps that act-quant row scales amplify.)"""
    from mars5_tts_tpu.ops.pallas.nar_mega import mega_decoder_stack

    layers, x, memory, kpm, mpm = _make_stack(1)
    got = mega_decoder_stack(layers, x, memory, NH, kpm, mpm,
                             eps=LAYERNORM_EPS, interpret=True)
    want = _ref_jit(layers, x, memory, kpm, mpm)
    g = np.asarray(got, np.float32)
    w = np.asarray(want, np.float32)
    scale = np.abs(w).max()
    np.testing.assert_allclose(g, w, rtol=0, atol=0.03 * scale)
    assert np.abs(g - w).mean() < 8e-3 * scale


def test_mega_kernel_multilayer_identity_collapse(stack):
    """Weight streaming across layers: with layer 2's out-projections zeroed
    the 2-layer kernel must reproduce the 1-layer kernel BITWISE (wrong
    layer-offset DMAs would change the result wildly)."""
    from mars5_tts_tpu.ops.pallas.nar_mega import mega_decoder_stack

    layers2, x, memory, kpm, mpm = stack
    layers2 = dict(layers2)
    for k in ("sa_out_w", "ca_out_w", "lin2_w"):
        w = dict(layers2[k])
        w["q"] = w["q"].at[1].set(0)
        layers2[k] = w
    for k in ("sa_out_b", "ca_out_b", "lin2_b"):
        layers2[k] = layers2[k].at[1].set(0)

    def first(v):
        if isinstance(v, dict):
            return {kk: (vv[0:1] if hasattr(vv, "ndim") and vv.ndim >= 1
                         else vv) for kk, vv in v.items()}
        return v[0:1]

    layers1 = {k: first(v) for k, v in layers2.items()}
    g2 = mega_decoder_stack(layers2, x, memory, NH, kpm, mpm,
                            eps=LAYERNORM_EPS, interpret=True)
    g1 = mega_decoder_stack(layers1, x, memory, NH, kpm, mpm,
                            eps=LAYERNORM_EPS, interpret=True)
    np.testing.assert_array_equal(np.asarray(g2, np.float32),
                                  np.asarray(g1, np.float32))


def test_mega_kernel_matches_emulation_bounded(stack):
    """TWO layers: bounded-tight vs the emulation (ulp flips amplified by the
    act-quant scales only — a weight-streaming or layout bug would blow these
    bounds by orders of magnitude)."""
    from mars5_tts_tpu.ops.pallas.nar_mega import (mega_decoder_stack,
                                                   mega_decoder_stack_ref)

    layers, x, memory, kpm, mpm = stack
    got = mega_decoder_stack(layers, x, memory, NH, kpm, mpm,
                             eps=LAYERNORM_EPS, interpret=True)
    want = mega_decoder_stack_ref(layers, x, memory, NH, kpm, mpm,
                                  eps=LAYERNORM_EPS)
    g = np.asarray(got, np.float32)
    w = np.asarray(want, np.float32)
    scale = np.abs(w).max()
    np.testing.assert_allclose(g, w, rtol=0, atol=0.03 * scale)
    assert np.abs(g - w).mean() < 8e-3 * scale
    cos = (g * w).sum() / (np.linalg.norm(g) * np.linalg.norm(w) + 1e-12)
    assert cos > 0.9995


def _zero_qd(*shape):
    return {"q": jnp.zeros(shape, jnp.int8),
            "s": jnp.ones(shape[:-1], jnp.float32),
            "a8": jnp.zeros(shape[:-2] if len(shape) > 2 else ())}


@pytest.mark.parametrize("mode", ["sa_only", "ca_only", "ffn_only"])
def test_mega_isolated_segments_bitwise(mode):
    """ONE layer with the other residual branches zeroed — localizes any
    future numerics regression to a stage."""
    from mars5_tts_tpu.ops.pallas.nar_mega import mega_decoder_stack

    layers, x, memory, kpm, mpm = _make_stack(1)
    layers = dict(layers)
    zero_d = jnp.zeros((1, D), jnp.float32)
    if mode in ("ca_only", "ffn_only"):
        layers["sa_out_w"] = _zero_qd(1, D, D)
        layers["sa_out_b"] = zero_d
    if mode in ("sa_only", "ffn_only"):
        layers["ca_out_w"] = _zero_qd(1, D, D)
        layers["ca_out_b"] = zero_d
    if mode in ("sa_only", "ca_only"):
        layers["lin2_w"] = _zero_qd(1, D, F)
        layers["lin2_b"] = zero_d
    got = mega_decoder_stack(layers, x, memory, NH, kpm, mpm,
                             eps=LAYERNORM_EPS, interpret=True)
    want = _ref_jit(layers, x, memory, kpm, mpm)
    np.testing.assert_array_equal(np.asarray(got, np.float32),
                                  np.asarray(want, np.float32))


def test_mega_matches_standard_stack(stack, monkeypatch):
    """Same quantized math as the XLA W8A8 stack up to the attention softmax
    implementation: close in f32, high cosine."""
    monkeypatch.setenv("MARS5_NAR_FUSED", "0")
    monkeypatch.setenv("MARS5_NAR_MEGA", "0")
    from mars5_tts_tpu.ops.pallas.nar_mega import mega_decoder_stack_ref
    from mars5_tts_tpu.ops.norms import layer_norm

    layers, x, memory, kpm, mpm = stack
    p = {"layers": layers,
         "norm_w": jnp.ones((D,), jnp.bfloat16),
         "norm_b": jnp.zeros((D,), jnp.bfloat16)}
    want = decoder_stack(p, x, memory, nhead=NH, tgt_key_padding_mask=kpm,
                         memory_key_padding_mask=mpm)
    got = layer_norm(
        mega_decoder_stack_ref(layers, x, memory, NH, kpm, mpm,
                               eps=LAYERNORM_EPS),
        p["norm_w"], p["norm_b"], LAYERNORM_EPS)
    g = np.asarray(got, np.float32)
    w = np.asarray(want, np.float32)
    # only the valid rows are contractual (pad rows diverge by construction)
    g = np.concatenate([g[0, :100].ravel(), g[1, :90].ravel()])
    w = np.concatenate([w[0, :100].ravel(), w[1, :90].ravel()])
    scale = np.abs(w).max()
    np.testing.assert_allclose(g, w, rtol=0, atol=0.05 * scale)
    cos = (g * w).sum() / (np.linalg.norm(g) * np.linalg.norm(w) + 1e-12)
    assert cos > 0.999
    assert np.abs(g - w).mean() < 5e-3 * scale


def test_mega_mask_isolation(stack):
    """Valid-row outputs are independent of the contents of masked rows."""
    from mars5_tts_tpu.ops.pallas.nar_mega import mega_decoder_stack_ref

    layers, x, memory, kpm, mpm = stack
    base = mega_decoder_stack_ref(layers, x, memory, NH, kpm, mpm,
                                  eps=LAYERNORM_EPS)
    x2 = x.at[1, 90:].set(jnp.bfloat16(7.0))          # masked decoder rows
    mem2 = memory.at[0, 15:].set(jnp.bfloat16(-3.0))  # masked memory rows
    pert = mega_decoder_stack_ref(layers, x2, mem2, NH, kpm, mpm,
                                  eps=LAYERNORM_EPS)
    np.testing.assert_array_equal(np.asarray(base[0, :100]),
                                  np.asarray(pert[0, :100]))
    np.testing.assert_array_equal(np.asarray(base[1, :90]),
                                  np.asarray(pert[1, :90]))


@pytest.mark.slow
def test_engine_mega_interpret(monkeypatch):
    """The REAL diffusion engine through the megakernel on CPU
    (MARS5_NAR_MEGA_INTERPRET=1): deterministic, L0 lane pinned, grid tracks
    the unfused W8A8 run."""
    from mars5_tts_tpu.config import DSH
    from mars5_tts_tpu.diffusion import (MultinomialDiffusion,
                                         perform_simple_inference)
    from mars5_tts_tpu.models.nar import ResidualTransformerConfig, init_nar
    from mars5_tts_tpu.ops.quant import quantize_nar

    cfg = ResidualTransformerConfig(n_text_vocab=32, dim=D, nhead=NH,
                                    enc_layers=1, dec_layers=NLAYERS,
                                    n_spk_layers=1, t_emb_dim=D,
                                    hidden_dim=F)
    p = init_nar(jax.random.PRNGKey(3), cfg, dtype=jnp.float32)
    pq = quantize_nar(p)
    rng = np.random.default_rng(5)
    bs, Lt, Lc, Lx, T = 1, 7, 11, 16, 4
    batch = (rng.integers(0, 32, (bs, Lt)), rng.integers(0, 1024, (bs, Lc, 8)),
             np.asarray([Lt]), np.asarray([Lc]),
             rng.integers(0, 1024, (bs, Lx, 8)), np.zeros((bs, Lx), bool))
    diff = MultinomialDiffusion(1025, timesteps=T)
    dsh = DSH(last_greedy=True, x_0_temp=0.7, guidance_w=3.0, jump_len=1,
              jump_n_sample=1, q0_override_steps=2)
    key = jax.random.key(0, impl="rbg")

    # env knobs are read at TRACE time: clear the jit caches between toggles,
    # otherwise the mega call silently reuses the unfused graph (vacuous)
    from mars5_tts_tpu.diffusion.engine import (_diffusion_scan,
                                                _diffusion_scan_serving)

    def _clear():
        _diffusion_scan.clear_cache()
        _diffusion_scan_serving.clear_cache()

    monkeypatch.setenv("MARS5_NAR_FUSED", "0")
    _clear()
    g_unfused = np.asarray(perform_simple_inference(pq, cfg, batch, diff, T,
                                                    dsh, key=key))
    monkeypatch.setenv("MARS5_NAR_MEGA_INTERPRET", "1")
    _clear()
    g_mega = np.asarray(perform_simple_inference(pq, cfg, batch, diff, T,
                                                 dsh, key=key))
    g_mega2 = np.asarray(perform_simple_inference(pq, cfg, batch, diff, T,
                                                  dsh, key=key))
    _clear()  # don't leak the interpret trace to other tests
    np.testing.assert_array_equal(g_mega, g_mega2)
    assert (g_mega[..., 0] == g_unfused[..., 0]).all()
    agree = (g_mega == g_unfused).mean()
    assert agree > 0.5, f"mega-vs-unfused grid agreement {agree:.2f}"
