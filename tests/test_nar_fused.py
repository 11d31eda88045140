"""Fused NAR decoder-layer GEMM kernels (ops/pallas/nar_fused.py).

Contract under test: at groups=1 every fused site computes the SAME chain as
the unfused W8A8 path (exact int8 dots; LN/quant replicate the bf16
round-trips). Outputs may differ only where compiler fusion (FMA) flips a
borderline f32 rounding — bounded to ~2 bf16 ulp with the overwhelming
majority of elements exactly equal. Grouped activation quant matches its jnp
emulation and is at least as accurate as per-row quant vs the fp32 reference.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mars5_tts_tpu.models.layers import (LAYERNORM_EPS, decoder_layer,
                                         decoder_layer_fused)
from mars5_tts_tpu.ops.norms import layer_norm
from mars5_tts_tpu.ops.quant import linear_any, quantize_weight, slice_rows


def _assert_fused_eq(got, want, exact_frac=0.95):
    """Equal up to compiler-fusion rounding: tiny bounded diffs, mostly exact."""
    g = np.asarray(got, np.float32)
    w = np.asarray(want, np.float32)
    scale = max(np.abs(w).max(), 1.0)
    np.testing.assert_allclose(g, w, rtol=0, atol=0.02 * scale)
    assert (g == w).mean() > exact_frac
    assert np.abs(g - w).mean() < 2e-3 * scale


def _qd(w, stacked=False):
    q, s = quantize_weight(jnp.asarray(w), axis=-1)
    return {"q": q, "s": s, "a8": jnp.zeros(q.shape[:-2] if q.ndim > 2 else ())}


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


@pytest.fixture(scope="module")
def layer(rng):
    """One W8A8 decoder layer at tiny-but-tileable geometry."""
    d, f, lk = 256, 384, 32
    mk = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.05)
    p = {
        "norm1_w": mk(d) + 1, "norm1_b": mk(d),
        "norm2_w": mk(d) + 1, "norm2_b": mk(d),
        "norm3_w": mk(d) + 1, "norm3_b": mk(d),
        "sa_in_w": _qd(rng.standard_normal((3, d, d)) * 0.05),
        "sa_in_b": mk(3, d),
        "sa_out_w": _qd(rng.standard_normal((d, d)) * 0.05),
        "sa_out_b": mk(d),
        "ca_in_w": _qd(rng.standard_normal((3, d, d)) * 0.05),
        "ca_in_b": mk(3, d),
        "ca_out_w": _qd(rng.standard_normal((d, d)) * 0.05),
        "ca_out_b": mk(d),
        "WV": _qd(rng.standard_normal((2 * f, d)) * 0.05),
        "lin2_w": _qd(rng.standard_normal((d, f)) * 0.05),
        "lin2_b": mk(d),
    }
    x = jnp.asarray(rng.standard_normal((2, 96, d)).astype(np.float32),
                    jnp.bfloat16)
    memory = jnp.asarray(rng.standard_normal((2, lk, d)).astype(np.float32),
                         jnp.bfloat16)
    return p, x, memory


def test_fused_linear_ln_bitwise(layer):
    from mars5_tts_tpu.ops.pallas.nar_fused import fused_linear

    p, x, _ = layer
    got = fused_linear(x, p["sa_in_w"], ln=(p["norm1_w"], p["norm1_b"]),
                       bias=p["sa_in_b"], eps=LAYERNORM_EPS, bm=64,
                       interpret=True)
    h = layer_norm(x, p["norm1_w"], p["norm1_b"], LAYERNORM_EPS)
    want = linear_any(h, p["sa_in_w"], p["sa_in_b"])  # (B, L, 3, D)
    want = want.reshape(want.shape[0], want.shape[1], -1)
    _assert_fused_eq(got, want)


def test_fused_linear_residual_bitwise(layer):
    from mars5_tts_tpu.ops.pallas.nar_fused import fused_linear

    p, x, _ = layer
    a = (x * jnp.bfloat16(0.5))[..., :256]
    got = fused_linear(a, p["sa_out_w"], bias=p["sa_out_b"], residual=x,
                       bm=64, interpret=True)
    want = x + linear_any(a, p["sa_out_w"], p["sa_out_b"])
    _assert_fused_eq(got, want)


def test_fused_linear_crossq_bitwise(layer):
    from mars5_tts_tpu.ops.pallas.nar_fused import fused_linear

    p, x, _ = layer
    got = fused_linear(x, slice_rows(p["ca_in_w"], slice(0, 1)),
                       ln=(p["norm2_w"], p["norm2_b"]), bias=p["ca_in_b"][:1],
                       eps=LAYERNORM_EPS, bm=64, interpret=True)
    h = layer_norm(x, p["norm2_w"], p["norm2_b"], LAYERNORM_EPS)
    want = linear_any(h, slice_rows(p["ca_in_w"], 0), p["ca_in_b"][0])
    _assert_fused_eq(got, want)


def test_fused_ffn_bitwise(layer):
    from mars5_tts_tpu.models.layers import swiglu_ff
    from mars5_tts_tpu.ops.pallas.nar_fused import fused_ffn

    p, x, _ = layer
    got = fused_ffn(x, p["norm3_w"], p["norm3_b"], p["WV"], p["lin2_w"],
                    p["lin2_b"], eps=LAYERNORM_EPS, bm=64, interpret=True)
    h = layer_norm(x, p["norm3_w"], p["norm3_b"], LAYERNORM_EPS)
    want = x + swiglu_ff(p, h)
    # two chained quant-GEMMs + silu: borderline roundings compound, so the
    # exactly-equal fraction is lower than at the single-GEMM sites
    _assert_fused_eq(got, want, exact_frac=0.4)


@pytest.mark.parametrize("groups", [2, 4])
def test_grouped_matches_emulation(layer, groups):
    from mars5_tts_tpu.ops.pallas.nar_fused import (fused_ffn, fused_ffn_ref,
                                                    fused_linear,
                                                    fused_linear_ref)

    p, x, _ = layer
    got = fused_linear(x, p["sa_in_w"], ln=(p["norm1_w"], p["norm1_b"]),
                       bias=p["sa_in_b"], eps=LAYERNORM_EPS, groups=groups,
                       bm=64, interpret=True)
    want = fused_linear_ref(x, p["sa_in_w"], ln=(p["norm1_w"], p["norm1_b"]),
                            bias=p["sa_in_b"], eps=LAYERNORM_EPS, groups=groups)
    _assert_fused_eq(got, want)

    got = fused_ffn(x, p["norm3_w"], p["norm3_b"], p["WV"], p["lin2_w"],
                    p["lin2_b"], eps=LAYERNORM_EPS, groups=groups, bm=64,
                    interpret=True)
    want = fused_ffn_ref(x, p["norm3_w"], p["norm3_b"], p["WV"], p["lin2_w"],
                         p["lin2_b"], eps=LAYERNORM_EPS, groups=groups)
    _assert_fused_eq(got, want, exact_frac=0.4)


def test_grouped_quant_tighter_than_per_row(layer):
    """Per-K-group act scales should not be less accurate than per-row."""
    from mars5_tts_tpu.ops.pallas.nar_fused import fused_linear, fused_linear_ref

    p, x, _ = layer
    h = layer_norm(x, p["norm1_w"], p["norm1_b"], LAYERNORM_EPS)
    wq, ws = p["sa_in_w"]["q"].reshape(-1, 256), p["sa_in_w"]["s"].reshape(-1)
    exact = (h.astype(jnp.float32).reshape(-1, 256)
             @ (wq.astype(jnp.float32) * ws[:, None]).T)
    errs = {}
    for g in (1, 4):
        y = fused_linear(x, p["sa_in_w"], ln=(p["norm1_w"], p["norm1_b"]),
                         eps=LAYERNORM_EPS, groups=g, bm=64, interpret=True)
        y = np.asarray(y, np.float32).reshape(-1, 3 * 256)
        errs[g] = np.abs(y - np.asarray(exact)).mean()
    assert errs[4] <= errs[1] * 1.05


def _gd(w, gsize):
    """Grouped-weight quant dict (per-(channel, K-group) scales)."""
    from mars5_tts_tpu.ops.quant import quantize_weight_grouped
    q, sg = quantize_weight_grouped(jnp.asarray(w), gsize)
    return {"q": q, "sg": sg,
            "a8": jnp.zeros(q.shape[:-2] if q.ndim > 2 else ())}


def test_wgrouped_matches_emulation(layer, rng):
    """Grouped WEIGHT scales (sg dicts): interpret kernel == jnp emulation."""
    from mars5_tts_tpu.ops.pallas.nar_fused import (fused_ffn, fused_ffn_ref,
                                                    fused_linear,
                                                    fused_linear_ref)

    p, x, _ = layer
    d, f, gsize = 256, 384, 64
    sa_in = _gd(rng.standard_normal((3, d, d)) * 0.05, gsize)
    wv = _gd(rng.standard_normal((2 * f, d)) * 0.05, gsize)
    lin2 = _gd(rng.standard_normal((d, f)) * 0.05, gsize)
    g, g2 = d // gsize, f // gsize
    got = fused_linear(x, sa_in, ln=(p["norm1_w"], p["norm1_b"]),
                       bias=p["sa_in_b"], eps=LAYERNORM_EPS, groups=g,
                       bm=64, interpret=True)
    want = fused_linear_ref(x, sa_in, ln=(p["norm1_w"], p["norm1_b"]),
                            bias=p["sa_in_b"], eps=LAYERNORM_EPS, groups=g)
    _assert_fused_eq(got, want)

    got = fused_ffn(x, p["norm3_w"], p["norm3_b"], wv, lin2,
                    p["lin2_b"], eps=LAYERNORM_EPS, groups=g, groups2=g2,
                    bm=64, interpret=True)
    want = fused_ffn_ref(x, p["norm3_w"], p["norm3_b"], wv, lin2,
                         p["lin2_b"], eps=LAYERNORM_EPS, groups=g, groups2=g2)
    _assert_fused_eq(got, want, exact_frac=0.4)


def test_wgrouped_xla_fallback_matches_kernel(layer, rng):
    """linear_any on an sg dict (XLA grouped fallback) == the fused kernel."""
    from mars5_tts_tpu.ops.pallas.nar_fused import fused_linear

    p, x, _ = layer
    d, gsize = 256, 64
    w = _gd(rng.standard_normal((d, d)) * 0.05, gsize)
    got = fused_linear(x, w, groups=d // gsize, bm=64, interpret=True)
    want = linear_any(x, w)
    _assert_fused_eq(got, want, exact_frac=0.4)

    # stacked (3, D, D) grouped kernel through the fallback (sg (3, G, D)):
    # per-third results must equal the flat per-third fallback
    w3 = _gd(rng.standard_normal((3, d, d)) * 0.05, gsize)
    y3 = linear_any(x, w3)                          # (B, L, 3, D)
    assert y3.shape == x.shape[:2] + (3, d)
    for i in range(3):
        flat = {"q": w3["q"][i], "sg": w3["sg"][i], "a8": jnp.zeros(())}
        np.testing.assert_array_equal(np.asarray(y3[..., i, :]),
                                      np.asarray(linear_any(x, flat)))


def test_wgrouped_tighter_than_per_row(layer, rng):
    """Grouped weight+act scales beat per-row accuracy vs the fp32 product."""
    from mars5_tts_tpu.ops.pallas.nar_fused import fused_linear

    p, x, _ = layer
    d, gsize = 256, 32
    wf = rng.standard_normal((d, d)).astype(np.float32) * 0.05
    exact = np.asarray(x.astype(jnp.float32).reshape(-1, d)) @ wf.T
    y_row = fused_linear(x, _qd(wf), bm=64, interpret=True)
    y_grp = fused_linear(x, _gd(wf, gsize), groups=d // gsize, bm=64,
                         interpret=True)
    e_row = np.abs(np.asarray(y_row, np.float32).reshape(-1, d) - exact).mean()
    e_grp = np.abs(np.asarray(y_grp, np.float32).reshape(-1, d) - exact).mean()
    assert e_grp < e_row


@pytest.mark.slow
def test_quantize_nar_grouped_keys():
    """quantize_nar(w_gsize) groups exactly the fused-site keys; the decoder
    layer then runs through the fused path (interpret) and stays close to the
    per-row quantized layer."""
    from mars5_tts_tpu.ops.quant import quantize_nar

    rng = np.random.default_rng(3)
    d, f, lk, L = 256, 384, 32, 2
    mk = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.05)
    layers = {
        "norm1_w": mk(L, d) + 1, "norm1_b": mk(L, d),
        "norm2_w": mk(L, d) + 1, "norm2_b": mk(L, d),
        "norm3_w": mk(L, d) + 1, "norm3_b": mk(L, d),
        "sa_in_w": mk(L, 3, d, d), "sa_in_b": mk(L, 3, d),
        "sa_out_w": mk(L, d, d), "sa_out_b": mk(L, d),
        "ca_in_w": mk(L, 3, d, d), "ca_in_b": mk(L, 3, d),
        "ca_out_w": mk(L, d, d), "ca_out_b": mk(L, d),
        "WV": mk(L, 2 * f, d), "lin2_w": mk(L, d, f), "lin2_b": mk(L, d),
    }
    params = {"encoder": {"layers": {}},
              "decoder": {"layers": layers},
              "residual_decoder": {"lin_w": mk(8, 16, d)}}
    qp = quantize_nar(params, w_gsize=64,
                      w_group_keys=("sa_in_w", "WV", "lin2_w"))
    dl = qp["decoder"]["layers"]
    assert "sg" in dl["sa_in_w"] and "s" not in dl["sa_in_w"]
    assert dl["sa_in_w"]["sg"].shape == (L, 3, d // 64, d)
    assert "sg" in dl["WV"] and dl["WV"]["sg"].shape == (L, d // 64, 2 * f)
    assert "sg" in dl["lin2_w"] and dl["lin2_w"]["sg"].shape == (L, f // 64, d)
    for k in ("sa_out_w", "ca_in_w", "ca_out_w"):
        assert "s" in dl[k] and "sg" not in dl[k]

    import os
    from mars5_tts_tpu.ops.quant import index_quant
    lp = {k: (index_quant(v, 0) if isinstance(v, dict) else v[0])
          for k, v in dl.items()}
    lp_row = {k: (index_quant(v, 0) if isinstance(v, dict) else v[0])
              for k, v in quantize_nar(params)["decoder"]["layers"].items()}
    x = jnp.asarray(rng.standard_normal((1, 64, d)).astype(np.float32),
                    jnp.bfloat16)
    memory = jnp.asarray(rng.standard_normal((1, lk, d)).astype(np.float32),
                         jnp.bfloat16)
    os.environ["MARS5_NARF_GSIZE"] = "64"
    try:
        got = decoder_layer_fused(lp, x, memory, nhead=4, interpret=True)
    finally:
        del os.environ["MARS5_NARF_GSIZE"]
    want = decoder_layer_fused(lp_row, x, memory, nhead=4, interpret=True)
    g, w = np.asarray(got, np.float32), np.asarray(want, np.float32)
    cos = (g * w).sum() / (np.linalg.norm(g) * np.linalg.norm(w))
    assert cos > 0.999  # same layer, finer quant grid


def test_decoder_layer_fused_matches_unfused(layer):
    """Whole layer: fused == unfused up to the attention softmax impl (the
    Pallas flash kernel's exp2/deferred-normalization vs XLA softmax)."""
    p, x, memory = layer
    kpm = jnp.zeros((2, 96), bool)
    mpm = jnp.zeros((2, 32), bool)
    want = decoder_layer(p, x, memory, nhead=4, tgt_key_padding_mask=kpm,
                         memory_key_padding_mask=mpm)
    got = decoder_layer_fused(p, x, memory, nhead=4, tgt_key_padding_mask=kpm,
                              memory_key_padding_mask=mpm, interpret=True)
    w = np.asarray(want, np.float32)
    g = np.asarray(got, np.float32)
    np.testing.assert_allclose(g, w, atol=0.02 * np.abs(w).max(), rtol=0)
    assert np.abs(g - w).mean() < 2e-3 * np.abs(w).max()
    cos = (g * w).sum() / (np.linalg.norm(g) * np.linalg.norm(w))
    assert cos > 0.9999


@pytest.mark.slow
def test_engine_fused_interpret_and_grouped(monkeypatch):
    """The REAL diffusion engine through the fused decoder-layer kernels
    (MARS5_NAR_FUSED_INTERPRET=1 on CPU): per-row and grouped (sg) quant both
    produce valid grids tracking the unfused W8A8 run, and the fused run is
    deterministic."""
    from mars5_tts_tpu.config import DSH
    from mars5_tts_tpu.diffusion import (MultinomialDiffusion,
                                         perform_simple_inference)
    from mars5_tts_tpu.models.layers import nar_w_group_keys
    from mars5_tts_tpu.models.nar import ResidualTransformerConfig, init_nar
    from mars5_tts_tpu.ops.quant import quantize_nar

    cfg = ResidualTransformerConfig.tiny(n_text_vocab=32)
    p = init_nar(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    pq = quantize_nar(p)
    pg = quantize_nar(p, w_gsize=32, w_group_keys=nar_w_group_keys())
    rng = np.random.default_rng(0)
    bs, Lt, Lc, Lx, T = 1, 7, 11, 16, 8
    batch = (rng.integers(0, 32, (bs, Lt)), rng.integers(0, 1024, (bs, Lc, 8)),
             np.asarray([Lt]), np.asarray([Lc]),
             rng.integers(0, 1024, (bs, Lx, 8)), np.zeros((bs, Lx), bool))
    diff = MultinomialDiffusion(1025, timesteps=T)
    dsh = DSH(last_greedy=True, x_0_temp=0.7, guidance_w=3.0, jump_len=1,
              jump_n_sample=1, q0_override_steps=2)
    key = jax.random.key(0, impl="rbg")

    # env knobs are read at TRACE time: clear the jit caches between toggles,
    # otherwise the second call silently reuses the first graph and the
    # comparison is vacuous
    from mars5_tts_tpu.diffusion.engine import (_diffusion_scan,
                                                _diffusion_scan_serving)

    def _clear():
        _diffusion_scan.clear_cache()
        _diffusion_scan_serving.clear_cache()

    monkeypatch.setenv("MARS5_NAR_FUSED", "0")
    _clear()
    g_unfused = np.asarray(perform_simple_inference(pq, cfg, batch, diff, T,
                                                    dsh, key=key))
    monkeypatch.setenv("MARS5_NAR_FUSED", "1")
    monkeypatch.setenv("MARS5_NAR_FUSED_INTERPRET", "1")
    _clear()
    g_fused = np.asarray(perform_simple_inference(pq, cfg, batch, diff, T,
                                                  dsh, key=key))
    g_fused2 = np.asarray(perform_simple_inference(pq, cfg, batch, diff, T,
                                                   dsh, key=key))
    np.testing.assert_array_equal(g_fused, g_fused2)   # deterministic
    assert (g_fused[..., 0] == g_unfused[..., 0]).all()  # L0 pinned
    # same int8 math up to the attention softmax impl: high-but-not-exact
    agree = (g_fused == g_unfused).mean()
    assert agree > 0.5, f"fused-vs-unfused grid agreement {agree:.2f}"

    monkeypatch.setenv("MARS5_NARF_GSIZE", "32")
    _clear()
    g_grouped = np.asarray(perform_simple_inference(pg, cfg, batch, diff, T,
                                                    dsh, key=key))
    assert g_grouped.shape == g_fused.shape
    assert (g_grouped[..., 0] == g_unfused[..., 0]).all()
    agree_g = (g_grouped == g_fused).mean()
    assert agree_g > 0.5, f"grouped-vs-per-row agreement {agree_g:.2f}"
    _clear()  # don't leak interpret traces to other tests


@pytest.mark.heavy
def test_decoder_stack_q_tail_start(monkeypatch):
    """Final-layer query slicing (deep-clone prompt rows dropped inside the
    stack) matches the full stack sliced afterwards: the integer-GEMM fused
    sites are exact under the shape change; the bf16/f32 XLA ops may re-fuse
    (FMA reassociation — the documented XLA-CPU bitwise lesson), so the
    comparison allows ulp-level drift only."""
    from mars5_tts_tpu.models.layers import decoder_stack
    from mars5_tts_tpu.models.nar import ResidualTransformerConfig, init_nar
    from mars5_tts_tpu.ops.quant import quantize_nar

    cfg = ResidualTransformerConfig.tiny(n_text_vocab=32)
    p = quantize_nar(init_nar(jax.random.PRNGKey(3), cfg, dtype=jnp.float32))
    dec = p["decoder"]
    rng_ = np.random.default_rng(5)
    b, L, lc, s = 2, 24, 9, 10
    d = dec["norm_w"].shape[-1]
    x = jnp.asarray(rng_.standard_normal((b, L, d)).astype(np.float32))
    memory = jnp.asarray(rng_.standard_normal((b, lc, d)).astype(np.float32))
    kpm = jnp.zeros((b, L), bool).at[1, -3:].set(True)
    mpm = jnp.zeros((b, lc), bool).at[0, -2:].set(True)

    def both():
        full = decoder_stack(dec, x, memory, nhead=cfg.nhead,
                             tgt_key_padding_mask=kpm,
                             memory_key_padding_mask=mpm)
        tail = decoder_stack(dec, x, memory, nhead=cfg.nhead,
                             tgt_key_padding_mask=kpm,
                             memory_key_padding_mask=mpm, q_tail_start=s)
        assert tail.shape == (b, L - s, d)
        return np.asarray(full[:, s:]), np.asarray(tail)

    monkeypatch.setenv("MARS5_NAR_FUSED_INTERPRET", "1")
    w, g = both()
    scale = np.abs(w).max()
    np.testing.assert_allclose(g, w, atol=1e-5 * scale, rtol=0)
    assert (g == w).mean() > 0.9  # ulp drift touches only a few percent

    # XLA fallback path: slicing happens after the stack -> bitwise equal
    monkeypatch.setenv("MARS5_NAR_FUSED_INTERPRET", "0")
    monkeypatch.setenv("MARS5_NAR_FUSED", "0")
    w, g = both()
    np.testing.assert_array_equal(w, g)
