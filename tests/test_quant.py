"""Weight-only int8 quantization: accuracy + engine integration."""

import numpy as np

import jax
import jax.numpy as jnp


def test_quantize_roundtrip_error():
    from mars5_tts_tpu.ops.quant import linear_q8, quantize_weight

    rng = np.random.default_rng(0)
    w = rng.standard_normal((64, 48)).astype(np.float32) * 0.1
    q, s = quantize_weight(jnp.asarray(w))
    deq = np.asarray(q, np.float32) * np.asarray(s)[:, None]
    rel = np.abs(deq - w).max() / np.abs(w).max()
    assert rel < 0.01  # per-channel int8: <1% of the channel max

    x = rng.standard_normal((2, 48)).astype(np.float32)
    y_ref = x @ w.T
    y_q8 = np.asarray(linear_q8(jnp.asarray(x), q, s))
    assert np.abs(y_q8 - y_ref).max() / np.abs(y_ref).max() < 0.02


def test_quantized_codeclm_forward_close():
    from mars5_tts_tpu.models.ar import CodecLMConfig, codeclm_forward, init_codeclm
    from mars5_tts_tpu.ops.quant import quantize_codeclm

    cfg = CodecLMConfig.tiny(n_vocab=64)
    params = init_codeclm(jax.random.PRNGKey(0), cfg)
    qparams = quantize_codeclm(params)

    rng = np.random.default_rng(1)
    tokens = jnp.asarray(rng.integers(0, 64, (1, 10)))
    spk = jnp.asarray(rng.integers(0, 1024, (1, 5, 8)))
    full = np.asarray(codeclm_forward(params, cfg, tokens, spk_codes=spk))
    quant = np.asarray(codeclm_forward(qparams, cfg, tokens, spk_codes=spk))
    # logits track closely; argmax is stable
    cos = (full * quant).sum() / (np.linalg.norm(full) * np.linalg.norm(quant))
    assert cos > 0.999
    assert (full.argmax(-1) == quant.argmax(-1)).mean() > 0.9


def test_quantized_decode_runs():
    from mars5_tts_tpu.models.ar import CodecLMConfig, init_codeclm
    from mars5_tts_tpu.models.ar_decode import ArSampling, ar_generate
    from mars5_tts_tpu.ops.quant import quantize_codeclm

    cfg = CodecLMConfig.tiny(n_vocab=50)
    params = quantize_codeclm(init_codeclm(jax.random.PRNGKey(0), cfg))
    s = ArSampling(top_k=10, top_p=0.9, n_phones_gen=8, eos_idx=49,
                   valid_start=20, valid_end=51, max_len=32)
    out, n_gen = ar_generate(params, cfg, np.arange(8) % 20,
                             np.full((4, 8), 3), sampling=s, seed=0)
    assert len(out) >= 8 and (out[:8] == np.arange(8) % 20).all()


# ---------------------------------------------------------------------------
# int8 QUALITY GATES: quantized paths must track bf16/fp32 closely enough that
# the README quality-mode table can quote their RTFs with evidence.

def test_w8a8_linear_error_bound():
    from mars5_tts_tpu.ops.quant import linear_w8a8, quantize_weight

    rng = np.random.default_rng(0)
    w = rng.standard_normal((256, 192)).astype(np.float32) * 0.05
    x = rng.standard_normal((16, 192)).astype(np.float32)
    q, s = quantize_weight(jnp.asarray(w))
    y_ref = x @ w.T
    y = np.asarray(linear_w8a8(jnp.asarray(x), q, s))
    rel = np.abs(y - y_ref).max() / np.abs(y_ref).max()
    assert rel < 0.03  # W8A8 per-token: ~1-2% typical, 3% bound


def test_quantized_nar_grid_divergence():
    """NAR W8A8: full 20-step diffusion grids vs fp32 — bounded divergence."""
    from mars5_tts_tpu.config import DSH
    from mars5_tts_tpu.diffusion import (MultinomialDiffusion,
                                         perform_simple_inference)
    from mars5_tts_tpu.models.nar import ResidualTransformerConfig, init_nar
    from mars5_tts_tpu.ops.quant import quantize_nar

    cfg = ResidualTransformerConfig.tiny(n_text_vocab=32)
    p = init_nar(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    pq = quantize_nar(p)
    rng = np.random.default_rng(0)
    bs, Lt, Lc, Lx, T = 1, 7, 11, 16, 20
    batch = (rng.integers(0, 32, (bs, Lt)), rng.integers(0, 1024, (bs, Lc, 8)),
             np.asarray([Lt]), np.asarray([Lc]),
             rng.integers(0, 1024, (bs, Lx, 8)), np.zeros((bs, Lx), bool))
    diff = MultinomialDiffusion(1025, timesteps=T)
    dsh = DSH(last_greedy=True, x_0_temp=0.7, guidance_w=3.0, jump_len=1,
              jump_n_sample=1, q0_override_steps=2)
    key = jax.random.key(0, impl="rbg")
    g0 = np.asarray(perform_simple_inference(p, cfg, batch, diff, T, dsh, key=key))
    g1 = np.asarray(perform_simple_inference(pq, cfg, batch, diff, T, dsh, key=key))
    agree = (g0 == g1).mean()
    # same uniforms + near-identical logits: grids mostly agree even on random
    # weights (whose near-uniform posteriors are the worst case for this test)
    assert agree > 0.5, f"int8 NAR grid agreement {agree:.2f}"
    assert (g0[..., 0] == g1[..., 0]).all()  # L0 lane pinned to AR codes in both


def test_fused_ar_token_divergence():
    """Fused W8A8 AR decode vs bf16 XLA engine: shared uniforms, bounded drift."""
    from mars5_tts_tpu.models.ar import CodecLMConfig, init_codeclm
    from mars5_tts_tpu.models.ar_decode import ArSampling, ar_generate
    from mars5_tts_tpu.models.ar_decode_fused import (ar_generate_fused,
                                                      prepare_fused)

    cfg = CodecLMConfig(n_vocab=512, dim=256, n_heads=4, n_kv_heads=4,
                        head_dim=64, n_layers=3, hidden_dim=512,
                        sliding_window=64, n_spk_layers=2, spk_hidden_dim=256)
    params = init_codeclm(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    fp, dims = prepare_fused(params, cfg, max_len=48)
    s = ArSampling(temperature=0.7, top_k=50, top_p=0.2, n_phones_gen=100,
                   eos_idx=0, valid_start=10, valid_end=510, max_len=48)
    prompt = np.arange(12, 24)
    spk = np.random.default_rng(0).integers(0, 1024, (20, 8))
    u = np.random.default_rng(1).random((48, 1))
    t_bf16, _ = ar_generate(params, cfg, prompt, spk, sampling=s, uniforms=u)
    t_fused, _ = ar_generate_fused(params, fp, cfg, dims, prompt, spk,
                                   sampling=s, uniforms=u, interpret=None)
    n = min(len(t_bf16), len(t_fused))
    agree = (t_bf16[:n] == t_fused[:n]).mean()
    # top_p=0.2 concentrates mass; with shared uniforms the quantized path
    # should track the bf16 trajectory closely on the first decode steps
    assert (t_bf16[:len(prompt) + 5] == t_fused[:len(prompt) + 5]).all(), (
        t_bf16[:20], t_fused[:20])
    assert agree > 0.5, f"fused int8 AR agreement {agree:.2f}"
