"""Weight-only int8 quantization: accuracy + engine integration."""

import pytest
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


@pytest.mark.heavy
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


@pytest.mark.slow
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


def test_quantize_nar_idempotent():
    """Double-quantize regression (round 4): bench.build() quantizes the NAR
    by default, and serving scripts layered quantize_nar on top — the second
    call must pass already-quantized leaves through unchanged (same mode) and
    fail loudly on a mode change (int8 leaves can't be re-grouped)."""
    from mars5_tts_tpu.models.layers import nar_w_group_keys
    from mars5_tts_tpu.models.nar import ResidualTransformerConfig, init_nar
    from mars5_tts_tpu.ops.quant import quantize_nar

    cfg = ResidualTransformerConfig.tiny(n_text_vocab=32)
    p = init_nar(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    pq = quantize_nar(p)
    pq2 = quantize_nar(pq)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b), pq, pq2)

    with pytest.raises(ValueError, match="already quantized"):
        quantize_nar(pq, w_gsize=2, w_group_keys=nar_w_group_keys())
    with pytest.raises(ValueError, match="already quantized"):
        quantize_nar(pq, act_int8=False)


@pytest.mark.slow
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
    # The first generated token is sampled from the shared bf16 prefill logits:
    # any mismatch there is a structural bug, not quantization noise.
    assert (t_bf16[:len(prompt) + 1] == t_fused[:len(prompt) + 1]).all(), (
        t_bf16[:20], t_fused[:20])
    # After that, int8 weight + int8-KV-cache noise compounds: on RANDOM tiny
    # weights the posteriors are near-uniform (the worst case — any logit
    # perturbation can flip a draw), so token trajectories legitimately split
    # within a few steps and later tokens agree only by chance. Token-level
    # drift beyond step 1 is characterized by `agree` (not asserted); the
    # per-step fidelity gates live in test_fused_step_logit_error (both
    # wbits, tight budgets).
    del agree


@pytest.mark.parametrize("wbits,budget", [pytest.param(8, 0.02, marks=pytest.mark.slow), pytest.param(4, 0.05, marks=pytest.mark.heavy)])
def test_fused_step_logit_error(wbits, budget):
    """Direct one-step fidelity: fused int8/int4(+KV8) logits vs bf16 engine.

    Runs a single decode step from identical prefill state (no compounding):
    the quantized pipeline's logit perturbation must stay small relative to
    the logit scale — this, not token drift on random weights, is the
    meaningful per-step quality gate for BOTH serving wbits (the primary
    replacement for the chance-level token-agreement smoke; measured values
    at this geometry: 0.0085 int8, ~0.03 int4 (MSE-clip pack; the amax pack
    measures the same within noise on Gaussian weights) — budgets carry
    comfortable margin).
    """
    from mars5_tts_tpu.models.ar import CodecLMConfig, init_codeclm, codeclm_prefill, spk_embedding
    from mars5_tts_tpu.models.ar_decode import ArSampling, ar_generate
    from mars5_tts_tpu.models.ar_decode_fused import (_fused_backbone_step,
                                                      prepare_fused)
    from mars5_tts_tpu.models.ar_decode import _decode_backbone_step
    from mars5_tts_tpu.ops.pallas.decode_layer import quantize_kv_rows

    cfg = CodecLMConfig(n_vocab=512, dim=256, n_heads=4, n_kv_heads=4,
                        head_dim=64, n_layers=3, hidden_dim=512,
                        sliding_window=64, n_spk_layers=2, spk_hidden_dim=256)
    params = init_codeclm(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    fp, dims = prepare_fused(params, cfg, max_len=48, wbits=wbits)

    prompt = jnp.asarray(np.arange(12, 24), jnp.int32)[None]
    spk = jnp.asarray(np.random.default_rng(0).integers(0, 1024, (20, 8)))[None]
    spk_vec = spk_embedding(params, cfg, spk)
    all_logits, (k_full, v_full) = codeclm_prefill(params, cfg, prompt, spk_vec)
    pb = prompt.shape[1]
    d = dims.dim

    # bf16 engine one step
    tok = jnp.asarray([100], jnp.int32)
    ck5 = jnp.zeros((dims.n_layers, 1, dims.window, cfg.n_heads, cfg.head_dim),
                    jnp.bfloat16).at[:, :, : pb + 1].set(k_full.astype(jnp.bfloat16))
    cv5 = jnp.zeros_like(ck5).at[:, :, : pb + 1].set(v_full.astype(jnp.bfloat16))
    logits_ref, _, _ = _decode_backbone_step(params, cfg, tok,
                                             jnp.asarray([pb], jnp.int32), ck5, cv5)

    # fused engine one step from the same prefill state
    k_flat = k_full[:, 0].reshape(dims.n_layers, pb + 1, d)
    v_flat = v_full[:, 0].reshape(dims.n_layers, pb + 1, d)
    k8, ks = quantize_kv_rows(k_flat)
    v8, vs = quantize_kv_rows(v_flat)
    cache_k = jnp.zeros((dims.n_layers, dims.w_pad, d), jnp.int8).at[:, : pb + 1].set(k8)
    cache_v = jnp.zeros((dims.n_layers, dims.w_pad, d), jnp.int8).at[:, : pb + 1].set(v8)
    kvs = jnp.zeros((dims.n_layers, 2, dims.w_pad), jnp.float32)
    kvs = kvs.at[:, 0, : pb + 1].set(ks).at[:, 1, : pb + 1].set(vs)
    logits_fused, _, _, _ = _fused_backbone_step(
        fp, dims, cfg, tok, jnp.int32(pb), cache_k, cache_v, kvs, None)

    lr = np.asarray(logits_ref, np.float32).ravel()
    lf = np.asarray(logits_fused, np.float32).ravel()
    scale = np.abs(lr).max()
    rel = np.abs(lr - lf).max() / scale
    assert rel < budget, (
        f"fused step relative logit error {rel:.4f} (wbits={wbits})")


def test_int4_mse_scales_beat_amax():
    """quantize_weight_mse at 4 bits strictly reduces round-trip MSE vs amax
    (at int8 amax is already near-optimal; the gain is the int4 pack's)."""
    import numpy as np
    import jax.numpy as jnp
    from mars5_tts_tpu.ops.quant import quantize_weight, quantize_weight_mse

    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((4, 96, 256)) * 0.04, jnp.float32)
    qa, sa = quantize_weight(w, axis=-1, levels=7)
    qm, sm = quantize_weight_mse(w, levels=7)
    e_amax = float(jnp.mean(jnp.square(qa * sa[..., None] - w)))
    e_mse = float(jnp.mean(jnp.square(qm * sm[..., None] - w)))
    assert e_mse < 0.9 * e_amax, (e_mse, e_amax)
