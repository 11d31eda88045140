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
