"""int4 output head (ops/pallas/head4.py): pack fidelity, kernel-vs-emulation,
and the fused decode integration (W4A8 head replaces the int8 XLA head when
wbits=4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mars5_tts_tpu.ops.pallas.head4 import (head4_logits,
                                            head4_logits_emulation, pack_head4)


def test_pack_roundtrip_fidelity():
    """Dequantized int4 head tracks the bf16 weight within the 4-bit budget."""
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((512, 256)) * 0.05, jnp.float32)
    wp, ws = pack_head4(w)
    from mars5_tts_tpu.ops.pallas.decode_layer import _unpack4

    low, high = _unpack4(wp)
    deq = jnp.concatenate([low.astype(jnp.float32) * ws[0][:, None],
                           high.astype(jnp.float32) * ws[1][:, None]], axis=1)
    err = deq[:512] - w
    rel_rms = float(jnp.sqrt(jnp.mean(err ** 2) / jnp.mean(w ** 2)))
    # MSE-clipped int4 Gaussian rows: ~10% RMS (the 4-bit information floor);
    # max error is dominated by the clipped tail by design, so RMS is the gate
    assert rel_rms < 0.12, rel_rms


def test_kernel_matches_emulation():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((8, 256)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((500, 256)) * 0.05, jnp.float32)
    wp, ws = pack_head4(w, bn=128)
    y_k = np.asarray(head4_logits(x, wp, ws, n_vocab=500, bn=128,
                                  interpret=True))
    y_e = np.asarray(head4_logits_emulation(x, wp, ws, n_vocab=500))
    assert y_k.shape == (8, 500)
    np.testing.assert_allclose(y_k, y_e, rtol=2e-6, atol=1e-6)


def test_head4_vs_fp_reference():
    """W4A8 head logits track the exact bf16 head within the combined
    int4-weight + int8-activation budget."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((8, 256)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((512, 256)) * 0.05, jnp.float32)
    wp, ws = pack_head4(w)
    y4 = np.asarray(head4_logits_emulation(x, wp, ws, n_vocab=512))
    yf = np.asarray(x.astype(jnp.float32) @ w.T)
    rel = np.abs(y4 - yf).max() / np.abs(yf).max()
    # ~11% on Gaussian weights: the head has no residual stream to dilute the
    # 4-bit noise, which is exactly why head4 is opt-in (MARS5_HEAD4=1), not
    # the production default. This test records the characterization.
    assert 0.02 < rel < 0.20, rel


@pytest.mark.heavy
def test_head4_opt_in(monkeypatch):
    """Default pack keeps the int8 head; MARS5_HEAD4=1 switches to int4."""
    from mars5_tts_tpu.models.ar import CodecLMConfig, init_codeclm
    from mars5_tts_tpu.models.ar_decode_fused import prepare_fused

    cfg = CodecLMConfig(n_vocab=512, dim=256, n_heads=4, n_kv_heads=4,
                        head_dim=64, n_layers=2, hidden_dim=512,
                        sliding_window=32, n_spk_layers=1, spk_hidden_dim=256)
    params = init_codeclm(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    fp4, _ = prepare_fused(params, cfg, max_len=24, wbits=4)
    assert "head_q" in fp4 and "head4_p" not in fp4    # default: int8 head
    monkeypatch.setenv("MARS5_HEAD4", "1")
    fp4i, _ = prepare_fused(params, cfg, max_len=24, wbits=4)
    assert "head4_p" in fp4i and "head_q" not in fp4i
    fp8, _ = prepare_fused(params, cfg, max_len=24, wbits=8)
    assert "head_q" in fp8 and "head4_p" not in fp8    # int8 backbone: never
