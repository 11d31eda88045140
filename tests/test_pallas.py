"""Pallas decode-attention kernel vs the XLA path (interpreter mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.mark.parametrize("pos_val", [5, 60, 100])  # below, at, and past the window
def test_pallas_decode_attention_matches_xla(pos_val):
    from mars5_tts_tpu.models.ar_decode import _decode_attention
    from mars5_tts_tpu.ops.pallas import decode_attention_pallas

    bs, w, h, d = 2, 64, 4, 32
    rng = np.random.default_rng(0)
    q = rng.standard_normal((bs, h, d)).astype(np.float32)
    k = rng.standard_normal((bs, w, h, d)).astype(np.float32)
    v = rng.standard_normal((bs, w, h, d)).astype(np.float32)
    pos = np.array([pos_val, max(pos_val - 3, 0)], np.int32)

    ref = _decode_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                            jnp.asarray(pos), w)
    out = decode_attention_pallas(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                                  jnp.asarray(pos), interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_pallas_masks_unwritten_slots():
    """pos < W: slots beyond pos must not contribute (their slot_pos < 0)."""
    from mars5_tts_tpu.ops.pallas import decode_attention_pallas

    bs, w, h, d = 1, 32, 2, 16
    rng = np.random.default_rng(1)
    q = rng.standard_normal((bs, h, d)).astype(np.float32)
    k = rng.standard_normal((bs, w, h, d)).astype(np.float32)
    v = rng.standard_normal((bs, w, h, d)).astype(np.float32)
    pos = np.array([4], np.int32)

    out1 = decode_attention_pallas(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                                   jnp.asarray(pos), interpret=True)
    # poison the invalid slots; output must not change
    k2, v2 = k.copy(), v.copy()
    k2[:, 5:] = 1e3
    v2[:, 5:] = -1e3
    out2 = decode_attention_pallas(jnp.asarray(q), jnp.asarray(k2), jnp.asarray(v2),
                                   jnp.asarray(pos), interpret=True)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)


@pytest.mark.parametrize("l,masked", [(300, True), (256, False), (517, True)])
def test_pallas_mha_matches_xla(l, masked):
    from mars5_tts_tpu.ops.attention import sdpa
    from mars5_tts_tpu.ops.pallas.mha import sdpa_pallas

    b, h, d = 2, 4, 32
    rng = np.random.default_rng(l)
    q = rng.standard_normal((b, l, h, d)).astype(np.float32)
    k = rng.standard_normal((b, l, h, d)).astype(np.float32)
    v = rng.standard_normal((b, l, h, d)).astype(np.float32)
    mask = np.zeros((b, l), bool)
    if masked:
        mask[1, l - 40:] = True

    ref = sdpa(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
               ~jnp.asarray(mask)[:, None, None, :])
    out = sdpa_pallas(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                      jnp.asarray(mask), interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("pos_val", [5, 63, 100])
def test_pallas_decode_attention_self_column(pos_val):
    """Self-column mode (cache excludes current token) matches the XLA path."""
    from mars5_tts_tpu.models.ar_decode import _decode_attention
    from mars5_tts_tpu.ops.pallas import decode_attention_pallas

    bs, w, h, d = 2, 64, 4, 32
    rng = np.random.default_rng(pos_val)
    q = rng.standard_normal((bs, h, d)).astype(np.float32)
    k = rng.standard_normal((bs, w, h, d)).astype(np.float32)
    v = rng.standard_normal((bs, w, h, d)).astype(np.float32)
    kn = rng.standard_normal((bs, h, d)).astype(np.float32)
    vn = rng.standard_normal((bs, h, d)).astype(np.float32)
    pos = np.array([pos_val, max(pos_val - 3, 0)], np.int32)

    ref = _decode_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                            jnp.asarray(pos), w, k_new=jnp.asarray(kn),
                            v_new=jnp.asarray(vn))
    out = decode_attention_pallas(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                                  jnp.asarray(pos), k_new=jnp.asarray(kn),
                                  v_new=jnp.asarray(vn), interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("l,masked", [(300, True), (517, False)])
def test_pallas_mha_quantized_close_to_fp(l, masked):
    """int8 QK/PV attention: bounded error vs the fp path + exact jnp mirror."""
    import jax
    from mars5_tts_tpu.ops.attention import sdpa
    from mars5_tts_tpu.ops.pallas.mha import sdpa_pallas

    b, h, d = 2, 4, 32
    rng = np.random.default_rng(l + 1)
    q = rng.standard_normal((b, l, h, d)).astype(np.float32)
    k = rng.standard_normal((b, l, h, d)).astype(np.float32)
    v = rng.standard_normal((b, l, h, d)).astype(np.float32)
    mask = np.zeros((b, l), bool)
    if masked:
        mask[1, l - 40:] = True

    ref = np.asarray(sdpa(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                          ~jnp.asarray(mask)[:, None, None, :]))
    out = np.asarray(sdpa_pallas(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                                 jnp.asarray(mask), interpret=True,
                                 quantized=True))
    # int8 scores + int8 probs/values: low-percent relative error. Random
    # normal q/k are the worst case (near-uniform probs -> the output is a
    # ~1/sqrt(L)-magnitude mean while quant noise scales with |v|); peaked
    # real-model attention sits well below this bound.
    err = np.abs(out - ref) / (np.abs(ref).max() + 1e-6)
    assert err.max() < 0.08, err.max()

    # exact mirror of the kernel's quantized math on one head
    def quant_rows(xf):
        s = np.maximum(np.abs(xf).max(1, keepdims=True), 1e-8) / 127.0
        return np.clip(np.round(xf / s), -127, 127).astype(np.int32), s

    bi, hi = 0, 1
    q8, qs = quant_rows(q[bi, :, hi])
    k8, ks = quant_rows(k[bi, :, hi])
    s = (q8 @ k8.T).astype(np.float32) * (qs / np.sqrt(d)) * ks.T
    if masked:
        s[:, mask[bi]] = -np.inf
    p = np.exp(s - s.max(1, keepdims=True))
    r = p.sum(1, keepdims=True)
    va = np.maximum(np.abs(v[bi, :, hi]).max(0, keepdims=True), 1e-8)
    vs = va / 127.0
    v8 = np.clip(np.round(v[bi, :, hi] / vs), -127, 127).astype(np.int32)
    p8 = np.round(p * 127.0).astype(np.int32)
    mine = (p8 @ v8).astype(np.float32) * (vs / 127.0) / r
    np.testing.assert_allclose(out[bi, :, hi], mine, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("quantized", [False, True])
def test_pallas_mha_cross_attention(quantized):
    """Lk != Lq (decoder cross-attention shape): kernel matches XLA sdpa."""
    from mars5_tts_tpu.ops.attention import sdpa
    from mars5_tts_tpu.ops.pallas.mha import sdpa_pallas

    b, lq, lk, h, d = 2, 300, 13, 4, 32
    rng = np.random.default_rng(5)
    q = rng.standard_normal((b, lq, h, d)).astype(np.float32)
    k = rng.standard_normal((b, lk, h, d)).astype(np.float32)
    v = rng.standard_normal((b, lk, h, d)).astype(np.float32)
    mask = np.zeros((b, lk), bool)
    mask[1, lk - 4:] = True

    ref = np.asarray(sdpa(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                          ~jnp.asarray(mask)[:, None, None, :]))
    out = np.asarray(sdpa_pallas(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                                 jnp.asarray(mask), interpret=True,
                                 quantized=quantized))
    if quantized:
        err = np.abs(out - ref) / (np.abs(ref).max() + 1e-6)
        assert err.max() < 0.08, err.max()
    else:
        np.testing.assert_allclose(out, ref, atol=2e-5)
