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
