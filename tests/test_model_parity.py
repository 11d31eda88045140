"""Numerical parity of the JAX AR/NAR models vs the PyTorch reference (fp32, CPU).

Strategy: instantiate the reference modules at a tiny configuration with random
torch init, convert the state_dict through ``mars5_tts_tpu.models.convert``, run the
same inputs through both, and compare outputs to tight fp32 tolerances. This guards
every numerics contract at once: RoPE convention, banded mask, RMSNorm/LayerNorm eps,
SwiGLU residual order, speaker-encoder masking, timestep embeddings, and the
checkpoint name mapping itself.
"""

import numpy as np
import pytest

from tests.conftest import add_reference_to_path, reference_available

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")

ATOL = 2e-4


@pytest.fixture(scope="module")
def torch_mod():
    import torch
    torch.manual_seed(0)
    return torch


@pytest.fixture(scope="module")
def ref_mars5():
    add_reference_to_path()
    import mars5.model as ref_model
    return ref_model


def test_codeclm_forward_parity(torch_mod, ref_mars5):
    import jax.numpy as jnp
    from mars5_tts_tpu.models.ar import CodecLMConfig, codeclm_forward
    from mars5_tts_tpu.models.convert import convert_codeclm

    torch = torch_mod
    cfg = CodecLMConfig.tiny(n_vocab=64)
    ref = ref_mars5.CodecLM(n_vocab=64, dim=64, nhead=2, n_layers=2, n_spk_layers=2,
                            dim_ff_scale=1.5, sliding_window=64).eval()
    params = convert_codeclm(ref.state_dict(), cfg)

    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 64, size=(1, 12))
    spk_codes = rng.integers(0, 1024, size=(1, 9, 8))
    spk_codes[0, 7:, :] = 1024  # trailing pad

    with torch.inference_mode():
        t_out = ref(torch.tensor(tokens), spk_reference=torch.tensor(spk_codes))
    j_out = codeclm_forward(params, cfg, jnp.asarray(tokens), spk_codes=jnp.asarray(spk_codes))

    diff = np.abs(np.asarray(j_out) - t_out.numpy()).max()
    assert diff < ATOL, f"AR logits max diff {diff}"


def test_codeclm_forward_no_spk_parity(torch_mod, ref_mars5):
    import jax.numpy as jnp
    from mars5_tts_tpu.models.ar import CodecLMConfig, codeclm_forward
    from mars5_tts_tpu.models.convert import convert_codeclm

    torch = torch_mod
    cfg = CodecLMConfig.tiny(n_vocab=48)
    ref = ref_mars5.CodecLM(n_vocab=48, dim=64, nhead=2, n_layers=2, n_spk_layers=2,
                            dim_ff_scale=1.5, sliding_window=8).eval()
    cfg = CodecLMConfig.tiny(n_vocab=48).__class__(**{**cfg.__dict__, "n_vocab": 48,
                                                      "sliding_window": 8})
    params = convert_codeclm(ref.state_dict(), cfg)

    rng = np.random.default_rng(1)
    # length 20 > window 8 exercises the banded mask
    tokens = rng.integers(0, 48, size=(1, 20))
    with torch.inference_mode():
        t_out = ref(torch.tensor(tokens))
    j_out = codeclm_forward(params, cfg, jnp.asarray(tokens))
    diff = np.abs(np.asarray(j_out) - t_out.numpy()).max()
    assert diff < ATOL, f"AR (banded, no spk) logits max diff {diff}"


def test_spk_embedding_parity(torch_mod, ref_mars5):
    import jax.numpy as jnp
    from mars5_tts_tpu.models.ar import CodecLMConfig, spk_embedding
    from mars5_tts_tpu.models.convert import convert_codeclm

    torch = torch_mod
    cfg = CodecLMConfig.tiny(n_vocab=64)
    ref = ref_mars5.CodecLM(n_vocab=64, dim=64, nhead=2, n_layers=2, n_spk_layers=2,
                            dim_ff_scale=1.5, sliding_window=64).eval()
    params = convert_codeclm(ref.state_dict(), cfg)

    rng = np.random.default_rng(2)
    spk_codes = rng.integers(0, 1024, size=(1, 11, 8))
    spk_codes[0, 8:, :] = 1024

    t_out = ref.get_spk_embedding(torch.tensor(spk_codes))
    j_out = spk_embedding(params, cfg, jnp.asarray(spk_codes))
    diff = np.abs(np.asarray(j_out) - t_out.numpy()).max()
    assert diff < ATOL, f"speaker embedding max diff {diff}"


def _nar_pair(torch, ref_mars5, n_text_vocab=32):
    from mars5_tts_tpu.models.convert import convert_nar
    from mars5_tts_tpu.models.nar import ResidualTransformerConfig

    cfg = ResidualTransformerConfig.tiny(n_text_vocab=n_text_vocab)
    ref = ref_mars5.ResidualTransformer(
        n_text_vocab=n_text_vocab, n_quant=cfg.n_quant, dim=cfg.dim, nhead=cfg.nhead,
        enc_layers=cfg.enc_layers, dec_layers=cfg.dec_layers, n_spk_layers=cfg.n_spk_layers,
        t_emb_dim=cfg.t_emb_dim, p_cond_drop=0, dropout=0).eval()
    params = convert_nar(ref.state_dict(), cfg)
    return cfg, ref, params


def _nar_inputs(rng, n_text_vocab, n_quant):
    c_text = rng.integers(0, n_text_vocab, size=(2, 7))
    c_codes = rng.integers(0, n_quant - 1, size=(2, 9, 8))
    c_texts_length = np.array([7, 5])
    c_codes_length = np.array([9, 6])
    c_codes[1, 6:] = n_quant - 1
    x = rng.integers(0, n_quant, size=(2, 6, 8))
    x_padding_mask = np.zeros((2, 6), dtype=bool)
    x_padding_mask[1, 4:] = True
    t = np.array([13, 2])
    return c_text, c_codes, c_texts_length, c_codes_length, x, x_padding_mask, t


@pytest.mark.parametrize("drop_cond", [False, True])
def test_nar_forward_parity(torch_mod, ref_mars5, drop_cond):
    import jax.numpy as jnp
    from mars5_tts_tpu.models.nar import nar_forward

    torch = torch_mod
    cfg, ref, params = _nar_pair(torch, ref_mars5)
    rng = np.random.default_rng(3)
    c_text, c_codes, ctl, ccl, x, xpm, t = _nar_inputs(rng, cfg.n_text_vocab, cfg.n_quant)

    with torch.inference_mode():
        t_out = ref(torch.tensor(c_text), torch.tensor(c_codes), torch.tensor(ctl),
                    torch.tensor(ccl), torch.tensor(x), torch.tensor(xpm),
                    torch.tensor(t), drop_cond=drop_cond)
    # reference returns (bs, L, n_quant_classes, n_q); ours returns (bs, L, n_q, classes)
    t_out = t_out.numpy().transpose(0, 1, 3, 2)

    j_out = nar_forward(params, cfg, jnp.asarray(c_text), jnp.asarray(c_codes),
                        jnp.asarray(ctl), jnp.asarray(ccl), jnp.asarray(x),
                        jnp.asarray(xpm), jnp.asarray(t),
                        drop_cond=jnp.full((2,), drop_cond, dtype=bool))
    diff = np.abs(np.asarray(j_out) - t_out).max()
    assert diff < ATOL, f"NAR logits max diff {diff} (drop_cond={drop_cond})"


def test_nar_spk_embedding_parity(torch_mod, ref_mars5):
    import jax.numpy as jnp
    from mars5_tts_tpu.models.nar import nar_spk_embedding

    torch = torch_mod
    cfg, ref, params = _nar_pair(torch, ref_mars5)
    rng = np.random.default_rng(4)
    c_codes = rng.integers(0, cfg.n_quant - 1, size=(2, 9, 8))
    ccl = np.array([9, 5])

    t_out = ref.get_spk_embedding(torch.tensor(c_codes), torch.tensor(ccl))
    j_out = nar_spk_embedding(params, cfg, jnp.asarray(c_codes), jnp.asarray(ccl))
    diff = np.abs(np.asarray(j_out) - t_out.numpy()).max()
    assert diff < ATOL, f"NAR speaker embedding max diff {diff}"
