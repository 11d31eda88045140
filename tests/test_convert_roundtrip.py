"""Checkpoint round-trip: pytree -> reference naming -> reference torch model.

The exported state dict must (a) load into the actual reference torch modules
with strict=True, (b) produce the same outputs there as our JAX forward, and
(c) re-import into our pytree bit-exactly.
"""

import numpy as np
import pytest

from tests.conftest import add_reference_to_path, reference_available

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")


def test_codeclm_roundtrip_through_reference():
    import torch
    add_reference_to_path()
    import mars5.model as ref_model

    import jax
    import jax.numpy as jnp
    from mars5_tts_tpu.models.ar import CodecLMConfig, codeclm_forward, init_codeclm
    from mars5_tts_tpu.models.convert import convert_codeclm, convert_codeclm_back

    cfg = CodecLMConfig.tiny(n_vocab=64)
    params = init_codeclm(jax.random.PRNGKey(3), cfg)
    sd = {k: torch.tensor(v) for k, v in convert_codeclm_back(params, cfg).items()}

    ref = ref_model.CodecLM(n_vocab=64, dim=64, nhead=2, n_layers=2, n_spk_layers=2,
                            dim_ff_scale=1.5, sliding_window=64).eval()
    missing, unexpected = ref.load_state_dict(sd, strict=True), None
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 64, size=(1, 9))
    spk = rng.integers(0, 1024, size=(1, 5, 8))
    with torch.inference_mode():
        t_out = ref(torch.tensor(tokens), spk_reference=torch.tensor(spk))
    j_out = codeclm_forward(params, cfg, jnp.asarray(tokens), spk_codes=jnp.asarray(spk))
    assert np.abs(np.asarray(j_out) - t_out.numpy()).max() < 2e-4

    # re-import: bit-exact pytree
    back = convert_codeclm(sd, cfg)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(jax.tree.map(np.asarray, params))[0],
            jax.tree_util.tree_flatten_with_path(back)[0]):
        assert pa == pb
        np.testing.assert_array_equal(a, np.asarray(b), err_msg=str(pa))


def test_nar_roundtrip_through_reference():
    import torch
    add_reference_to_path()
    import mars5.model as ref_model

    import jax
    import jax.numpy as jnp
    from mars5_tts_tpu.models.convert import convert_nar, convert_nar_back
    from mars5_tts_tpu.models.nar import (ResidualTransformerConfig, init_nar,
                                          nar_forward)

    cfg = ResidualTransformerConfig.tiny(n_text_vocab=32)
    params = init_nar(jax.random.PRNGKey(4), cfg)
    sd = {k: torch.tensor(v) for k, v in convert_nar_back(params, cfg).items()}

    ref = ref_model.ResidualTransformer(
        n_text_vocab=32, n_quant=cfg.n_quant, dim=cfg.dim, nhead=cfg.nhead,
        enc_layers=cfg.enc_layers, dec_layers=cfg.dec_layers,
        n_spk_layers=cfg.n_spk_layers, t_emb_dim=cfg.t_emb_dim,
        p_cond_drop=0, dropout=0).eval()
    ref.load_state_dict(sd, strict=True)

    rng = np.random.default_rng(1)
    c_text = rng.integers(0, 32, (1, 5))
    c_codes = rng.integers(0, 1024, (1, 6, 8))
    x = rng.integers(0, 1024, (1, 4, 8))
    xpm = np.zeros((1, 4), bool)
    t = np.array([3])
    with torch.inference_mode():
        t_out = ref(torch.tensor(c_text), torch.tensor(c_codes), torch.tensor([5]),
                    torch.tensor([6]), torch.tensor(x), torch.tensor(xpm),
                    torch.tensor(t)).numpy().transpose(0, 1, 3, 2)
    j_out = nar_forward(params, cfg, jnp.asarray(c_text), jnp.asarray(c_codes),
                        jnp.asarray([5]), jnp.asarray([6]), jnp.asarray(x),
                        jnp.asarray(xpm), jnp.asarray(t))
    assert np.abs(np.asarray(j_out) - t_out).max() < 2e-4
