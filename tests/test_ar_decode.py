"""End-to-end AR decode parity: our jitted engine vs the reference ar_generate loop.

The reference's only RNG draw is ``torch.multinomial``; we patch it to the same
inverse-CDF rule over an injected uniform stream, so with converted weights both
frameworks must emit identical token sequences (SURVEY.md §7 parity contract).
``torchaudio`` (imported but unused by mars5/ar_generate.py) is stubbed.
"""

import sys
import types
from types import SimpleNamespace

import numpy as np
import pytest

from tests.conftest import add_reference_to_path, reference_available

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")


@pytest.fixture(scope="module")
def ref_ar_generate():
    add_reference_to_path()
    if "torchaudio" not in sys.modules:
        sys.modules["torchaudio"] = types.ModuleType("torchaudio")
    from mars5.ar_generate import ar_generate as ref_gen
    return ref_gen


def _fake_tokenizers(n_text=20, n_speech=30):
    texttok = SimpleNamespace(vocab={i: b"" for i in range(n_text)})
    speechtok = SimpleNamespace(vocab={i: b"" for i in range(n_speech)},
                                special_tokens={"<|endofspeech|>": n_speech - 1})
    return texttok, speechtok


class _MultinomialPatch:
    """Deterministic inverse-CDF replacement for torch.multinomial."""

    def __init__(self, torch, uniforms):
        self.torch = torch
        self.uniforms = list(uniforms)
        self.i = 0

    def __call__(self, probs, num_samples=1, replacement=False):
        assert num_samples == 1
        p = probs.detach().cpu().numpy().astype(np.float64)
        cdf = np.cumsum(p)
        u = self.uniforms[self.i]
        self.i += 1
        idx = int(np.searchsorted(cdf, u * cdf[-1], side="right"))
        return self.torch.tensor([idx], dtype=self.torch.long)


@pytest.mark.parametrize("use_kv_cache,typical_p,top_p", [
    (True, 1.0, 0.9),
    (False, 1.0, 0.9),
    (True, 0.9, 1.0),
    (True, 1.0, 0.2),
])
def test_ar_generate_token_parity(ref_ar_generate, use_kv_cache, typical_p, top_p):
    import torch
    import jax.numpy as jnp
    import mars5.model as ref_model

    from mars5_tts_tpu.models.ar import CodecLMConfig
    from mars5_tts_tpu.models.ar_decode import ArSampling, ar_generate
    from mars5_tts_tpu.models.convert import convert_codeclm

    torch.manual_seed(42)
    n_text, n_speech = 20, 30
    n_vocab = n_text + n_speech
    cfg = CodecLMConfig.tiny(n_vocab=n_vocab)
    ref = ref_model.CodecLM(n_vocab=n_vocab, dim=64, nhead=2, n_layers=2,
                            n_spk_layers=2, dim_ff_scale=1.5, sliding_window=64).eval()
    params = convert_codeclm(ref.state_dict(), cfg)

    texttok, speechtok = _fake_tokenizers(n_text, n_speech)
    rng = np.random.default_rng(7)
    prompt = np.concatenate([rng.integers(0, n_text, 6),
                             rng.integers(n_text, n_vocab - 2, 4)]).astype(np.int64)
    spk_codes = rng.integers(0, 1024, size=(5, 8))
    first_codec_idx = 7
    max_len = 36
    uniforms = rng.random(max_len + 5)

    kwargs = dict(temperature=0.7, topk=10, top_p=top_p, typical_p=typical_p,
                  alpha_frequency=1.0, alpha_presence=0.4, penalty_window=5,
                  eos_penalty_factor=1.0, eos_penalty_decay=0.5, n_phones_gen=10)

    patch = _MultinomialPatch(torch, uniforms)
    orig = torch.multinomial
    try:
        torch.multinomial = patch
        ref_out = ref_ar_generate(texttok, speechtok, ref,
                                  torch.tensor(prompt), torch.tensor(spk_codes),
                                  first_codec_idx, max_len=max_len, fp16=False,
                                  vocode=False, use_kv_cache=use_kv_cache,
                                  beam_width=1, beam_length_penalty=1, **kwargs)
    finally:
        torch.multinomial = orig
    ref_tokens = ref_out.numpy()

    s = ArSampling(temperature=0.7, top_k=10, top_p=top_p, typical_p=typical_p,
                   alpha_frequency=1.0, alpha_presence=0.4, penalty_window=5,
                   eos_penalty_decay=0.5, eos_penalty_factor=1.0, n_phones_gen=10,
                   eos_idx=n_text + speechtok.special_tokens["<|endofspeech|>"],
                   valid_start=n_text, valid_end=n_text + n_speech + 1,
                   max_len=max_len)
    ours, n_gen = ar_generate(params, cfg, prompt, spk_codes, sampling=s,
                              uniforms=uniforms[: max_len])

    assert ours.tolist() == ref_tokens.tolist(), (
        f"token divergence (kv={use_kv_cache}, typ={typical_p}, top_p={top_p}):\n"
        f"ref : {ref_tokens.tolist()}\nours: {ours.tolist()}")


@pytest.mark.slow
def test_nocache_matches_cached_engine():
    """use_kv_cache=False path: full-forward-per-step decode must produce the
    same tokens as the ring-cache engine (they compute the same banded-window
    attention; fp32 'highest' precision keeps the sampled paths aligned)."""
    import jax
    import numpy as np
    from mars5_tts_tpu.models.ar import CodecLMConfig, init_codeclm
    from mars5_tts_tpu.models.ar_decode import (ArSampling, ar_generate,
                                                ar_generate_nocache)

    cfg = CodecLMConfig.tiny(n_vocab=50)
    params = init_codeclm(jax.random.PRNGKey(3), cfg)
    s = ArSampling(temperature=0.7, top_k=10, top_p=0.9, typical_p=1.0,
                   alpha_frequency=1.0, alpha_presence=0.4, penalty_window=5,
                   eos_penalty_decay=0.5, eos_penalty_factor=1.0,
                   n_phones_gen=12, eos_idx=49, valid_start=20, valid_end=51,
                   max_len=40)
    rng = np.random.default_rng(5)
    prompt = rng.integers(0, 20, 9)
    spk = rng.integers(0, 1024, (5, 8))
    u = rng.random(s.max_len).astype(np.float32)
    t_cached, n_cached = ar_generate(params, cfg, prompt, spk, sampling=s, uniforms=u)
    t_nc, n_nc = ar_generate_nocache(params, cfg, prompt, spk, sampling=s, uniforms=u)
    assert n_cached == n_nc
    assert t_cached.tolist() == t_nc.tolist()
