"""Tiny-model fixtures: a complete fake MARS5 checkpoint set for e2e tests.

Builds real minbpe tokenizers, tiny torch AR/NAR models saved in the reference's
safetensors layout (tokenizers in metadata), plus random tiny Encodec/Vocos
parameter pytrees — enough to run ``Mars5TTS.tts()`` end-to-end without the real
1.2B-param weights (SURVEY.md §4 test strategy).
"""

from __future__ import annotations

import os
import tempfile

import numpy as np


def make_tokenizer_strings():
    """(texttok_model_str, speechtok_model_str) in minbpe-v1 format."""
    from mars5_tts_tpu.text import CodebookTokenizer, GPT4_SPLIT_PATTERN, RegexTokenizer

    texttok = RegexTokenizer(GPT4_SPLIT_PATTERN)
    texttok.train("dummy corpus", 256)  # no merges: byte-level vocab
    texttok.register_special_tokens({"<|startoftext|>": 256, "<|endoftext|>": 257})

    speechtok = CodebookTokenizer(GPT4_SPLIT_PATTERN, codebook_size=1024)
    speechtok.train(" ".join(str(i % 7) for i in range(50)), 1024)  # no merges
    speechtok.register_special_tokens({"<|endofspeech|>": 1024})

    with tempfile.TemporaryDirectory() as d:
        texttok.save(os.path.join(d, "text"))
        speechtok.save(os.path.join(d, "speech"))
        text_str = open(os.path.join(d, "text.model")).read()
        speech_str = open(os.path.join(d, "speech.model")).read()
    return texttok, speechtok, text_str, speech_str


def make_tiny_mars5(tmpdir, seed: int = 0, fused_geom: bool = False):
    """Create tiny AR/NAR safetensors checkpoints + codec params + configs.

    Returns (mars5, info) where mars5 is a constructed Mars5TTS and info carries
    the checkpoint paths/configs for direct-load tests.

    ``fused_geom``: use an AR geometry the fused decode kernel accepts
    (dim 256 = 4 heads x 64, hidden 1024 — dim % 128 == 0, hidden/2 % 128 == 0)
    so pipeline tests can drive the fused branches in interpret/emulation mode.
    """
    import torch

    import jax
    from mars5_tts_tpu.hub import save_checkpoint
    from mars5_tts_tpu.models.ar import CodecLMConfig
    from mars5_tts_tpu.models.encodec import EncodecConfig, init_encodec
    from mars5_tts_tpu.models.nar import ResidualTransformerConfig
    from mars5_tts_tpu.models.vocos import VocosConfig, init_vocos
    from mars5_tts_tpu.pipeline import Mars5TTS

    import sys
    sys.path.insert(0, "/root/reference")
    import mars5.model as ref_model

    torch.manual_seed(seed)
    texttok, speechtok, text_str, speech_str = make_tokenizer_strings()
    n_vocab = len(texttok.vocab) + len(speechtok.vocab)      # 258 + 1025
    n_text_vocab = len(texttok.vocab) + 1

    if fused_geom:
        ar_torch = ref_model.CodecLM(n_vocab=n_vocab, dim=256, nhead=4,
                                     n_layers=2, n_spk_layers=2, dim_ff_scale=4,
                                     sliding_window=3000).eval()
    else:
        ar_torch = ref_model.CodecLM(n_vocab=n_vocab, dim=64, nhead=2, n_layers=2,
                                     n_spk_layers=2, dim_ff_scale=1.5,
                                     sliding_window=3000).eval()
    nar_torch = ref_model.ResidualTransformer(
        n_text_vocab=n_text_vocab, n_quant=1025, dim=64, nhead=4, enc_layers=2,
        dec_layers=2, n_spk_layers=2, t_emb_dim=64, p_cond_drop=0, dropout=0).eval()

    if fused_geom:
        ar_cfg = CodecLMConfig(n_vocab=n_vocab, dim=256, n_heads=4, n_kv_heads=4,
                               head_dim=64, n_layers=2, hidden_dim=1024,
                               sliding_window=3000, n_spk_layers=2,
                               spk_hidden_dim=768)
    else:
        ar_cfg = CodecLMConfig(n_vocab=n_vocab, dim=64, n_heads=2, n_kv_heads=2,
                               head_dim=64, n_layers=2, hidden_dim=96,
                               sliding_window=3000, n_spk_layers=2, spk_hidden_dim=192)
    nar_cfg = ResidualTransformerConfig(n_text_vocab=n_text_vocab, n_quant=1025,
                                        dim=64, nhead=4, enc_layers=2, dec_layers=2,
                                        n_spk_layers=2, t_emb_dim=64, hidden_dim=192)

    vocab_meta = {"texttok.model": text_str, "speechtok.model": speech_str}
    ar_path = os.path.join(tmpdir, "mars5_ar.safetensors")
    nar_path = os.path.join(tmpdir, "mars5_nar.safetensors")
    save_checkpoint(ar_path, {k: v.numpy() for k, v in ar_torch.state_dict().items()},
                    vocab_meta, config=ar_cfg.__dict__)
    save_checkpoint(nar_path, {k: v.numpy() for k, v in nar_torch.state_dict().items()},
                    vocab_meta, config=nar_cfg.__dict__)
    encodec_cfg = EncodecConfig(dimension=16, n_filters=4, ratios=(4, 2), n_q=8,
                                codebook_size=1024)
    vocos_cfg = VocosConfig(input_channels=16, dim=16, intermediate_dim=32,
                            num_layers=2, n_fft=64, hop_length=16,
                            n_codebooks=8, codebook_size=1024)

    key = jax.random.PRNGKey(seed)
    encodec_params = init_encodec(key, encodec_cfg)
    vocos_params = init_vocos(jax.random.fold_in(key, 1), vocos_cfg)

    mars5 = Mars5TTS.from_local(ar_path, nar_path,
                                encodec_params=encodec_params,
                                vocos_params=vocos_params,
                                ar_cfg=ar_cfg, nar_cfg=nar_cfg,
                                encodec_cfg=encodec_cfg, vocos_cfg=vocos_cfg)
    info = {"ar_path": ar_path, "nar_path": nar_path, "ar_torch": ar_torch,
            "nar_torch": nar_torch, "texttok": texttok, "speechtok": speechtok}
    return mars5, info
