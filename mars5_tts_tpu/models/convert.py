"""Checkpoint conversion: reference torch state_dicts -> mars5_tts_tpu pytrees.

The reference ships AR/NAR weights as ``.pt``/``.safetensors`` state dicts with
torch module naming (see SURVEY.md §2.14 and reference hubconf.py:51-69):

* AR (``CodecLM``): ``embed.weight``, ``ar.layers.N.attention.{wq,wk,wv,wo}.weight``,
  ``ar.layers.N.{attention_norm,ffn_norm}.weight``, ``ar.layers.N.feed_forward.{w1,w2,w3}.weight``,
  ``ar.{norm,output}.weight``, ``pos_embedding.alpha``, ``ref_chunked_emb.embs.N.weight``,
  ``spk_identity_emb.weight``, ``spk_encoder.layers.N.*`` (torch TransformerEncoderLayer
  with the SwiGLU monkeypatch: params live under ``activation.{W,V}.weight`` and
  ``linear2``; ``linear1`` is Identity and absent), ``spk_encoder.norm.{weight,bias}``.
* NAR (``ResidualTransformer``): ``tfm.{encoder,decoder}.layers.N.*``, three
  ``*pos_embedding.alpha`` scalars, two timestep MLPs, ``text_embed``, ``ref_embedder``,
  ``residual_encoder`` chunked embeddings, and 8 ``residual_decoder.N.{0,1}`` heads.

All kernels stay in torch (out, in) layout (see ops/attention.linear). Conversion is
therefore rename + stack only — no transposes — which keeps it trivially auditable.
"""

from __future__ import annotations

import numpy as np

from .ar import CodecLMConfig
from .nar import ResidualTransformerConfig


def permute_rope_rows(w, head_dim: int):
    """Permute per-head output rows [0,2,...,1,3,...] (interleaved -> half-split).

    Applied to wq/wk so the TPU-friendly half-split RoPE (ops/rope.py) matches the
    reference's interleaved convention exactly: q·k scores are invariant under any
    shared permutation of the q/k basis.
    """
    out_dim = w.shape[0]
    perm = np.arange(out_dim).reshape(-1, head_dim)
    perm = np.concatenate([perm[:, 0::2], perm[:, 1::2]], axis=1).reshape(-1)
    return w[perm]


def _np(t):
    """torch tensor / array-like -> float32 numpy (weights are fp16 on disk)."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    a = np.asarray(t)
    if a.dtype == np.float16:
        a = a.astype(np.float32)
    return a


def _stack(sd, fmt, n, **kw):
    return np.stack([_np(sd[fmt.format(i=i, **kw)]) for i in range(n)])


def _enc_layer(sd, prefix):
    """One torch TransformerEncoderLayer (SwiGLU-patched) -> our layer dict."""
    return {
        "sa_in_w": _np(sd[f"{prefix}.self_attn.in_proj_weight"]),
        "sa_in_b": _np(sd[f"{prefix}.self_attn.in_proj_bias"]),
        "sa_out_w": _np(sd[f"{prefix}.self_attn.out_proj.weight"]),
        "sa_out_b": _np(sd[f"{prefix}.self_attn.out_proj.bias"]),
        "W": _np(sd[f"{prefix}.activation.W.weight"]),
        "V": _np(sd[f"{prefix}.activation.V.weight"]),
        "lin2_w": _np(sd[f"{prefix}.linear2.weight"]),
        "lin2_b": _np(sd[f"{prefix}.linear2.bias"]),
        "norm1_w": _np(sd[f"{prefix}.norm1.weight"]),
        "norm1_b": _np(sd[f"{prefix}.norm1.bias"]),
        "norm2_w": _np(sd[f"{prefix}.norm2.weight"]),
        "norm2_b": _np(sd[f"{prefix}.norm2.bias"]),
    }


def _dec_layer(sd, prefix):
    layer = _enc_layer(sd, prefix)
    layer.update({
        "ca_in_w": _np(sd[f"{prefix}.multihead_attn.in_proj_weight"]),
        "ca_in_b": _np(sd[f"{prefix}.multihead_attn.in_proj_bias"]),
        "ca_out_w": _np(sd[f"{prefix}.multihead_attn.out_proj.weight"]),
        "ca_out_b": _np(sd[f"{prefix}.multihead_attn.out_proj.bias"]),
        "norm3_w": _np(sd[f"{prefix}.norm3.weight"]),
        "norm3_b": _np(sd[f"{prefix}.norm3.bias"]),
    })
    return layer


def _stack_layers(layers):
    import jax
    return jax.tree.map(lambda *xs: np.stack(xs), *layers)


def _enc_stack(sd, prefix, n_layers):
    return {
        "layers": _stack_layers([_enc_layer(sd, f"{prefix}.layers.{i}") for i in range(n_layers)]),
        "norm_w": _np(sd[f"{prefix}.norm.weight"]),
        "norm_b": _np(sd[f"{prefix}.norm.bias"]),
    }


def _dec_stack(sd, prefix, n_layers):
    return {
        "layers": _stack_layers([_dec_layer(sd, f"{prefix}.layers.{i}") for i in range(n_layers)]),
        "norm_w": _np(sd[f"{prefix}.norm.weight"]),
        "norm_b": _np(sd[f"{prefix}.norm.bias"]),
    }


def convert_codeclm(sd, cfg: CodecLMConfig):
    """Reference ``CodecLM.state_dict()`` -> AR parameter pytree (numpy leaves)."""
    nl = cfg.n_layers
    return {
        "embed": _np(sd["embed.weight"]),
        "ar": {
            "layers": {
                "wq": np.stack([
                    permute_rope_rows(_np(sd[f"ar.layers.{i}.attention.wq.weight"]),
                                      cfg.head_dim) for i in range(nl)]),
                "wk": np.stack([
                    permute_rope_rows(_np(sd[f"ar.layers.{i}.attention.wk.weight"]),
                                      cfg.head_dim) for i in range(nl)]),
                "wv": _stack(sd, "ar.layers.{i}.attention.wv.weight", nl),
                "wo": _stack(sd, "ar.layers.{i}.attention.wo.weight", nl),
                "w1": _stack(sd, "ar.layers.{i}.feed_forward.w1.weight", nl),
                "w2": _stack(sd, "ar.layers.{i}.feed_forward.w2.weight", nl),
                "w3": _stack(sd, "ar.layers.{i}.feed_forward.w3.weight", nl),
                "attention_norm": _stack(sd, "ar.layers.{i}.attention_norm.weight", nl),
                "ffn_norm": _stack(sd, "ar.layers.{i}.ffn_norm.weight", nl),
            },
            "norm": _np(sd["ar.norm.weight"]),
            "output": _np(sd["ar.output.weight"]),
        },
        "pos_alpha": _np(sd["pos_embedding.alpha"]),
        "ref_chunked_emb": _stack(sd, "ref_chunked_emb.embs.{i}.weight", cfg.n_codebooks),
        "spk_identity_emb": _np(sd["spk_identity_emb.weight"]),
        "spk_encoder": _enc_stack(sd, "spk_encoder", cfg.n_spk_layers),
    }


def convert_nar(sd, cfg: ResidualTransformerConfig):
    """Reference ``ResidualTransformer.state_dict()`` -> NAR parameter pytree."""
    nq = cfg.pred_quant_levels
    return {
        "text_embed": _np(sd["text_embed.weight"]),
        "cond_pos_alpha": _np(sd["cond_pos_embedding.alpha"]),
        "pos_alpha": _np(sd["pos_embedding.alpha"]),
        "ref_pos_alpha": _np(sd["ref_pos_embedding.alpha"]),
        "encoder": _enc_stack(sd, "tfm.encoder", cfg.enc_layers),
        "decoder": _dec_stack(sd, "tfm.decoder", cfg.dec_layers),
        "t_enc_mlp": {
            "w0": _np(sd["timestep_encoder_emb.0.weight"]), "b0": _np(sd["timestep_encoder_emb.0.bias"]),
            "w1": _np(sd["timestep_encoder_emb.2.weight"]), "b1": _np(sd["timestep_encoder_emb.2.bias"]),
        },
        "t_dec_mlp": {
            "w0": _np(sd["timestep_decoder_emb.0.weight"]), "b0": _np(sd["timestep_decoder_emb.0.bias"]),
            "w1": _np(sd["timestep_decoder_emb.2.weight"]), "b1": _np(sd["timestep_decoder_emb.2.bias"]),
        },
        "ref_embedder": _stack(sd, "ref_embedder.embs.{i}.weight", cfg.c_quant_levels),
        "spk_identity_emb": _np(sd["spk_identity_emb.weight"]),
        "spk_encoder": _enc_stack(sd, "spk_encoder", cfg.n_spk_layers),
        "residual_encoder": _stack(sd, "residual_encoder.embs.{i}.weight", cfg.c_quant_levels),
        "residual_decoder": {
            "ln_w": _stack(sd, "residual_decoder.{i}.0.weight", nq),
            "ln_b": _stack(sd, "residual_decoder.{i}.0.bias", nq),
            "lin_w": _stack(sd, "residual_decoder.{i}.1.weight", nq),
            "lin_b": _stack(sd, "residual_decoder.{i}.1.bias", nq),
        },
    }
