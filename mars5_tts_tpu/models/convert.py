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


def infer_codeclm_config(sd, n_vocab: int | None = None) -> CodecLMConfig:
    """Derive a CodecLMConfig from checkpoint tensor shapes.

    head_dim is not recoverable from shapes alone; the reference's ModelArgs pins
    it to 64 (mars5/nn_future.py:149), which holds for every released MARS5
    checkpoint. Tiny test checkpoints carry exact configs in metadata instead.
    """
    nv, dim = sd["embed.weight"].shape
    n_layers = 1 + max(int(k.split(".")[2]) for k in sd if k.startswith("ar.layers."))
    head_dim = 64
    n_heads = sd["ar.layers.0.attention.wq.weight"].shape[0] // head_dim
    n_kv_heads = sd["ar.layers.0.attention.wk.weight"].shape[0] // head_dim
    hidden = sd["ar.layers.0.feed_forward.w1.weight"].shape[0]
    n_spk = 1 + max(int(k.split(".")[2]) for k in sd if k.startswith("spk_encoder.layers."))
    spk_hidden = sd["spk_encoder.layers.0.activation.W.weight"].shape[0]
    n_cb = sum(1 for k in sd if k.startswith("ref_chunked_emb.embs.") and k.endswith(".weight"))
    cb_size = sd["ref_chunked_emb.embs.0.weight"].shape[0]
    return CodecLMConfig(n_vocab=int(n_vocab or nv), dim=int(dim), n_heads=int(n_heads),
                         n_kv_heads=int(n_kv_heads), head_dim=head_dim,
                         n_layers=n_layers, hidden_dim=int(hidden),
                         n_spk_layers=n_spk, spk_hidden_dim=int(spk_hidden),
                         codebook_size=int(cb_size), n_codebooks=int(n_cb))


def infer_nar_config(sd, nhead: int = 16) -> ResidualTransformerConfig:
    """Derive a ResidualTransformerConfig from checkpoint tensor shapes.

    nhead is not recoverable from shapes; defaults to the released model's 16.
    """
    n_text, dim = sd["text_embed.weight"].shape
    n_quant = sd["residual_decoder.0.1.weight"].shape[0]
    enc = 1 + max(int(k.split(".")[3]) for k in sd if k.startswith("tfm.encoder.layers."))
    dec = 1 + max(int(k.split(".")[3]) for k in sd if k.startswith("tfm.decoder.layers."))
    n_spk = 1 + max(int(k.split(".")[2]) for k in sd if k.startswith("spk_encoder.layers."))
    t_emb = sd["timestep_encoder_emb.0.weight"].shape[1]
    hidden = sd["tfm.encoder.layers.0.activation.W.weight"].shape[0]
    nq = sum(1 for k in sd if k.startswith("residual_decoder.") and k.endswith(".1.weight"))
    return ResidualTransformerConfig(n_text_vocab=int(n_text), n_quant=int(n_quant),
                                     dim=int(dim), nhead=nhead, enc_layers=enc,
                                     dec_layers=dec, n_spk_layers=n_spk,
                                     pred_quant_levels=nq, t_emb_dim=int(t_emb),
                                     hidden_dim=int(hidden))


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


def _reshape3(w):
    """(3D, ...) fused in_proj weight/bias -> (3, D, ...)."""
    return w.reshape(3, w.shape[0] // 3, *w.shape[1:])


def _enc_layer(sd, prefix):
    """One torch TransformerEncoderLayer (SwiGLU-patched) -> our layer dict."""
    return {
        # fused (3D, D) in_proj -> (3, D, D): q/k/v thirds on a stack axis
        # (same element order; lets TP shard the head axis — see torch_mha)
        "sa_in_w": _reshape3(_np(sd[f"{prefix}.self_attn.in_proj_weight"])),
        "sa_in_b": _reshape3(_np(sd[f"{prefix}.self_attn.in_proj_bias"])),
        "sa_out_w": _np(sd[f"{prefix}.self_attn.out_proj.weight"]),
        "sa_out_b": _np(sd[f"{prefix}.self_attn.out_proj.bias"]),
        "WV": np.concatenate([_np(sd[f"{prefix}.activation.W.weight"]),
                              _np(sd[f"{prefix}.activation.V.weight"])], axis=0),
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
        "ca_in_w": _reshape3(_np(sd[f"{prefix}.multihead_attn.in_proj_weight"])),
        "ca_in_b": _reshape3(_np(sd[f"{prefix}.multihead_attn.in_proj_bias"])),
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


def _unpermute_rope_rows(w, head_dim: int):
    """Inverse of permute_rope_rows (half-split -> interleaved)."""
    out_dim = w.shape[0]
    perm = np.arange(out_dim).reshape(-1, head_dim)
    perm = np.concatenate([perm[:, 0::2], perm[:, 1::2]], axis=1).reshape(-1)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(out_dim)
    return w[inv]


def _np_leaf(x):
    return np.asarray(x)


def _flat3(w):
    """(3, D, ...) stacked in_proj -> torch's fused (3D, ...)."""
    return w.reshape(3 * w.shape[1], *w.shape[2:])


def _unstack_enc_layer(layers, i, prefix, out):
    g = lambda k: _np_leaf(layers[k][i])
    out[f"{prefix}.self_attn.in_proj_weight"] = _flat3(g("sa_in_w"))
    out[f"{prefix}.self_attn.in_proj_bias"] = _flat3(g("sa_in_b"))
    out[f"{prefix}.self_attn.out_proj.weight"] = g("sa_out_w")
    out[f"{prefix}.self_attn.out_proj.bias"] = g("sa_out_b")
    wv = g("WV")
    out[f"{prefix}.activation.W.weight"] = wv[: wv.shape[0] // 2]
    out[f"{prefix}.activation.V.weight"] = wv[wv.shape[0] // 2:]
    out[f"{prefix}.linear2.weight"] = g("lin2_w")
    out[f"{prefix}.linear2.bias"] = g("lin2_b")
    out[f"{prefix}.norm1.weight"] = g("norm1_w")
    out[f"{prefix}.norm1.bias"] = g("norm1_b")
    out[f"{prefix}.norm2.weight"] = g("norm2_w")
    out[f"{prefix}.norm2.bias"] = g("norm2_b")
    if "ca_in_w" in layers:
        out[f"{prefix}.multihead_attn.in_proj_weight"] = _flat3(g("ca_in_w"))
        out[f"{prefix}.multihead_attn.in_proj_bias"] = _flat3(g("ca_in_b"))
        out[f"{prefix}.multihead_attn.out_proj.weight"] = g("ca_out_w")
        out[f"{prefix}.multihead_attn.out_proj.bias"] = g("ca_out_b")
        out[f"{prefix}.norm3.weight"] = g("norm3_w")
        out[f"{prefix}.norm3.bias"] = g("norm3_b")


def _unstack_stack(stack, prefix, n_layers, out):
    for i in range(n_layers):
        _unstack_enc_layer(stack["layers"], i, f"{prefix}.layers.{i}", out)
    out[f"{prefix}.norm.weight"] = _np_leaf(stack["norm_w"])
    out[f"{prefix}.norm.bias"] = _np_leaf(stack["norm_b"])


def convert_codeclm_back(params, cfg: CodecLMConfig) -> dict:
    """AR pytree -> reference ``CodecLM.state_dict()`` naming (numpy values).

    Undoes the RoPE row permutation so the exported checkpoint loads into the
    reference torch model (and back into this framework) unchanged.
    """
    sd: dict = {"embed.weight": _np_leaf(params["embed"])}
    layers = params["ar"]["layers"]
    for i in range(cfg.n_layers):
        pre = f"ar.layers.{i}"
        sd[f"{pre}.attention.wq.weight"] = _unpermute_rope_rows(
            _np_leaf(layers["wq"][i]), cfg.head_dim)
        sd[f"{pre}.attention.wk.weight"] = _unpermute_rope_rows(
            _np_leaf(layers["wk"][i]), cfg.head_dim)
        sd[f"{pre}.attention.wv.weight"] = _np_leaf(layers["wv"][i])
        sd[f"{pre}.attention.wo.weight"] = _np_leaf(layers["wo"][i])
        sd[f"{pre}.feed_forward.w1.weight"] = _np_leaf(layers["w1"][i])
        sd[f"{pre}.feed_forward.w2.weight"] = _np_leaf(layers["w2"][i])
        sd[f"{pre}.feed_forward.w3.weight"] = _np_leaf(layers["w3"][i])
        sd[f"{pre}.attention_norm.weight"] = _np_leaf(layers["attention_norm"][i])
        sd[f"{pre}.ffn_norm.weight"] = _np_leaf(layers["ffn_norm"][i])
    sd["ar.norm.weight"] = _np_leaf(params["ar"]["norm"])
    sd["ar.output.weight"] = _np_leaf(params["ar"]["output"])
    sd["pos_embedding.alpha"] = _np_leaf(params["pos_alpha"])
    for i in range(cfg.n_codebooks):
        sd[f"ref_chunked_emb.embs.{i}.weight"] = _np_leaf(params["ref_chunked_emb"][i])
    sd["spk_identity_emb.weight"] = _np_leaf(params["spk_identity_emb"])
    _unstack_stack(params["spk_encoder"], "spk_encoder", cfg.n_spk_layers, sd)
    return sd


def convert_nar_back(params, cfg: ResidualTransformerConfig) -> dict:
    """NAR pytree -> reference ``ResidualTransformer.state_dict()`` naming."""
    sd: dict = {
        "text_embed.weight": _np_leaf(params["text_embed"]),
        "cond_pos_embedding.alpha": _np_leaf(params["cond_pos_alpha"]),
        "pos_embedding.alpha": _np_leaf(params["pos_alpha"]),
        "ref_pos_embedding.alpha": _np_leaf(params["ref_pos_alpha"]),
        "timestep_encoder_emb.0.weight": _np_leaf(params["t_enc_mlp"]["w0"]),
        "timestep_encoder_emb.0.bias": _np_leaf(params["t_enc_mlp"]["b0"]),
        "timestep_encoder_emb.2.weight": _np_leaf(params["t_enc_mlp"]["w1"]),
        "timestep_encoder_emb.2.bias": _np_leaf(params["t_enc_mlp"]["b1"]),
        "timestep_decoder_emb.0.weight": _np_leaf(params["t_dec_mlp"]["w0"]),
        "timestep_decoder_emb.0.bias": _np_leaf(params["t_dec_mlp"]["b0"]),
        "timestep_decoder_emb.2.weight": _np_leaf(params["t_dec_mlp"]["w1"]),
        "timestep_decoder_emb.2.bias": _np_leaf(params["t_dec_mlp"]["b1"]),
        "spk_identity_emb.weight": _np_leaf(params["spk_identity_emb"]),
    }
    _unstack_stack(params["encoder"], "tfm.encoder", cfg.enc_layers, sd)
    _unstack_stack(params["decoder"], "tfm.decoder", cfg.dec_layers, sd)
    _unstack_stack(params["spk_encoder"], "spk_encoder", cfg.n_spk_layers, sd)
    for i in range(cfg.c_quant_levels):
        sd[f"ref_embedder.embs.{i}.weight"] = _np_leaf(params["ref_embedder"][i])
        sd[f"residual_encoder.embs.{i}.weight"] = _np_leaf(params["residual_encoder"][i])
    rd = params["residual_decoder"]
    for i in range(cfg.pred_quant_levels):
        sd[f"residual_decoder.{i}.0.weight"] = _np_leaf(rd["ln_w"][i])
        sd[f"residual_decoder.{i}.0.bias"] = _np_leaf(rd["ln_b"][i])
        sd[f"residual_decoder.{i}.1.weight"] = _np_leaf(rd["lin_w"][i])
        sd[f"residual_decoder.{i}.1.bias"] = _np_leaf(rd["lin_b"][i])
    return sd
