"""CodecLM — the ~750M-parameter autoregressive codec language model.

A Mistral-style decoder-only transformer (26 layers, dim 1536, 24 heads, head_dim 64,
SwiGLU hidden 3584, sliding window 3000) over the joint text+speech BPE vocabulary,
conditioned on an implicit speaker embedding prepended as sequence position 0.

Behavioral contract follows the reference ``CodecLM`` (mars5/model.py:42-141) and
``MistralTransformer`` (mars5/nn_future.py:336-398):
* token embedding -> [speaker vector] ++ tokens -> RoPE positions 0..L
* banded causal mask (window 3000) during prefill
* final RMSNorm + untied output projection to the vocabulary
* prefill output strips the speaker position.

TPU-first design: parameters are a pytree with the 26 transformer blocks stacked on
a leading axis and scanned (one compiled block); all matmuls hit the MXU in the
compute dtype (bf16 in production, fp32 in parity tests); norms/softmax in fp32.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..ops.attention import banded_causal_mask, sdpa
from ..ops.quant import linear_any as linear
from ..ops.embeddings import add_sine_pe, chunked_embed
from ..ops.norms import rms_norm
from ..ops.rope import apply_rope_halfsplit, rope_angles
from ..utils.masks import construct_padding_mask
from .layers import encoder_stack


@dataclass(frozen=True)
class CodecLMConfig:
    n_vocab: int
    dim: int = 1536
    n_heads: int = 24
    n_kv_heads: int = 24
    head_dim: int = 64
    n_layers: int = 26
    hidden_dim: int = 3584          # int(1536 * 7/3)
    sliding_window: int = 3000
    norm_eps: float = 1e-5
    n_spk_layers: int = 2
    spk_hidden_dim: int = 4608      # int(1536 * 4 * 3/4) — speaker-encoder FFN
    codebook_size: int = 1025       # 1024 codes + pad(1024)
    n_codebooks: int = 8

    @classmethod
    def mars5(cls, n_vocab: int) -> "CodecLMConfig":
        """The released MARS5 English AR configuration (inference.py:105)."""
        return cls(n_vocab=n_vocab)

    @classmethod
    def tiny(cls, n_vocab: int = 64) -> "CodecLMConfig":
        """A small config for tests/CI.

        Matches ``CodecLM(n_vocab, dim=64, nhead=2, n_layers=2, dim_ff_scale=1.5,
        sliding_window=64)`` in the reference — note the reference's ``ModelArgs``
        pins ``head_dim=64`` independent of ``dim`` (mars5/nn_future.py:149).
        """
        return cls(n_vocab=n_vocab, dim=64, n_heads=2, n_kv_heads=2, head_dim=64,
                   n_layers=2, hidden_dim=96, sliding_window=64, n_spk_layers=2,
                   spk_hidden_dim=192)


def mistral_block(p, x, cos, sin, mask, cfg: CodecLMConfig):
    """One pre-norm Mistral block (attention + SwiGLU FFN), full-sequence path."""
    b, l, d = x.shape
    h = rms_norm(x, p["attention_norm"], cfg.norm_eps)
    q = linear(h, p["wq"]).reshape(b, l, cfg.n_heads, cfg.head_dim)
    k = linear(h, p["wk"]).reshape(b, l, cfg.n_kv_heads, cfg.head_dim)
    v = linear(h, p["wv"]).reshape(b, l, cfg.n_kv_heads, cfg.head_dim)
    q = apply_rope_halfsplit(q, cos, sin)
    k = apply_rope_halfsplit(k, cos, sin)
    attn = sdpa(q, k, v, mask)
    x = x + linear(attn.reshape(b, l, cfg.n_heads * cfg.head_dim), p["wo"])
    h = rms_norm(x, p["ffn_norm"], cfg.norm_eps)
    ff = linear(jax.nn.silu(linear(h, p["w1"])) * linear(h, p["w3"]), p["w2"])
    return x + ff, (k, v)


def backbone_forward(p, x, positions, cfg: CodecLMConfig, mask=None):
    """MistralTransformer forward over embedded inputs.

    Args:
        p: backbone pytree: {"layers": stacked blocks, "norm", "output"}.
        x: (bs, L, dim) embedded inputs.
        positions: (L,) absolute positions for RoPE.
        mask: optional additive (L, L) attention mask; if None and L > 1 a banded
            causal mask is built (reference builds it only when seq > 1).

    Returns:
        (logits (bs, L, vocab), stacked per-layer (k, v) for cache seeding).
    """
    l = x.shape[1]
    cos, sin = rope_angles(positions, cfg.head_dim)
    if mask is None and l > 1:
        mask = banded_causal_mask(l, cfg.sliding_window)

    def step(h, layer_p):
        h, kv = mistral_block(layer_p, h, cos, sin, mask, cfg)
        return h, kv

    from .layers import _maybe_remat
    x, kvs = jax.lax.scan(_maybe_remat(step), x, p["layers"])
    x = rms_norm(x, p["norm"], cfg.norm_eps)
    return linear(x, p["output"]), kvs


def spk_embedding(p, cfg: CodecLMConfig, spk_codes):
    """Implicit speaker embedding from reference codec codes.

    Mirrors ``CodecLM.get_spk_embedding`` (mars5/model.py:70-92): chunked-embed the
    (bs, S, 8) codes, prepend the learned identity query token, add sinusoidal
    positions (learnable alpha), mask padding (codebook-0 == 1024 onward), run the
    2-layer SwiGLU transformer encoder, take position 0.
    """
    bs = spk_codes.shape[0]
    seq = chunked_embed(p["ref_chunked_emb"], spk_codes)
    ident = jnp.broadcast_to(p["spk_identity_emb"][None], (bs, 1, seq.shape[-1])).astype(seq.dtype)
    seq = jnp.concatenate([ident, seq], axis=1)
    seq = add_sine_pe(seq, p["pos_alpha"])
    pad = construct_padding_mask(spk_codes[:, :, 0], cfg.codebook_size - 1)
    pad = jnp.concatenate([jnp.zeros((bs, 1), dtype=bool), pad], axis=1)
    out = encoder_stack(p["spk_encoder"], seq, nhead=cfg.n_heads, key_padding_mask=pad)
    return out[:, 0]


def codeclm_forward(p, cfg: CodecLMConfig, tokens, spk_codes=None, spk_vector=None):
    """Full (prefill/parity) forward: (bs, L) tokens -> (bs, L, vocab) logits.

    If ``spk_codes`` or a precomputed ``spk_vector`` is given, it is prepended as
    sequence position 0 and the corresponding output row stripped, exactly like the
    reference (mars5/model.py:109-139).
    """
    x = p["embed"][tokens]
    has_spk = spk_codes is not None or spk_vector is not None
    if has_spk:
        if spk_vector is None:
            spk_vector = spk_embedding(p, cfg, spk_codes)
        x = jnp.concatenate([spk_vector[:, None].astype(x.dtype), x], axis=1)
    positions = jnp.arange(x.shape[1])
    logits, kvs = backbone_forward(p["ar"], x, positions, cfg)
    if has_spk:
        logits = logits[:, 1:]
    return logits


def codeclm_prefill(p, cfg: CodecLMConfig, tokens, spk_vector):
    """Prefill for decode: returns (all logits incl. spk row, stacked kvs).

    ``tokens`` is the (bs, Lp) padded prompt; caller slices the true last-token
    logits and seeds the KV cache from ``kvs`` (n_layers, ...).
    """
    x = p["embed"][tokens]
    x = jnp.concatenate([spk_vector[:, None].astype(x.dtype), x], axis=1)
    positions = jnp.arange(x.shape[1])
    logits, kvs = backbone_forward(p["ar"], x, positions, cfg)
    return logits, kvs


# ----------------------------------------------------------------------------
# initialization (for tests / training-from-scratch; checkpoints use convert.py)

def init_codeclm(key, cfg: CodecLMConfig, dtype=jnp.float32):
    import numpy as np

    def dense(key, out_d, in_d, scale=None):
        scale = scale if scale is not None else (1.0 / np.sqrt(in_d))
        return (jax.random.uniform(key, (out_d, in_d), jnp.float32, -scale, scale)).astype(dtype)

    keys = iter(jax.random.split(key, 200))
    d, hd, nl = cfg.dim, cfg.hidden_dim, cfg.n_layers

    def stack(fn):
        return jnp.stack([fn(next(keys)) for _ in range(nl)])

    layers = {
        "wq": stack(lambda k: dense(k, cfg.n_heads * cfg.head_dim, d)),
        "wk": stack(lambda k: dense(k, cfg.n_kv_heads * cfg.head_dim, d)),
        "wv": stack(lambda k: dense(k, cfg.n_kv_heads * cfg.head_dim, d)),
        "wo": stack(lambda k: dense(k, d, cfg.n_heads * cfg.head_dim)),
        "w1": stack(lambda k: dense(k, hd, d)),
        "w2": stack(lambda k: dense(k, d, hd)),
        "w3": stack(lambda k: dense(k, hd, d)),
        "attention_norm": jnp.ones((nl, d), dtype),
        "ffn_norm": jnp.ones((nl, d), dtype),
    }

    def enc_layer(k):
        ks = jax.random.split(k, 6)
        return {
            "sa_in_w": dense(ks[0], 3 * d, d).reshape(3, d, d),
            "sa_in_b": jnp.zeros((3, d), dtype),
            "sa_out_w": dense(ks[1], d, d), "sa_out_b": jnp.zeros((d,), dtype),
            "WV": jnp.concatenate([dense(ks[2], cfg.spk_hidden_dim, d),
                                   dense(ks[3], cfg.spk_hidden_dim, d)], axis=0),
            "lin2_w": dense(ks[4], d, cfg.spk_hidden_dim), "lin2_b": jnp.zeros((d,), dtype),
            "norm1_w": jnp.ones((d,), dtype), "norm1_b": jnp.zeros((d,), dtype),
            "norm2_w": jnp.ones((d,), dtype), "norm2_b": jnp.zeros((d,), dtype),
        }

    spk_layers = [enc_layer(next(keys)) for _ in range(cfg.n_spk_layers)]
    spk_encoder = {
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *spk_layers),
        "norm_w": jnp.ones((d,), dtype), "norm_b": jnp.zeros((d,), dtype),
    }

    return {
        "embed": jax.random.normal(next(keys), (cfg.n_vocab, d), jnp.float32).astype(dtype),
        "ar": {
            "layers": layers,
            "norm": jnp.ones((d,), dtype),
            "output": dense(next(keys), cfg.n_vocab, d),
        },
        "pos_alpha": jnp.ones((1,), dtype),
        "ref_chunked_emb": jax.random.normal(
            next(keys), (cfg.n_codebooks, cfg.codebook_size, d // cfg.n_codebooks),
            jnp.float32).astype(dtype),
        "spk_identity_emb": jax.random.normal(next(keys), (1, d), jnp.float32).astype(dtype),
        "spk_encoder": spk_encoder,
    }
