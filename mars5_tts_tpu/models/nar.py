"""ResidualTransformer — the ~450M-parameter NAR multinomial-diffusion denoiser.

An encoder-decoder transformer (8 encoder / 16 decoder layers, dim 1024, 16 heads,
SwiGLU FFN 3072) that, given BPE text, a speaker embedding distilled from the full
8-codebook reference codes, a diffusion timestep, and the noisy 8-codebook grid x_t,
predicts per-position per-codebook logits over the 1025 classes of x_0.

Behavioral contract follows the reference ``ResidualTransformer``
(mars5/model.py:163-343):
* CFG conditioning drop zeroes the speaker-code length (and pads the codes),
* encoder input  = [speaker vector] ++ text embeddings, sinusoidal pos-emb after
  the concat, plus the encoder timestep MLP embedding,
* decoder input  = chunked embedding of x_t + pos-emb + decoder timestep MLP,
* output = 8 independent LayerNorm(eps=1e-5)→Linear heads.

Deviation (internal only): we return logits as (bs, L, 8, 1025) — class axis last —
which is what the diffusion engine consumes; the reference returns (bs, L, 1025, 8)
and permutes at the call site (mars5/diffuser.py:358-359).

TPU-first: layers stacked + scanned; CFG cond/uncond run as one batched forward
(batch 2B) in the sampler rather than two sequential calls.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..ops.attention import linear
from ..ops.embeddings import add_sine_pe, chunked_embed, timestep_embedding
from ..ops.norms import layer_norm
from ..utils.masks import length_to_mask
from .layers import decoder_stack, encoder_stack


@dataclass(frozen=True)
class ResidualTransformerConfig:
    n_text_vocab: int
    n_quant: int = 1025             # classes per codebook (1024 + pad)
    dim: int = 1024
    nhead: int = 16
    enc_layers: int = 8
    dec_layers: int = 16
    n_spk_layers: int = 3
    c_quant_levels: int = 8
    pred_quant_levels: int = 8
    t_emb_dim: int = 1024
    hidden_dim: int = 3072          # int(1024 * 4 * 3/4)

    @classmethod
    def mars5(cls, n_text_vocab: int) -> "ResidualTransformerConfig":
        return cls(n_text_vocab=n_text_vocab)

    @classmethod
    def tiny(cls, n_text_vocab: int = 32, n_quant: int = 1025) -> "ResidualTransformerConfig":
        """Matches ``ResidualTransformer(n_text_vocab, n_quant, dim=64, nhead=4,
        enc_layers=2, dec_layers=2, n_spk_layers=2, t_emb_dim=64)`` in the reference
        (dim_ff = int(dim*3) = 192). n_quant stays 1025 because the CFG cond-drop
        pad value 1024 is hardcoded in the reference (mars5/model.py:296)."""
        return cls(n_text_vocab=n_text_vocab, n_quant=n_quant, dim=64, nhead=4,
                   enc_layers=2, dec_layers=2, n_spk_layers=2, t_emb_dim=64,
                   hidden_dim=192)


def nar_spk_embedding(p, cfg: ResidualTransformerConfig, c_codes, c_codes_length):
    """Speaker embedding from reference codes (mars5/model.py:245-261,298-311)."""
    bs, sl = c_codes.shape[0], c_codes.shape[1]
    seq = chunked_embed(p["ref_embedder"], c_codes)
    ident = jnp.broadcast_to(p["spk_identity_emb"][None], (bs, 1, seq.shape[-1])).astype(seq.dtype)
    seq = jnp.concatenate([ident, seq], axis=1)
    seq = add_sine_pe(seq, p["ref_pos_alpha"])
    pad = length_to_mask(c_codes_length + 1, jnp.zeros_like(c_codes_length), sl + 1)
    out = encoder_stack(p["spk_encoder"], seq, nhead=cfg.nhead, key_padding_mask=pad)
    return out[:, 0]


def nar_timestep_mlps(p, t, t_emb_dim: int, dtype):
    """The encoder/decoder timestep MLP embeddings: t (bs,) -> two (bs, dim)."""
    t_emb = timestep_embedding(t, t_emb_dim, dtype=dtype)
    t_enc = linear(jax.nn.silu(linear(t_emb, p["t_enc_mlp"]["w0"], p["t_enc_mlp"]["b0"])),
                   p["t_enc_mlp"]["w1"], p["t_enc_mlp"]["b1"])
    t_dec = linear(jax.nn.silu(linear(t_emb, p["t_dec_mlp"]["w0"], p["t_dec_mlp"]["b0"])),
                   p["t_dec_mlp"]["w1"], p["t_dec_mlp"]["b1"])
    return t_enc, t_dec


def nar_enc_inputs(p, cfg: ResidualTransformerConfig, c_text, c_texts_length, spk):
    """Timestep-independent encoder stream: [spk] ++ text with pos-emb.

    Returns (c (bs, Lt+1, dim), c_padding (bs, Lt+1)). The per-timestep encoder
    input is ``c + t_enc[:, None]`` — the ONLY t-dependence of the whole encoder
    stack, which is what lets the diffusion engine precompute every timestep's
    memory in one batched forward (engine.py).
    """
    text_emb = p["text_embed"][c_text]
    # The reference's per-sample unpad/concat/re-pad (model.py:319-329) is
    # equivalent to this fixed concat because the speaker segment has length 1.
    c = jnp.concatenate([spk[:, None].astype(text_emb.dtype), text_emb], axis=1)
    c_lengths = c_texts_length + 1
    c_padding = length_to_mask(c_lengths, jnp.zeros_like(c_lengths), c.shape[1])
    c = add_sine_pe(c, p["cond_pos_alpha"])
    return c, c_padding


def nar_decoder_apply(p, cfg: ResidualTransformerConfig, x, x_padding_mask, t_dec,
                      memory, c_padding, q_tail_start: int = 0):
    """Decoder stream + stack given a precomputed encoder memory.

    ``q_tail_start``: drop output rows before this index INSIDE the stack
    (final decoder layer runs on the query slice — ulp-level identical kept
    rows; see decoder_stack). Returns (bs, Lx - q_tail_start, dim).
    """
    h = chunked_embed(p["residual_encoder"], x)
    h = add_sine_pe(h, p["pos_alpha"])
    h = h + t_dec[:, None]
    return decoder_stack(p["decoder"], h, memory, nhead=cfg.nhead,
                         tgt_key_padding_mask=x_padding_mask,
                         memory_key_padding_mask=c_padding,
                         q_tail_start=q_tail_start)


def nar_backbone(p, cfg: ResidualTransformerConfig, c_text, c_codes, c_texts_length,
                 c_codes_length, x, x_padding_mask, t, drop_cond=None, spk=None):
    """Denoiser backbone: everything up to (but excluding) the 8 output heads.

    Args:
        c_text: (bs, Lt) BPE text ids (padded).
        c_codes: (bs, Lc, 8) reference codec codes (padded with 1024).
        c_texts_length / c_codes_length: (bs,) true lengths.
        x: (bs, Lx, 8) noisy codes x_t.
        x_padding_mask: (bs, Lx) bool, True = padded.
        t: (bs,) diffusion timesteps.
        drop_cond: optional (bs,) bool — classifier-free-guidance conditioning drop.
        spk: optional precomputed (bs, dim) speaker embedding. The speaker encoder
            is timestep-independent, so the diffusion engine computes it ONCE
            outside the 200-step scan and passes it in (identical numerics —
            same inputs every step).

    Returns:
        (bs, Lx, dim) decoder output (post final LayerNorm).
    """
    if spk is None:
        if drop_cond is not None:
            c_codes_length = jnp.where(drop_cond, 0, c_codes_length)
            c_codes = jnp.where(drop_cond[:, None, None], cfg.n_quant - 1, c_codes)
        spk = nar_spk_embedding(p, cfg, c_codes, c_codes_length)  # (bs, dim)

    dtype = p["text_embed"].dtype
    t_enc, t_dec = nar_timestep_mlps(p, t, cfg.t_emb_dim, dtype)
    c, c_padding = nar_enc_inputs(p, cfg, c_text, c_texts_length, spk)
    memory = encoder_stack(p["encoder"], c + t_enc[:, None], nhead=cfg.nhead,
                           key_padding_mask=c_padding)
    return nar_decoder_apply(p, cfg, x, x_padding_mask, t_dec, memory, c_padding)


def nar_heads(p, cfg: ResidualTransformerConfig, out, lanes=None):
    """The per-codebook output heads: LayerNorm(eps=1e-5) -> Linear(dim -> n_quant).

    Args:
        out: (bs, L, dim) decoder output (any L — the diffusion engine passes a
            frame slice when only part of the grid consumes model logits).
        lanes: optional list of codebook indices to compute (default: all 8).
            In deep-clone inference the masked-known region (prompt frames and
            the AR-pinned L0 lane) never reads x̂0 logits, so the engine requests
            lanes 1..7 only.

    Returns:
        (bs, L, len(lanes), n_quant) logits.
    """
    from ..ops.quant import index_quant, linear_any
    rd = p["residual_decoder"]
    if lanes is None:
        lanes = range(cfg.pred_quant_levels)

    def head(i):
        hn = layer_norm(out, rd["ln_w"][i], rd["ln_b"][i], eps=1e-5)
        return linear_any(hn, index_quant(rd["lin_w"], i), rd["lin_b"][i])

    return jnp.stack([head(i) for i in lanes], axis=2)


def fold_quant_heads(p, cfg: ResidualTransformerConfig, lanes: tuple,
                     pad_to: int | None = None):
    """Fold the per-lane head LayerNorm affines into the quantized head weights.

    The 8 output heads are LN_i(out) @ W_i^T + b_i where every LN_i shares the
    SAME normalization statistics (they all normalize ``out``) and differs only
    in the affine (w_i, b_i). Algebra: with n = (out - mean)/sqrt(var + eps),
        LN_i(out) @ W_i^T + b_i = n @ (W_i ⊙ w_i)^T + (W_i @ b_i + b_i').
    So the serving path computes ONE normalize + ONE activation quant + ONE
    merged GEMM over all requested lanes instead of 7 × (LN + quant + GEMM).
    Quantized (W8A8) path only — the parity path keeps the reference op order
    bit-for-bit (reference: mars5/model.py:233-243 residual_decoder heads).

    Returns {"q": (n_lanes, n_quant, d) int8, "s": f32 scales, "b": f32 biases}
    — folded weights requantized per output row (a trajectory-level precompute;
    XLA hoists it out of the diffusion scan as loop-invariant).
    """
    rd = p["residual_decoder"]
    idx = jnp.asarray(lanes, jnp.int32)
    lw = rd["lin_w"]
    wf = lw["q"][idx].astype(jnp.float32) * lw["s"][idx][..., None]  # (n, N, D)
    lnw = rd["ln_w"][idx].astype(jnp.float32)                        # (n, D)
    lnb = rd["ln_b"][idx].astype(jnp.float32)
    bias = rd["lin_b"][idx].astype(jnp.float32)
    wfold = wf * lnw[:, None, :]
    bfold = jnp.einsum("lnd,ld->ln", wf, lnb) + bias
    amax = jnp.max(jnp.abs(wfold), axis=-1)
    s2 = jnp.maximum(amax, 1e-12) / 127.0
    q2 = jnp.clip(jnp.round(wfold / s2[..., None]), -127, 127).astype(jnp.int8)
    if pad_to is not None and pad_to > q2.shape[1]:
        # pad the class axis to a lane-aligned width for the fused tail kernel
        # (ops/pallas/diffusion_tail.py): pad rows produce logit -1e30
        # (softmax-transparent; the kernel re-masks them before argmax)
        extra = pad_to - q2.shape[1]
        q2 = jnp.pad(q2, ((0, 0), (0, extra), (0, 0)))
        s2 = jnp.pad(s2, ((0, 0), (0, extra)), constant_values=1.0)
        bfold = jnp.pad(bfold, ((0, 0), (0, extra)), constant_values=-1e30)
    return {"q": q2, "s": s2, "b": bfold}


def nar_heads_prequant(out, eps: float = 1e-5):
    """The LN-normalize + act-quant prologue of nar_heads_folded, split out so
    the fused heads+tail kernel (ops/pallas/diffusion_tail.heads_diffusion_tail)
    can take int8 activations and keep the logits VMEM-resident. Bit-matches
    nar_heads_folded's prologue op-for-op.

    Returns (x8 int8, xs f32 (…, 1)).
    """
    from ..ops.quant import quantize_act
    xf = out.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    nrm = ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(out.dtype)
    return quantize_act(nrm)


def nar_heads_folded(folded, out, eps: float = 1e-5, flat: bool = False):
    """Merged-GEMM output heads from fold_quant_heads (W8A8 serving path).

    Args:
        out: (bs, L, d) decoder output slice.
    Returns:
        (bs, L, n_lanes, n_quant) logits in out.dtype.
    """
    from ..ops.quant import quantize_act
    n, nq, d = folded["q"].shape
    xf = out.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    nrm = ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(out.dtype)
    xq, xs = quantize_act(nrm)
    y = jax.lax.dot_general(xq, folded["q"].reshape(n * nq, d),
                            dimension_numbers=(((2,), (1,)), ((), ())),
                            preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * (xs * folded["s"].reshape(n * nq))
    y = y + folded["b"].reshape(n * nq)
    if flat:
        return y.astype(out.dtype)                   # (bs, L, n*nq)
    return y.reshape(*out.shape[:2], n, nq).astype(out.dtype)


def nar_forward(p, cfg: ResidualTransformerConfig, c_text, c_codes, c_texts_length,
                c_codes_length, x, x_padding_mask, t, drop_cond=None, spk=None):
    """Full denoiser forward: backbone + all 8 heads.

    Returns (bs, Lx, 8, n_quant) logits for x_0 (see nar_backbone for args).
    """
    out = nar_backbone(p, cfg, c_text, c_codes, c_texts_length, c_codes_length,
                       x, x_padding_mask, t, drop_cond=drop_cond, spk=spk)
    return nar_heads(p, cfg, out)


# ----------------------------------------------------------------------------
# initialization (tests / training); checkpoints load through convert.py

def init_nar(key, cfg: ResidualTransformerConfig, dtype=jnp.float32):
    import numpy as np

    keys = iter(jax.random.split(key, 400))
    d, f = cfg.dim, cfg.hidden_dim

    def dense(out_d, in_d):
        scale = 1.0 / np.sqrt(in_d)
        return jax.random.uniform(next(keys), (out_d, in_d), jnp.float32, -scale, scale).astype(dtype)

    def enc_layer():
        return {
            "sa_in_w": dense(3 * d, d).reshape(3, d, d),
            "sa_in_b": jnp.zeros((3, d), dtype),
            "sa_out_w": dense(d, d), "sa_out_b": jnp.zeros((d,), dtype),
            "WV": jnp.concatenate([dense(f, d), dense(f, d)], axis=0),
            "lin2_w": dense(d, f), "lin2_b": jnp.zeros((d,), dtype),
            "norm1_w": jnp.ones((d,), dtype), "norm1_b": jnp.zeros((d,), dtype),
            "norm2_w": jnp.ones((d,), dtype), "norm2_b": jnp.zeros((d,), dtype),
        }

    def dec_layer():
        layer = enc_layer()
        layer.update({
            "ca_in_w": dense(3 * d, d).reshape(3, d, d),
            "ca_in_b": jnp.zeros((3, d), dtype),
            "ca_out_w": dense(d, d), "ca_out_b": jnp.zeros((d,), dtype),
            "norm3_w": jnp.ones((d,), dtype), "norm3_b": jnp.zeros((d,), dtype),
        })
        return layer

    def stack(mk, n):
        return jax.tree.map(lambda *xs: jnp.stack(xs), *[mk() for _ in range(n)])

    emb = lambda n, dd: jax.random.normal(next(keys), (n, dd), jnp.float32).astype(dtype)

    return {
        "text_embed": emb(cfg.n_text_vocab, d),
        "cond_pos_alpha": jnp.ones((1,), dtype),
        "pos_alpha": jnp.ones((1,), dtype),
        "ref_pos_alpha": jnp.ones((1,), dtype),
        "encoder": {"layers": stack(enc_layer, cfg.enc_layers),
                    "norm_w": jnp.ones((d,), dtype), "norm_b": jnp.zeros((d,), dtype)},
        "decoder": {"layers": stack(dec_layer, cfg.dec_layers),
                    "norm_w": jnp.ones((d,), dtype), "norm_b": jnp.zeros((d,), dtype)},
        "t_enc_mlp": {"w0": dense(d, cfg.t_emb_dim), "b0": jnp.zeros((d,), dtype),
                      "w1": dense(d, d), "b1": jnp.zeros((d,), dtype)},
        "t_dec_mlp": {"w0": dense(d, cfg.t_emb_dim), "b0": jnp.zeros((d,), dtype),
                      "w1": dense(d, d), "b1": jnp.zeros((d,), dtype)},
        "ref_embedder": emb(cfg.c_quant_levels * cfg.n_quant, d // cfg.c_quant_levels).reshape(
            cfg.c_quant_levels, cfg.n_quant, d // cfg.c_quant_levels),
        "spk_identity_emb": emb(1, d),
        "spk_encoder": {"layers": stack(enc_layer, cfg.n_spk_layers),
                        "norm_w": jnp.ones((d,), dtype), "norm_b": jnp.zeros((d,), dtype)},
        "residual_encoder": emb(cfg.c_quant_levels * cfg.n_quant, d // cfg.c_quant_levels).reshape(
            cfg.c_quant_levels, cfg.n_quant, d // cfg.c_quant_levels),
        "residual_decoder": {
            "ln_w": jnp.ones((cfg.pred_quant_levels, d), dtype),
            "ln_b": jnp.zeros((cfg.pred_quant_levels, d), dtype),
            "lin_w": jnp.stack([dense(cfg.n_quant, d) for _ in range(cfg.pred_quant_levels)]),
            "lin_b": jnp.zeros((cfg.pred_quant_levels, cfg.n_quant), dtype),
        },
    }
