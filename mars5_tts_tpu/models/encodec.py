"""Encodec 24 kHz encoder + residual vector quantizer, TPU-native.

The reference delegates reference-audio featurization to Meta's ``encodec`` pip
package (``EncodecModel.encodec_model_24khz()`` at 6 kbps -> 8 codebooks x 1024 @
75 Hz; wired at reference inference.py:87-88,233). This module reimplements the
*encoder-side* capability in JAX (SURVEY.md §2.9): the decoder is not needed
(Vocos replaces it).

Architecture (encodec_model_24khz, causal, weight-norm folded at load):
  SConv1d(1->32, k7)
  for ratio in [2, 4, 5, 8]:
      ResnetBlock(dim): ELU -> conv(dim->dim/2, k3) -> ELU -> conv(dim/2->dim, k1),
                        shortcut conv(dim->dim, k1)            [true_skip=False]
      ELU -> SConv1d(dim -> 2*dim, k=2*ratio, stride=ratio)
  2-layer LSTM(512) with residual skip
  ELU -> SConv1d(512 -> 128, k7)
then an 8-stage residual VQ: per stage, nearest-neighbor (L2) lookup in a
(1024, 128) codebook, subtract, continue on the residual.

Causal padding follows encodec's SConv1d exactly: left-pad ``(k-1)*dilation -
(stride-1)`` in reflect mode, plus right zero "extra padding" so the final
partial frame is covered.

All convs run as ``lax.conv_general_dilated`` (MXU); the LSTM is a ``lax.scan``
(the one latency-bound serial piece — SURVEY.md §7 "Hard parts"); RVQ argmin is a
batched matmul + argmax (distance expansion), bit-stable in fp32.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class EncodecConfig:
    channels: int = 1
    dimension: int = 128
    n_filters: int = 32
    ratios: tuple = (8, 5, 4, 2)      # decoder order; encoder uses reversed
    kernel_size: int = 7
    last_kernel_size: int = 7
    residual_kernel_size: int = 3
    compress: int = 2
    lstm_layers: int = 2
    n_q: int = 8
    codebook_size: int = 1024
    sample_rate: int = 24000

    @property
    def hop_length(self) -> int:
        return int(np.prod(self.ratios))  # 320 -> 75 Hz at 24 kHz

    @classmethod
    def mars5(cls) -> "EncodecConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "EncodecConfig":
        return cls(dimension=16, n_filters=4, ratios=(4, 2), n_q=4, codebook_size=32)

    @classmethod
    def infer(cls, params) -> "EncodecConfig":
        """Derive the config from a parameter pytree's shapes."""
        n_filters = params["init"]["w"].shape[0]
        kernel_size = params["init"]["w"].shape[-1]
        ratios = tuple(int(s["down"]["w"].shape[-1]) // 2 for s in params["stages"])[::-1]
        dimension = params["final"]["w"].shape[0]
        last_kernel = params["final"]["w"].shape[-1]
        n_q, codebook_size, _ = params["codebooks"].shape
        lstm_layers = len(params["lstm"]["layers"])
        return cls(dimension=int(dimension), n_filters=int(n_filters),
                   ratios=ratios, kernel_size=int(kernel_size),
                   last_kernel_size=int(last_kernel), lstm_layers=lstm_layers,
                   n_q=int(n_q), codebook_size=int(codebook_size))


def _conv1d(x, w, b, stride: int = 1, dilation: int = 1, groups: int = 1):
    """x: (B, C, T); w: (out, in/groups, K) torch layout."""
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding="VALID",
        rhs_dilation=(dilation,), feature_group_count=groups,
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b[None, :, None]
    return y.astype(x.dtype)


def _causal_pad(x, kernel: int, stride: int, dilation: int):
    """encodec SConv1d causal padding (conv.py pad1d semantics).

    Left ``padding_total`` and right ``extra_padding`` are applied in ONE
    reflect pad — the trailing pad that covers the final partial frame is
    REFLECT, not zeros (caught by tests/test_codec_oracle.py full-model parity
    on non-hop-multiple lengths). Inputs shorter than the pad are zero-extended
    first and the extension cropped after, exactly like pad1d.
    """
    length = x.shape[-1]
    eff_k = (kernel - 1) * dilation + 1
    padding_total = eff_k - stride
    n_frames = (length - eff_k + padding_total) / stride + 1
    ideal_length = (int(np.ceil(n_frames)) - 1) * stride + (eff_k - padding_total)
    extra_padding = max(ideal_length - length, 0)
    max_pad = max(padding_total, extra_padding)
    if length <= max_pad:
        ext = max_pad - length + 1
        x = jnp.pad(x, ((0, 0), (0, 0), (0, ext)))
        x = jnp.pad(x, ((0, 0), (0, 0), (padding_total, extra_padding)),
                    mode="reflect")
        return x[..., : x.shape[-1] - ext]
    return jnp.pad(x, ((0, 0), (0, 0), (padding_total, extra_padding)),
                   mode="reflect")


def sconv1d(p, x, stride: int = 1, dilation: int = 1):
    """Causal padded conv, weight-norm already folded into p['w']."""
    kernel = p["w"].shape[-1]
    x = _causal_pad(x, kernel, stride, dilation)
    return _conv1d(x, p["w"], p.get("b"), stride=stride, dilation=dilation)


def _lstm_layer(p, x):
    """Single torch-compatible LSTM layer over (T, B, C) via lax.scan.

    p: w_ih (4H, C), w_hh (4H, H), b_ih (4H,), b_hh (4H,). Gate order i,f,g,o.
    """
    hidden = p["w_hh"].shape[-1]
    t_len, bs = x.shape[0], x.shape[1]
    x_proj = jnp.einsum("tbc,gc->tbg", x, p["w_ih"]) + p["b_ih"] + p["b_hh"]

    def step(carry, xt):
        h, c = carry
        gates = xt + h @ p["w_hh"].T
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    init = (jnp.zeros((bs, hidden), x.dtype), jnp.zeros((bs, hidden), x.dtype))
    _, hs = jax.lax.scan(step, init, x_proj)
    return hs


def slstm(p, x):
    """encodec SLSTM: 2-layer LSTM with residual skip. x: (B, C, T)."""
    h = x.transpose(2, 0, 1)  # (T, B, C)
    for layer_p in p["layers"]:
        h = _lstm_layer(layer_p, h)
    h = h + x.transpose(2, 0, 1)
    return h.transpose(1, 2, 0)


def encoder_forward(p, cfg: EncodecConfig, audio):
    """audio: (B, 1, T) float in [-1, 1] -> embeddings (B, dimension, T/hop)."""
    x = sconv1d(p["init"], audio)
    for stage, ratio in zip(p["stages"], reversed(cfg.ratios)):
        res = stage["res"]
        h = jax.nn.elu(x)
        h = sconv1d(res["conv1"], h, dilation=1)
        h = jax.nn.elu(h)
        h = sconv1d(res["conv2"], h)
        x = sconv1d(res["shortcut"], x) + h
        x = jax.nn.elu(x)
        x = sconv1d(stage["down"], x, stride=ratio)
    x = slstm(p["lstm"], x)
    x = jax.nn.elu(x)
    x = sconv1d(p["final"], x)
    return x


def rvq_encode(codebooks, emb, n_q: int):
    """Residual VQ: (B, D, T) embeddings -> (B, n_q, T) int32 codes.

    codebooks: (n_q_total, bins, D). Nearest neighbor by L2, expanded as
    ``argmax(2 x·e - ||e||²)`` in fp32 (the ||x||² term is code-independent),
    matching encodec's EuclideanCodebook distance (quantization/core_vq.py).
    """
    x = emb.transpose(0, 2, 1).astype(jnp.float32)  # (B, T, D)
    codes = []
    residual = x
    for q in range(n_q):
        e = codebooks[q].astype(jnp.float32)  # (bins, D)
        dots = jnp.einsum("btd,nd->btn", residual, e,
                          preferred_element_type=jnp.float32)
        dist = 2.0 * dots - jnp.sum(e * e, axis=-1)[None, None, :]
        idx = jnp.argmax(dist, axis=-1).astype(jnp.int32)
        residual = residual - e[idx]
        codes.append(idx)
    return jnp.stack(codes, axis=1)


def encodec_encode(p, cfg: EncodecConfig, audio):
    """Full encode path: (B, 1, T) audio -> (B, n_q, frames) codes @ 75 Hz.

    Jitted (one XLA program per audio-length bucket); cfg is static.
    ``audio`` may be int16 PCM — scaled to float in-graph, so PCM16 sources
    (WAV) upload at half the bytes (host->device transfer dominates this
    stage's wall time on modest interconnects).
    """
    return _encodec_encode_jit(p, cfg, audio)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _encodec_encode_jit(p, cfg: EncodecConfig, audio):
    if audio.dtype == jnp.int16:
        audio = audio.astype(jnp.float32) / 32768.0
    emb = encoder_forward(p, cfg, audio)
    return rvq_encode(p["codebooks"], emb, cfg.n_q)


# ----------------------------------------------------------------------------
# conversion from the official encodec checkpoint naming

def _fold_weight_norm(sd, prefix):
    """encodec stores convs as weight_g/weight_v; fold to a plain kernel."""
    import numpy as np
    if f"{prefix}.weight_g" in sd:
        g = np.asarray(sd[f"{prefix}.weight_g"], np.float32)
        v = np.asarray(sd[f"{prefix}.weight_v"], np.float32)
        norm = np.sqrt((v ** 2).sum(axis=(1, 2), keepdims=True))
        w = g * v / norm
    else:
        w = np.asarray(sd[f"{prefix}.weight"], np.float32)
    out = {"w": w}
    if f"{prefix}.bias" in sd:
        out["b"] = np.asarray(sd[f"{prefix}.bias"], np.float32)
    return out


def convert_encodec(sd, cfg: EncodecConfig = EncodecConfig()):
    """Official ``encodec_24khz`` state_dict -> encoder+quantizer pytree.

    Layer indices follow SEANetEncoder.model's sequential layout:
    0: init conv; then per stage i (4 stages): 3i+1 resnet block, 3i+3 downsample
    (ELUs hold no params but occupy indices); 13: LSTM; 15: final conv.
    """
    def conv(i, sub="conv.conv"):
        return _fold_weight_norm(sd, f"encoder.model.{i}.{sub}")

    stages = []
    mult = 1
    idx = 1
    for ratio in reversed(cfg.ratios):
        stages.append({
            "res": {
                "conv1": _fold_weight_norm(sd, f"encoder.model.{idx}.block.1.conv.conv"),
                "conv2": _fold_weight_norm(sd, f"encoder.model.{idx}.block.3.conv.conv"),
                "shortcut": _fold_weight_norm(sd, f"encoder.model.{idx}.shortcut.conv.conv"),
            },
            "down": conv(idx + 2),
        })
        idx += 3
        mult *= 2

    lstm_layers = []
    for l in range(cfg.lstm_layers):
        lstm_layers.append({
            "w_ih": np.asarray(sd[f"encoder.model.{idx}.lstm.weight_ih_l{l}"], np.float32),
            "w_hh": np.asarray(sd[f"encoder.model.{idx}.lstm.weight_hh_l{l}"], np.float32),
            "b_ih": np.asarray(sd[f"encoder.model.{idx}.lstm.bias_ih_l{l}"], np.float32),
            "b_hh": np.asarray(sd[f"encoder.model.{idx}.lstm.bias_hh_l{l}"], np.float32),
        })

    codebooks = np.stack([
        np.asarray(sd[f"quantizer.vq.layers.{q}._codebook.embed"], np.float32)
        for q in range(cfg.n_q)])

    return {
        "init": conv(0),
        "stages": stages,
        "lstm": {"layers": lstm_layers},
        "final": conv(idx + 2),
        "codebooks": codebooks,
    }


def init_encodec(key, cfg: EncodecConfig):
    """Random init (tests only; real use converts the official checkpoint)."""
    keys = iter(jax.random.split(key, 64))

    def conv(out_c, in_c, k):
        w = jax.random.normal(next(keys), (out_c, in_c, k)) * (1.0 / np.sqrt(in_c * k))
        return {"w": w, "b": jnp.zeros((out_c,))}

    stages = []
    mult = 1
    nf = cfg.n_filters
    for ratio in reversed(cfg.ratios):
        d = mult * nf
        stages.append({
            "res": {
                "conv1": conv(d // cfg.compress, d, cfg.residual_kernel_size),
                "conv2": conv(d, d // cfg.compress, 1),
                "shortcut": conv(d, d, 1),
            },
            "down": conv(d * 2, d, ratio * 2),
        })
        mult *= 2
    d = mult * nf
    lstm = {"layers": [
        {"w_ih": jax.random.normal(next(keys), (4 * d, d)) * 0.05,
         "w_hh": jax.random.normal(next(keys), (4 * d, d)) * 0.05,
         "b_ih": jnp.zeros((4 * d,)), "b_hh": jnp.zeros((4 * d,))}
        for _ in range(cfg.lstm_layers)]}
    return {
        "init": conv(nf, cfg.channels, cfg.kernel_size),
        "stages": stages,
        "lstm": lstm,
        "final": conv(cfg.dimension, d, cfg.last_kernel_size),
        "codebooks": jax.random.normal(next(keys), (cfg.n_q, cfg.codebook_size, cfg.dimension)),
    }
