"""Vocos vocoder (charactr/vocos-encodec-24khz), TPU-native.

The reference vocodes through the ``vocos`` pip package
(``Vocos.from_pretrained("charactr/vocos-encodec-24khz")``;
``codes_to_features`` + ``decode(features, bandwidth_id=1)`` at reference
inference.py:119,160-172 — including the deliberate 3 kbps-id smoothing trick on
6 kbps tokens). This module owns that capability in JAX (SURVEY.md §2.10):

* ``codes_to_features`` — sum of per-codebook embedding lookups over the Encodec
  codebooks (vocos pretrained.py).
* ``VocosBackbone`` — Conv1d embed (k7) -> AdaLayerNorm (bandwidth-conditioned)
  -> 8 ConvNeXt-1d blocks (depthwise k7 conv, AdaLayerNorm, 384->1152->384 MLP,
  layer scale, residual) -> final LayerNorm.
* ``ISTFTHead`` — Linear(384 -> n_fft+2) -> exp-magnitude + phase -> framed
  inverse rFFT, Hann-windowed overlap-add with squared-window envelope
  normalization, "same" padding crop (vocos spectral_ops.ISTFT).

Config: input_channels=128, dim=384, intermediate_dim=1152, num_layers=8,
adanorm over 4 bandwidth ids, n_fft=1280, hop=320, 24 kHz output.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class VocosConfig:
    input_channels: int = 128
    dim: int = 384
    intermediate_dim: int = 1152
    num_layers: int = 8
    adanorm_num_embeddings: int = 4
    n_fft: int = 1280
    hop_length: int = 320
    n_codebooks: int = 8            # codebooks addressable by codes_to_features
    codebook_size: int = 1024
    eps: float = 1e-6

    @classmethod
    def mars5(cls) -> "VocosConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "VocosConfig":
        return cls(input_channels=8, dim=16, intermediate_dim=32, num_layers=2,
                   n_fft=64, hop_length=16, n_codebooks=4, codebook_size=32)

    @classmethod
    def infer(cls, params, codebook_size: int = 1024, hop_length: int | None = None) -> "VocosConfig":
        """Derive the config from a parameter pytree's shapes.

        hop_length is not recoverable from weights; defaults to n_fft // 4
        (the released model's 1280/320) unless given.
        """
        dim, input_channels, _ = params["embed_w"].shape
        num_layers = len(params["convnext"])
        intermediate_dim = params["convnext"][0]["pwconv1_w"].shape[0]
        n_adanorm = params["norm"]["scale"].shape[0]
        n_fft = params["head"]["out_w"].shape[0] - 2
        n_codebooks = params["codebook_weights"].shape[0] // codebook_size
        return cls(input_channels=int(input_channels), dim=int(dim),
                   intermediate_dim=int(intermediate_dim), num_layers=num_layers,
                   adanorm_num_embeddings=int(n_adanorm), n_fft=int(n_fft),
                   hop_length=int(hop_length or n_fft // 4),
                   n_codebooks=int(n_codebooks), codebook_size=codebook_size)


def codes_to_features(codebook_weights, codes, bins: int = 1024):
    """(K, T) or (K, B, T) codes -> (B, C, T) features (sum of codebook embeds).

    codebook_weights: (K_total * bins, C) — concatenated Encodec codebooks;
    codebook k uses rows [k*bins, (k+1)*bins) (vocos pretrained.py offsets).
    """
    if codes.ndim == 2:
        codes = codes[:, None]
    k = codes.shape[0]
    offsets = (jnp.arange(k) * bins).reshape(k, 1, 1)
    emb = codebook_weights[codes + offsets]      # (K, B, T, C)
    return emb.sum(axis=0).transpose(0, 2, 1)    # (B, C, T)


def _ada_layer_norm(p, x, cond_id, eps: float):
    """AdaLayerNorm: plain LN (no affine) scaled/shifted by cond embeddings.

    x: (B, T, C); p: {"scale": (n_emb, C), "shift": (n_emb, C)}.
    """
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    xn = (x - mean) * jax.lax.rsqrt(var + eps)
    return xn * p["scale"][cond_id][None, None, :] + p["shift"][cond_id][None, None, :]


def _layer_norm(x, w, b, eps: float):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * w + b


def convnext_block(p, x, cond_id, cfg: VocosConfig):
    """x: (B, C, T) -> (B, C, T)."""
    residual = x
    h = jax.lax.conv_general_dilated(
        x, p["dwconv_w"], (1,), [(3, 3)], feature_group_count=cfg.dim,
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32).astype(x.dtype)
    h = h + p["dwconv_b"][None, :, None]
    h = h.transpose(0, 2, 1)  # (B, T, C)
    h = _ada_layer_norm(p["norm"], h, cond_id, cfg.eps)
    h = h @ p["pwconv1_w"].T + p["pwconv1_b"]
    h = jax.nn.gelu(h, approximate=False)
    h = h @ p["pwconv2_w"].T + p["pwconv2_b"]
    h = p["gamma"] * h
    return residual + h.transpose(0, 2, 1)


def backbone_forward(p, cfg: VocosConfig, features, bandwidth_id):
    """features: (B, C_in, T) -> (B, T, dim)."""
    x = jax.lax.conv_general_dilated(
        features, p["embed_w"], (1,), [(3, 3)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32).astype(features.dtype)
    x = x + p["embed_b"][None, :, None]
    x = _ada_layer_norm(p["norm"], x.transpose(0, 2, 1), bandwidth_id, cfg.eps).transpose(0, 2, 1)
    for block in p["convnext"]:
        x = convnext_block(block, x, bandwidth_id, cfg)
    x = x.transpose(0, 2, 1)
    return _layer_norm(x, p["final_ln_w"], p["final_ln_b"], cfg.eps)


def istft_same(spec, n_fft: int, hop_length: int, window):
    """Inverse STFT with "same" padding (vocos spectral_ops.ISTFT).

    spec: complex (B, n_fft//2+1, T). Returns (B, (T-1)*hop) audio — framed
    irfft, windowed overlap-add, squared-window envelope normalization, then
    crop of (n_fft - hop)//2 samples on both sides.
    """
    pad = (n_fft - hop_length) // 2
    frames = jnp.fft.irfft(spec, n=n_fft, axis=1)      # (B, n_fft, T)
    frames = frames * window[None, :, None]
    b, _, t = frames.shape
    out_len = (t - 1) * hop_length + n_fft

    if n_fft % hop_length == 0:
        # shift-and-add fold: split each frame into r = n_fft/hop hop-sized
        # segments; segment s of frame t lands at output chunk t+s, so the
        # whole overlap-add is r staggered (T, hop) adds. The scatter-based
        # general path below serializes on the TPU (2x ~13 ms per call at
        # bench geometry); this is ~0.1 ms of vector adds.
        r = n_fft // hop_length
        chunks = jnp.zeros((b, t + r - 1, hop_length), frames.dtype)
        env_chunks = jnp.zeros((t + r - 1, hop_length), frames.dtype)
        w2 = (window * window).reshape(r, hop_length)
        for s in range(r):
            seg = frames[:, s * hop_length:(s + 1) * hop_length, :]  # (B, hop, T)
            chunks = chunks.at[:, s:s + t].add(seg.transpose(0, 2, 1))
            env_chunks = env_chunks.at[s:s + t].add(
                jnp.broadcast_to(w2[s][None], (t, hop_length)))
        audio = chunks.reshape(b, out_len)
        env = env_chunks.reshape(out_len)
    else:  # pragma: no cover - MARS5's vocos always has n_fft = 4*hop
        idx = (jnp.arange(t)[:, None] * hop_length
               + jnp.arange(n_fft)[None, :])            # (T, n_fft)
        audio = jnp.zeros((b, out_len), frames.dtype)
        audio = audio.at[:, idx].add(frames.transpose(0, 2, 1))
        env = jnp.zeros((out_len,), frames.dtype)
        env = env.at[idx].add((window * window)[None, :].repeat(t, axis=0))
    audio = audio / jnp.maximum(env, 1e-11)[None]
    return audio[:, pad:-pad]


def istft_head(p, x, cfg: VocosConfig):
    """x: (B, T, dim) -> (B, samples) audio."""
    h = x @ p["out_w"].T + p["out_b"]          # (B, T, n_fft + 2)
    h = h.transpose(0, 2, 1)                    # (B, n_fft+2, T)
    mag, phase = jnp.split(h, 2, axis=1)
    mag = jnp.exp(jnp.clip(mag, max=1e2))
    spec = mag * jax.lax.complex(jnp.cos(phase), jnp.sin(phase))
    window = jnp.asarray(np.hanning(cfg.n_fft + 1)[:-1].astype(np.float32))
    return istft_same(spec, cfg.n_fft, cfg.hop_length, window)


@functools.partial(jax.jit, static_argnames=("cfg", "bandwidth_id"))
def vocos_decode(p, cfg: VocosConfig, features, bandwidth_id: int):
    """features (B, C_in, T) + bandwidth id -> (B, samples) 24 kHz audio. Jitted."""
    x = backbone_forward(p, cfg, features, bandwidth_id)
    return istft_head(p["head"], x, cfg)


def vocos_vocode(p, cfg: VocosConfig, tokens, bandwidth_id: int = 1,
                 pcm16: bool = False):
    """(T, n_q) token grid -> (samples,) audio — the reference Mars5TTS.vocode,
    including the bandwidth_id=1 (3 kbps) smoothing trick on 6 kbps tokens
    (inference.py:160-172).

    ``pcm16``: quantize to int16 PCM on-device (the WAV wire format). Halves
    the device->host transfer — which dominates the vocode stage wall time on
    hosts with modest interconnect (device compute is ~1 ms) — at standard
    96 dB PCM fidelity.
    """
    features = codes_to_features(p["codebook_weights"], tokens.T,
                                 bins=cfg.codebook_size)
    audio = vocos_decode(p, cfg, features, bandwidth_id)[0]
    if pcm16:
        return _to_pcm16(audio)
    return audio


@jax.jit
def _to_pcm16(audio):
    return jnp.clip(jnp.round(audio * 32767.0), -32768, 32767).astype(jnp.int16)


# ----------------------------------------------------------------------------
# conversion from the vocos checkpoint naming

def convert_vocos(sd, cfg: VocosConfig = VocosConfig()):
    """vocos-encodec-24khz state_dict -> pytree.

    Expects keys: backbone.embed.{weight,bias}, backbone.norm.{scale,shift}.weight,
    backbone.convnext.{i}.(dwconv.{weight,bias} | norm.{scale,shift}.weight |
    pwconv1/2.{weight,bias} | gamma), backbone.final_layer_norm.{weight,bias},
    head.out.{weight,bias}, and the Encodec quantizer codebooks
    (feature_extractor.encodec.quantizer.vq.layers.{k}._codebook.embed).
    """
    def a(k):
        v = sd[k]
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return np.asarray(v, np.float32)

    blocks = []
    for i in range(cfg.num_layers):
        pre = f"backbone.convnext.{i}"
        blocks.append({
            "dwconv_w": a(f"{pre}.dwconv.weight"), "dwconv_b": a(f"{pre}.dwconv.bias"),
            "norm": {"scale": a(f"{pre}.norm.scale.weight"),
                     "shift": a(f"{pre}.norm.shift.weight")},
            "pwconv1_w": a(f"{pre}.pwconv1.weight"), "pwconv1_b": a(f"{pre}.pwconv1.bias"),
            "pwconv2_w": a(f"{pre}.pwconv2.weight"), "pwconv2_b": a(f"{pre}.pwconv2.bias"),
            "gamma": a(f"{pre}.gamma"),
        })

    codebooks = np.concatenate([
        a(f"feature_extractor.encodec.quantizer.vq.layers.{k}._codebook.embed")
        for k in range(cfg.n_codebooks)], axis=0)

    return {
        "embed_w": a("backbone.embed.weight"), "embed_b": a("backbone.embed.bias"),
        "norm": {"scale": a("backbone.norm.scale.weight"),
                 "shift": a("backbone.norm.shift.weight")},
        "convnext": blocks,
        "final_ln_w": a("backbone.final_layer_norm.weight"),
        "final_ln_b": a("backbone.final_layer_norm.bias"),
        "head": {"out_w": a("head.out.weight"), "out_b": a("head.out.bias")},
        "codebook_weights": codebooks,
    }


def init_vocos(key, cfg: VocosConfig):
    """Random init (tests only)."""
    keys = iter(jax.random.split(key, 64))

    def dense(o, i):
        return jax.random.normal(next(keys), (o, i)) * (1.0 / np.sqrt(i))

    blocks = []
    for _ in range(cfg.num_layers):
        blocks.append({
            "dwconv_w": jax.random.normal(next(keys), (cfg.dim, 1, 7)) * 0.2,
            "dwconv_b": jnp.zeros((cfg.dim,)),
            "norm": {"scale": jnp.ones((cfg.adanorm_num_embeddings, cfg.dim)),
                     "shift": jnp.zeros((cfg.adanorm_num_embeddings, cfg.dim))},
            "pwconv1_w": dense(cfg.intermediate_dim, cfg.dim),
            "pwconv1_b": jnp.zeros((cfg.intermediate_dim,)),
            "pwconv2_w": dense(cfg.dim, cfg.intermediate_dim),
            "pwconv2_b": jnp.zeros((cfg.dim,)),
            "gamma": jnp.full((cfg.dim,), 1.0 / cfg.num_layers),
        })
    return {
        "embed_w": jax.random.normal(next(keys), (cfg.dim, cfg.input_channels, 7)) * 0.1,
        "embed_b": jnp.zeros((cfg.dim,)),
        "norm": {"scale": jnp.ones((cfg.adanorm_num_embeddings, cfg.dim)),
                 "shift": jnp.zeros((cfg.adanorm_num_embeddings, cfg.dim))},
        "convnext": blocks,
        "final_ln_w": jnp.ones((cfg.dim,)), "final_ln_b": jnp.zeros((cfg.dim,)),
        "head": {"out_w": dense(cfg.n_fft + 2, cfg.dim),
                 "out_b": jnp.zeros((cfg.n_fft + 2,))},
        "codebook_weights": jax.random.normal(
            next(keys), (cfg.n_codebooks * cfg.codebook_size, cfg.input_channels)),
    }
