"""Fused-kernel AR decode engine: int8 megakernel decode for bs=1 serving.

Production single-stream decode path: prefill runs through the bf16 XLA graph
(models/ar.codeclm_prefill), then every generated token goes through ONE Pallas
program (ops/pallas/decode_layer.fused_decode_layers) that streams the whole
int8-quantized backbone + ring KV cache through VMEM once. The output head
(int8, XLA), final RMSNorm, the reference logit pipeline, and inverse-CDF
sampling are shared with the XLA engine (models/ar_decode). Reference semantics
follow mars5/ar_generate.py:15-165; numeric contract (W8A8 per-token dynamic
quantization) is characterized by tests/test_quant.py token-divergence gates.

Batched serving keeps the XLA engine; this path exists to win the bs=1 latency
benchmark (BASELINE configs #1/#2) where the ~470 GB/s practical HBM bandwidth
of the chip — not compute — bounds tokens/s.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.pallas import enabled as pallas_enabled
from ..ops.pallas.decode_layer import (FusedDims, build_fused_pack,
                                       fused_decode_layers,
                                       fused_step_emulation, make_dims,
                                       quantize_kv_rows)
from ..ops.quant import quantize_weight, linear_q8
from ..ops.norms import rms_norm
from .ar import CodecLMConfig, codeclm_prefill, spk_embedding
from .ar_decode import ArSampling, _sample_and_update, DecodeState


class FusedState(NamedTuple):
    tokens: jax.Array      # (1, max_len) int32
    cur: jax.Array         # (1,)
    n_gen: jax.Array       # (1,)
    cache_k: jax.Array     # (L, W_pad, d) int8 — layer-flat fused layout
    cache_v: jax.Array     # (L, W_pad, d) int8
    kv_scales: jax.Array   # (L, 2, W_pad) f32 per-position K/V dequant scales
    counts: jax.Array      # (1, V)
    uniforms: jax.Array    # (max_len, 1)
    est_len: jax.Array     # (1,)
    done: jax.Array        # (1,)


def prepare_fused(params, cfg: CodecLMConfig, max_len: int, wbits: int = 8):
    """Build the decode-time bundle: quantized pack + head + embed/norm.

    ``params`` are the raw (bf16) CodecLM params; returns (bundle, dims).
    ``wbits``: backbone weight precision — 8 (default, W8A8) or 4
    (nibble-packed int4 weights, halves the dominant weight stream; quality
    characterized in tests/test_quant.py + scripts/bench_quality_modes.py).
    """
    dims = make_dims(cfg, max_len, wbits=wbits)
    fp = build_fused_pack(params, cfg, dims)
    hq, hs = quantize_weight(params["ar"]["output"], axis=-1)
    fp["head_q"], fp["head_s"] = hq, hs.astype(jnp.float32)
    fp["final_norm"] = params["ar"]["norm"]
    fp["embed"] = params["embed"]
    return fp, dims


def _fused_backbone_step(fp, dims: FusedDims, cfg: CodecLMConfig, token, pos,
                         cache_k, cache_v, kv_scales, interpret: bool):
    """One-token forward: embed -> megakernel -> final norm -> int8 head."""
    x = fp["embed"][token].astype(jnp.bfloat16)         # (1, d)
    x = jnp.concatenate([x, jnp.zeros((7, dims.dim), jnp.bfloat16)], axis=0)
    if interpret is None:  # pure-jnp emulation (CPU test oracle)
        h, k_new, v_new = fused_step_emulation(
            fp, x, pos, cache_k, cache_v, kv_scales, dims=dims,
            norm_eps=cfg.norm_eps)
    else:
        h, k_new, v_new = fused_decode_layers(
            fp, x, pos, cache_k, cache_v, kv_scales, dims=dims,
            norm_eps=cfg.norm_eps, interpret=interpret)
    h = rms_norm(h[0:1].astype(jnp.bfloat16), fp["final_norm"], cfg.norm_eps)
    logits = linear_q8(h, fp["head_q"], fp["head_s"]).astype(jnp.float32)
    slot = jnp.mod(pos, dims.window)
    k8, ks_new = quantize_kv_rows(k_new)      # (L, 1, d) -> (L, 1)
    v8, vs_new = quantize_kv_rows(v_new)
    cache_k = jax.lax.dynamic_update_slice(cache_k, k8, (0, slot, 0))
    cache_v = jax.lax.dynamic_update_slice(cache_v, v8, (0, slot, 0))
    s_new = jnp.concatenate([ks_new, vs_new], axis=1)[:, :, None]  # (L, 2, 1)
    kv_scales = jax.lax.dynamic_update_slice(kv_scales, s_new, (0, 0, slot))
    return logits, cache_k, cache_v, kv_scales


def _fused_body(fp, dims, cfg, s: ArSampling, st: FusedState,
                interpret) -> FusedState:
    last_tok = st.tokens[0, (st.cur[0] - 1).clip(0)]
    logits, ck, cv, kvs = _fused_backbone_step(
        fp, dims, cfg, last_tok[None], st.cur[0], st.cache_k, st.cache_v,
        st.kv_scales, interpret)
    st = st._replace(cache_k=ck, cache_v=cv, kv_scales=kvs)
    # reuse the shared sampling pipeline via the DecodeState duck-type
    upd = _sample_and_update(logits, st, s)
    return upd


@functools.partial(jax.jit, static_argnames=("cfg", "dims", "s", "interpret"))
def _generate_fused_jit(params, fp, cfg: CodecLMConfig, dims: FusedDims,
                        s: ArSampling, prompt_padded, prompt_len, spk_codes,
                        uniforms, est_len, interpret=False):
    # ---- prefill through the bf16 XLA graph (one pass, batched matmuls) ----
    spk_vec = spk_embedding(params, cfg, spk_codes)
    all_logits, kvs = codeclm_prefill(params, cfg, prompt_padded, spk_vec)
    k_full, v_full = kvs                     # (L, 1, Pb+1, H, D)
    pb = prompt_padded.shape[1]
    d = dims.dim
    k_flat = k_full[:, 0].reshape(dims.n_layers, pb + 1, d)
    v_flat = v_full[:, 0].reshape(dims.n_layers, pb + 1, d)
    k8, ks = quantize_kv_rows(k_flat)        # (L, Pb+1, d), (L, Pb+1)
    v8, vs = quantize_kv_rows(v_flat)
    cache_k = jnp.zeros((dims.n_layers, dims.w_pad, d), jnp.int8)
    cache_v = jnp.zeros_like(cache_k)
    cache_k = cache_k.at[:, : pb + 1].set(k8)
    cache_v = cache_v.at[:, : pb + 1].set(v8)
    kv_scales = jnp.zeros((dims.n_layers, 2, dims.w_pad), jnp.float32)
    kv_scales = kv_scales.at[:, 0, : pb + 1].set(ks)
    kv_scales = kv_scales.at[:, 1, : pb + 1].set(vs)

    last_logits = jnp.take_along_axis(
        all_logits, prompt_len[:, None, None], axis=1)[:, 0].astype(jnp.float32)

    tokens = jnp.zeros((1, s.max_len), jnp.int32)
    tokens = jax.lax.dynamic_update_slice(tokens, prompt_padded.astype(jnp.int32), (0, 0))
    st = FusedState(
        tokens=tokens, cur=prompt_len.astype(jnp.int32),
        n_gen=jnp.zeros((1,), jnp.int32), cache_k=cache_k, cache_v=cache_v,
        kv_scales=kv_scales,
        counts=jnp.zeros((1, cfg.n_vocab), jnp.int32), uniforms=uniforms,
        est_len=est_len.astype(jnp.int32), done=jnp.zeros((1,), bool))
    st = _sample_and_update(last_logits, st, s)

    final = jax.lax.while_loop(
        lambda t: ~jnp.all(t.done),
        lambda t: _fused_body(fp, dims, cfg, s, t, interpret),
        st)
    return final.tokens, final.cur, final.n_gen


def ar_generate_fused(params, fp, cfg: CodecLMConfig, dims: FusedDims, prompt,
                      spk_codes, *, sampling: ArSampling, uniforms=None,
                      seed: int = 0, interpret=False):
    """bs=1 generation via the fused int8 decode kernel (reference-shaped API).

    ``interpret``: False = compiled kernel (TPU), True = Pallas interpreter
    (CPU tests), None = pure-jnp emulation (oracle).
    """
    prompt = np.asarray(prompt)
    window = dims.window
    if len(prompt) + 1 > window:
        raise ValueError(f"prompt length {len(prompt)} exceeds window {window}")
    prompt_padded = jnp.asarray(prompt, jnp.int32)[None]
    prompt_len = jnp.asarray([len(prompt)], jnp.int32)
    spk = jnp.asarray(spk_codes, jnp.int32)[None]
    if uniforms is None:
        uniforms = jax.random.uniform(jax.random.PRNGKey(seed),
                                      (sampling.max_len, 1))
    else:
        uniforms = jnp.asarray(uniforms, jnp.float32)
        if uniforms.ndim == 1:
            uniforms = uniforms[:, None]
    est = jnp.full((1,), sampling.n_phones_gen, jnp.int32)
    tokens, final_len, n_gen = _generate_fused_jit(
        params, fp, cfg, dims, sampling, prompt_padded, prompt_len, spk,
        uniforms, est, interpret=interpret)
    tokens = np.asarray(tokens)
    return tokens[0, : int(final_len[0])], int(n_gen[0])
