"""AR decode engine: KV-cached autoregressive generation as one jitted program.

TPU-native redesign of the reference decode loop (mars5/ar_generate.py:15-165).
The reference runs a Python while-loop calling the model per token; here the whole
generation — prefill, ring-buffer KV cache, per-step logit pipeline (frequency/
presence penalty over a sliding window, vocab masking, early-EOS penalty,
temperature, top-k/top-p, typical-p), inverse-CDF sampling, and EOS early-exit —
compiles to a single ``lax.while_loop`` with static shapes. Python re-enters only
to read the result.

Cache layout: (n_layers, bs, window, n_kv_heads, head_dim) ring buffer written at
``position % window``. For a current position p, the ring slot s holds position
``p - ((p - s) mod window)``; slots with negative values (not yet written, or
prefill padding junk ahead of the cursor) are masked out. Within the window this
reproduces the reference's rotating cache exactly; past the window it implements
the *correct* sliding-window semantics (the reference's unrotated read,
mars5/nn_future.py:258-259, is only valid below the window — SURVEY.md §2.4).

Sequence convention (matches CodecLM): position 0 is the speaker embedding, token
i sits at position i + 1. ``cur`` counts tokens, so the next token is decoded at
position ``cur``, reading the token at index ``cur - 1``.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import linear
from ..ops.norms import rms_norm
from ..ops.rope import apply_rope, rope_angles
from ..ops.sampling import (apply_typical_p, early_eos_penalty,
                            freq_presence_penalty, mask_vocab_window,
                            sample_from_logprobs, top_k_top_p_filter)
from .ar import CodecLMConfig, codeclm_prefill, spk_embedding


@dataclass(frozen=True)
class ArSampling:
    """Static sampling hyperparameters for one generation (from InferenceConfig)."""

    temperature: float = 0.7
    top_k: int = 200
    top_p: float = 0.2
    typical_p: float = 1.0
    alpha_frequency: float = 3.0
    alpha_presence: float = 0.4
    penalty_window: int = 80
    eos_penalty_decay: float = 0.5
    eos_penalty_factor: float = 1.0
    # dynamic in spirit but static per call (computed from len(text)):
    n_phones_gen: int = 0
    eos_idx: int = 0
    valid_start: int = 0          # len(texttok.vocab)
    valid_end: int = 0            # valid_start + len(speechtok.vocab) + 1
    max_len: int = 2000           # max total sequence length (prompt + generated)


class DecodeState(NamedTuple):
    tokens: jax.Array      # (bs, max_len) int32 token buffer (prompt + generated)
    cur: jax.Array         # () int32 — number of tokens currently in the sequence
    n_gen: jax.Array       # () int32 — number of generated tokens
    cache_k: jax.Array     # (L, bs, W, H, D)
    cache_v: jax.Array
    counts: jax.Array      # (bs, V) int32 — occurrence counts in penalty window
    uniforms: jax.Array    # (max_steps,) uniforms for inverse-CDF sampling
    done: jax.Array        # () bool


def _decode_attention(q, ck, cv, pos, window):
    """Single-token attention against the ring cache.

    q: (bs, H, D); ck/cv: (bs, W, H, D); pos: current absolute position.
    """
    scale = 1.0 / (q.shape[-1] ** 0.5)
    logits = jnp.einsum("bhd,bwhd->bhw", q, ck, preferred_element_type=jnp.float32) * scale
    slots = jnp.arange(window)
    slot_pos = pos - jnp.mod(pos - slots, window)
    valid = slot_pos >= 0
    logits = jnp.where(valid[None, None, :], logits, float("-inf"))
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bhw,bwhd->bhd", probs.astype(q.dtype), cv,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def _decode_backbone_step(p, cfg: CodecLMConfig, token, pos, cache_k, cache_v):
    """One-token forward through all layers, updating the ring cache.

    token: (bs,) int32; pos: () absolute position of this token.
    Returns (logits (bs, V), new_cache_k, new_cache_v).
    """
    window = cache_k.shape[2]
    x = p["embed"][token][:, None, :]  # (bs, 1, d)
    cos, sin = rope_angles(pos[None], cfg.head_dim)  # (1, D/2)
    slot = jnp.mod(pos, window)
    bs = x.shape[0]

    def layer_step(h, inputs):
        layer_p, ck, cv = inputs
        hn = rms_norm(h, layer_p["attention_norm"], cfg.norm_eps)
        q = linear(hn, layer_p["wq"]).reshape(bs, 1, cfg.n_heads, cfg.head_dim)
        k = linear(hn, layer_p["wk"]).reshape(bs, 1, cfg.n_kv_heads, cfg.head_dim)
        v = linear(hn, layer_p["wv"]).reshape(bs, 1, cfg.n_kv_heads, cfg.head_dim)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        ck = jax.lax.dynamic_update_slice(ck, k, (0, slot, 0, 0))
        cv = jax.lax.dynamic_update_slice(cv, v, (0, slot, 0, 0))
        attn = _decode_attention(q[:, 0], ck, cv, pos, window)
        h = h + linear(attn.reshape(bs, 1, cfg.n_heads * cfg.head_dim), layer_p["wo"])
        hn = rms_norm(h, layer_p["ffn_norm"], cfg.norm_eps)
        ff = linear(jax.nn.silu(linear(hn, layer_p["w1"])) * linear(hn, layer_p["w3"]),
                    layer_p["w2"])
        return h + ff, (ck, cv)

    h, (new_k, new_v) = jax.lax.scan(layer_step, x, (p["ar"]["layers"], cache_k, cache_v))
    h = rms_norm(h, p["ar"]["norm"], cfg.norm_eps)
    logits = linear(h, p["ar"]["output"])[:, 0]
    return logits.astype(jnp.float32), new_k, new_v


def _filter_logits(logits, s: ArSampling, counts, n_gen):
    """The full per-step logit pipeline (mars5/ar_generate.py:73-102)."""
    logits = jnp.where(n_gen > 1,
                       freq_presence_penalty(logits, counts, s.alpha_frequency,
                                             s.alpha_presence),
                       logits)
    logits = mask_vocab_window(logits, s.valid_start, s.valid_end)
    logits = early_eos_penalty(logits, n_gen, s.n_phones_gen,
                               s.eos_penalty_decay, s.eos_penalty_factor, s.eos_idx)
    logits = logits / s.temperature
    logits = top_k_top_p_filter(logits, top_k=s.top_k, top_p=s.top_p)
    logits = apply_typical_p(logits, s.typical_p)
    logits = mask_vocab_window(logits, s.valid_start, s.valid_end)
    return jax.nn.log_softmax(logits, axis=-1)


@functools.partial(jax.jit, static_argnames=("cfg", "s"))
def _generate_jit(params, cfg: CodecLMConfig, s: ArSampling, prompt_padded,
                  prompt_len, spk_codes, uniforms):
    """Compiled end-to-end generation.

    Args:
        prompt_padded: (bs=1, Pb) prompt token ids, right-padded (values ignored
            beyond prompt_len).
        prompt_len: () int32 true prompt length.
        spk_codes: (1, S, 8) speaker reference codes (padded with 1024).
        uniforms: (max_len,) uniforms consumed one per decode step.
    Returns:
        (tokens (1, max_len), final_len, n_gen)
    """
    bs, pb = prompt_padded.shape
    window = min(cfg.sliding_window, s.max_len + 1)
    if pb + 1 > window:
        raise ValueError(f"padded prompt {pb}+1 exceeds cache window {window}")

    spk_vec = spk_embedding(params, cfg, spk_codes)
    all_logits, kvs = codeclm_prefill(params, cfg, prompt_padded, spk_vec)
    # kvs: (L, bs, Pb+1, H, D) for positions 0..Pb; scatter into ring slots.
    k_full, v_full = kvs
    cache_k = jnp.zeros((cfg.n_layers, bs, window, cfg.n_kv_heads, cfg.head_dim),
                        dtype=k_full.dtype)
    cache_v = jnp.zeros_like(cache_k)
    cache_k = cache_k.at[:, :, : pb + 1].set(k_full)
    cache_v = cache_v.at[:, :, : pb + 1].set(v_full)

    # logits at the last real prompt token (position prompt_len)
    last_logits = jax.lax.dynamic_index_in_dim(
        all_logits, prompt_len, axis=1, keepdims=False).astype(jnp.float32)

    tokens = jnp.zeros((bs, s.max_len), jnp.int32)
    tokens = jax.lax.dynamic_update_slice(tokens, prompt_padded.astype(jnp.int32), (0, 0))

    def sample_and_update(logits, state: DecodeState):
        logprobs = _filter_logits(logits, s, state.counts, state.n_gen)
        u = state.uniforms[state.n_gen]
        tok = sample_from_logprobs(logprobs, u[None])  # (bs,)
        is_eos = (tok[0] == s.eos_idx) | (state.cur >= s.max_len)
        new_tokens = jnp.where(
            is_eos, state.tokens,
            jax.lax.dynamic_update_slice(state.tokens, tok[:, None], (0, state.cur)))
        # penalty-window counts: add the new token; evict the one leaving the window
        counts = state.counts.at[jnp.arange(bs), tok].add(
            jnp.where(is_eos, 0, 1))
        evict_pos = state.cur - s.penalty_window  # token index leaving the window
        evict_tok = jax.lax.dynamic_index_in_dim(
            state.tokens, jnp.maximum(evict_pos, 0), axis=1, keepdims=False)
        do_evict = (~is_eos) & (state.n_gen + 1 > s.penalty_window) & (evict_pos >= 0)
        counts = counts.at[jnp.arange(bs), evict_tok].add(
            jnp.where(do_evict, -1, 0))
        return DecodeState(
            tokens=new_tokens,
            cur=state.cur + jnp.where(is_eos, 0, 1),
            n_gen=state.n_gen + jnp.where(is_eos, 0, 1),
            cache_k=state.cache_k, cache_v=state.cache_v,
            counts=counts, uniforms=state.uniforms,
            done=is_eos | (state.cur + 1 >= s.max_len),
        )

    init = DecodeState(
        tokens=tokens, cur=prompt_len, n_gen=jnp.int32(0),
        cache_k=cache_k, cache_v=cache_v,
        counts=jnp.zeros((bs, cfg.n_vocab), jnp.int32),
        uniforms=uniforms, done=jnp.bool_(False),
    )
    # first sample comes from the prefill logits
    state = sample_and_update(last_logits, init)

    def cond(st: DecodeState):
        return ~st.done

    def body(st: DecodeState):
        last_tok = jax.lax.dynamic_index_in_dim(st.tokens, st.cur - 1, axis=1,
                                                keepdims=False)  # (bs,)
        logits, ck, cv = _decode_backbone_step(params, cfg, last_tok, st.cur,
                                               st.cache_k, st.cache_v)
        st = st._replace(cache_k=ck, cache_v=cv)
        return sample_and_update(logits, st)

    final = jax.lax.while_loop(cond, body, state)
    return final.tokens, final.cur, final.n_gen


def _bucket(n: int, step: int = 64) -> int:
    return max(step, -(-n // step) * step)


def ar_generate(params, cfg: CodecLMConfig, prompt, spk_codes, *,
                sampling: ArSampling, uniforms=None, seed: int = 0):
    """Generate a completion of ``prompt`` (host-side wrapper).

    Args:
        params: CodecLM parameter pytree.
        prompt: 1-D int sequence (text tokens + offset speech tokens).
        spk_codes: (S, 8) speaker-reference codec codes.
        sampling: ArSampling statics.
        uniforms: optional (max_len,) uniform stream (parity harness); otherwise
            derived from ``seed``.
    Returns:
        np.ndarray (final_len,) — the full sequence (prompt + generated tokens,
        without the terminating EOS), as the reference returns.
    """
    prompt = np.asarray(prompt, dtype=np.int32)
    window = min(cfg.sliding_window, sampling.max_len + 1)
    if len(prompt) + 1 > window:
        raise ValueError(f"prompt length {len(prompt)} exceeds cache window {window}")
    pb = min(_bucket(len(prompt)), window - 1)
    prompt_padded = np.zeros((1, pb), np.int32)
    prompt_padded[0, : len(prompt)] = prompt
    spk = np.asarray(spk_codes, dtype=np.int32)[None]

    if uniforms is None:
        uniforms = jax.random.uniform(jax.random.PRNGKey(seed), (sampling.max_len,))
    else:
        uniforms = jnp.asarray(uniforms, dtype=jnp.float32)

    tokens, final_len, n_gen = _generate_jit(
        params, cfg, sampling, jnp.asarray(prompt_padded),
        jnp.int32(len(prompt)), jnp.asarray(spk), uniforms)
    final_len = int(final_len)
    return np.asarray(tokens)[0, :final_len], int(n_gen)
