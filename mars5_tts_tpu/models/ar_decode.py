"""AR decode engine: KV-cached autoregressive generation as one jitted program.

TPU-native redesign of the reference decode loop (mars5/ar_generate.py:15-165).
The reference runs a Python while-loop calling the model per token at batch size 1
(hard-asserted); here the whole generation — prefill, ring-buffer KV cache,
per-step logit pipeline (frequency/presence penalty over a sliding window, vocab
masking, early-EOS penalty, temperature, top-k/top-p, typical-p), inverse-CDF
sampling, and per-sequence EOS early-exit — compiles to a single
``lax.while_loop`` with static shapes, and is NATIVELY BATCHED: each row carries
its own prompt length, cursor, penalty counts, and done flag (the bucketed-batch
serving path, BASELINE config #3).

Cache layout: (n_layers, bs, window, n_kv_heads, head_dim) ring buffer written at
``position % window`` per row. For a row at position p, ring slot s holds position
``p - ((p - s) mod window)``; slots with negative values (not yet written, or
prefill padding junk ahead of the cursor) are masked out. Within the window this
reproduces the reference's rotating cache exactly; past the window it implements
the *correct* sliding-window semantics (the reference's unrotated read,
mars5/nn_future.py:258-259, is only valid below the window — SURVEY.md §2.4).

Sequence convention (matches CodecLM): position 0 is the speaker embedding, token
i sits at position i + 1; a row with ``cur`` tokens decodes its next token at
position ``cur``.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.quant import linear_any as linear
from ..ops.norms import rms_norm
from ..ops.rope import apply_rope_halfsplit, rope_angles
from ..ops.sampling import (apply_typical_p, filter_topk_subset,
                            filter_topk_subset_rows, freq_presence_penalty,
                            mask_vocab_window, sample_from_logprobs,
                            top_k_top_p_filter)
from .ar import CodecLMConfig, codeclm_prefill, spk_embedding


def ar_vocab_window(n_text_vocab: int, n_speech_vocab: int,
                    n_model_vocab: int) -> tuple[int, int]:
    """(valid_start, valid_end) for the AR speech-token window.

    The reference sets ``valid_end = len(texttok.vocab) + len(speechtok.vocab)
    + 1`` (mars5/ar_generate.py:41), but its ``+ 1`` is always cut by the
    logits width: its model vocab is exactly ``text + speech``
    (inference.py:100-103), so the highest samplable id is ``text + speech -
    1`` — the last decodable speech token. We encode that *effective* bound
    explicitly: when ``n_model_vocab > text + speech`` (e.g. bench geometry
    pairing a 24k-vocab model with tiny fixture tokenizers), the ids at and
    past ``text + speech`` are live junk logit rows inside the reference's
    nominal window; an AR decode eventually samples one and
    ``speechtok.decode_int`` rejects it (observed on-chip: bench_ttfa r5,
    token id 1025 of a 1025-entry vocab).
    """
    valid_start = n_text_vocab
    valid_end = min(n_text_vocab + n_speech_vocab, n_model_vocab)
    return valid_start, valid_end


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
    valid_end: int = 0            # see ar_vocab_window (clamped to model vocab)
    max_len: int = 2000           # max total sequence length (prompt + generated)


class RowSampling(NamedTuple):
    """Per-row dynamic sampling parameters (serving pools with heterogeneous
    requests). Values must respect the static ``ArSampling`` bounds: a row's
    top_k may not exceed the static ``top_k`` (the compile-time extraction
    width). Rows with top_p >= 1 / typical_p > 0.999 skip those filters,
    mirroring the static path's trace-time gates."""

    temperature: jax.Array        # (bs,) f32
    top_k: jax.Array              # (bs,) int32
    top_p: jax.Array              # (bs,) f32
    typical_p: jax.Array          # (bs,) f32
    alpha_frequency: jax.Array    # (bs,) f32
    alpha_presence: jax.Array     # (bs,) f32
    penalty_window: jax.Array     # (bs,) int32
    eos_penalty_decay: jax.Array  # (bs,) f32
    eos_penalty_factor: jax.Array # (bs,) f32


def rows_from_sampling(s: "ArSampling", bs: int,
                       overrides: dict | None = None,
                       cap_top_k: int | None = None) -> RowSampling:
    """Broadcast an ArSampling into a RowSampling (optionally overriding).

    ``cap_top_k`` is the pool's static top-k extraction width (defaults to
    ``s.top_k``); per-row top_k is clamped to it.
    """
    o = overrides or {}

    def get(name, dtype):
        return jnp.full((bs,), o.get(name, getattr(s, name)), dtype)

    return RowSampling(
        temperature=get("temperature", jnp.float32),
        top_k=jnp.minimum(get("top_k", jnp.int32),
                          s.top_k if cap_top_k is None else cap_top_k),
        top_p=get("top_p", jnp.float32),
        typical_p=get("typical_p", jnp.float32),
        alpha_frequency=get("alpha_frequency", jnp.float32),
        alpha_presence=get("alpha_presence", jnp.float32),
        penalty_window=get("penalty_window", jnp.int32),
        eos_penalty_decay=get("eos_penalty_decay", jnp.float32),
        eos_penalty_factor=get("eos_penalty_factor", jnp.float32),
    )


class DecodeState(NamedTuple):
    tokens: jax.Array      # (bs, max_len) int32 token buffer (prompt + generated)
    cur: jax.Array         # (bs,) int32 — tokens currently in each sequence
    n_gen: jax.Array       # (bs,) int32 — generated tokens per sequence
    cache_k: jax.Array     # (L, bs, W, H, D)
    cache_v: jax.Array
    counts: jax.Array      # (bs, V) int32 — occurrence counts in penalty window
    uniforms: jax.Array    # (max_len, bs) uniforms for inverse-CDF sampling
    est_len: jax.Array     # (bs,) int32 — per-row early-EOS estimated length
    done: jax.Array        # (bs,) bool


def _decode_attention(q, ck, cv, pos, window, k_new=None, v_new=None):
    """Single-token attention against the ring cache.

    q: (bs, H, D); ck/cv: (bs, W, H, D); pos: (bs,) per-row absolute positions.
    When ``k_new``/``v_new`` (bs, H, D) are given, the cache is treated as NOT
    containing the current token: its ring slot is masked (stale) and the
    current token contributes through an explicit self-attention column. This
    avoids scattering k/v into a cache *copy* inside every layer (XLA cannot
    do that update in place mid-read; the copies cost ~0.25 ms/step at bs=1
    and ~2 ms at bs=8).
    """
    scale = 1.0 / (q.shape[-1] ** 0.5)
    logits = jnp.einsum("bhd,bwhd->bhw", q, ck, preferred_element_type=jnp.float32) * scale
    slots = jnp.arange(window)[None, :]
    slot_pos = pos[:, None] - jnp.mod(pos[:, None] - slots, window)
    valid = slot_pos >= 0  # (bs, W)
    if k_new is not None:
        cur_slot = jnp.mod(pos, window)
        valid = valid & (slots != cur_slot[:, None])
        self_score = jnp.sum(q.astype(jnp.float32) * k_new.astype(jnp.float32),
                             axis=-1, keepdims=True) * scale  # (bs, H, 1)
        logits = jnp.where(valid[:, None, :], logits, float("-inf"))
        logits = jnp.concatenate([logits, self_score], axis=-1)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        out = jnp.einsum("bhw,bwhd->bhd", probs[..., :window].astype(q.dtype), cv,
                         preferred_element_type=jnp.float32)
        out = out + probs[..., window:].astype(jnp.float32) * v_new.astype(jnp.float32)
        return out.astype(q.dtype)
    logits = jnp.where(valid[:, None, :], logits, float("-inf"))
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bhw,bwhd->bhd", probs.astype(q.dtype), cv,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def _decode_backbone_step(p, cfg: CodecLMConfig, token, pos, cache_k, cache_v):
    """One-token forward through all layers, updating the ring cache.

    token: (bs,) int32; pos: (bs,) per-row absolute position of this token.
    Returns (logits (bs, V), new_cache_k, new_cache_v).
    """
    window = cache_k.shape[2]
    bs = token.shape[0]
    x = p["embed"][token][:, None, :]  # (bs, 1, d)
    cos, sin = rope_angles(pos, cfg.head_dim)  # (bs, D/2)
    cos_b, sin_b = cos[:, None, None, :], sin[:, None, None, :]
    slot = jnp.mod(pos, window)  # (bs,)
    b_idx = jnp.arange(bs)

    # PERF: the caches are read via per-layer dynamic slices and written back as
    # ONE single-slot scatter after the layer scan. Threading them through the
    # scan as xs/ys makes XLA materialize a full cache copy every decode step
    # (~1.9 ms/step at MARS5 geometry); this layout measures ~3.2 ms/step vs the
    # ~2.2 ms HBM-bandwidth floor.
    def layer_step(carry, layer_p):
        h, li = carry
        hn = rms_norm(h, layer_p["attention_norm"], cfg.norm_eps)
        q = linear(hn, layer_p["wq"]).reshape(bs, 1, cfg.n_heads, cfg.head_dim)
        k = linear(hn, layer_p["wk"]).reshape(bs, 1, cfg.n_kv_heads, cfg.head_dim)
        v = linear(hn, layer_p["wv"]).reshape(bs, 1, cfg.n_kv_heads, cfg.head_dim)
        q = apply_rope_halfsplit(q, cos_b, sin_b)
        k = apply_rope_halfsplit(k, cos_b, sin_b)
        ck = jax.lax.dynamic_slice(
            cache_k, (li, 0, 0, 0, 0),
            (1, bs, window, cfg.n_kv_heads, cfg.head_dim))[0]
        cv = jax.lax.dynamic_slice(
            cache_v, (li, 0, 0, 0, 0),
            (1, bs, window, cfg.n_kv_heads, cfg.head_dim))[0]
        attn = _decode_attention(q[:, 0], ck, cv, pos, window,
                                 k_new=k[:, 0], v_new=v[:, 0])
        h = h + linear(attn.reshape(bs, 1, cfg.n_heads * cfg.head_dim), layer_p["wo"])
        hn = rms_norm(h, layer_p["ffn_norm"], cfg.norm_eps)
        ff = linear(jax.nn.silu(linear(hn, layer_p["w1"])) * linear(hn, layer_p["w3"]),
                    layer_p["w2"])
        return (h + ff, li + 1), (k[:, 0], v[:, 0])

    (h, _), (ks, vs) = jax.lax.scan(layer_step, (x, jnp.int32(0)), p["ar"]["layers"])
    # ks/vs: (L, bs, H, D) — ONE batched scatter into a flattened (bs*W) view
    # with unique indices. Measured on-chip: ties the per-row unrolled
    # dynamic_update_slices at bs=8 (1.24 ms/step) and is the only viable form
    # at pool sizes (bs=32: 2.9 ms/step vs 958 ms for the unrolled loop, whose
    # O(bs) HLO also blows up compile time — VERDICT r1 "What's weak" #3).
    flat_idx = b_idx * window + slot
    new_k = (cache_k.reshape(cache_k.shape[0], bs * window, *cache_k.shape[3:])
             .at[:, flat_idx].set(ks, unique_indices=True)
             .reshape(cache_k.shape))
    new_v = (cache_v.reshape(cache_v.shape[0], bs * window, *cache_v.shape[3:])
             .at[:, flat_idx].set(vs, unique_indices=True)
             .reshape(cache_v.shape))
    h = rms_norm(h, p["ar"]["norm"], cfg.norm_eps)
    logits = linear(h, p["ar"]["output"])[:, 0]
    return logits.astype(jnp.float32), new_k, new_v


def _filter_logits(logits, s: ArSampling, counts, n_gen, est_len,
                   rows: RowSampling | None = None):
    """The full per-step logit pipeline (mars5/ar_generate.py:73-102).

    n_gen / est_len: (bs,) per-row generated counts and estimated lengths.
    With ``rows``, sampling hyperparameters are per-row dynamic arrays (the
    serving pool's heterogeneous-request path; static ``s`` still provides the
    structural fields: vocab window, eos index, top-k extraction width).
    """
    if rows is not None:
        penalized = freq_presence_penalty(logits, counts,
                                          rows.alpha_frequency[:, None],
                                          rows.alpha_presence[:, None])
    else:
        penalized = freq_presence_penalty(logits, counts, s.alpha_frequency,
                                          s.alpha_presence)
    logits = jnp.where((n_gen > 1)[:, None], penalized, logits)
    logits = mask_vocab_window(logits, s.valid_start, s.valid_end)
    # early-EOS penalty, rowwise (reference computes it from n_generated);
    # est_len is per-row so batched rows keep their own text-length estimates
    penalty = jnp.maximum(est_len - n_gen, 1).astype(logits.dtype)
    if rows is not None:
        modifier = rows.eos_penalty_factor * penalty ** rows.eos_penalty_decay
    else:
        modifier = s.eos_penalty_factor * penalty ** s.eos_penalty_decay
    apply = n_gen <= est_len
    eos_col = logits[:, s.eos_idx] - jnp.where(apply, modifier, 0.0)
    logits = logits.at[:, s.eos_idx].set(eos_col)
    if rows is not None:
        logits = logits / rows.temperature[:, None]
        logits = filter_topk_subset_rows(logits, s.top_k, rows.top_k,
                                         rows.top_p, rows.typical_p)
    elif s.top_k > 0:
        logits = logits / s.temperature
        # fast path: nucleus+typical on the sorted top-k subset (no full-vocab
        # sorts in the decode loop); exact up to k-th-value tie-breaks
        logits = filter_topk_subset(logits, s.top_k, s.top_p, s.typical_p)
    else:
        logits = logits / s.temperature
        logits = top_k_top_p_filter(logits, top_k=s.top_k, top_p=s.top_p)
        logits = apply_typical_p(logits, s.typical_p)
    logits = mask_vocab_window(logits, s.valid_start, s.valid_end)
    return jax.nn.log_softmax(logits, axis=-1)


def _sample_and_update(logits, state: DecodeState, s: ArSampling,
                       rows: RowSampling | None = None) -> DecodeState:
    """Sample one token per active row and advance the per-row decode state."""
    bs = logits.shape[0]
    b_idx = jnp.arange(bs)
    logprobs = _filter_logits(logits, s, state.counts, state.n_gen,
                              state.est_len, rows)
    u = jnp.take_along_axis(state.uniforms,
                            jnp.minimum(state.n_gen, s.max_len - 1)[None, :],
                            axis=0)[0]  # (bs,)
    tok = sample_from_logprobs(logprobs, u)  # (bs,)
    active = ~state.done
    appends = active & (tok != s.eos_idx) & (state.cur < s.max_len)
    cur_tok = state.tokens[b_idx, state.cur.clip(0, s.max_len - 1)]
    new_tokens = state.tokens.at[b_idx, state.cur.clip(0, s.max_len - 1)].set(
        jnp.where(appends, tok, cur_tok))
    # penalty-window counts: add the new token; evict the one leaving
    pw = rows.penalty_window if rows is not None else s.penalty_window
    counts = state.counts.at[b_idx, tok].add(appends.astype(jnp.int32))
    evict_pos = state.cur - pw  # token index leaving the window
    evict_tok = new_tokens[b_idx, evict_pos.clip(0, s.max_len - 1)]
    do_evict = appends & (state.n_gen + 1 > pw) & (evict_pos >= 0)
    counts = counts.at[b_idx, evict_tok].add(-do_evict.astype(jnp.int32))
    new_cur = state.cur + appends.astype(jnp.int32)
    done = state.done | (active & (tok == s.eos_idx)) | (new_cur >= s.max_len)
    return state._replace(
        tokens=new_tokens, cur=new_cur,
        n_gen=state.n_gen + appends.astype(jnp.int32),
        counts=counts, done=done)


def _init_state(params, cfg: CodecLMConfig, s: ArSampling, prompt_padded,
                prompt_len, spk_codes, uniforms, est_len=None,
                rows: RowSampling | None = None) -> DecodeState:
    """Prefill + first sample: builds a ready-to-decode DecodeState (any bs)."""
    bs, pb = prompt_padded.shape
    window = min(cfg.sliding_window, s.max_len + 1)
    if pb + 1 > window:
        raise ValueError(f"padded prompt {pb}+1 exceeds cache window {window}")

    spk_vec = spk_embedding(params, cfg, spk_codes)
    all_logits, kvs = codeclm_prefill(params, cfg, prompt_padded, spk_vec)
    k_full, v_full = kvs  # (L, bs, Pb+1, H, D)
    cache_k = jnp.zeros((cfg.n_layers, bs, window, cfg.n_kv_heads, cfg.head_dim),
                        dtype=k_full.dtype)
    cache_v = jnp.zeros_like(cache_k)
    cache_k = cache_k.at[:, :, : pb + 1].set(k_full)
    cache_v = cache_v.at[:, :, : pb + 1].set(v_full)

    # logits at each row's last real prompt token (position prompt_len)
    last_logits = jnp.take_along_axis(
        all_logits, prompt_len[:, None, None], axis=1)[:, 0].astype(jnp.float32)

    tokens = jnp.zeros((bs, s.max_len), jnp.int32)
    tokens = jax.lax.dynamic_update_slice(tokens, prompt_padded.astype(jnp.int32), (0, 0))

    if est_len is None:
        est_len = jnp.full((bs,), s.n_phones_gen, jnp.int32)
    init = DecodeState(
        tokens=tokens, cur=prompt_len.astype(jnp.int32),
        n_gen=jnp.zeros((bs,), jnp.int32),
        cache_k=cache_k, cache_v=cache_v,
        counts=jnp.zeros((bs, cfg.n_vocab), jnp.int32),
        uniforms=uniforms, est_len=est_len.astype(jnp.int32),
        done=jnp.zeros((bs,), bool),
    )
    # first sample comes from the prefill logits
    return _sample_and_update(last_logits, init, s, rows)


def _decode_body(params, cfg: CodecLMConfig, s: ArSampling, st: DecodeState,
                 rows: RowSampling | None = None) -> DecodeState:
    bs = st.cur.shape[0]
    b_idx = jnp.arange(bs)
    last_tok = st.tokens[b_idx, (st.cur - 1).clip(0)]  # (bs,)
    logits, ck, cv = _decode_backbone_step(params, cfg, last_tok, st.cur,
                                           st.cache_k, st.cache_v)
    st = st._replace(cache_k=ck, cache_v=cv)
    return _sample_and_update(logits, st, s, rows)


@functools.partial(jax.jit, static_argnames=("cfg", "s"))
def _generate_jit(params, cfg: CodecLMConfig, s: ArSampling, prompt_padded,
                  prompt_len, spk_codes, uniforms, est_len=None,
                  rows: RowSampling | None = None):
    """Compiled end-to-end batched generation.

    Args:
        prompt_padded: (bs, Pb) prompt token ids, right-padded per row.
        prompt_len: (bs,) int32 true prompt lengths.
        spk_codes: (bs, S, 8) speaker reference codes (padded with 1024).
        uniforms: (max_len, bs) uniforms; row i consumes uniforms[n_gen_i, i].
    Returns:
        (tokens (bs, max_len), final_len (bs,), n_gen (bs,)).
    """
    state = _init_state(params, cfg, s, prompt_padded, prompt_len, spk_codes,
                        uniforms, est_len, rows)
    final = jax.lax.while_loop(
        lambda st: ~jnp.all(st.done),
        lambda st: _decode_body(params, cfg, s, st, rows),
        state)
    return final.tokens, final.cur, final.n_gen


@functools.partial(jax.jit, static_argnames=("cfg", "s"))
def _generate_nocache_jit(params, cfg: CodecLMConfig, s: ArSampling,
                          prompt_padded, prompt_len, spk_codes, uniforms,
                          est_len=None, rows: RowSampling | None = None):
    """Cacheless generation: the reference's ``use_kv_cache=False`` semantics
    (mars5/ar_generate.py:54-59, inference.py:67-69) — every step re-runs the
    FULL forward over the token buffer (banded sliding-window mask) and samples
    from the logits at each row's cursor. Functionally equivalent to the cached
    engine (the ring cache holds exactly the banded mask's window); kept for
    strict config compatibility and as a cross-check of the cache path.
    """
    bs = prompt_padded.shape[0]
    spk_vec = spk_embedding(params, cfg, spk_codes)
    tokens = jnp.zeros((bs, s.max_len), jnp.int32)
    tokens = jax.lax.dynamic_update_slice(tokens, prompt_padded.astype(jnp.int32), (0, 0))
    if est_len is None:
        est_len = jnp.full((bs,), s.n_phones_gen, jnp.int32)
    dummy_cache = jnp.zeros((cfg.n_layers, bs, 1, cfg.n_kv_heads, cfg.head_dim))
    st = DecodeState(
        tokens=tokens, cur=prompt_len.astype(jnp.int32),
        n_gen=jnp.zeros((bs,), jnp.int32),
        cache_k=dummy_cache, cache_v=dummy_cache,
        counts=jnp.zeros((bs, cfg.n_vocab), jnp.int32),
        uniforms=uniforms, est_len=est_len.astype(jnp.int32),
        done=jnp.zeros((bs,), bool))

    def body(st):
        # full forward over the whole buffer; causality makes the positions
        # beyond each row's cursor irrelevant to the cursor's logits
        all_logits, _ = codeclm_prefill(params, cfg, st.tokens, spk_vec)
        logits = jnp.take_along_axis(
            all_logits, st.cur[:, None, None], axis=1)[:, 0].astype(jnp.float32)
        return _sample_and_update(logits, st, s, rows)

    final = jax.lax.while_loop(lambda t: ~jnp.all(t.done), body, st)
    return final.tokens, final.cur, final.n_gen


def ar_generate_nocache(params, cfg: CodecLMConfig, prompt, spk_codes, *,
                        sampling: ArSampling, uniforms=None, seed: int = 0):
    """Single-prompt cacheless generation (``use_kv_cache=False``)."""
    prompt = np.asarray(prompt)
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
    tokens, final_len, n_gen = _generate_nocache_jit(
        params, cfg, sampling, prompt_padded, prompt_len, spk, uniforms)
    tokens = np.asarray(tokens)
    return tokens[0, : int(final_len[0])], int(n_gen[0])


@functools.partial(jax.jit, static_argnames=("cfg", "s"))
def prefill_row(params, cfg: CodecLMConfig, s: ArSampling, prompt_padded,
                prompt_len, spk_codes, uniforms, est_len=None,
                rows: RowSampling | None = None) -> DecodeState:
    """Single-request prefill for continuous batching: a bs=1 DecodeState with
    the first token already sampled (insertable into a batch via insert_row).
    ``rows`` (bs=1) carries the request's own sampling parameters."""
    return _init_state(params, cfg, s, prompt_padded, prompt_len, spk_codes,
                       uniforms, est_len, rows)


@functools.partial(jax.jit, static_argnames=("cfg", "s", "n_steps"))
def decode_chunk(params, cfg: CodecLMConfig, s: ArSampling, state: DecodeState,
                 n_steps: int, rows: RowSampling | None = None) -> DecodeState:
    """Run at most n_steps decode iterations (stops early if all rows finish).

    The continuous-batching scheduling quantum: rows decode independently, so
    chunked execution is bit-identical to the monolithic while_loop per row.
    ``rows`` enables per-request sampling parameters across the pool.
    """
    def cond(carry):
        st, i = carry
        return (~jnp.all(st.done)) & (i < n_steps)

    def body(carry):
        st, i = carry
        return _decode_body(params, cfg, s, st, rows), i + 1

    final, _ = jax.lax.while_loop(cond, body, (state, jnp.int32(0)))
    return final


@jax.jit
def insert_rows_sampling(pool: RowSampling, row: RowSampling, b) -> RowSampling:
    """Write a bs=1 RowSampling into slot ``b`` of a pool RowSampling."""
    return jax.tree.map(lambda p, r: p.at[b].set(r[0]), pool, row)


@jax.jit
def extract_row(state: DecodeState, j) -> DecodeState:
    """Slice row ``j`` of a batch DecodeState out as a bs=1 state.

    Mirrors insert_row's per-field batch axes (cache_k/cache_v and uniforms
    carry the batch on axis 1; everything else on axis 0)."""
    return DecodeState(
        tokens=jax.lax.dynamic_slice_in_dim(state.tokens, j, 1, 0),
        cur=jax.lax.dynamic_slice_in_dim(state.cur, j, 1, 0),
        n_gen=jax.lax.dynamic_slice_in_dim(state.n_gen, j, 1, 0),
        cache_k=jax.lax.dynamic_slice_in_dim(state.cache_k, j, 1, 1),
        cache_v=jax.lax.dynamic_slice_in_dim(state.cache_v, j, 1, 1),
        counts=jax.lax.dynamic_slice_in_dim(state.counts, j, 1, 0),
        uniforms=jax.lax.dynamic_slice_in_dim(state.uniforms, j, 1, 1),
        est_len=jax.lax.dynamic_slice_in_dim(state.est_len, j, 1, 0),
        done=jax.lax.dynamic_slice_in_dim(state.done, j, 1, 0),
    )


@jax.jit
def insert_row(state: DecodeState, row: DecodeState, b) -> DecodeState:
    """Write a prefilled bs=1 row state into slot ``b`` of a batch state."""
    return DecodeState(
        tokens=jax.lax.dynamic_update_slice(state.tokens, row.tokens, (b, 0)),
        cur=state.cur.at[b].set(row.cur[0]),
        n_gen=state.n_gen.at[b].set(row.n_gen[0]),
        cache_k=jax.lax.dynamic_update_slice(
            state.cache_k, row.cache_k, (0, b, 0, 0, 0)),
        cache_v=jax.lax.dynamic_update_slice(
            state.cache_v, row.cache_v, (0, b, 0, 0, 0)),
        counts=jax.lax.dynamic_update_slice(state.counts, row.counts, (b, 0)),
        uniforms=jax.lax.dynamic_update_slice(
            state.uniforms, row.uniforms, (0, b)),
        est_len=state.est_len.at[b].set(row.est_len[0]),
        done=state.done.at[b].set(row.done[0]),
    )


def make_parked_state(cfg: CodecLMConfig, s: ArSampling, bs: int,
                      dtype=jnp.float32) -> DecodeState:
    """An all-done batch state (every row free) for a continuous batcher."""
    window = min(cfg.sliding_window, s.max_len + 1)
    return DecodeState(
        tokens=jnp.zeros((bs, s.max_len), jnp.int32),
        cur=jnp.zeros((bs,), jnp.int32),
        n_gen=jnp.zeros((bs,), jnp.int32),
        cache_k=jnp.zeros((cfg.n_layers, bs, window, cfg.n_kv_heads, cfg.head_dim), dtype),
        cache_v=jnp.zeros((cfg.n_layers, bs, window, cfg.n_kv_heads, cfg.head_dim), dtype),
        counts=jnp.zeros((bs, cfg.n_vocab), jnp.int32),
        uniforms=jnp.zeros((s.max_len, bs), jnp.float32),
        est_len=jnp.zeros((bs,), jnp.int32),
        done=jnp.ones((bs,), bool),
    )


def _bucket(n: int, step: int = 64) -> int:
    return max(step, -(-n // step) * step)


def ar_generate_batched(params, cfg: CodecLMConfig, prompts, spk_codes_list, *,
                        sampling: ArSampling, uniforms=None, seed: int = 0,
                        est_lens=None):
    """Batched generation over variable-length prompts (bucketed static shapes).

    Args:
        prompts: list of 1-D int sequences.
        spk_codes_list: list of (S_i, 8) speaker-reference code arrays.
    Returns:
        list of (np.ndarray sequence incl. prompt, n_generated) per input.
    """
    bs = len(prompts)
    window = min(cfg.sliding_window, sampling.max_len + 1)
    max_p = max(len(p) for p in prompts)
    if max_p + 1 > window:
        raise ValueError(f"prompt length {max_p} exceeds cache window {window}")
    pb = min(_bucket(max_p), window - 1)
    prompt_padded = np.zeros((bs, pb), np.int32)
    prompt_len = np.zeros((bs,), np.int32)
    for i, p in enumerate(prompts):
        prompt_padded[i, : len(p)] = np.asarray(p, np.int32)
        prompt_len[i] = len(p)

    max_s = max(c.shape[0] for c in spk_codes_list)
    sb = _bucket(max_s, 16)
    spk = np.full((bs, sb, 8), cfg.codebook_size - 1, np.int32)  # pad idx 1024
    for i, c in enumerate(spk_codes_list):
        spk[i, : c.shape[0]] = np.asarray(c, np.int32)

    if uniforms is None:
        uniforms = jax.random.uniform(jax.random.PRNGKey(seed),
                                      (sampling.max_len, bs))
    else:
        uniforms = jnp.asarray(uniforms, jnp.float32)
        if uniforms.ndim == 1:
            uniforms = uniforms[:, None]

    est = (jnp.asarray(est_lens, jnp.int32) if est_lens is not None
           else jnp.full((bs,), sampling.n_phones_gen, jnp.int32))
    tokens, final_len, n_gen = _generate_jit(
        params, cfg, sampling, jnp.asarray(prompt_padded),
        jnp.asarray(prompt_len), jnp.asarray(spk), uniforms, est)
    tokens = np.asarray(tokens)
    final_len = np.asarray(final_len)
    n_gen = np.asarray(n_gen)
    return [(tokens[i, : final_len[i]], int(n_gen[i])) for i in range(bs)]


def ar_generate(params, cfg: CodecLMConfig, prompt, spk_codes, *,
                sampling: ArSampling, uniforms=None, seed: int = 0):
    """Generate a completion of a single ``prompt`` (reference-shaped API).

    Returns (np.ndarray full sequence without terminating EOS, n_generated) —
    as the reference's ar_generate returns its best beam.
    """
    out = ar_generate_batched(params, cfg, [np.asarray(prompt)],
                              [np.asarray(spk_codes)], sampling=sampling,
                              uniforms=uniforms, seed=seed)
    return out[0]
