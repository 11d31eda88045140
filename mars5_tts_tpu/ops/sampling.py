"""Logit processors and categorical sampling, as pure fp32 JAX functions.

Faithful TPU-native re-implementations of the reference logit pipeline
(mars5/samplers.py): OpenAI-style frequency/presence penalty, early-EOS penalty,
top-k/top-p filtering, and typical sampling — all shaped (bs, vocab) and usable
inside jit/while_loop (no data-dependent shapes).

Sampling contract: the reference draws through ``torch.multinomial`` /
``torch.rand_like`` whose RNG mapping cannot be replicated; this framework defines
the seed→sample mapping as inverse-CDF (AR) and Gumbel-max (diffusion) over an
injectable uniform stream. Parity tests drive both frameworks with the same
uniforms (see SURVEY.md §7 "Hard parts").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = float("-inf")


def topk_blocked(logits, k: int, nb: int = 8):
    """Exact ``lax.top_k`` via per-block top-k + candidate merge.

    XLA's TopK custom fusion over the full (1, 24000) vocab costs ~94 us/token
    on v5e — the largest non-GEMM op in the AR decode loop. Splitting the vocab
    into ``nb`` blocks, taking the per-block top-k (one batched call) and
    merging the ``nb*k`` candidates with a second top-k is exact (every global
    top-k element is in its block's top-k) and measures 3x faster on-chip
    (scripts/probe_topk.py: 94 -> ~12 us effective). Values are bit-identical
    to ``lax.top_k``; index order can differ only on exact value ties that
    straddle a block boundary (measure-zero for continuous logits; the merge
    prefers lower block index, matching top_k's lowest-index-first tie rule for
    the common case of ties within one block).

    Falls back to plain ``lax.top_k`` when the vocab doesn't split cleanly or
    is too small for blocking to pay.
    """
    v = logits.shape[-1]
    if v % nb or v // nb <= 2 * k:
        return jax.lax.top_k(logits, k)
    bs = logits.shape[0]
    xb = logits.reshape(bs * nb, v // nb)
    bv, bi = jax.lax.top_k(xb, k)                         # (bs*nb, k)
    base = (jnp.arange(nb, dtype=bi.dtype) * (v // nb))[None, :, None]
    bi = (bi.reshape(bs, nb, k) + base).reshape(bs, nb * k)
    bv = bv.reshape(bs, nb * k)
    mv, mi = jax.lax.top_k(bv, k)                         # merge candidates
    return mv, jnp.take_along_axis(bi, mi, axis=-1)


def freq_presence_penalty(logits, counts, alpha_frequency: float, alpha_presence: float):
    """``logits - counts*α_freq - (counts>0)*α_presence`` (mars5/samplers.py:20-36).

    ``counts`` is the per-vocab occurrence count over the penalty window, maintained
    incrementally by the decode loop (the reference recounts with ``unique`` each
    step; same result).
    """
    c = counts.astype(logits.dtype)
    return logits - c * alpha_frequency - (c > 0).astype(logits.dtype) * alpha_presence


def early_eos_penalty(logits, n_generated, estimated_gen_length, decay: float,
                      factor: float, eos_index: int):
    """Subtract ``factor * max(est - n, 1)**decay`` from the EOS logit while
    ``n_generated <= estimated_gen_length`` (mars5/samplers.py:39-56).

    ``n_generated`` may be a traced scalar.
    """
    penalty = jnp.maximum(estimated_gen_length - n_generated, 1).astype(logits.dtype)
    modifier = factor * penalty ** decay
    apply = n_generated <= estimated_gen_length
    eos_col = logits[:, eos_index] - jnp.where(apply, modifier, 0.0)
    return logits.at[:, eos_index].set(eos_col)


def mask_vocab_window(logits, valid_start: int, valid_end: int):
    """-inf outside ``[valid_start - 1, valid_end)``.

    Reproduces the reference's exact (quirky) slicing
    ``logits[..., :valid_start-1] = -inf; logits[..., valid_end:] = -inf``
    (mars5/ar_generate.py:82-83) — index ``valid_start - 1`` stays allowed.
    """
    v = logits.shape[-1]
    idx = jnp.arange(v)
    keep = (idx >= valid_start - 1) & (idx < valid_end)
    return jnp.where(keep[None, :], logits, NEG_INF)


def top_k_top_p_filter(logits, top_k: int = 0, top_p: float = 1.0, min_tokens: int = 1):
    """Top-k then nucleus filtering (mars5/samplers.py:61-93).

    top_k/top_p are static (trace-time) hyperparameters. Ties with the k-th value
    survive (strict ``<`` comparison, as in the reference).
    """
    v = logits.shape[-1]
    if top_k > 0:
        k = min(max(top_k, min_tokens), v)
        kth = topk_blocked(logits, k)[0][..., -1:]
        logits = jnp.where(logits < kth, NEG_INF, logits)

    if top_p < 1.0:
        sorted_idx = jnp.argsort(-logits, axis=-1)  # descending, stable
        sorted_logits = jnp.take_along_axis(logits, sorted_idx, axis=-1)
        cum = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
        remove = cum > top_p
        if min_tokens > 1:
            remove = remove.at[..., :min_tokens].set(False)
        # shift right: keep the first token above the threshold
        remove = jnp.concatenate(
            [jnp.zeros_like(remove[..., :1]), remove[..., :-1]], axis=-1)
        bs_idx = jnp.arange(logits.shape[0])[:, None]
        remove_orig = jnp.zeros_like(remove).at[bs_idx, sorted_idx].set(remove)
        logits = jnp.where(remove_orig, NEG_INF, logits)
    return logits


def apply_typical_p(logits, mass: float):
    """Typical sampling (arXiv 2202.00666; mars5/samplers.py:96-122).

    No-op when ``mass > 0.999`` (static). Input may contain -inf entries.
    """
    if mass > 0.999:
        return logits
    normalized = jax.nn.log_softmax(logits, axis=-1)
    p = jnp.exp(normalized)
    prod = jnp.where(jnp.isneginf(normalized), 0.0, normalized * p)  # nansum semantics
    ent = -jnp.sum(prod, axis=-1, keepdims=True)
    shifted = jnp.abs(-normalized - ent)  # +inf for -inf logits
    order = jnp.argsort(shifted, axis=-1)  # ascending, stable
    sorted_scores = jnp.take_along_axis(shifted, order, axis=-1)
    sorted_logits = jnp.take_along_axis(logits, order, axis=-1)
    cum = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
    last_ind = jnp.sum(cum < mass, axis=-1, keepdims=True)  # (bs, 1)
    threshold = jnp.take_along_axis(sorted_scores, last_ind, axis=-1)
    remove_sorted = sorted_scores > threshold
    bs_idx = jnp.arange(logits.shape[0])[:, None]
    remove = jnp.zeros_like(remove_sorted).at[bs_idx, order].set(remove_sorted)
    return jnp.where(remove, NEG_INF, logits)


def filter_topk_subset(logits, top_k: int, top_p: float = 1.0,
                       typical_mass: float = 1.0, min_tokens: int = 1):
    """Fused top-k -> nucleus -> typical filtering without full-vocab sorts.

    Decode-loop fast path: ``lax.top_k`` returns the k survivors already sorted
    descending, and both nucleus and typical filtering depend only on the
    survivors (every other token is -inf with zero probability mass), so they run
    exactly on the (bs, k) subset and the result scatters back to the full vocab.
    This is bit-identical to ``top_k_top_p_filter`` + ``apply_typical_p`` except
    for tie-breaks at the k-th value (the reference keeps all ties; top_k keeps
    exactly k, lowest index first) — measure-zero for continuous logits.
    Requires top_k > 0.
    """
    assert top_k > 0
    v = logits.shape[-1]
    bs = logits.shape[0]
    k = min(max(top_k, min_tokens), v)
    vals, idx = topk_blocked(logits, k)  # (bs, k), sorted descending

    if top_p < 1.0:
        cum = jnp.cumsum(jax.nn.softmax(vals, axis=-1), axis=-1)
        remove = cum > top_p
        if min_tokens > 1:
            remove = remove.at[..., :min_tokens].set(False)
        remove = jnp.concatenate(
            [jnp.zeros_like(remove[..., :1]), remove[..., :-1]], axis=-1)
        vals = jnp.where(remove, NEG_INF, vals)

    if typical_mass <= 0.999:
        normalized = jax.nn.log_softmax(vals, axis=-1)
        p = jnp.exp(normalized)
        prod = jnp.where(jnp.isneginf(normalized), 0.0, normalized * p)
        ent = -jnp.sum(prod, axis=-1, keepdims=True)
        shifted = jnp.abs(-normalized - ent)
        order = jnp.argsort(shifted, axis=-1)  # k elements only
        sorted_scores = jnp.take_along_axis(shifted, order, axis=-1)
        sorted_vals = jnp.take_along_axis(vals, order, axis=-1)
        cum = jnp.cumsum(jax.nn.softmax(sorted_vals, axis=-1), axis=-1)
        last_ind = jnp.sum(cum < typical_mass, axis=-1, keepdims=True)
        threshold = jnp.take_along_axis(sorted_scores, last_ind, axis=-1)
        vals = jnp.where(shifted > threshold, NEG_INF, vals)

    bs_idx = jnp.arange(bs)[:, None]
    return jnp.full_like(logits, NEG_INF).at[bs_idx, idx].set(vals)


def filter_topk_subset_rows(logits, max_k: int, k_row, top_p_row, typical_row,
                            min_tokens: int = 1):
    """Row-wise dynamic variant of ``filter_topk_subset`` for serving pools.

    ``max_k`` is the static top-k extraction width (compile-time bound);
    ``k_row`` (bs,) int32, ``top_p_row``/``typical_row`` (bs,) f32 are per-row
    dynamic values. Bit-identical to the static fast path when a row's values
    equal the static config (rows with top_p >= 1 / typical > 0.999 pass
    through unfiltered, matching the static code's trace-time gates).
    """
    assert max_k > 0
    bs = logits.shape[0]
    v = logits.shape[-1]
    k = min(max(max_k, min_tokens), v)
    vals, idx = topk_blocked(logits, k)  # (bs, k) descending

    # dynamic per-row k: positions >= k_row are cut (lowest-index-first ties,
    # same as lax.top_k's static behavior)
    pos = jnp.arange(k)[None, :]
    vals = jnp.where(pos >= jnp.maximum(k_row, min_tokens)[:, None], NEG_INF, vals)

    # nucleus, applied per-row where top_p < 1
    cum = jnp.cumsum(jax.nn.softmax(vals, axis=-1), axis=-1)
    remove = cum > top_p_row[:, None]
    if min_tokens > 1:
        remove = remove.at[..., :min_tokens].set(False)
    remove = jnp.concatenate(
        [jnp.zeros_like(remove[..., :1]), remove[..., :-1]], axis=-1)
    remove = remove & (top_p_row[:, None] < 1.0)
    vals = jnp.where(remove, NEG_INF, vals)

    # typical sampling, applied per-row where mass <= 0.999
    normalized = jax.nn.log_softmax(vals, axis=-1)
    p = jnp.exp(normalized)
    prod = jnp.where(jnp.isneginf(normalized), 0.0, normalized * p)
    ent = -jnp.sum(prod, axis=-1, keepdims=True)
    shifted = jnp.abs(-normalized - ent)
    order = jnp.argsort(shifted, axis=-1)
    sorted_scores = jnp.take_along_axis(shifted, order, axis=-1)
    sorted_vals = jnp.take_along_axis(vals, order, axis=-1)
    cum_t = jnp.cumsum(jax.nn.softmax(sorted_vals, axis=-1), axis=-1)
    last_ind = jnp.sum(cum_t < typical_row[:, None], axis=-1, keepdims=True)
    threshold = jnp.take_along_axis(sorted_scores, last_ind, axis=-1)
    t_remove = (shifted > threshold) & (typical_row[:, None] <= 0.999)
    vals = jnp.where(t_remove, NEG_INF, vals)

    bs_idx = jnp.arange(bs)[:, None]
    return jnp.full_like(logits, NEG_INF).at[bs_idx, idx].set(vals)


def sample_from_logprobs(logprobs, u):
    """Inverse-CDF categorical draw.

    Args:
        logprobs: (bs, V) normalized log-probabilities (may contain -inf).
        u: (bs,) uniforms in [0, 1).
    Returns:
        (bs,) int32 sampled indices, always at a finite-logprob entry.
    """
    probs = jnp.exp(logprobs)
    cdf = jnp.cumsum(probs, axis=-1)
    total = cdf[..., -1:]
    r = u[..., None] * total
    raw = jnp.sum(cdf <= r, axis=-1).astype(jnp.int32)  # first i with cdf > r
    # Float cumsum is a reassociated parallel scan: inside a zero-probability
    # (-inf) run the cdf can wobble by a few ulps instead of staying exactly
    # flat, so `raw` can land on a masked index — or one past the window when
    # u*total rounds up to total. Exact inverse-CDF never returns a
    # zero-probability token (the reference's torch.multinomial can't either):
    # snap to the first live index at-or-after `raw` (the exact-math answer
    # for r inside a flat stretch), falling back to the last live index when
    # raw overran the end. Observed on-chip: a 2304-step AR decode sampled
    # index == valid_end once, crashing the tokenizer (bench_ttfa, r5).
    v = logprobs.shape[-1]
    idx = jnp.arange(v, dtype=jnp.int32)
    live = jnp.isfinite(logprobs)
    at_or_after = jnp.min(
        jnp.where(live & (idx >= raw[..., None]), idx, v), axis=-1)
    last_live = jnp.max(jnp.where(live, idx, -1), axis=-1)
    return jnp.where(at_or_after < v, at_or_after, last_live).astype(jnp.int32)


MIN_LOG_ARG = 1e-7  # matches reference diffuser clamp (mars5/diffuser.py:18)


def gumbel_argmax(logprobs, uniform, axis: int = -1):
    """Gumbel-max categorical sampling given explicit uniforms.

    Matches reference ``log_sample_categorical`` (mars5/diffuser.py:219-228):
    ``argmax(-log(-log(clamp(u))) + logprobs)`` with the MIN_LOG_ARG clamps.
    """
    g = -jnp.log(jnp.clip(-jnp.log(jnp.clip(uniform, min=MIN_LOG_ARG)), min=MIN_LOG_ARG))
    return jnp.argmax(g + logprobs, axis=axis).astype(jnp.int32)
