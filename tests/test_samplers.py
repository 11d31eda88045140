"""Parity of logit processors vs reference mars5/samplers.py (fp32, random logits)."""

import numpy as np
import pytest

from tests.conftest import add_reference_to_path, reference_available

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")

ATOL = 1e-6


@pytest.fixture(scope="module")
def ref_samplers():
    add_reference_to_path()
    import mars5.samplers as s
    return s


def _logits(rng, bs=2, v=50):
    return rng.standard_normal((bs, v)).astype(np.float32) * 3.0


def test_top_k_top_p_parity(ref_samplers):
    import torch
    import jax.numpy as jnp
    from mars5_tts_tpu.ops.sampling import top_k_top_p_filter

    rng = np.random.default_rng(0)
    for top_k, top_p in [(0, 1.0), (10, 1.0), (0, 0.5), (10, 0.3), (5, 0.9), (200, 0.2)]:
        l = _logits(rng)
        ref = ref_samplers.top_k_top_p_filtering(torch.tensor(l.copy()), top_k=top_k, top_p=top_p)
        ours = top_k_top_p_filter(jnp.asarray(l), top_k=top_k, top_p=top_p)
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=ATOL,
                                   err_msg=f"top_k={top_k} top_p={top_p}")


def test_typical_p_parity(ref_samplers):
    import torch
    import jax.numpy as jnp
    from mars5_tts_tpu.ops.sampling import apply_typical_p

    rng = np.random.default_rng(1)
    for mass in [1.0, 0.95, 0.5, 0.2]:
        l = _logits(rng)
        # reference applies typical_p after masking -> include some -inf
        l[:, 40:] = -np.inf
        ref = ref_samplers.apply_typical_p(torch.tensor(l.copy()), mass=mass)
        ours = apply_typical_p(jnp.asarray(l), mass=mass)
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=ATOL,
                                   err_msg=f"mass={mass}")


def test_freq_rep_penalty_parity(ref_samplers):
    import torch
    import jax.numpy as jnp
    from mars5_tts_tpu.ops.sampling import freq_presence_penalty

    rng = np.random.default_rng(2)
    l = _logits(rng, bs=1, v=30)
    prev = rng.integers(0, 30, size=(1, 25))
    window = 10
    ref = ref_samplers.freq_rep_penalty(torch.tensor(l.copy()), torch.tensor(prev),
                                        alpha_frequency=3.0, alpha_presence=0.4,
                                        penalty_window=window)
    # our engine maintains counts over the window incrementally
    counts = np.zeros((1, 30), np.int32)
    for t in prev[0, -window:]:
        counts[0, t] += 1
    ours = freq_presence_penalty(jnp.asarray(l), jnp.asarray(counts), 3.0, 0.4)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=ATOL)


def test_early_eos_penalty_parity(ref_samplers):
    import torch
    import jax.numpy as jnp
    from mars5_tts_tpu.ops.sampling import early_eos_penalty

    rng = np.random.default_rng(3)
    for n_gen, est in [(0, 20), (5, 20), (19, 20), (20, 20), (25, 20)]:
        l = _logits(rng, bs=1, v=30)
        ref = ref_samplers.early_eos_penalty(torch.tensor(l.copy()), n_gen, est,
                                             decay=0.5, factor=1.0, eos_index=7)
        ours = early_eos_penalty(jnp.asarray(l), n_gen, est, decay=0.5, factor=1.0, eos_index=7)
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=ATOL,
                                   err_msg=f"n_gen={n_gen}")


def test_gumbel_argmax_matches_reference_formula():
    import torch
    import jax.numpy as jnp
    from mars5_tts_tpu.ops.sampling import gumbel_argmax

    add_reference_to_path()
    from mars5.diffuser import MultinomialDiffusion

    rng = np.random.default_rng(4)
    logprobs = np.log(rng.dirichlet(np.ones(16), size=(3, 5)).astype(np.float32))
    u = rng.random((3, 5, 16)).astype(np.float32)

    diff = MultinomialDiffusion(16, timesteps=10)
    # reference samples its own uniforms; patch torch.rand_like to inject ours
    orig = torch.rand_like
    try:
        torch.rand_like = lambda t, **kw: torch.tensor(u)
        ref = diff.log_sample_categorical(torch.tensor(logprobs.copy()))
    finally:
        torch.rand_like = orig
    ours = gumbel_argmax(jnp.asarray(logprobs), jnp.asarray(u))
    np.testing.assert_array_equal(np.asarray(ours), ref.numpy())


def test_inverse_cdf_sampling_statistics():
    """sample_from_logprobs draws from the right distribution (chi-squared sanity)."""
    import jax.numpy as jnp
    from mars5_tts_tpu.ops.sampling import sample_from_logprobs

    rng = np.random.default_rng(5)
    probs = np.array([0.5, 0.25, 0.125, 0.125], np.float32)
    logp = np.log(probs)[None].repeat(1, axis=0)
    n = 4000
    us = rng.random(n).astype(np.float32)
    draws = np.array([int(sample_from_logprobs(jnp.asarray(logp), jnp.asarray([u]))[0])
                      for u in us[:200]])
    # exact inverse-CDF check against manual computation on a few uniforms
    cdf = np.cumsum(probs)
    expect = np.searchsorted(cdf, us[:200] * cdf[-1], side="right")
    np.testing.assert_array_equal(draws, expect)


def test_topk_blocked_exact():
    """topk_blocked == lax.top_k (values AND indices) at the AR hot-path shape,
    plus the non-divisible / small-vocab fallbacks."""
    import jax
    import jax.numpy as jnp
    from mars5_tts_tpu.ops.sampling import topk_blocked

    rng = np.random.default_rng(7)
    for bs, v, k in [(1, 24_000, 200), (4, 24_000, 200), (2, 1024, 64),
                     (1, 24_001, 200), (1, 4096, 200)]:
        x = jnp.asarray(rng.standard_normal((bs, v)).astype(np.float32))
        bv, bi = jax.jit(lambda x: jax.lax.top_k(x, k))(x)
        tv, ti = jax.jit(lambda x: topk_blocked(x, k))(x)
        np.testing.assert_array_equal(np.asarray(bv), np.asarray(tv))
        np.testing.assert_array_equal(np.asarray(bi), np.asarray(ti))


def test_inverse_cdf_never_samples_masked():
    """sample_from_logprobs must never return a -inf (zero-probability) index.

    XLA's cumsum is a reassociated parallel scan: inside a masked run the cdf
    can wobble by a few ulps instead of staying flat, so the raw `sum(cdf<=r)`
    count can land on a masked index — observed on-chip as an AR decode
    sampling exactly `valid_end` and crashing the tokenizer (bench_ttfa, r5).
    Property-test the guard (all draws live), and check the snap is exact
    inverse-CDF: identical to searchsorted over the live-entry cdf.
    """
    import jax.numpy as jnp
    from mars5_tts_tpu.ops.sampling import NEG_INF, sample_from_logprobs

    rng = np.random.default_rng(11)
    # 6 trials = 6 distinct random vocab widths (each width is a fresh XLA
    # compile, the dominant cost); coverage was identical at 20 trials
    for trial in range(6):
        v = int(rng.integers(8, 2000))
        bs = int(rng.integers(1, 5))
        logits = rng.standard_normal((bs, v)).astype(np.float32) * 3
        # random masking incl. masked head/tail runs (the AR vocab-window shape)
        mask = rng.random((bs, v)) < rng.uniform(0.3, 0.98)
        mask[:, : int(rng.integers(0, v // 3))] = True
        mask[:, v - int(rng.integers(1, v // 3)):] = True
        mask[np.arange(bs), rng.integers(0, v, bs)] = False  # >=1 live per row
        logits[mask] = NEG_INF
        logp = logits - np.log(np.exp(logits - logits.max(-1, keepdims=True))
                               .sum(-1, keepdims=True)) - logits.max(-1, keepdims=True)
        # uniforms incl. the hostile u -> 1 edge
        us = np.concatenate([rng.random(6), [0.0, 1 - 1e-7, 1 - 6e-8]]).astype(np.float32)
        for ui, u in enumerate(us):
            out = np.asarray(sample_from_logprobs(
                jnp.asarray(logp), jnp.asarray([u] * bs, np.float32)))
            for b in range(bs):
                assert np.isfinite(logp[b, out[b]]), (trial, u, out[b])
                if ui >= 6:
                    continue  # hostile u->1 edges: liveness is the contract
                # exactness on ordinary uniforms: searchsorted over the
                # live-only cdf (a sequential-cumsum oracle; at the u->1 edge
                # it can disagree with XLA's reassociated scan by one live
                # step, which is why the edge rows assert liveness only)
                live_idx = np.flatnonzero(~mask[b])
                cdf = np.cumsum(np.exp(logp[b, live_idx]), dtype=np.float32)
                j = np.searchsorted(cdf, np.float32(u) * cdf[-1], side="right")
                expect = live_idx[min(j, len(live_idx) - 1)]
                assert out[b] == expect, (trial, u, out[b], expect)


def test_ar_vocab_window_clamps_to_model_vocab():
    """The AR window's upper bound must never exceed the model vocab.

    The reference's `valid_end = text + speech + 1` (mars5/ar_generate.py:41)
    is vacuous there (its logits end at n_vocab = text + speech); with a model
    vocab LARGER than text + speech (bench geometry: 24k-vocab random weights
    + tiny fixture tokenizers), the id at text + speech is a live junk logit
    row inside that window — an AR decode eventually samples it and
    speechtok.decode_int raises (observed on-chip: bench_ttfa, r5).
    """
    from mars5_tts_tpu.models.ar_decode import ar_vocab_window

    # reference-true geometry: bound == n_vocab, same effective window as +1
    assert ar_vocab_window(258, 1025, 258 + 1025) == (258, 1283)
    # mismatched geometry (bench weights): clamp excludes the junk rows
    assert ar_vocab_window(258, 1025, 24_000) == (258, 1283)
    # the pipeline wires the clamp (both tts and the serving pool use it)
    import inspect

    from mars5_tts_tpu import pipeline
    src = inspect.getsource(pipeline.Mars5TTS._init_runtime)
    assert "ar_vocab_window" in src
