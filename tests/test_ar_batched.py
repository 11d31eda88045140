"""Batched AR decode: each row must match its standalone single-sequence run."""

import numpy as np
import pytest

import jax


@pytest.fixture(scope="module")
def tiny_setup():
    from mars5_tts_tpu.models.ar import CodecLMConfig, init_codeclm

    cfg = CodecLMConfig.tiny(n_vocab=50)
    params = init_codeclm(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _sampling(max_len):
    from mars5_tts_tpu.models.ar_decode import ArSampling

    return ArSampling(temperature=0.7, top_k=10, top_p=0.9, typical_p=1.0,
                      alpha_frequency=1.0, alpha_presence=0.4, penalty_window=5,
                      eos_penalty_decay=0.5, eos_penalty_factor=1.0,
                      n_phones_gen=8, eos_idx=49, valid_start=20, valid_end=51,
                      max_len=max_len)


@pytest.mark.slow
def test_batched_rows_match_single_runs(tiny_setup):
    from mars5_tts_tpu.models.ar_decode import ar_generate_batched

    cfg, params = tiny_setup
    rng = np.random.default_rng(0)
    max_len = 48
    prompts = [rng.integers(0, 20, n) for n in (6, 11, 9)]
    spks = [rng.integers(0, 1024, (s, 8)) for s in (4, 7, 5)]
    uniforms = rng.random((max_len, 3)).astype(np.float32)

    s = _sampling(max_len)
    batched = ar_generate_batched(params, cfg, prompts, spks, sampling=s,
                                  uniforms=uniforms)

    for i in range(3):
        single = ar_generate_batched(params, cfg, [prompts[i]], [spks[i]],
                                     sampling=s, uniforms=uniforms[:, i:i + 1])
        b_seq, b_n = batched[i]
        s_seq, s_n = single[0]
        assert b_n == s_n, f"row {i}: n_gen {b_n} != {s_n}"
        assert b_seq.tolist() == s_seq.tolist(), f"row {i} diverged"


def test_batched_independent_eos(tiny_setup):
    """Rows finish independently; a finished row's tokens stay frozen."""
    from mars5_tts_tpu.models.ar_decode import ar_generate_batched

    cfg, params = tiny_setup
    rng = np.random.default_rng(1)
    # short max_len forces some rows to hit the cap
    prompts = [rng.integers(0, 20, n) for n in (5, 15)]
    spks = [rng.integers(0, 1024, (4, 8))] * 2
    s = _sampling(24)
    out = ar_generate_batched(params, cfg, prompts, spks, sampling=s, seed=0)
    for (seq, n), p in zip(out, prompts):
        assert len(seq) <= 24
        assert (seq[: len(p)] == p).all()
        assert 49 not in seq[len(p):].tolist()
