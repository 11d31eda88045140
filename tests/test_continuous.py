"""Continuous batching: chunked row-pool decode matches standalone generation."""

import numpy as np
import pytest

import jax


@pytest.fixture(scope="module")
def setup():
    from mars5_tts_tpu.models.ar import CodecLMConfig, init_codeclm
    from mars5_tts_tpu.models.ar_decode import ArSampling

    cfg = CodecLMConfig.tiny(n_vocab=50)
    params = init_codeclm(jax.random.PRNGKey(0), cfg)
    s = ArSampling(temperature=0.7, top_k=10, top_p=0.9, typical_p=1.0,
                   alpha_frequency=1.0, alpha_presence=0.4, penalty_window=5,
                   eos_penalty_decay=0.5, eos_penalty_factor=1.0, n_phones_gen=8,
                   eos_idx=49, valid_start=20, valid_end=51, max_len=48)
    return cfg, params, s


def test_continuous_matches_standalone(setup):
    from mars5_tts_tpu.models.ar_decode import ar_generate
    from mars5_tts_tpu.serving.continuous import ContinuousBatcher, Request

    cfg, params, s = setup
    rng = np.random.default_rng(0)
    n_req = 5
    prompts = [rng.integers(0, 20, int(n)) for n in rng.integers(4, 12, n_req)]
    spks = [rng.integers(0, 1024, (int(m), 8)) for m in rng.integers(3, 7, n_req)]
    uniforms = [rng.random(s.max_len).astype(np.float32) for _ in range(n_req)]

    batcher = ContinuousBatcher(params, cfg, s, batch_size=2, chunk_steps=7,
                                prompt_bucket=16, spk_bucket=16)
    reqs = [batcher.submit(Request(prompt=p, spk_codes=k, uniforms=u))
            for p, k, u in zip(prompts, spks, uniforms)]
    completed = batcher.run()
    assert len(completed) == n_req
    # more requests than rows -> several admission waves, chunked decode
    assert batcher.chunks_run > 1

    for req, p, k, u in zip(reqs, prompts, spks, uniforms):
        ref_seq, ref_n = ar_generate(params, cfg, p, k, sampling=s, uniforms=u)
        assert req.n_gen == ref_n, f"n_gen {req.n_gen} != {ref_n}"
        assert req.tokens.tolist() == ref_seq.tolist(), "chunked decode diverged"


def test_continuous_rejects_oversize_prompt(setup):
    from mars5_tts_tpu.serving.continuous import ContinuousBatcher, Request

    cfg, params, s = setup
    batcher = ContinuousBatcher(params, cfg, s, batch_size=2, prompt_bucket=8,
                                spk_bucket=16)
    with pytest.raises(ValueError, match="exceeds bucket"):
        batcher.submit(Request(prompt=np.zeros(20, int),
                               spk_codes=np.zeros((4, 8), int)))


def test_per_request_sampling_matches_standalone(setup):
    """Heterogeneous sampling params across pool rows == standalone runs.

    Each request overrides different hyperparameters; the pooled row-wise
    dynamic logit pipeline must be bit-identical to a dedicated ar_generate
    whose static ArSampling carries the same values.
    """
    from dataclasses import replace

    from mars5_tts_tpu.models.ar_decode import ar_generate
    from mars5_tts_tpu.serving.continuous import ContinuousBatcher, Request

    cfg, params, s = setup
    rng = np.random.default_rng(7)
    overrides = [
        {"temperature": 1.3, "top_k": 5},
        {"top_p": 0.5, "alpha_frequency": 2.5},
        {"typical_p": 0.8, "penalty_window": 3},
        {},  # pool defaults
    ]
    prompts = [rng.integers(0, 20, int(n)) for n in rng.integers(4, 12, 4)]
    spks = [rng.integers(0, 1024, (4, 8)) for _ in range(4)]
    uniforms = [rng.random(s.max_len).astype(np.float32) for _ in range(4)]

    batcher = ContinuousBatcher(params, cfg, s, batch_size=3, chunk_steps=9,
                                prompt_bucket=16, spk_bucket=16)
    reqs = [batcher.submit(Request(prompt=p, spk_codes=k, uniforms=u, sampling=o))
            for p, k, u, o in zip(prompts, spks, uniforms, overrides)]
    batcher.run()

    for req, p, k, u, o in zip(reqs, prompts, spks, uniforms, overrides):
        # standalone with the SAME static top_k (the pool's extraction width)
        # but this request's remaining params as rows
        from mars5_tts_tpu.models.ar_decode import (ar_generate_batched,
                                                    rows_from_sampling)
        s_req = replace(s, **{k2: v for k2, v in o.items() if k2 != "top_k"})
        rows = rows_from_sampling(s, 1, o)
        from mars5_tts_tpu.models.ar_decode import _generate_jit
        import jax.numpy as jnp
        pp = np.zeros((1, 16), np.int32)
        pp[0, : len(p)] = p
        spk = np.full((1, 16, 8), cfg.codebook_size - 1, np.int32)
        spk[0, : k.shape[0]] = k
        toks, cur, n_gen = _generate_jit(
            params, cfg, s, jnp.asarray(pp), jnp.asarray([len(p)], jnp.int32),
            jnp.asarray(spk), jnp.asarray(u)[:, None],
            jnp.full((1,), s.n_phones_gen, jnp.int32), rows=rows)
        assert req.n_gen == int(n_gen[0])
        assert req.tokens.tolist() == np.asarray(toks[0][: int(cur[0])]).tolist()
