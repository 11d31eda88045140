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


@pytest.mark.slow
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


@pytest.mark.slow
def test_mixed_bucket_queue_matches_standalone(setup):
    """Shallow + deep prompts share the pool: per-bucket prefills, identical
    tokens vs standalone (VERDICT r2 #6 mixed-length production queue)."""
    from mars5_tts_tpu.models.ar_decode import ar_generate
    from mars5_tts_tpu.serving.continuous import ContinuousBatcher, Request

    cfg, params, s = setup
    rng = np.random.default_rng(3)
    lens = [4, 20, 6, 30, 8, 18]          # alternating shallow/deep
    prompts = [rng.integers(0, 20, n) for n in lens]
    spks = [rng.integers(0, 1024, (4, 8)) for _ in lens]
    uniforms = [rng.random(s.max_len).astype(np.float32) for _ in lens]

    batcher = ContinuousBatcher(params, cfg, s, batch_size=3, chunk_steps=7,
                                prompt_buckets=(8, 32), spk_bucket=16)
    reqs = [batcher.submit(Request(prompt=p, spk_codes=k, uniforms=u))
            for p, k, u in zip(prompts, spks, uniforms)]
    completed = batcher.run()
    assert len(completed) == len(lens)
    assert batcher.prefills_by_bucket[8] > 0
    assert batcher.prefills_by_bucket[32] > 0

    for req, p, k, u in zip(reqs, prompts, spks, uniforms):
        ref_seq, ref_n = ar_generate(params, cfg, p, k, sampling=s, uniforms=u)
        assert req.n_gen == ref_n
        assert req.tokens.tolist() == ref_seq.tolist(), "mixed-bucket diverged"


def test_request_topk_above_pool_default(setup):
    """A request may raise top_k beyond the default sampling's top_k, up to
    the pool's max_top_k extraction width (VERDICT r2 #6)."""
    from dataclasses import replace

    from mars5_tts_tpu.models.ar_decode import ar_generate
    from mars5_tts_tpu.serving.continuous import ContinuousBatcher, Request

    cfg, params, s = setup                 # s.top_k == 10
    s_low = replace(s, top_k=4)            # pool default narrower than request
    rng = np.random.default_rng(9)
    p = rng.integers(0, 20, 6)
    k = rng.integers(0, 1024, (4, 8))
    u = rng.random(s.max_len).astype(np.float32)

    batcher = ContinuousBatcher(params, cfg, s_low, batch_size=2,
                                prompt_buckets=(8,), spk_bucket=16,
                                max_top_k=10)
    req = batcher.submit(Request(prompt=p, spk_codes=k, uniforms=u,
                                 sampling={"top_k": 10}))
    batcher.run()

    # oracle: standalone run whose static sampling top_k is 10
    ref_seq, ref_n = ar_generate(params, cfg, p, k, sampling=s, uniforms=u)
    assert req.n_gen == ref_n
    assert req.tokens.tolist() == ref_seq.tolist()

    with pytest.raises(ValueError, match="max_top_k"):
        batcher.submit(Request(prompt=p, spk_codes=k,
                               sampling={"top_k": 11}))
