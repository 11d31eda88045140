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
