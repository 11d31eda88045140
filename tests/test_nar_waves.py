"""NAR wave batching: padded wave rows == solo diffusion runs (bit-identical).

The wave scheduler groups requests by (reference length, gen-length bucket)
and pads rows to the bucket; x_padding_mask must make the padded frames
invisible to the real frames. The injected-uniform harness constructs wave
uniforms whose real positions carry each solo run's values, so grids must
match EXACTLY (same f32 ops, padded keys contribute exact zeros).
"""

import numpy as np
import pytest

import jax

from mars5_tts_tpu.config import DSH
from mars5_tts_tpu.diffusion import (MultinomialDiffusion, build_step_plan,
                                     perform_simple_inference)
from mars5_tts_tpu.models.nar import ResidualTransformerConfig, init_nar

K = 1025


@pytest.fixture(scope="module")
def nar():
    cfg = ResidualTransformerConfig.tiny(n_text_vocab=32)
    params = init_nar(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _dsh(deep):
    return DSH(last_greedy=True, x_0_temp=0.7, guidance_w=3.0, deep_clone=deep,
               jump_len=1, jump_n_sample=1, q0_override_steps=2,
               enable_kevin_scaled_inference=True)


@pytest.mark.parametrize("deep", [True, False])
@pytest.mark.slow
def test_wave_rows_match_solo(nar, deep):
    cfg, params = nar
    T, lc, lt = 5, 4, 6
    lgs = [5, 7]                     # true gen lengths; bucket = 8
    bucket = 8
    rng = np.random.default_rng(0)
    diff = MultinomialDiffusion(K, timesteps=T)
    dsh = _dsh(deep)
    t_lasts, _, _ = build_step_plan(T, 1, 1)
    n = len(t_lasts)

    c_texts = [rng.integers(0, 32, lt), rng.integers(0, 32, lt - 2)]
    c_codes = [rng.integers(0, 1024, (lc, 8)) for _ in lgs]
    l0 = [rng.integers(0, 1024, lg) for lg in lgs]
    # one padded uniform tensor per request, at WAVE layout; the solo run
    # consumes the slices covering its own (smaller) grid
    off = lc if deep else 0
    u_wave = [rng.random((n, 2, 1, off + bucket, 8, K)).astype(np.float32)
              for _ in lgs]
    x_init_wave = [rng.integers(0, K, (1, bucket, 8)) for _ in lgs]

    solo = []
    for j, lg in enumerate(lgs):
        x = np.repeat(l0[j][:, None], 8, axis=1)[None]
        batch = (c_texts[j][None], c_codes[j][None], [len(c_texts[j])], [lc],
                 x, np.zeros((1, lg), bool))
        u = u_wave[j][:, :, :, : off + lg]
        out = perform_simple_inference(
            params, cfg, batch, diff, T, dsh, uniforms=u,
            x_init=x_init_wave[j][:, :lg])
        solo.append(np.asarray(out)[0])

    # wave: both rows padded to the bucket
    bs = len(lgs)
    c_text = np.zeros((bs, lt), np.int64)
    ctl = np.zeros((bs,), np.int64)
    x = np.zeros((bs, bucket, 8), np.int64)
    xpm = np.ones((bs, bucket), bool)
    for j, lg in enumerate(lgs):
        c_text[j, : len(c_texts[j])] = c_texts[j]
        ctl[j] = len(c_texts[j])
        x[j, :lg] = np.repeat(l0[j][:, None], 8, axis=1)
        xpm[j, :lg] = False
    batch = (c_text, np.stack(c_codes), ctl, np.full((bs,), lc), x, xpm)
    u = np.concatenate(u_wave, axis=2)
    x_init = np.concatenate(x_init_wave, axis=0)
    out = np.asarray(perform_simple_inference(
        params, cfg, batch, diff, T, dsh, uniforms=u, x_init=x_init))

    for j, lg in enumerate(lgs):
        np.testing.assert_array_equal(
            out[j, :lg], solo[j][:lg],
            err_msg=f"wave row {j} (deep={deep}) diverged from solo")


def test_mixed_voice_rows_match_solo(nar):
    """Deep-clone batch whose rows use DIFFERENT reference voices (per-row
    prompt lengths): the ragged engine branch must reproduce each row's solo
    run bit-for-bit under a shared uniform stream (VERDICT r3 next #5)."""
    cfg, params = nar
    T, lt = 5, 6
    lcs = [4, 2]                     # per-row reference (prompt) lengths
    lgs = [5, 7]                     # per-row gen lengths; padded to 7
    lx = max(lgs)
    rng = np.random.default_rng(7)
    diff = MultinomialDiffusion(K, timesteps=T)
    dsh = _dsh(True)
    t_lasts, _, _ = build_step_plan(T, 1, 1)
    n = len(t_lasts)

    c_texts = [rng.integers(0, 32, lt), rng.integers(0, 32, lt - 1)]
    c_codes = [rng.integers(0, 1024, (lc, 8)) for lc in lcs]
    l0 = [rng.integers(0, 1024, lg) for lg in lgs]
    L = max(lcs) + lx
    # one (n, 2, 1, L, 8, K) stream per row: the solo run consumes the prefix
    # covering its own lc+lg grid; the ragged batch consumes the same entries
    # at the same absolute positions (prompt at 0..lc-1, gen right after)
    u_rows = [rng.random((n, 2, 1, L, 8, K)).astype(np.float32) for _ in lcs]
    x_init_rows = [rng.integers(0, K, (1, lx, 8)) for _ in lcs]

    solo = []
    for j, (lc, lg) in enumerate(zip(lcs, lgs)):
        x = np.repeat(l0[j][:, None], 8, axis=1)[None]
        batch = (c_texts[j][None], c_codes[j][None], [len(c_texts[j])], [lc],
                 x, np.zeros((1, lg), bool))
        out = perform_simple_inference(
            params, cfg, batch, diff, T, dsh,
            uniforms=u_rows[j][:, :, :, : lc + lg],
            x_init=x_init_rows[j][:, :lg])
        solo.append(np.asarray(out)[0])

    bs = len(lcs)
    lc_max = max(lcs)
    c_text = np.zeros((bs, lt), np.int64)
    ctl = np.zeros((bs,), np.int64)
    codes = np.zeros((bs, lc_max, 8), np.int64)
    x = np.zeros((bs, lx, 8), np.int64)
    xpm = np.ones((bs, lx), bool)
    for j, (lc, lg) in enumerate(zip(lcs, lgs)):
        c_text[j, : len(c_texts[j])] = c_texts[j]
        ctl[j] = len(c_texts[j])
        codes[j, :lc] = c_codes[j]
        x[j, :lg] = np.repeat(l0[j][:, None], 8, axis=1)
        xpm[j, :lg] = False
    batch = (c_text, codes, ctl, np.asarray(lcs), x, xpm)
    u = np.concatenate(u_rows, axis=2)
    x_init = np.concatenate(x_init_rows, axis=0)
    out = np.asarray(perform_simple_inference(
        params, cfg, batch, diff, T, dsh, uniforms=u, x_init=x_init))

    assert out.shape == (bs, lx, 8)
    for j, lg in enumerate(lgs):
        np.testing.assert_array_equal(
            out[j, :lg], solo[j][:lg],
            err_msg=f"mixed-voice row {j} diverged from its solo run")


@pytest.mark.slow
def test_scheduler_groups_and_crops(nar):
    from mars5_tts_tpu.serving.nar_waves import NarRequest, NarWaveScheduler

    cfg, params = nar
    rng = np.random.default_rng(1)
    diff = MultinomialDiffusion(K, timesteps=4)
    sched = NarWaveScheduler(params, cfg, diff, 4, _dsh(True), wave_size=2,
                             gen_buckets=(6, 10), text_bucket=8)
    reqs = []
    for lc, lg in [(4, 5), (4, 6), (4, 9), (3, 5), (4, 5)]:
        reqs.append(sched.submit(NarRequest(
            c_text=rng.integers(0, 32, 5), c_codes=rng.integers(0, 1024, (lc, 8)),
            l0_codes=rng.integers(0, 1024, lg), seed=lg)))
    done = sched.flush()
    assert len(done) == 5
    # groups: (lc=4, b=6) x2 -> 1 wave, +1 overflow wave; (4, 10); (3, 6)
    assert sched.waves_run == 4
    for r in reqs:
        assert r.grid.shape == (len(r.l0_codes), 8)
        # L0 lane pinned to the AR codes (q0 override holds to t=0 verbatim)
        np.testing.assert_array_equal(r.grid[:, 0], r.l0_codes)

    with pytest.raises(ValueError, match="exceeds"):
        sched.submit(NarRequest(c_text=rng.integers(0, 32, 5),
                                c_codes=rng.integers(0, 1024, (4, 8)),
                                l0_codes=rng.integers(0, 1024, 11)))


@pytest.mark.slow
def test_scheduler_flush_full_waves(nar):
    """flush_full_waves runs only complete cohorts; the remainder stays queued
    and a later flush() drains it (the overlapped serving loop's contract)."""
    from mars5_tts_tpu.serving.nar_waves import NarRequest, NarWaveScheduler

    cfg, params = nar
    rng = np.random.default_rng(2)
    diff = MultinomialDiffusion(K, timesteps=4)
    sched = NarWaveScheduler(params, cfg, diff, 4, _dsh(True), wave_size=2,
                             gen_buckets=(6,), text_bucket=8)

    def req(lg, seed):
        return sched.submit(NarRequest(
            c_text=rng.integers(0, 32, 5), c_codes=rng.integers(0, 1024, (4, 8)),
            l0_codes=rng.integers(0, 1024, lg), seed=seed))

    r1, r2, r3 = req(5, 0), req(6, 1), req(5, 2)
    assert sched.flush_full_waves() == 1          # one full wave of 2
    assert sched.waves_run == 1 and len(sched.completed) == 2
    assert sched.queue == [r3]                    # remainder kept, in order
    assert r3.grid is None
    assert sched.flush_full_waves() == 0          # nothing full -> no-op
    assert sched.queue == [r3]
    done = sched.flush()                          # drains the partial wave
    assert len(done) == 3 and sched.waves_run == 2
    for r in (r1, r2, r3):
        assert r.grid.shape == (len(r.l0_codes), 8)
        np.testing.assert_array_equal(r.grid[:, 0], r.l0_codes)
