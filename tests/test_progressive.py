"""Intra-utterance progressive streaming (serving/progressive.py).

Tiny-geometry CPU tests. Trajectory-level quality (progressive vs one-shot
under the reseed noise floor) is scored on-chip by scripts/bench_progressive.py
— here we pin the structural contracts:

* the emitted grid's L0 lane is exactly the AR codes (RePaint retain_quant0,
  segmented or not);
* concatenated streamed PCM == one vocode of the concatenated grid (the
  vocode_margin re-establishes conv/iSTFT-overlap state at each boundary);
* deep clone drops the re-generated prompt span before denoising;
* generator bookkeeping (frame ranges, per-chunk timing).
"""

import numpy as np
import pytest

from fixtures import make_tiny_mars5


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    model, _ = make_tiny_mars5(tmp_path_factory.mktemp("prog"), seed=3)
    return model


def _ref_audio(n=1024):
    rng = np.random.default_rng(7)
    return (rng.standard_normal(n) * 0.1).astype(np.float32)


def _cfg(**kw):
    from mars5_tts_tpu.config import InferenceConfig

    kw.setdefault("timesteps", 8)
    kw.setdefault("generate_max_len_override", 64)
    kw.setdefault("trim_db", 200.0)
    return InferenceConfig(**kw)


@pytest.mark.heavy
def test_stream_grid_l0_is_ar_codes(tiny):
    from mars5_tts_tpu.serving import progressive_tts

    cfg = _cfg(deep_clone=True, generate_max_len_override=384)
    grid, audio = progressive_tts(tiny, "hello world", _ref_audio(),
                                  ref_transcript="a ref", cfg=cfg, seed=0,
                                  seg_frames=32, ctx_frames=16)
    # one-shot pipeline to recover the AR codes under the same seed
    ar_codes, _ = tiny.tts("hello world", _ref_audio(),
                           ref_transcript="a ref", cfg=cfg, seed=0)
    skip = int(np.asarray(tiny.encode_reference(_ref_audio())).shape[-1])
    want = np.asarray(ar_codes)[skip:]
    assert grid.shape == (len(want), 8)
    np.testing.assert_array_equal(grid[:, 0], want)
    assert audio.ndim == 1 and len(audio) > 0


def test_stream_pcm_matches_full_vocode_of_emitted_grid(tiny):
    """Concatenated streamed PCM must equal ONE vocode pass over the full
    emitted grid — the margin makes every boundary's conv + iSTFT overlap
    state identical to the full pass (away from the utterance head, where
    both runs share the same edge padding anyway)."""
    from mars5_tts_tpu.serving import stream_tts

    cfg = _cfg(deep_clone=False)
    grids, pcms = [], []
    for ch in stream_tts(tiny, "the quick brown rat", _ref_audio(),
                         ref_transcript="", cfg=cfg, seed=1,
                         seg_frames=8, ctx_frames=8, vocode_margin=16):
        grids.append(ch.grid)
        pcms.append(ch.pcm)
        assert ch.frame_end - ch.frame_start == len(ch.grid)
        assert ch.timing is not None and "total_s" in ch.timing
    assert len(grids) >= 3, "want a multi-segment stream for this test"
    grid = np.concatenate(grids, axis=0)
    stream_audio = np.concatenate(pcms)
    full_audio = np.asarray(tiny.vocode(grid))[: len(grid) *
                                               tiny.vocos_cfg.hop_length]
    assert stream_audio.shape == full_audio.shape
    np.testing.assert_allclose(stream_audio, full_audio, atol=2e-5, rtol=1e-4)


@pytest.mark.heavy
def test_margin_zero_differs_at_boundaries(tiny):
    """Negative control: with no margin the conv state is NOT re-established,
    so boundary samples must differ from the full vocode — proving the margin
    in the previous test is what carries the exactness."""
    from mars5_tts_tpu.serving import stream_tts

    cfg = _cfg(deep_clone=False)
    pcms, grids = [], []
    for ch in stream_tts(tiny, "the quick brown rat", _ref_audio(),
                         ref_transcript="", cfg=cfg, seed=1,
                         seg_frames=8, ctx_frames=8, vocode_margin=0):
        grids.append(ch.grid)
        pcms.append(ch.pcm)
    grid = np.concatenate(grids, axis=0)
    stream_audio = np.concatenate(pcms)
    full_audio = np.asarray(tiny.vocode(grid))[: len(grid) *
                                               tiny.vocos_cfg.hop_length]
    assert not np.allclose(stream_audio, full_audio, atol=2e-5, rtol=1e-4)


@pytest.mark.heavy
def test_deep_clone_drops_regenerated_prompt_span(tiny):
    from mars5_tts_tpu.serving import stream_tts

    cfg = _cfg(deep_clone=True, generate_max_len_override=384)
    chunks = list(stream_tts(tiny, "hi", _ref_audio(), ref_transcript="a ref",
                             cfg=cfg, seed=2, seg_frames=32, ctx_frames=16))
    total = sum(len(c.grid) for c in chunks)
    ar_codes, _ = tiny.tts("hi", _ref_audio(), ref_transcript="a ref",
                           cfg=cfg, seed=2)
    skip = int(np.asarray(tiny.encode_reference(_ref_audio())).shape[-1])
    assert total == len(np.asarray(ar_codes)) - skip


@pytest.mark.heavy
def test_single_segment_covers_everything(tiny):
    from mars5_tts_tpu.serving import progressive_tts

    cfg = _cfg(deep_clone=False)
    grid, audio = progressive_tts(tiny, "abc", _ref_audio(), ref_transcript="",
                                  cfg=cfg, seed=3, seg_frames=10_000)
    assert len(grid) > 0
    assert len(audio) == len(grid) * tiny.vocos_cfg.hop_length


def test_bad_args_rejected(tiny):
    from mars5_tts_tpu.serving import stream_tts

    with pytest.raises(ValueError):
        next(stream_tts(tiny, "x", _ref_audio(), ref_transcript="",
                        cfg=_cfg(), seg_frames=0))
    # no speaker prompt AND no tail context = empty deep-clone prompt past seg 0
    with pytest.raises(ValueError):
        next(stream_tts(tiny, "x", _ref_audio(), ref_transcript="",
                        cfg=_cfg(), keep_spk_prompt=False, ctx_frames=0))


@pytest.mark.heavy
def test_progressive_with_geometry_buckets(tiny):
    """Progressive segments honor the serving geometry buckets: with
    nar_gen_bucket set, every segment call pads its frame axis to the bucket
    and crops back — the structural contracts (L0 lane = AR codes, exact
    segment lengths) must hold unchanged."""
    from mars5_tts_tpu.serving import progressive_tts

    cfg = _cfg(deep_clone=False)
    old = tiny.nar_gen_bucket, tiny.nar_text_bucket
    tiny.nar_gen_bucket, tiny.nar_text_bucket = 16, 8
    try:
        grid, audio = progressive_tts(tiny, "bucketed stream", _ref_audio(),
                                      ref_transcript="", cfg=cfg, seed=6,
                                      seg_frames=8, ctx_frames=8)
    finally:
        tiny.nar_gen_bucket, tiny.nar_text_bucket = old
    ar_codes, _ = tiny.tts("bucketed stream", _ref_audio(),
                           ref_transcript="", cfg=cfg, seed=6)
    want = np.asarray(ar_codes)
    assert grid.shape == (len(want), 8)
    np.testing.assert_array_equal(grid[:, 0], want)
    assert len(audio) == len(grid) * tiny.vocos_cfg.hop_length


def test_single_segment_shallow_degenerates_to_oneshot(tiny):
    """With one segment covering the whole utterance, a shallow-clone
    progressive run has EXACTLY the one-shot call geometry (c_codes = speaker
    prompt for conditioning only, x = all gen frames, same NAR key seed+1) —
    so its audio must equal tts()'s (trim disabled via trim_db=200)."""
    from mars5_tts_tpu.serving import progressive_tts

    cfg = _cfg(deep_clone=False)
    grid, audio = progressive_tts(tiny, "same trajectory", _ref_audio(),
                                  ref_transcript="", cfg=cfg, seed=9,
                                  seg_frames=10_000)
    _, ref_audio_out = tiny.tts("same trajectory", _ref_audio(),
                                ref_transcript="", cfg=cfg, seed=9)
    n = min(len(audio), len(ref_audio_out))
    assert n > 0 and abs(len(audio) - len(ref_audio_out)) < 2 * tiny.vocos_cfg.hop_length
    np.testing.assert_allclose(audio[:n], np.asarray(ref_audio_out)[:n],
                               atol=1e-6, rtol=1e-5)
