"""Long-form chunking + crossfade stitching."""

import numpy as np


def test_chunk_text_sentences():
    from mars5_tts_tpu.serving import chunk_text

    text = "First sentence. Second one is here! Third? " * 5
    chunks = chunk_text(text, max_chars=60)
    assert all(len(c) <= 61 for c in chunks)
    assert " ".join(chunks).replace("  ", " ").startswith("First sentence.")
    # every sentence survives
    assert sum(c.count(".") + c.count("!") + c.count("?") for c in chunks) == 15


def test_chunk_text_overlong_sentence():
    from mars5_tts_tpu.serving import chunk_text

    text = "word " * 100  # 500 chars, no sentence punctuation
    chunks = chunk_text(text, max_chars=80)
    assert all(len(c) <= 80 for c in chunks)
    assert "".join(c.replace(",", "").replace(" ", "") for c in chunks) == "word" * 100


def test_chunk_text_preserves_order():
    """Over-long sentences must not jump ahead of buffered short ones (r4 advisor)."""
    from mars5_tts_tpu.serving import chunk_text

    text = "Short one. " + "B" * 50 + ". Tail."
    chunks = chunk_text(text, max_chars=20)
    assert chunks[0] == "Short one."          # buffered text flushed first
    assert chunks[-1] == "Tail."              # not merged across the long sentence
    assert all("B" in c for c in chunks[1:-1])
    # character content survives in order
    flat = "".join(chunks).replace(" ", "").replace(",", "")
    assert flat == text.replace(" ", "")


def test_chunk_text_rejects_nonpositive():
    import pytest

    from mars5_tts_tpu.serving import chunk_text

    for bad in (0, -5):
        with pytest.raises(ValueError):
            chunk_text("anything", max_chars=bad)


def test_stream_first_chunk_ramp():
    """first_chunk_chars re-splits only the opening chunk (TTFA ramp)."""
    text = "Aaaa bbbb cccc dddd. Eeee ffff gggg hhhh. Iiii jjjj kkkk llll."
    base = _collect_stream(_FakeTTS(seg_len=2400), text, max_chars=100)
    assert len(base) == 1  # whole text fits one chunk at 100 chars
    ramp = _collect_stream(_FakeTTS(seg_len=2400), text, max_chars=100,
                           first_chunk_chars=25)
    assert len(ramp) >= 2
    assert len(ramp[0].text) <= 25
    # text content identical overall
    assert " ".join(c.text for c in ramp).split() == text.split()


def test_crossfade_concat_energy():
    from mars5_tts_tpu.serving import crossfade_concat

    sr = 24000
    a = np.ones(sr // 10, np.float32)
    b = np.ones(sr // 10, np.float32) * -1.0
    out = crossfade_concat([a, b], sr=sr, fade_ms=20, gap_ms=0)
    fade = int(sr * 0.02)
    assert len(out) == len(a) + len(b) - fade
    # equal-power fade: starts at a's value, ends at b's
    assert abs(out[0] - 1.0) < 1e-6 and abs(out[-1] + 1.0) < 1e-6
    assert np.isfinite(out).all()


def test_crossfade_single_and_empty():
    from mars5_tts_tpu.serving import crossfade_concat

    a = np.ones(100, np.float32)
    assert np.array_equal(crossfade_concat([a]), a)
    assert len(crossfade_concat([])) == 0


class _FakeTTS:
    """Deterministic stand-in for Mars5TTS: audio keyed on (text, seed)."""

    sr = 24000

    def __init__(self, seg_len=None):
        self.last_timing = {}
        self.seg_len = seg_len

    def tts(self, text, ref_audio, ref_transcript=None, cfg=None, seed=0):
        import zlib
        rng = np.random.default_rng(zlib.crc32(f"{text}|{seed}".encode()))
        n = self.seg_len if self.seg_len is not None else 2000 + (seed % 5) * 700
        audio = (rng.standard_normal(n) * 0.3).astype(np.float32)
        self.last_timing = {"seed": seed, "text": text}
        return None, audio


def _collect_stream(model, text, **kw):
    from mars5_tts_tpu.serving import stream_longform

    return list(stream_longform(model, text, ref_audio=None, ref_transcript="",
                                **kw))


def test_stream_matches_batch_bitexact():
    """Concatenated stream PCM is bit-identical to synthesize_longform."""
    from mars5_tts_tpu.serving import synthesize_longform

    text = "One sentence here. Two now! Three follows? Four ends. Five more."
    for kw in (dict(fade_ms=20.0, gap_ms=60.0),   # production defaults
               dict(fade_ms=20.0, gap_ms=0.0),    # crossfade eats segment tails
               dict(fade_ms=1000.0, gap_ms=5.0),  # fade longer than segments
               dict(fade_ms=0.0, gap_ms=0.0)):    # fade floor of 1 sample
        model = _FakeTTS(seg_len=900 if kw["fade_ms"] >= 1000 else None)
        batch = synthesize_longform(model, text, ref_audio=None,
                                    ref_transcript="", max_chars=16, **kw)
        stream = _collect_stream(model, text, max_chars=16, **kw)
        assert len(stream) == len(batch.chunks) >= 3
        assert [c.text for c in stream] == batch.chunks
        assert stream[-1].final and not any(c.final for c in stream[:-1])
        joined = np.concatenate([c.pcm for c in stream])
        assert joined.dtype == np.float32
        assert np.array_equal(joined, batch.audio), kw


def test_stream_first_audio_before_last_chunk():
    """Playable samples appear before the narration finishes (TTFA win)."""
    stream = _collect_stream(_FakeTTS(seg_len=2400), "A. B. C. D.", max_chars=2,
                             fade_ms=20.0, gap_ms=60.0)
    assert len(stream) == 4
    fade = int(24000 * 0.020)
    # every chunk yields audio as soon as it resolves; only the crossfade
    # tail (fade samples) is withheld at each junction
    assert all(len(c.pcm) > 0 for c in stream)
    assert len(stream[0].pcm) >= 2400 - fade - 200  # minus trim slack


def test_stream_single_chunk():
    from mars5_tts_tpu.serving import synthesize_longform

    model = _FakeTTS()
    text = "Short."
    batch = synthesize_longform(model, text, ref_audio=None, ref_transcript="")
    stream = _collect_stream(model, text)
    assert len(stream) == 1 and stream[0].final
    assert np.array_equal(stream[0].pcm, batch.audio)


def test_stream_first_chunk_timesteps_ramp():
    """first_chunk_timesteps reduces cfg.timesteps for chunk 0 ONLY."""
    from mars5_tts_tpu import InferenceConfig

    class _RecordingTTS(_FakeTTS):
        def __init__(self):
            super().__init__(seg_len=2400)
            self.seen_T = []

        def tts(self, text, ref_audio, ref_transcript=None, cfg=None, seed=0):
            self.seen_T.append(cfg.timesteps)
            return super().tts(text, ref_audio, ref_transcript, cfg, seed)

    text = "Aaaa bbbb cccc dddd. Eeee ffff gggg hhhh. Iiii jjjj kkkk llll."
    model = _RecordingTTS()
    out = _collect_stream(model, text, max_chars=25,
                          cfg=InferenceConfig(timesteps=200),
                          first_chunk_timesteps=100)
    assert len(out) >= 2
    assert model.seen_T[0] == 100
    assert all(t == 200 for t in model.seen_T[1:])
    # no ramp -> every chunk at cfg.timesteps
    model2 = _RecordingTTS()
    _collect_stream(model2, text, max_chars=25, cfg=InferenceConfig(timesteps=200))
    assert all(t == 200 for t in model2.seen_T)
