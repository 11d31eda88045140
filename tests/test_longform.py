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
