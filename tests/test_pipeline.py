"""End-to-end Mars5TTS.tts() on the tiny fixture checkpoint (BASELINE config #1/#2 shape)."""

import numpy as np
import pytest

from tests.conftest import reference_available

pytestmark = pytest.mark.skipif(not reference_available(), reason="fixture builds tiny torch models from the reference")


@pytest.fixture(scope="module")
def tiny_mars5(tmp_path_factory):
    from tests.fixtures import make_tiny_mars5

    mars5, info = make_tiny_mars5(str(tmp_path_factory.mktemp("ckpt")))
    mars5.default_T = 8  # keep the DDPM short for CI
    return mars5, info


def _ref_audio(n=800):
    t = np.arange(n) / 24000
    return (0.4 * np.sin(2 * np.pi * 180 * t)).astype(np.float32)


def test_tts_shallow_clone(tiny_mars5):
    from mars5_tts_tpu import InferenceConfig

    mars5, _ = tiny_mars5
    cfg = InferenceConfig(deep_clone=False, generate_max_len_override=160,
                          timesteps=8, trim_db=200)  # trim_db huge -> keep audio
    ar_codes, audio = mars5.tts("hi", _ref_audio(), ref_transcript="", cfg=cfg, seed=0)
    assert ar_codes.ndim == 1 and len(ar_codes) > 0
    assert (ar_codes >= 0).all() and (ar_codes < 1024).all()
    assert audio.ndim == 1 and len(audio) > 0 and np.isfinite(audio).all()
    # timing counters populated
    assert set(mars5.last_timing["stages_s"]) >= {
        "tokenize_text", "encode_reference", "ar_generate", "nar_diffusion", "vocode"}


def test_tts_deep_clone(tiny_mars5):
    from mars5_tts_tpu import InferenceConfig

    mars5, _ = tiny_mars5
    cfg = InferenceConfig(deep_clone=True, generate_max_len_override=260,
                          timesteps=8, trim_db=200)
    ar_codes, audio = mars5.tts("ok", _ref_audio(), ref_transcript="a b", cfg=cfg, seed=1)
    assert len(ar_codes) >= 0
    assert np.isfinite(audio).all()


def test_tts_deep_clone_requires_transcript(tiny_mars5):
    from mars5_tts_tpu import InferenceConfig

    mars5, _ = tiny_mars5
    with pytest.raises(AssertionError, match="deep clone"):
        mars5.tts("x", _ref_audio(), ref_transcript=None,
                  cfg=InferenceConfig(deep_clone=True))


@pytest.mark.slow
def test_tts_determinism(tiny_mars5):
    from mars5_tts_tpu import InferenceConfig

    mars5, _ = tiny_mars5
    cfg = InferenceConfig(deep_clone=False, generate_max_len_override=120,
                          timesteps=8, trim_db=200)
    a1, w1 = mars5.tts("yo", _ref_audio(), ref_transcript="", cfg=cfg, seed=3)
    a2, w2 = mars5.tts("yo", _ref_audio(), ref_transcript="", cfg=cfg, seed=3)
    assert a1.tolist() == a2.tolist()
    np.testing.assert_array_equal(w1, w2)


def test_get_speaker_embedding(tiny_mars5):
    mars5, _ = tiny_mars5
    emb = mars5.get_speaker_embedding(_ref_audio())
    assert emb.shape == (1, mars5.ar_cfg.dim)
    assert np.isfinite(emb).all()


def test_vocode_ar_codes_debug_path(tiny_mars5):
    """The demo notebook's `vocode(ar_codes[:, None])`-style call (tiled L0)."""
    mars5, _ = tiny_mars5
    codes = np.random.default_rng(0).integers(0, 1024, size=(12, 8))
    audio = mars5.vocode(codes)
    assert audio.shape == (12 * mars5.vocos_cfg.hop_length,)


def test_tts_shallow_none_transcript_typeerror(tiny_mars5):
    """Reference quirk preserved: shallow clone with ref_transcript=None raises
    TypeError at the unconditional transcript concat (inference.py:226)."""
    from mars5_tts_tpu import InferenceConfig

    mars5, _ = tiny_mars5
    with pytest.raises(TypeError):
        mars5.tts("x", _ref_audio(), ref_transcript=None,
                  cfg=InferenceConfig(deep_clone=False))


@pytest.mark.slow
def test_tts_batch(tiny_mars5):
    """Batched public API (config #3): several texts, one reference voice."""
    from mars5_tts_tpu import InferenceConfig

    mars5, _ = tiny_mars5
    cfg = InferenceConfig(deep_clone=False, generate_max_len_override=140,
                          timesteps=6, trim_db=200)
    texts = ["one", "two here", "and three"]
    results = mars5.tts_batch(texts, _ref_audio(), ref_transcript="", cfg=cfg, seed=2)
    assert len(results) == 3
    for codes, wav in results:
        assert codes.ndim == 1 and (codes >= 0).all() and (codes < 1024).all()
        assert wav.ndim == 1 and np.isfinite(wav).all()
    assert "ar_generate" in mars5.last_timing["stages_s"]


@pytest.mark.parametrize("deep", [False, True])
@pytest.mark.slow
def test_tts_batch_per_row_voices(tiny_mars5, deep):
    """Mixed-voice batch: per-text reference audios (and transcripts under deep
    clone) ride the per-row speaker streams + ragged NAR branch end-to-end."""
    from mars5_tts_tpu import InferenceConfig

    mars5, _ = tiny_mars5
    cfg = InferenceConfig(deep_clone=deep, generate_max_len_override=260,
                          timesteps=6, trim_db=200)
    refs = [_ref_audio(800), _ref_audio(1400) * 0.5]  # different lengths/voices
    results = mars5.tts_batch(["one", "two here"], refs,
                              ref_transcript=["a", "b c"], cfg=cfg, seed=4)
    assert len(results) == 2
    for codes, wav in results:
        assert codes.ndim == 1 and (codes >= 0).all() and (codes < 1024).all()
        assert wav.ndim == 1 and np.isfinite(wav).all()

    with pytest.raises(ValueError, match="reference audios"):
        mars5.tts_batch(["a"], refs, ref_transcript=["a", "b"], cfg=cfg)


@pytest.mark.slow
def test_longform_end_to_end(tiny_mars5):
    """synthesize_longform drives tts() per chunk and stitches (config #4)."""
    from mars5_tts_tpu import InferenceConfig
    from mars5_tts_tpu.serving import synthesize_longform

    mars5, _ = tiny_mars5
    cfg = InferenceConfig(deep_clone=False, generate_max_len_override=120,
                          timesteps=6, trim_db=200)
    text = "First sentence here. Second one follows! A third ends it."
    result = synthesize_longform(mars5, text, _ref_audio(), ref_transcript="",
                                 cfg=cfg, max_chars=25, seed=0)
    assert len(result.chunks) >= 2
    assert len(result.timings) == len(result.chunks)
    assert len(result.audio) > 0 and np.isfinite(result.audio).all()
    assert abs(sum(result.chunk_audio_seconds) * 24000 - len(result.audio)) < \
        24000  # stitching only adds/removes fades+gaps

    # streaming variant: chunks surface incrementally, concatenation is
    # bit-identical to the batch stitcher (same seeds per chunk)
    from mars5_tts_tpu.serving import stream_longform
    stream = list(stream_longform(mars5, text, _ref_audio(), ref_transcript="",
                                  cfg=cfg, max_chars=25, seed=0))
    assert [c.text for c in stream] == result.chunks
    assert stream[-1].final
    assert all("rtf" in c.timing or c.timing for c in stream)
    assert np.array_equal(np.concatenate([c.pcm for c in stream]), result.audio)


@pytest.mark.slow
def test_tts_backend_knobs(tiny_mars5, tmp_path):
    """ar_backend/nar_backend knobs construct and synthesize on CPU.

    Pallas is disabled off-TPU, so ``fused`` falls back to the XLA engine —
    tokens must match the bf16 default exactly; ``nar_backend="int8"``
    exercises the quantized NAR end-to-end (agreement is characterized in
    tests/test_quant.py, here it just must run).
    """
    import numpy as np
    from mars5_tts_tpu.config import InferenceConfig
    from mars5_tts_tpu.pipeline import Mars5TTS

    mars5, info = tiny_mars5
    rng = np.random.default_rng(0)
    ref_audio = (rng.standard_normal(2400) * 0.05).astype(np.float32)
    cfg = InferenceConfig(deep_clone=False, rep_penalty_window=8,
                          timesteps=4, generate_max_len_override=24)

    ar, wav = mars5.tts("hi there", ref_audio, "", cfg=cfg, seed=3)

    m2 = Mars5TTS.from_local(info["ar_path"], info["nar_path"],
                             encodec_params=mars5.encodec,
                             vocos_params=mars5.vocos,
                             ar_cfg=mars5.ar_cfg, nar_cfg=mars5.nar_cfg,
                             encodec_cfg=mars5.encodec_cfg,
                             vocos_cfg=mars5.vocos_cfg,
                             ar_backend="fused4", nar_backend="int8")
    ar2, wav2 = m2.tts("hi there", ref_audio, "", cfg=cfg, seed=3)
    np.testing.assert_array_equal(np.asarray(ar), np.asarray(ar2))
    assert np.isfinite(np.asarray(wav2)).all()


@pytest.mark.slow
def test_tts_fused_branches_interpret(tmp_path_factory, monkeypatch):
    """The TPU-only fused AR branches of tts/tts_batch, driven on CPU via
    MARS5_FUSED_INTERPRET=emu (pure-jnp kernel emulation) at a kernel-legal
    geometry — exercises the pipeline glue (prompt/spk/est plumbing, pack
    cache incl. batch-adjusted dims) end-to-end."""
    import numpy as np
    from tests.fixtures import make_tiny_mars5
    from mars5_tts_tpu.config import InferenceConfig
    from mars5_tts_tpu.pipeline import Mars5TTS

    mars5, info = make_tiny_mars5(
        str(tmp_path_factory.mktemp("ckpt_fused")), fused_geom=True)
    m2 = Mars5TTS.from_local(info["ar_path"], info["nar_path"],
                             encodec_params=mars5.encodec,
                             vocos_params=mars5.vocos,
                             ar_cfg=mars5.ar_cfg, nar_cfg=mars5.nar_cfg,
                             encodec_cfg=mars5.encodec_cfg,
                             vocos_cfg=mars5.vocos_cfg,
                             ar_backend="fused4", nar_backend="int8")
    monkeypatch.setenv("MARS5_FUSED_INTERPRET", "emu")
    rng = np.random.default_rng(0)
    ref_audio = (rng.standard_normal(2400) * 0.05).astype(np.float32)
    cfg = InferenceConfig(deep_clone=False, rep_penalty_window=8,
                          timesteps=4, generate_max_len_override=24)
    ar, wav = m2.tts("hi", ref_audio, "", cfg=cfg, seed=3)
    assert np.isfinite(np.asarray(wav)).all()

    outs = m2.tts_batch(["hi", "yo there"], ref_audio, "", cfg=cfg, seed=3)
    assert len(outs) == 2
    for codes, w in outs:
        assert np.isfinite(np.asarray(w)).all()


@pytest.mark.slow
def test_deploy_predictor_end_to_end(tiny_mars5, tmp_path):
    """deploy/predict.Predictor: setup from checkpoints + WAV-in/WAV-out."""
    import sys
    import numpy as np
    sys.path.insert(0, "/root/repo")
    from deploy.predict import Predictor
    from mars5_tts_tpu.audio.io import read_wav, write_wav
    from mars5_tts_tpu.hub import save_pytree_npz

    mars5, info = tiny_mars5
    enc_path = str(tmp_path / "encodec.npz")
    voc_path = str(tmp_path / "vocos.npz")
    save_pytree_npz(enc_path, mars5.encodec)
    save_pytree_npz(voc_path, mars5.vocos)

    rng = np.random.default_rng(0)
    ref_path = str(tmp_path / "ref.wav")
    write_wav(ref_path, (rng.standard_normal(2400) * 0.05).astype(np.float32),
              sr=24000)

    p = Predictor()
    p.setup(ar_path=info["ar_path"], nar_path=info["nar_path"],
            encodec_path=enc_path, vocos_path=voc_path)
    # tiny fixture: cap generation/timesteps so the test stays fast (the
    # Predictor's fixed deep-clone cfg would run T=200 on CPU)
    import dataclasses
    orig_tts = p.model.tts
    def fast_tts(text, audio, ref_transcript=None, cfg=None, **kw):
        cfg = dataclasses.replace(cfg, timesteps=4, generate_max_len_override=360)
        return orig_tts(text, audio, ref_transcript=ref_transcript, cfg=cfg, **kw)
    p.model.tts = fast_tts
    out = p.predict("hello", ref_path, "hi", out_path=str(tmp_path / "out.wav"))
    wav, sr = read_wav(out)
    assert sr == 24000 and np.isfinite(wav).all() and wav.size > 0


@pytest.mark.heavy
def test_tts_guidance_interval(tiny_mars5):
    """The guidance-interval serving dial synthesizes end-to-end and the
    default interval reproduces the reference-behavior output exactly."""
    from mars5_tts_tpu import InferenceConfig

    mars5, _ = tiny_mars5
    cfg = InferenceConfig(deep_clone=False, generate_max_len_override=120,
                          timesteps=6, trim_db=200)
    _, base = mars5.tts("interval check", _ref_audio(), ref_transcript="",
                        cfg=cfg, seed=11)
    assert mars5.guidance_interval == (0.0, 1.0)
    try:
        mars5.guidance_interval = (0.5, 1.0)
        _, fast = mars5.tts("interval check", _ref_audio(), ref_transcript="",
                            cfg=cfg, seed=11)
        mars5.guidance_interval = (0.0, 1.0)
        _, again = mars5.tts("interval check", _ref_audio(), ref_transcript="",
                             cfg=cfg, seed=11)
    finally:
        mars5.guidance_interval = (0.0, 1.0)
    assert np.array_equal(base, again)       # default = reference behavior
    assert len(fast) > 0 and np.isfinite(fast).all()


@pytest.mark.heavy
def test_tts_nar_geometry_buckets(tiny_mars5):
    """NAR geometry buckets synthesize end-to-end, keep the output length
    exact (pads cropped), and stay deterministic; a bucket of 1 is the exact
    path bit-for-bit (no padding ever happens)."""
    from mars5_tts_tpu import InferenceConfig

    mars5, _ = tiny_mars5
    cfg = InferenceConfig(deep_clone=True, generate_max_len_override=260,
                          timesteps=6, trim_db=200)
    args = ("bucket check", _ref_audio())
    _, base = mars5.tts(*args, ref_transcript="a b", cfg=cfg, seed=5)
    try:
        mars5.nar_gen_bucket, mars5.nar_text_bucket = 1, 1
        _, same = mars5.tts(*args, ref_transcript="a b", cfg=cfg, seed=5)
        mars5.nar_gen_bucket, mars5.nar_text_bucket = 16, 8
        _, b1 = mars5.tts(*args, ref_transcript="a b", cfg=cfg, seed=5)
        _, b2 = mars5.tts(*args, ref_transcript="a b", cfg=cfg, seed=5)
    finally:
        mars5.nar_gen_bucket = mars5.nar_text_bucket = 0
    np.testing.assert_array_equal(base, same)   # bucket=1 == exact path
    np.testing.assert_array_equal(b1, b2)       # bucketed is deterministic
    assert len(b1) == len(base)                 # pads cropped: same audio length
    assert np.isfinite(b1).all()


def test_from_params_matches_checkpoint_pipeline(tiny_mars5):
    """Mars5TTS.from_params (in-memory params + tokenizer objects, no torch
    checkpoint round trip) produces the exact same synthesis as the
    checkpoint-constructed pipeline."""
    from mars5_tts_tpu import InferenceConfig
    from mars5_tts_tpu.pipeline import Mars5TTS

    mars5, _ = tiny_mars5
    clone = Mars5TTS.from_params(
        mars5.codeclm, mars5.codecnar, mars5.ar_cfg, mars5.nar_cfg,
        texttok=mars5.texttok, speechtok=mars5.speechtok,
        encodec_params=mars5.encodec, vocos_params=mars5.vocos,
        encodec_cfg=mars5.encodec_cfg, vocos_cfg=mars5.vocos_cfg)
    clone.default_T = mars5.default_T
    assert clone.n_vocab == mars5.n_vocab
    assert clone.n_text_vocab == mars5.n_text_vocab

    cfg = InferenceConfig(deep_clone=False, generate_max_len_override=160,
                          timesteps=8, trim_db=200)
    ref = _ref_audio()
    codes_a, audio_a = mars5.tts("hi", ref, ref_transcript="", cfg=cfg, seed=3)
    codes_b, audio_b = clone.tts("hi", ref, ref_transcript="", cfg=cfg, seed=3)
    np.testing.assert_array_equal(codes_a, codes_b)
    np.testing.assert_array_equal(audio_a, audio_b)
