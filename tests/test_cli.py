"""CLI end-to-end: on-disk checkpoint loading, synthesis modes, streaming writer.

The reference has no CLI (deployment goes through cog/predict.py); ours is a
beyond-reference surface, so these tests pin its contract: loads checkpoints +
codec npz pytrees from disk, honors the sampling/clone flags, and the --stream
writer's incremental WAV is byte-identical to the --longform batch stitcher's.
"""

import os

import numpy as np
import pytest

from tests.conftest import reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(),
    reason="fixture builds tiny torch models from the reference")


@pytest.fixture(scope="module")
def cli_env(tmp_path_factory):
    from mars5_tts_tpu.audio.io import write_wav
    from mars5_tts_tpu.hub import save_pytree_npz
    from tests.fixtures import make_tiny_mars5

    d = str(tmp_path_factory.mktemp("cli"))
    mars5, info = make_tiny_mars5(d)
    enc = os.path.join(d, "encodec.npz")
    voc = os.path.join(d, "vocos.npz")
    save_pytree_npz(enc, mars5.encodec)
    save_pytree_npz(voc, mars5.vocos)
    ref = os.path.join(d, "ref.wav")
    t = np.arange(800) / 24000
    write_wav(ref, (0.4 * np.sin(2 * np.pi * 180 * t)).astype(np.float32))
    return {"dir": d, "ar": info["ar_path"], "nar": info["nar_path"],
            "enc": enc, "voc": voc, "ref": ref}


def _base_args(env, out, *extra):
    return ["--text", "hi there. ok then.", "--ref", env["ref"],
            "--ar", env["ar"], "--nar", env["nar"],
            "--encodec", env["enc"], "--vocos", env["voc"],
            "--shallow", "--timesteps", "8", "--max-len", "120",
            "--trim-db", "200", "--seed", "3", "--out", out, *extra]


def test_cli_parse_rejections():
    """--max-chars must be positive; --stream/--longform are exclusive."""
    from mars5_tts_tpu.cli import build_parser

    p = build_parser()
    base = ["--text", "t", "--ref", "r.wav", "--ar", "a", "--nar", "n"]
    for bad in (["--max-chars", "0"], ["--max-chars", "-3"],
                ["--first-chunk-chars", "0"], ["--stream", "--longform"]):
        with pytest.raises(SystemExit):
            p.parse_args(base + bad)
    assert p.parse_args(base + ["--max-chars", "1"]).max_chars == 1


def test_float_to_pcm16_matches_write_wav(tmp_path):
    """The shared converter is the same math write_wav uses (byte contract)."""
    import wave

    from mars5_tts_tpu.audio.io import float_to_pcm16, write_wav

    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(5000) * 0.7).astype(np.float32)
    audio[:10] = 3.0  # clip region
    path = str(tmp_path / "x.wav")
    write_wav(path, audio)
    with wave.open(path, "rb") as w:
        raw = w.readframes(w.getnframes())
    assert raw == float_to_pcm16(audio).tobytes()


@pytest.mark.heavy
def test_cli_shallow_synthesis(cli_env, capsys):
    from mars5_tts_tpu.audio.io import read_wav
    from mars5_tts_tpu.cli import main

    out = os.path.join(cli_env["dir"], "basic.wav")
    assert main(_base_args(cli_env, out, "--timings")) == 0
    audio, sr = read_wav(out)
    assert sr == 24000 and len(audio) > 0 and np.isfinite(audio).all()
    captured = capsys.readouterr().out
    assert "wrote" in captured and "ar_generate" in captured  # timings JSON


def test_cli_stream_matches_longform_bytes(cli_env, capsys):
    """--stream's incrementally-written WAV == --longform's batch WAV, byte-for-byte."""
    from mars5_tts_tpu.cli import main

    batch_out = os.path.join(cli_env["dir"], "batch.wav")
    stream_out = os.path.join(cli_env["dir"], "stream.wav")
    assert main(_base_args(cli_env, batch_out, "--longform", "--max-chars", "10")) == 0
    assert main(_base_args(cli_env, stream_out, "--stream", "--max-chars", "10")) == 0
    captured = capsys.readouterr().out
    assert "time-to-first-audio" in captured
    assert "chunk 1" in captured  # the text really did split into >= 2 chunks
    with open(batch_out, "rb") as f1, open(stream_out, "rb") as f2:
        assert f1.read() == f2.read()


@pytest.mark.heavy
def test_cli_progressive_stream(cli_env, capsys, tmp_path):
    """--progressive writes an incremental WAV whose PCM matches one vocode
    pass of the emitted grid (the serving-layer exactness contract) and is
    mutually exclusive with the other modes."""
    import wave

    from mars5_tts_tpu.cli import build_parser, main

    with pytest.raises(SystemExit):
        build_parser().parse_args(
            ["--text", "t", "--ref", "r", "--ar", "a", "--nar", "n",
             "--progressive", "--stream"])

    out = str(tmp_path / "prog.wav")
    rc = main(_base_args(cli_env, out, "--progressive",
                         "--seg-frames", "8", "--ctx-frames", "8",
                         "--timings"))
    assert rc == 0
    cap = capsys.readouterr().out
    assert "time-to-first-audio" in cap
    assert "segment 1:" in cap, "want a multi-segment stream"
    with wave.open(out, "rb") as w:
        assert w.getnframes() > 0
        assert w.getframerate() == 24000
