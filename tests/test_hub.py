"""Checkpoint IO: .pt format, npz pytrees, metadata round-trips."""

import numpy as np
import pytest


def test_pt_checkpoint_roundtrip(tmp_path):
    import torch

    from mars5_tts_tpu.hub import load_checkpoint

    path = tmp_path / "ckpt.pt"
    torch.save({"vocab": {"texttok.model": "minbpe v1\n...\n"},
                "model": {"embed.weight": torch.randn(4, 3)}}, str(path))
    ckpt = load_checkpoint(path)
    assert ckpt["vocab"]["texttok.model"].startswith("minbpe v1")
    assert ckpt["model"]["embed.weight"].shape == (4, 3)


def test_pt_bare_state_dict(tmp_path):
    import torch

    from mars5_tts_tpu.hub import load_checkpoint

    path = tmp_path / "bare.pt"
    torch.save({"w": torch.ones(2, 2)}, str(path))
    ckpt = load_checkpoint(path)
    assert np.array_equal(ckpt["model"]["w"], np.ones((2, 2)))
    assert ckpt["vocab"] == {}


def test_unsupported_format(tmp_path):
    from mars5_tts_tpu.hub import load_checkpoint

    with pytest.raises(ValueError, match="unsupported checkpoint format"):
        load_checkpoint(tmp_path / "x.onnx")


def test_npz_pytree_roundtrip(tmp_path):
    from mars5_tts_tpu.hub import load_pytree_npz, save_pytree_npz

    tree = {"a": np.arange(6).reshape(2, 3),
            "nested": {"b": np.ones(4), "list": [np.zeros(2), np.full(3, 7)]}}
    path = tmp_path / "tree.npz"
    save_pytree_npz(path, tree)
    back = load_pytree_npz(path)
    assert np.array_equal(back["a"], tree["a"])
    assert np.array_equal(back["nested"]["list"][1], np.full(3, 7))
    assert isinstance(back["nested"]["list"], list)


def test_safetensors_metadata_config(tmp_path):
    from mars5_tts_tpu.hub import load_checkpoint, save_checkpoint

    path = tmp_path / "m.safetensors"
    save_checkpoint(path, {"w": np.ones((2, 2), np.float32)},
                    vocab={"texttok.model": "minbpe v1\np\n0\n"},
                    config={"dim": 64, "n_heads": 4})
    ckpt = load_checkpoint(path)
    assert ckpt["config"] == {"dim": 64, "n_heads": 4}
    assert "texttok.model" in ckpt["vocab"]
