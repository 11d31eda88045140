"""Trim/DSP parity vs the reference's torch-based librosa port."""

import numpy as np
import pytest

from tests.conftest import add_reference_to_path, reference_available

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")


@pytest.fixture(scope="module")
def ref_trim():
    add_reference_to_path()
    import mars5.trim as t

    # The reference's vendored numpy as_strided calls np.array(tensor, copy=False),
    # which numpy>=2.0 rejects for torch tensors. Shim it with numpy's own
    # stride_tricks on the underlying buffer (same semantics).
    def _as_strided(x, shape=None, strides=None, subok=False, writeable=True):
        arr = x.numpy() if hasattr(x, "numpy") else np.asarray(x)
        return np.lib.stride_tricks.as_strided(arr, shape=shape, strides=strides)

    t.as_strided = _as_strided
    return t


def _audio_with_silence(rng, sr=24000):
    sig = np.concatenate([
        np.zeros(int(0.3 * sr), np.float32),
        (0.5 * np.sin(2 * np.pi * 220 * np.arange(int(0.8 * sr)) / sr)).astype(np.float32),
        np.zeros(int(0.5 * sr), np.float32),
    ])
    return sig + rng.standard_normal(len(sig)).astype(np.float32) * 1e-5


def test_rms_parity(ref_trim):
    import torch
    from mars5_tts_tpu.audio import rms

    rng = np.random.default_rng(0)
    y = _audio_with_silence(rng)
    ref = ref_trim.rms(y=torch.tensor(y)).numpy()
    ours = rms(y)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_power_to_db_parity(ref_trim):
    import torch
    from mars5_tts_tpu.audio import power_to_db

    rng = np.random.default_rng(1)
    s = (rng.random(200) ** 3).astype(np.float32)
    ref = ref_trim.power_to_db(torch.tensor(s), ref=torch.max, top_db=80.0).numpy()
    ours = power_to_db(s, ref=np.max, top_db=80.0)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


@pytest.mark.parametrize("top_db", [27.0, 60.0])
def test_trim_parity(ref_trim, top_db):
    import torch
    from mars5_tts_tpu.audio import trim

    rng = np.random.default_rng(2)
    y = _audio_with_silence(rng)
    ref_y, ref_idx = ref_trim.trim(torch.tensor(y), top_db=top_db)
    ours_y, ours_idx = trim(y, top_db=top_db)
    assert ours_idx.tolist() == ref_idx.numpy().tolist()
    np.testing.assert_allclose(ours_y, ref_y.numpy(), atol=0)
    # sanity: it actually trimmed some silence
    assert len(ours_y) < len(y)


def test_trim_all_silent(ref_trim):
    import torch
    from mars5_tts_tpu.audio import trim

    y = np.zeros(5000, np.float32)
    ref_y, ref_idx = ref_trim.trim(torch.tensor(y), top_db=27)
    ours_y, ours_idx = trim(y, top_db=27)
    assert ours_idx.tolist() == ref_idx.numpy().tolist()
    assert len(ours_y) == len(ref_y)
