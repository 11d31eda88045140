"""torch.hub-style entry point (reference hubconf.py:17-69 equivalent).

Usage (local checkpoints; this environment has no network egress):

    from hubconf import mars5_english
    mars5, config_class = mars5_english(ar_path="mars5_ar.safetensors",
                                        nar_path="mars5_nar.safetensors")

When network access exists, ``pretrained=True`` without explicit paths downloads
the reference release checkpoints from the pinned URLs below into
``~/.cache/mars5_tts_tpu`` (same artifacts the reference's torch.hub flow uses —
our converter consumes them directly).
"""

import logging
import os
from pathlib import Path

dependencies = ["jax", "numpy"]

# pinned reference release URLs (reference hubconf.py:11-15)
AR_CKPT_URL = ("https://github.com/Camb-ai/MARS5-TTS/releases/download/"
               "v0.3/mars5_en_checkpoints_ar-3000000.safetensors")
NAR_CKPT_URL = ("https://github.com/Camb-ai/MARS5-TTS/releases/download/"
                "v0.3/mars5_en_checkpoints_nar-1980000.safetensors")


def _download(url: str, dest: Path, progress: bool = True) -> Path:
    dest.parent.mkdir(parents=True, exist_ok=True)
    if dest.exists():
        return dest
    import urllib.request
    logging.info("downloading %s -> %s", url, dest)
    urllib.request.urlretrieve(url, dest)  # noqa: S310
    return dest


def mars5_english(pretrained: bool = True, progress: bool = True, device=None,
                  ckpt_format: str = "safetensors", ar_path=None, nar_path=None,
                  **kwargs):
    """Load the MARS5 English model -> (Mars5TTS, InferenceConfig class).

    Mirrors the reference signature (hubconf.py:17). ``device`` is accepted for
    API compatibility and ignored (JAX places on the default device/mesh).
    """
    from mars5_tts_tpu.config import InferenceConfig
    from mars5_tts_tpu.pipeline import Mars5TTS

    assert ckpt_format in ("safetensors", "pt"), "ckpt_format must be safetensors|pt"
    cache = Path(os.environ.get("MARS5_CACHE", "~/.cache/mars5_tts_tpu")).expanduser()
    if ar_path is None:
        ar_path = _download(AR_CKPT_URL, cache / "mars5_ar.safetensors", progress)
    if nar_path is None:
        nar_path = _download(NAR_CKPT_URL, cache / "mars5_nar.safetensors", progress)
    model = Mars5TTS.from_local(ar_path, nar_path, **kwargs)
    return model, InferenceConfig
