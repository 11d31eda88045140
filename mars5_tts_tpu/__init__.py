"""MARS5-TTS-TPU: a TPU-native (JAX/XLA/Pallas) zero-shot voice-cloning TTS framework.

Reimplements the full capability surface of Camb-ai/MARS5-TTS — the ~750M-param AR
codec language model, the ~450M-param NAR multinomial-diffusion refiner, Encodec
reference encoding, Vocos vocoding, minbpe tokenization, and the ``Mars5TTS`` public
API — designed TPU-first: functional parameter pytrees, jit-compiled fixed-shape
decode loops, ``lax.scan`` diffusion, and ``jax.sharding`` meshes for multi-chip
serving and training.
"""

from .config import DSH, InferenceConfig

__version__ = "0.1.0"

__all__ = ["DSH", "InferenceConfig", "__version__"]


def __getattr__(name):
    # Lazy import of the heavyweight orchestration layer so that light users
    # (tokenizers, config) do not pay for JAX model imports.
    if name == "Mars5TTS":
        from .pipeline import Mars5TTS
        return Mars5TTS
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
