from .continuous import ContinuousBatcher, FusedContinuousBatcher, Request
from .longform import LongformResult, chunk_text, crossfade_concat, synthesize_longform

__all__ = ["ContinuousBatcher", "FusedContinuousBatcher",
           "LongformResult", "Request", "chunk_text",
           "crossfade_concat", "synthesize_longform"]
