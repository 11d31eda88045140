from .continuous import ContinuousBatcher, Request
from .longform import LongformResult, chunk_text, crossfade_concat, synthesize_longform

__all__ = ["ContinuousBatcher", "LongformResult", "Request", "chunk_text",
           "crossfade_concat", "synthesize_longform"]
