from .continuous import ContinuousBatcher, FusedContinuousBatcher, Request
from .longform import (LongformResult, StreamChunk, chunk_text,
                       crossfade_concat, stream_longform, synthesize_longform)

__all__ = ["ContinuousBatcher", "FusedContinuousBatcher",
           "LongformResult", "Request", "StreamChunk", "chunk_text",
           "crossfade_concat", "stream_longform", "synthesize_longform"]
