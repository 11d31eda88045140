from .continuous import ContinuousBatcher, FusedContinuousBatcher, Request
from .longform import (LongformResult, StreamChunk, chunk_text,
                       crossfade_concat, stream_longform, synthesize_longform)
from .progressive import ProgressiveChunk, progressive_tts, stream_tts

__all__ = ["ContinuousBatcher", "FusedContinuousBatcher",
           "LongformResult", "ProgressiveChunk", "Request", "StreamChunk",
           "chunk_text", "crossfade_concat", "progressive_tts",
           "stream_longform", "stream_tts", "synthesize_longform"]
