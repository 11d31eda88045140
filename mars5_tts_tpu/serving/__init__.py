from .longform import LongformResult, chunk_text, crossfade_concat, synthesize_longform

__all__ = ["LongformResult", "chunk_text", "crossfade_concat", "synthesize_longform"]
