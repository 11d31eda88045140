"""Long-form narration: chunked paragraph synthesis with crossfade stitching.

The reference caps AR generation at ~2000 codes (≈26 s) and lists "long-form
chunked synthesis" as an open roadmap TODO (reference README.md:197,
inference.py:56-59); BASELINE config #4 makes it a first-class capability here.

Strategy: split text into sentence-sized chunks under a character budget,
synthesize each chunk independently (same reference audio/transcript, so the
voice stays consistent), trim per-chunk silence, and overlap-add consecutive
chunks with a short equal-power crossfade.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Optional

import numpy as np

from ..audio.trim import trim
from ..config import InferenceConfig

_SENTENCE_SPLIT = re.compile(r"(?<=[.!?])\s+")


def chunk_text(text: str, max_chars: int = 300) -> list[str]:
    """Split text on sentence boundaries into chunks of at most ``max_chars``
    (a single over-long sentence is split on commas, then hard-wrapped)."""
    if max_chars < 1:
        raise ValueError(f"max_chars must be >= 1, got {max_chars}")
    sentences = [s.strip() for s in _SENTENCE_SPLIT.split(text.strip()) if s.strip()]
    chunks: list[str] = []
    cur = ""
    for s in sentences:
        if len(s) > max_chars:
            # Flush buffered shorter sentences first so chunk order follows
            # text order (an over-long sentence must not jump the queue).
            if cur:
                chunks.append(cur)
                cur = ""
            parts = [p.strip() for p in s.split(",")]
            rebuilt = ""
            for p in parts:
                if rebuilt and len(rebuilt) + len(p) + 2 > max_chars:
                    chunks.append(rebuilt + ",")
                    rebuilt = p
                else:
                    rebuilt = (rebuilt + ", " + p) if rebuilt else p
            for i in range(0, len(rebuilt), max_chars):
                frag = rebuilt[i:i + max_chars].strip()
                if frag:
                    chunks.append(frag)
            continue
        if cur and len(cur) + len(s) + 1 > max_chars:
            chunks.append(cur)
            cur = s
        else:
            cur = (cur + " " + s) if cur else s
    if cur:
        chunks.append(cur)
    return chunks


def crossfade_concat(segments: list[np.ndarray], sr: int = 24000,
                     fade_ms: float = 20.0, gap_ms: float = 60.0) -> np.ndarray:
    """Concatenate audio segments with an equal-power crossfade and short gaps."""
    if not segments:
        return np.zeros(0, np.float32)
    fade = max(int(sr * fade_ms / 1000), 1)
    gap = np.zeros(int(sr * gap_ms / 1000), np.float32)
    out = segments[0].astype(np.float32)
    for seg in segments[1:]:
        seg = seg.astype(np.float32)
        out = np.concatenate([out, gap])
        n = min(fade, len(out), len(seg))
        if n > 0:
            t = np.linspace(0.0, np.pi / 2, n, dtype=np.float32)
            out_tail = out[-n:] * np.cos(t)
            seg_head = seg[:n] * np.sin(t)
            out = np.concatenate([out[:-n], out_tail + seg_head, seg[n:]])
        else:
            out = np.concatenate([out, seg])
    return out


@dataclass
class LongformResult:
    audio: np.ndarray
    chunks: list[str]
    chunk_audio_seconds: list[float]
    timings: list[dict]


@dataclass
class StreamChunk:
    """One incremental slice of a streaming long-form synthesis.

    ``pcm`` is immediately playable: concatenating every ``pcm`` in order is
    bit-identical to ``synthesize_longform(...).audio`` for the same inputs.
    """
    pcm: np.ndarray           # samples safe to play now (may be empty early on)
    index: int                # which text chunk produced this yield
    text: str                 # that chunk's text
    audio_seconds: float      # duration of this chunk's (trimmed) segment
    timing: dict              # per-chunk stage timing (tts_model.last_timing)
    final: bool               # True on the last yield (stream fully flushed)


def synthesize_longform(tts_model, text: str, ref_audio,
                        ref_transcript: Optional[str] = None,
                        cfg: Optional[InferenceConfig] = None,
                        max_chars: int = 300, fade_ms: float = 20.0,
                        gap_ms: float = 60.0, seed: int = 0) -> LongformResult:
    """Narrate arbitrarily long ``text`` by chunked synthesis + stitching.

    Args:
        tts_model: a ``Mars5TTS`` instance.
        Everything else mirrors ``Mars5TTS.tts``.
    """
    cfg = cfg or InferenceConfig()
    chunks = chunk_text(text, max_chars=max_chars)
    segments, timings, secs = [], [], []
    for i, chunk in enumerate(chunks):
        _, audio = tts_model.tts(chunk, ref_audio, ref_transcript=ref_transcript,
                                 cfg=cfg, seed=seed + i)
        audio, _ = trim(np.asarray(audio), top_db=cfg.trim_db)
        segments.append(audio)
        secs.append(len(audio) / tts_model.sr)
        timings.append(dict(tts_model.last_timing))
    return LongformResult(audio=crossfade_concat(segments, sr=tts_model.sr,
                                                 fade_ms=fade_ms, gap_ms=gap_ms),
                          chunks=chunks, chunk_audio_seconds=secs, timings=timings)


def stream_longform(tts_model, text: str, ref_audio,
                    ref_transcript: Optional[str] = None,
                    cfg: Optional[InferenceConfig] = None,
                    max_chars: int = 300, fade_ms: float = 20.0,
                    gap_ms: float = 60.0, seed: int = 0,
                    first_chunk_chars: Optional[int] = None,
                    first_chunk_timesteps: Optional[int] = None):
    """Streaming long-form narration: yields playable PCM incrementally.

    Same synthesis as :func:`synthesize_longform`, but audio is surfaced as
    soon as it is final: time-to-first-audio is one chunk's synthesis instead
    of the whole narration. Because consecutive chunks are stitched with an
    equal-power crossfade, the last ``fade`` samples of the running stream can
    still be modified by the NEXT segment — those are held back and emitted
    once the junction is resolved (or at end of stream). Concatenating every
    yielded ``pcm`` is bit-identical to the batch stitcher's output (the
    per-junction math below reproduces :func:`crossfade_concat` exactly).

    ``first_chunk_chars`` (optional) is a time-to-first-audio ramp: the first
    text chunk is re-split at this smaller budget so the opening chunk — the
    one the listener is waiting on — is cheap to synthesize, and later chunks
    use the full ``max_chars``. Synthesis cost scales superlinearly with chunk
    length (AR decode is per-token, NAR diffusion is per-frame x T steps), so
    an 80-char opener cuts TTFA roughly proportionally. With the ramp active
    the chunking differs from the batch stitcher's, so the bit-identity above
    holds only against ``synthesize_longform`` run on the same chunk list.

    ``first_chunk_timesteps`` (optional) is the second TTFA ramp: the FIRST
    chunk's NAR diffusion runs at this reduced step count (e.g. 100 — the
    throughput tier promoted PASS by the reseed-floor criterion in
    scripts/bench_quality_modes.py), later chunks at ``cfg.timesteps``. Only
    the opening few seconds of audio take the (statistically reseed-level)
    quality dial; everything after runs at parity settings.

    Yields :class:`StreamChunk` once per text chunk (the last one carries
    ``final=True`` and includes the held-back tail).
    """
    cfg = cfg or InferenceConfig()
    chunks = chunk_text(text, max_chars=max_chars)
    if first_chunk_chars is not None and chunks and len(chunks[0]) > first_chunk_chars:
        chunks = chunk_text(chunks[0], max_chars=first_chunk_chars) + chunks[1:]
    sr = tts_model.sr
    fade = max(int(sr * fade_ms / 1000), 1)
    gap = np.zeros(int(sr * gap_ms / 1000), np.float32)
    held = np.zeros(0, np.float32)  # unemitted suffix of the stream
    total = 0                       # stream length so far (= len(out) in crossfade_concat)
    last = len(chunks) - 1
    for i, chunk in enumerate(chunks):
        chunk_cfg = cfg
        if i == 0 and first_chunk_timesteps is not None:
            from dataclasses import replace
            chunk_cfg = replace(cfg, timesteps=first_chunk_timesteps)
        _, audio = tts_model.tts(chunk, ref_audio, ref_transcript=ref_transcript,
                                 cfg=chunk_cfg, seed=seed + i)
        seg, _ = trim(np.asarray(audio), top_db=cfg.trim_db)
        seg = seg.astype(np.float32)
        if i == 0:
            cur = seg
            total = len(seg)
        else:
            held = np.concatenate([held, gap])
            total += len(gap)
            n = min(fade, total, len(seg))
            if n > 0:
                t = np.linspace(0.0, np.pi / 2, n, dtype=np.float32)
                mixed = held[len(held) - n:] * np.cos(t) + seg[:n] * np.sin(t)
                cur = np.concatenate([held[:len(held) - n], mixed, seg[n:]])
            else:
                cur = np.concatenate([held, seg])
            total += len(seg) - n
        # The next junction can rewrite at most min(fade, total) trailing
        # samples (n above is capped by both); everything earlier is final.
        keep = 0 if i == last else min(fade, total)
        emit, held = cur[:len(cur) - keep], cur[len(cur) - keep:]
        yield StreamChunk(pcm=emit, index=i, text=chunk,
                          audio_seconds=len(seg) / sr,
                          timing=dict(tts_model.last_timing), final=i == last)
