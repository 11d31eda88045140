"""Intra-utterance progressive synthesis: stream audio while the NAR denoises.

``stream_longform`` (longform.py) streams per text chunk, so time-to-first-audio
is one whole chunk's synthesis (measured 2.0 s warm with both TTFA ramps,
``TTFA_r05.json``). This module streams *within* an utterance: the generated
frame axis is split into segments, and each segment is denoised as a
RePaint/deep-clone continuation — exactly the inpainting mode the model is
trained for (reference `mars5/diffuser.py:422-438` prepends a fully-known
8-codebook prompt; here the prompt is the reference audio plus the tail of the
frames already emitted) — then vocoded with a margin and emitted.

Design notes (TPU serving):

* Each segment call reuses ``perform_simple_inference``'s deep-clone fast path
  unchanged: one jitted scan per (prompt, segment) geometry. With
  ``ctx_frames`` fixed and the segment axis bucketed, serving compiles a small,
  static set of scan geometries.
* The acoustic context for segment k is ``[speaker prompt (optional); last
  ctx_frames of the emitted grid]``. The speaker prompt rides every call by
  default (strongest conditioning); ``keep_spk_prompt=False`` drops it after
  segment 0 for ~1.5x less NAR compute at some quality cost — score both with
  scripts/bench_progressive.py before changing the default.
* Unlike one-shot deep clone, the AR's re-generated prompt span
  (``raw_prompt_acoustic_len`` frames that tts crops from its output,
  inference.py:300-301) is dropped *before* denoising: the true prompt is
  already known context here, so re-denoising its AR re-generation would be
  pure warm-up compute.
* Trajectories differ from one-shot synthesis by construction (per-segment
  draws), like the reduced-T tiers; quality is scored against the one-shot
  reseed noise floor (QMODES criterion), not asserted bit-equal.
* No trim: silence trimming needs the full waveform; callers that buffer the
  stream can apply ``audio.trim.trim`` afterwards (stream_longform does this
  per text chunk).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..config import DSH, InferenceConfig
from ..diffusion import MultinomialDiffusion, perform_simple_inference
from ..utils.profiling import StageTimer


@dataclass
class ProgressiveChunk:
    """One emitted audio segment.

    ``pcm`` may be shorter than ``grid`` implies (the last ``vocode_margin``
    frames' samples are held back until the next segment supplies their
    right-context) and may be empty for very small ``seg_frames``; the final
    chunk flushes everything. ``timing`` is the CUMULATIVE stage report for
    the whole request so far (AR + every segment to date), unlike
    ``StreamChunk.timing`` which is per-text-chunk.
    """

    pcm: np.ndarray          # float32 mono 24 kHz samples
    frame_start: int         # emitted-grid frame range [start, end)
    frame_end: int
    grid: np.ndarray         # (frames, 8) int token grid of this segment
    timing: Optional[dict] = None


def _segment_grid(model, text_tokens, prompt_codes, seg_l0, cfg, key,
                  continuation: bool = True):
    """Denoise one segment.

    prompt_codes: (P, 8) acoustic context (speaker prompt and/or emitted
    tail); seg_l0: (S,) AR L0 ids for the segment. ``continuation=True``
    treats the context as a fully-KNOWN deep-clone prefix (RePaint inpaints
    the segment as its continuation); ``False`` uses it for speaker
    conditioning only — segment 0 of a shallow-clone request, matching the
    one-shot shallow semantics where generated audio does NOT acoustically
    continue the reference.
    """
    c_text = np.asarray(text_tokens, np.int64)[None]
    c_codes = np.asarray(prompt_codes, np.int64)[None]
    c_texts_lengths = np.asarray([c_text.shape[1]], np.int64)
    c_codes_lengths = np.asarray([c_codes.shape[1]], np.int64)
    _x = np.repeat(np.asarray(seg_l0, np.int64)[None, :, None], 8, axis=2)
    x_padding_mask = np.zeros((1, _x.shape[1]), bool)

    T = cfg.timesteps or model.default_T
    diff = MultinomialDiffusion(model.diffusion_n_classes, timesteps=T)
    dsh = DSH(last_greedy=True, x_0_temp=cfg.x_0_temp,
              guidance_w=cfg.nar_guidance_w, deep_clone=continuation,
              jump_len=1, jump_n_sample=1,
              q0_override_steps=cfg.q0_override_steps,
              enable_kevin_scaled_inference=True, progress=False,
              guidance_interval=model.guidance_interval)
    out = perform_simple_inference(
        model.codecnar, model.nar_cfg,
        (c_text, c_codes, c_texts_lengths, c_codes_lengths, _x, x_padding_mask),
        diff, diff.num_timesteps, dsh, retain_quant0=True, key=key,
        gen_bucket=model.nar_gen_bucket, text_bucket=model.nar_text_bucket)
    return np.asarray(out)[0]  # (S, 8); engine already cropped the prompt


def stream_tts(model, text: str, ref_audio, ref_transcript: Optional[str] = None,
               cfg: Optional[InferenceConfig] = None, seed: int = 0,
               seg_frames: int = 192, ctx_frames: int = 192,
               vocode_margin: int = 32, keep_spk_prompt: bool = True):
    """Yield ``ProgressiveChunk``s for one utterance, emitting audio per
    denoised segment instead of once at the end.

    The AR pass runs first (sequential by nature — L0 must exist before any
    frame can be denoised); streaming begins with the first segment's
    diffusion. Concatenated ``pcm`` matches ``model.vocode`` of the
    concatenated ``grid`` exactly away from utterance edges (the margin
    re-vocodes ``vocode_margin`` context frames so conv/iSTFT-overlap state is
    identical; tests assert this).
    """
    cfg = cfg or InferenceConfig()
    if seg_frames < 1 or ctx_frames < 0 or vocode_margin < 0:
        raise ValueError("seg_frames >= 1, ctx_frames/vocode_margin >= 0")
    if not keep_spk_prompt and ctx_frames == 0:
        # segments past the first would have an EMPTY deep-clone prompt — no
        # acoustic conditioning at all (and no continuity with emitted audio)
        raise ValueError("keep_spk_prompt=False requires ctx_frames >= 1")
    timer = StageTimer()
    (text_tokens, prompt_codec, raw_prompt_acoustic_len,
     gen_codes_decoded) = model._synthesize_codes(
        text, ref_audio, ref_transcript, cfg, seed, timer)

    spk_prompt = prompt_codec[0].T.astype(np.int64)          # (S, 8)
    # Deep clone: drop the AR's re-generated prompt span (tts crops it from
    # its output; the true prompt is already our known context).
    skip_front = raw_prompt_acoustic_len if cfg.deep_clone else 0
    l0 = np.asarray(gen_codes_decoded, np.int64)[skip_front:]
    if l0.size == 0:
        return

    emitted = np.zeros((0, 8), np.int64)
    emitted_pcm = 0          # samples already yielded
    hop = model.vocos_cfg.hop_length     # samples per codec frame (320 at 24 kHz)
    starts = list(range(0, len(l0), seg_frames))
    for k, s0 in enumerate(starts):
        seg = l0[s0: s0 + seg_frames]
        with timer.stage(f"nar_seg{k}"):
            parts = []
            if keep_spk_prompt or k == 0:
                parts.append(spk_prompt)
            if ctx_frames and len(emitted):
                parts.append(emitted[-ctx_frames:])
            prompt_k = np.concatenate(parts, axis=0)
            # segment 0 honors the request's clone mode: deep clone = the
            # reference is a known RePaint prefix; shallow = speaker
            # conditioning only (one-shot shallow semantics). Every later
            # segment is a continuation of the emitted tail by construction.
            grid = _segment_grid(model, text_tokens, prompt_k, seg, cfg,
                                 key=jax.random.key(seed + 1 + k, impl="rbg"),
                                 continuation=cfg.deep_clone or k > 0)
        emitted = np.concatenate([emitted, grid], axis=0)
        last = k == len(starts) - 1
        with timer.stage(f"vocode_seg{k}"):
            # Vocode with `vocode_margin` frames of re-vocoded LEFT context
            # (re-establishes conv/iSTFT-overlap state at the join) and hold
            # back the last `vocode_margin` frames' samples until the next
            # segment supplies their RIGHT context (the vocoder convs are
            # non-causal) — so concatenated chunks match one full vocode pass.
            v0 = max(0, len(emitted) - len(grid) - 2 * vocode_margin)
            pcm = np.asarray(model.vocode(jnp.asarray(emitted[v0:])))
            pcm = pcm[: (len(emitted) - v0) * hop]   # iSTFT 'same' length
            e1 = len(emitted) if last else max(0, len(emitted) - vocode_margin)
            pcm = pcm[emitted_pcm - v0 * hop: e1 * hop - v0 * hop]
        timing = timer.report(audio_seconds=(emitted_pcm + len(pcm)) / model.sr)
        yield ProgressiveChunk(pcm=pcm, frame_start=s0,
                               frame_end=s0 + len(grid), grid=grid,
                               timing=timing)
        emitted_pcm += len(pcm)


def progressive_tts(model, text: str, ref_audio,
                    ref_transcript: Optional[str] = None,
                    cfg: Optional[InferenceConfig] = None, seed: int = 0,
                    **kw):
    """Collect ``stream_tts`` into ``(grid (L, 8), audio (T,))`` — the
    non-streaming view of the progressive trajectory (scoring/tests)."""
    grids, pcms = [], []
    for chunk in stream_tts(model, text, ref_audio,
                            ref_transcript=ref_transcript, cfg=cfg, seed=seed,
                            **kw):
        grids.append(chunk.grid)
        pcms.append(chunk.pcm)
    if not grids:
        return np.zeros((0, 8), np.int64), np.zeros((0,), np.float32)
    return np.concatenate(grids, axis=0), np.concatenate(pcms)
