"""Mars5TTS — the public orchestration API (reference inference.py:79-307).

Sequences the full zero-shot voice-cloning pipeline, preserving the reference's
behavior step for step: tokenize -> Encodec-encode the reference audio ->
speech-BPE the L0 codes -> shallow/deep prompt assembly -> AR generation ->
AR-output parsing -> NAR multinomial-diffusion refinement -> Vocos vocode ->
silence trim. ``InferenceConfig`` is the complete user-tunable surface.

Differences from the reference (all TPU-motivated, none API-visible):
* models are parameter pytrees + jitted functions (no nn.Module state),
* the AR decode loop and the 200-step DDPM both run fully on-device
  (lax.while_loop / lax.scan) with bucketed static shapes,
* randomness is jax PRNG keys; ``seed`` is exposed on ``tts()``
  (the reference uses torch's implicit global RNG),
* per-stage wall-clock/RTF counters are built in (the reference's README lists
  profiling as an open TODO).
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .audio.trim import trim
from .config import DSH, InferenceConfig
from .diffusion import MultinomialDiffusion, perform_simple_inference
from .hub import load_checkpoint, load_tokenizers
from .models.ar import CodecLMConfig, spk_embedding
from .models.ar_decode import (ArSampling, ar_generate, ar_generate_nocache,
                               ar_vocab_window)


def _fused_interpret():
    """Off-TPU execution mode for the fused AR branches (tests/CI):
    MARS5_FUSED_INTERPRET=emu -> pure-jnp emulation (None), =1 -> Pallas
    interpreter (True), unset -> False (fused branches require a real TPU)."""
    import os
    v = os.environ.get("MARS5_FUSED_INTERPRET", "")
    return None if v == "emu" else True if v == "1" else False
from .models.convert import convert_codeclm, convert_nar
from .models.encodec import EncodecConfig, encodec_encode
from .models.nar import ResidualTransformerConfig
from .models.vocos import VocosConfig, vocos_vocode
from .utils.profiling import StageTimer


class Mars5TTS:
    """TTS pipeline: AR codec LM + NAR diffusion refiner + Encodec/Vocos codecs."""

    def __init__(self, ar_ckpt: dict, nar_ckpt: dict, *,
                 encodec_params=None, vocos_params=None,
                 ar_cfg: Optional[CodecLMConfig] = None,
                 nar_cfg: Optional[ResidualTransformerConfig] = None,
                 encodec_cfg: Optional[EncodecConfig] = None,
                 vocos_cfg: Optional[VocosConfig] = None,
                 ar_backend: str = "bf16", nar_backend: str = "bf16",
                 guidance_interval: tuple = (0.0, 1.0),
                 nar_gen_bucket: Optional[int] = None,
                 nar_text_bucket: Optional[int] = None):
        # tokenizers are embedded in the checkpoint vocab metadata
        self.texttok, self.speechtok = load_tokenizers(ar_ckpt)

        self.n_vocab = len(self.texttok.vocab) + len(self.speechtok.vocab)
        self.n_text_vocab = len(self.texttok.vocab) + 1
        self.diffusion_n_classes = 1025  # 1024 codes + pad

        if ar_cfg is None:
            if "config" in ar_ckpt:
                ar_cfg = CodecLMConfig(**ar_ckpt["config"])
            else:
                from .models.convert import infer_codeclm_config
                ar_cfg = infer_codeclm_config(ar_ckpt["model"], n_vocab=self.n_vocab)
        if nar_cfg is None:
            if "config" in nar_ckpt:
                nar_cfg = ResidualTransformerConfig(**nar_ckpt["config"])
            else:
                from .models.convert import infer_nar_config
                nar_cfg = infer_nar_config(nar_ckpt["model"])
        self.ar_cfg = ar_cfg
        self.nar_cfg = nar_cfg
        self.codeclm = jax.tree.map(jnp.asarray, convert_codeclm(ar_ckpt["model"], self.ar_cfg))
        self.codecnar = jax.tree.map(jnp.asarray, convert_nar(nar_ckpt["model"], self.nar_cfg))
        self._set_codecs(encodec_params, vocos_params, encodec_cfg, vocos_cfg)

        self._init_runtime(ar_backend, nar_backend, guidance_interval,
                           nar_gen_bucket, nar_text_bucket)

    def _set_codecs(self, encodec_params, vocos_params, encodec_cfg, vocos_cfg):
        self.encodec = jax.tree.map(jnp.asarray, encodec_params) if encodec_params else None
        self.vocos = jax.tree.map(jnp.asarray, vocos_params) if vocos_params else None
        if encodec_cfg is None:
            encodec_cfg = (EncodecConfig.infer(self.encodec) if self.encodec
                           else EncodecConfig())
        if vocos_cfg is None:
            vocos_cfg = (VocosConfig.infer(self.vocos) if self.vocos
                         else VocosConfig())
        self.encodec_cfg = encodec_cfg
        self.vocos_cfg = vocos_cfg

    def _init_runtime(self, ar_backend, nar_backend, guidance_interval,
                      nar_gen_bucket, nar_text_bucket):
        # AR speech-token window, clamped to the model's true vocab (the
        # reference's `+ 1` bound is vacuous there; see ar_vocab_window).
        self._valid_window = ar_vocab_window(
            len(self.texttok.vocab), len(self.speechtok.vocab),
            self.ar_cfg.n_vocab)

        # Beyond-reference serving dial (README "Known deviations"): apply CFG
        # only while t/T is in [lo, hi) — cond-only steps run half the decoder
        # batch. (0, 1) = reference behavior; scored like the reduced-T modes
        # by scripts/bench_quality_modes.py's reseed-floor criterion.
        self.guidance_interval = tuple(guidance_interval)

        # NAR geometry buckets (serving compile-count control): round the
        # generated-frame / text axes up so the 200-step diffusion scan
        # compiles once per bucket instead of once per utterance geometry
        # (a fresh scan compile is minutes over the axon tunnel). 0 = exact
        # shapes (reference-parity default: seed-driven draws depend on the
        # padded shape, so bucketing is a different — equally valid —
        # trajectory whenever padding is non-zero; under injected uniforms
        # the real-frame grid is identical, tests/test_diffusion.py).
        self.nar_gen_bucket = int(
            os.environ.get("MARS5_NAR_GEN_BUCKET", "0")
            if nar_gen_bucket is None else nar_gen_bucket)
        self.nar_text_bucket = int(
            os.environ.get("MARS5_NAR_TEXT_BUCKET", "0")
            if nar_text_bucket is None else nar_text_bucket)

        self.default_T = 200
        self.sr = 24000
        self.latent_sr = 75
        self.last_timing: dict = {}
        self._last_ar_runaway = False

        # AR serving backend: "bf16" (XLA engine, exact reference parity —
        # the default), "fused" (int8 Pallas decode-layer megakernel) or
        # "fused4" (int4 nibble-packed weights, fastest). Quantized modes are
        # quality-characterized in tests/test_quant.py and
        # scripts/bench_quality_modes.py.
        if ar_backend not in ("bf16", "fused", "fused4"):
            raise ValueError(f"unknown ar_backend {ar_backend!r}")
        self.ar_backend = ar_backend
        self._fused_cache: dict = {}
        # NAR backend: "bf16" (parity default) | "int8" (W8A8 dots + int8
        # attention via the quantized Pallas flash kernel on TPU)
        if nar_backend not in ("bf16", "int8"):
            raise ValueError(f"unknown nar_backend {nar_backend!r}")
        self.nar_backend = nar_backend
        if nar_backend == "int8":
            from .ops.quant import quantize_nar
            from .ops.pallas import enabled as _pallas_on
            from .models.layers import _nar_fused_gsize, nar_w_group_keys
            # per-K-group weight scales (MARS5_NARF_GSIZE) ride the fused
            # Pallas GEMMs; off the TPU they'd hit the slow XLA fallback,
            # so grouping only applies when the fused path is live
            import os as _os
            fused_on = (_pallas_on()
                        and _os.environ.get("MARS5_NAR_FUSED", "1") == "1")
            gs = _nar_fused_gsize() if fused_on else 0
            self.codecnar = quantize_nar(self.codecnar, w_gsize=gs,
                                         w_group_keys=nar_w_group_keys())

    def _get_fused(self, max_len: int, batch: int = 1):
        """Lazily build (and cache, keyed by max_len) the fused decode pack.

        The quantized pack itself is batch-independent; batched callers get
        the cached pack with a batch-adjusted dims."""
        if max_len not in self._fused_cache:
            from .models.ar_decode_fused import prepare_fused
            wbits = 4 if self.ar_backend == "fused4" else 8
            self._fused_cache[max_len] = prepare_fused(
                self.codeclm, self.ar_cfg, max_len=max_len, wbits=wbits)
        fp, dims = self._fused_cache[max_len]
        if batch != dims.batch:
            import dataclasses
            dims = dataclasses.replace(dims, batch=batch)
        return fp, dims

    @classmethod
    def from_local(cls, ar_path, nar_path, **kwargs) -> "Mars5TTS":
        """Build from local .safetensors/.pt checkpoints (reference layout)."""
        return cls(load_checkpoint(ar_path), load_checkpoint(nar_path), **kwargs)

    @classmethod
    def from_params(cls, codeclm, codecnar, ar_cfg, nar_cfg, *,
                    texttok, speechtok, encodec_params=None, vocos_params=None,
                    encodec_cfg=None, vocos_cfg=None,
                    ar_backend: str = "bf16", nar_backend: str = "bf16",
                    guidance_interval: tuple = (0.0, 1.0),
                    nar_gen_bucket: Optional[int] = None,
                    nar_text_bucket: Optional[int] = None) -> "Mars5TTS":
        """Build from already-converted JAX parameter pytrees (serving path).

        Skips the torch-naming checkpoint conversion — for processes that
        already hold device-resident params (warm pools, benches, tests) and
        the tokenizers as objects rather than checkpoint vocab metadata."""
        self = cls.__new__(cls)
        self.texttok, self.speechtok = texttok, speechtok
        self.n_vocab = len(texttok.vocab) + len(speechtok.vocab)
        self.n_text_vocab = len(texttok.vocab) + 1
        self.diffusion_n_classes = 1025
        self.ar_cfg = ar_cfg
        self.nar_cfg = nar_cfg
        self.codeclm = jax.tree.map(jnp.asarray, codeclm)
        self.codecnar = jax.tree.map(jnp.asarray, codecnar)
        self._set_codecs(encodec_params, vocos_params, encodec_cfg, vocos_cfg)
        self._init_runtime(ar_backend, nar_backend, guidance_interval,
                           nar_gen_bucket, nar_text_bucket)
        return self

    # ------------------------------------------------------------------ codecs
    def _require_codec(self):
        if self.encodec is None:
            raise RuntimeError("Encodec encoder parameters were not provided")

    def _require_vocoder(self):
        if self.vocos is None:
            raise RuntimeError("Vocos vocoder parameters were not provided")

    def encode_reference(self, ref_audio: np.ndarray):
        """(T,) or (ch, T) 24 kHz audio -> (1, n_q, frames) codec codes."""
        self._require_codec()
        audio = np.asarray(ref_audio, np.float32)
        if audio.ndim == 1:
            audio = audio[None]
        if audio.shape[0] != 1:
            audio = audio.mean(axis=0, keepdims=True)
        return encodec_encode(self.encodec, self.encodec_cfg, jnp.asarray(audio)[None])

    def vocode(self, tokens) -> np.ndarray:
        """(seq_len, n_q) token grid -> (T,) audio. Uses bandwidth_id=1 — the
        reference's deliberate 3 kbps smoothing trick on 6 kbps tokens
        (inference.py:160-172)."""
        self._require_vocoder()
        audio = vocos_vocode(self.vocos, self.vocos_cfg, jnp.asarray(tokens),
                             bandwidth_id=1)
        return np.asarray(audio)

    def get_speaker_embedding(self, ref_audio) -> np.ndarray:
        """(T,) or (bs, T) audio -> (bs, dim) implicit speaker embedding
        (reference inference.py:174-199)."""
        codes = self.encode_reference(ref_audio)          # (1, n_q, S)
        codes = jnp.transpose(codes, (0, 2, 1))           # (1, S, n_q)
        return np.asarray(spk_embedding(self.codeclm, self.ar_cfg, codes))

    # --------------------------------------------------------------------- tts
    def tts(self, text: str, ref_audio, ref_transcript: Optional[str] = None,
            cfg: Optional[InferenceConfig] = None, seed: int = 0,
            max_retries: int = 0):
        """Synthesize ``text`` in the voice of ``ref_audio``.

        Returns ``(ar_codes (seq_len,) int L0 ids, waveform (T,) float 24 kHz)``,
        as the reference does (inference.py:201-307).

        ``max_retries``: optional retry-on-runaway-decode policy (SURVEY §5.3):
        when the AR hits its max length without EOS (the reference merely warns
        and returns the truncated beam), retry with a reseeded sampler up to
        this many times before accepting the truncated output.
        """
        if max_retries:
            for attempt in range(max_retries + 1):
                result = self.tts(text, ref_audio, ref_transcript, cfg,
                                  seed=seed + 1000 * attempt)
                if not self._last_ar_runaway or attempt == max_retries:
                    return result
                logging.warning("runaway AR decode; retrying (%d/%d)",
                                attempt + 1, max_retries)
            return result

        cfg = cfg or InferenceConfig()
        timer = StageTimer()
        (text_tokens, prompt_codec, raw_prompt_acoustic_len,
         gen_codes_decoded) = self._synthesize_codes(
            text, ref_audio, ref_transcript, cfg, seed, timer)

        with timer.stage("nar_diffusion"):
            c_text = np.asarray(text_tokens, np.int64)[None]
            c_codes = prompt_codec.transpose(0, 2, 1)  # (1, S, n_q)
            c_texts_lengths = np.asarray([len(text_tokens)], np.int64)
            c_codes_lengths = np.asarray([c_codes.shape[1]], np.int64)
            _x = np.repeat(gen_codes_decoded[None, :, None], 8, axis=2)
            x_padding_mask = np.zeros((1, _x.shape[1]), bool)

            # NOTE: the reference hardcodes T = self.default_T (inference.py:286),
            # silently ignoring its own cfg.timesteps knob; we honor it (identical
            # at the default 200).
            T = cfg.timesteps or self.default_T
            diff = MultinomialDiffusion(self.diffusion_n_classes, timesteps=T)
            dsh = DSH(last_greedy=True, x_0_temp=cfg.x_0_temp,
                      guidance_w=cfg.nar_guidance_w, deep_clone=cfg.deep_clone,
                      jump_len=1, jump_n_sample=1,
                      q0_override_steps=cfg.q0_override_steps,
                      enable_kevin_scaled_inference=True, progress=False,
                      guidance_interval=self.guidance_interval)
            final_output = perform_simple_inference(
                self.codecnar, self.nar_cfg,
                (c_text, c_codes, c_texts_lengths, c_codes_lengths, _x, x_padding_mask),
                diff, diff.num_timesteps, dsh, retain_quant0=True,
                # rbg: fast partitionable PRNG for the ~20M Gumbel draws per step
                key=jax.random.key(seed + 1, impl="rbg"),
                gen_bucket=self.nar_gen_bucket,
                text_bucket=self.nar_text_bucket)

            skip_front = raw_prompt_acoustic_len if cfg.deep_clone else 0
            # device hand-off: the grid goes straight into the vocoder without
            # a host round trip (the vocode stage wall absorbs the NAR device
            # wait; MARS5_SYNC_STAGES=1 restores per-stage sync for profiling)
            final_output = jnp.asarray(final_output)[0, skip_front:]
            if os.environ.get("MARS5_SYNC_STAGES") == "1":
                final_output = np.asarray(final_output)

        with timer.stage("vocode"):
            final_audio = self.vocode(final_output)

        with timer.stage("trim"):
            final_audio, _ = trim(final_audio, top_db=cfg.trim_db)

        self.last_timing = timer.report(audio_seconds=len(final_audio) / self.sr)
        return gen_codes_decoded, final_audio

    def _synthesize_codes(self, text, ref_audio, ref_transcript, cfg, seed,
                          timer):
        """Text/reference prep + AR decode + parse (the first half of tts).

        Returns ``(text_tokens, prompt_codec (1, n_q, S), raw_prompt_acoustic_len,
        gen_codes_decoded (Lgen,) int64 L0 ids)``; shared by ``tts`` and the
        progressive intra-utterance streamer (serving/progressive.py).
        """
        if cfg.deep_clone and ref_transcript is None:
            raise AssertionError(
                "Inference config deep clone is set to true, but reference "
                "transcript not specified! Please specify the transcript of the "
                "prompt, or set deep_clone=False in the inference `cfg` argument.")
        ref_audio = np.asarray(ref_audio, np.float32)
        ref_dur = ref_audio.shape[-1] / self.sr
        if ref_dur > cfg.max_prompt_dur:
            logging.warning(
                "Reference audio duration is %.2f > max suggested ref audio. "
                "Expect quality degradations.", ref_dur)

        with timer.stage("tokenize_text"):
            text_tokens = self.texttok.encode(
                "<|startoftext|>" + text.strip() + "<|endoftext|>", allowed_special="all")
            # NOTE: computed unconditionally, so shallow clone with
            # ref_transcript=None raises TypeError — exactly as the reference
            # (inference.py:226); pass ref_transcript="" for shallow clone.
            text_tokens_full = self.texttok.encode(
                "<|startoftext|>" + ref_transcript + " " + str(text).strip() + "<|endoftext|>",
                allowed_special="all")

        with timer.stage("encode_reference"):
            if ref_audio.ndim == 1:
                ref_audio = ref_audio[None]
            if ref_audio.shape[0] != 1:
                ref_audio = ref_audio.mean(axis=0, keepdims=True)
            ref_audio = np.pad(ref_audio, ((0, 0), (int(self.sr * cfg.ref_audio_pad), 0)))
            prompt_codec = np.asarray(self.encode_reference(ref_audio[0]))  # (1, n_q, S)

        with timer.stage("tokenize_speech"):
            n_speech_inp = 0
            q0_str = " ".join(str(t) for t in prompt_codec[0, 0].tolist())
            # no <eos> here — the AR continues this sequence (inference.py:238)
            speech_tokens = self.speechtok.encode(q0_str.strip())
            spk_ref_codec = prompt_codec[0].T  # (S, n_q)

            raw_prompt_acoustic_len = prompt_codec.shape[-1]
            offset_speech_codes = [p + len(self.texttok.vocab) for p in speech_tokens]
            if not cfg.deep_clone:
                offset_speech_codes = offset_speech_codes[:n_speech_inp]
            else:
                text_tokens = text_tokens_full
                n_speech_inp = len(offset_speech_codes)
            prompt = np.asarray(text_tokens + offset_speech_codes, np.int64)
            first_codec_idx = prompt.shape[-1] - n_speech_inp + 1

        with timer.stage("ar_generate"):
            max_len = cfg.generate_max_len_override if cfg.generate_max_len_override > 1 else 2000
            sampling = ArSampling(
                temperature=cfg.temperature, top_k=cfg.top_k, top_p=cfg.top_p,
                typical_p=cfg.typical_p, alpha_frequency=cfg.freq_penalty,
                alpha_presence=cfg.presence_penalty,
                penalty_window=cfg.rep_penalty_window,
                eos_penalty_decay=cfg.eos_penalty_decay,
                eos_penalty_factor=cfg.eos_penalty_factor,
                n_phones_gen=round(cfg.eos_estimated_gen_length_factor * len(text)),
                eos_idx=len(self.texttok.vocab) + self.speechtok.special_tokens["<|endofspeech|>"],
                valid_start=self._valid_window[0],
                valid_end=self._valid_window[1],
                max_len=max_len)
            from .ops.pallas import enabled as _pallas_enabled
            if (self.ar_backend != "bf16" and cfg.use_kv_cache
                    and (_pallas_enabled() or _fused_interpret() is not False)):
                from .models.ar_decode_fused import ar_generate_fused
                fp, dims = self._get_fused(max_len)
                ar_codes, _ = ar_generate_fused(
                    self.codeclm, fp, self.ar_cfg, dims, prompt, spk_ref_codec,
                    sampling=sampling, seed=seed,
                    interpret=False if _pallas_enabled() else _fused_interpret())
            else:
                gen_fn = ar_generate if cfg.use_kv_cache else ar_generate_nocache
                ar_codes, _ = gen_fn(self.codeclm, self.ar_cfg, prompt,
                                     spk_ref_codec, sampling=sampling, seed=seed)
            self._last_ar_runaway = len(ar_codes) >= max_len - 1
            if self._last_ar_runaway:
                # preserved reference behavior (mars5/ar_generate.py:160-162):
                # degrade gracefully with the truncated sequence, but say so
                logging.warning(
                    "[autoregressive generation] output length = %d -- inference "
                    "likely failed or input too long!", len(ar_codes))

        with timer.stage("parse_ar"):
            output_tokens = np.clip(ar_codes - len(self.texttok.vocab), 0, None)
            output_tokens = output_tokens[first_codec_idx:].tolist()
            gen_codes_decoded = self.speechtok.decode_int(output_tokens)
            gen_codes_decoded = np.asarray(
                [s for s in gen_codes_decoded if isinstance(s, int)], np.int64)

        return text_tokens, prompt_codec, raw_prompt_acoustic_len, gen_codes_decoded

    def tts_batch(self, texts, ref_audio, ref_transcript=None,
                  cfg: Optional[InferenceConfig] = None, seed: int = 0):
        """Batched synthesis: several texts, one shared OR per-text voices.

        BASELINE config #3 as a public API: one Encodec encode per distinct
        reference, one bucketed batched AR decode (per-row prompts/speaker
        streams/cursors/EOS-length estimates), one batched NAR diffusion over
        padded rows (per-row reference lengths ride the ragged deep-clone
        engine branch), batched vocoding. Per-text sampling follows the same
        reference semantics as ``tts``.

        Args:
            ref_audio: one waveform (shared voice) or a list of ``len(texts)``
                waveforms (one voice per text).
            ref_transcript: str or per-text list, matching ``ref_audio``
                (required under deep clone).

        Returns a list of ``(ar_codes, waveform)`` pairs, one per text.
        """
        from .models.ar_decode import ar_generate_batched
        from .models.vocos import codes_to_features, vocos_decode

        cfg = cfg or InferenceConfig()
        timer = StageTimer()
        n = len(texts)
        per_row_refs = isinstance(ref_audio, (list, tuple))
        refs = list(ref_audio) if per_row_refs else [ref_audio]
        if per_row_refs and len(refs) != n:
            raise ValueError(f"{len(refs)} reference audios != {n} texts")
        if isinstance(ref_transcript, (list, tuple)):
            transcripts = list(ref_transcript)
            if len(transcripts) != len(refs):
                raise ValueError("per-row transcripts must match ref_audio")
        else:
            transcripts = [ref_transcript] * len(refs)
        if cfg.deep_clone and any(t is None for t in transcripts):
            raise AssertionError(
                "Inference config deep clone is set to true, but reference "
                "transcript not specified! Please specify the transcript of the "
                "prompt, or set deep_clone=False in the inference `cfg` argument.")

        with timer.stage("encode_reference"):
            codec_per_ref = [np.asarray(self.encode_reference(r)) for r in refs]
        row_codec = (codec_per_ref if per_row_refs
                     else [codec_per_ref[0]] * n)      # (1, n_q, S_i) per row
        row_transcript = transcripts if per_row_refs else [transcripts[0]] * n
        skip_fronts = [c.shape[-1] if cfg.deep_clone else 0 for c in row_codec]

        with timer.stage("tokenize"):
            offset_speech_per_ref = []
            for c in codec_per_ref:
                q0_str = " ".join(str(t) for t in c[0, 0].tolist())
                speech_tokens = self.speechtok.encode(q0_str.strip())
                offset_speech_per_ref.append(
                    [p + len(self.texttok.vocab) for p in speech_tokens])
            row_offset_speech = (offset_speech_per_ref if per_row_refs
                                 else [offset_speech_per_ref[0]] * n)

            prompts, first_codec_idxs, text_token_rows, est_lens = [], [], [], []
            for text, tr, offset_speech in zip(texts, row_transcript,
                                               row_offset_speech):
                text_tokens = self.texttok.encode(
                    "<|startoftext|>" + text.strip() + "<|endoftext|>",
                    allowed_special="all")
                if cfg.deep_clone:
                    row_tokens = self.texttok.encode(
                        "<|startoftext|>" + tr + " " + str(text).strip()
                        + "<|endoftext|>", allowed_special="all")
                    n_speech_inp = len(offset_speech)
                    prompt = row_tokens + offset_speech
                else:
                    row_tokens = text_tokens
                    n_speech_inp = 0
                    prompt = row_tokens
                prompts.append(np.asarray(prompt, np.int64))
                first_codec_idxs.append(len(prompt) - n_speech_inp + 1)
                text_token_rows.append(row_tokens)
                est_lens.append(round(cfg.eos_estimated_gen_length_factor * len(text)))

        with timer.stage("ar_generate"):
            max_len = cfg.generate_max_len_override if cfg.generate_max_len_override > 1 else 2000
            sampling = ArSampling(
                temperature=cfg.temperature, top_k=cfg.top_k, top_p=cfg.top_p,
                typical_p=cfg.typical_p, alpha_frequency=cfg.freq_penalty,
                alpha_presence=cfg.presence_penalty,
                penalty_window=cfg.rep_penalty_window,
                eos_penalty_decay=cfg.eos_penalty_decay,
                eos_penalty_factor=cfg.eos_penalty_factor,
                n_phones_gen=max(est_lens),
                eos_idx=len(self.texttok.vocab) + self.speechtok.special_tokens["<|endofspeech|>"],
                valid_start=self._valid_window[0],
                valid_end=self._valid_window[1],
                max_len=max_len)
            spk_list = [c[0].T for c in row_codec]
            from .ops.pallas import enabled as _pallas_enabled
            if (self.ar_backend != "bf16" and cfg.use_kv_cache
                    and 2 <= len(texts) <= 8
                    and (_pallas_enabled() or _fused_interpret() is not False)):
                # batched megakernel decode: the int8/int4 weight stream is
                # shared across the rows (same quality contract as the bs=1
                # fused path; tests/test_quant.py)
                from .models.ar_decode_fused import ar_generate_fused_batched
                fp, dims = self._get_fused(max_len, batch=len(texts))
                outs = ar_generate_fused_batched(
                    self.codeclm, fp, self.ar_cfg, dims, prompts, spk_list,
                    sampling=sampling, seed=seed, est_lens=np.asarray(est_lens),
                    interpret=False if _pallas_enabled() else _fused_interpret())
            else:
                outs = ar_generate_batched(self.codeclm, self.ar_cfg, prompts,
                                           spk_list, sampling=sampling,
                                           seed=seed,
                                           est_lens=np.asarray(est_lens))

        with timer.stage("parse_ar"):
            rows = []
            for (seq, _), fci in zip(outs, first_codec_idxs):
                toks = np.clip(seq - len(self.texttok.vocab), 0, None)[fci:].tolist()
                decoded = self.speechtok.decode_int(toks)
                rows.append(np.asarray([s for s in decoded if isinstance(s, int)],
                                       np.int64))

        with timer.stage("nar_diffusion"):
            bs = len(texts)
            lt = max(len(r) for r in text_token_rows)
            lx = max(max(len(r) for r in rows), 1)
            c_text = np.zeros((bs, lt), np.int64)
            ctl = np.zeros((bs,), np.int64)
            _x = np.zeros((bs, lx, 8), np.int64)
            xpm = np.ones((bs, lx), bool)
            for i, (tr, row) in enumerate(zip(text_token_rows, rows)):
                c_text[i, : len(tr)] = tr
                ctl[i] = len(tr)
                _x[i, : len(row)] = row[:, None]
                xpm[i, : len(row)] = False
            lc_max = max(c.shape[-1] for c in row_codec)
            c_codes = np.zeros((bs, lc_max, 8), np.int64)
            ccl = np.zeros((bs,), np.int64)
            for i, c in enumerate(row_codec):
                c_codes[i, : c.shape[-1]] = c[0].T
                ccl[i] = c.shape[-1]

            T = cfg.timesteps or self.default_T
            diff = MultinomialDiffusion(self.diffusion_n_classes, timesteps=T)
            dsh = DSH(last_greedy=True, x_0_temp=cfg.x_0_temp,
                      guidance_w=cfg.nar_guidance_w, deep_clone=cfg.deep_clone,
                      jump_len=1, jump_n_sample=1,
                      q0_override_steps=cfg.q0_override_steps,
                      enable_kevin_scaled_inference=True, progress=False,
                      guidance_interval=self.guidance_interval)
            grid = perform_simple_inference(
                self.codecnar, self.nar_cfg,
                (c_text, c_codes, ctl, ccl, _x, xpm),
                diff, diff.num_timesteps, dsh, retain_quant0=True,
                key=jax.random.key(seed + 1, impl="rbg"),
                gen_bucket=self.nar_gen_bucket,
                text_bucket=self.nar_text_bucket)
            # per-row prompt crop (deep clone repeats each row's own prompt
            # frames at the front), left-aligned for batched vocoding
            grid = np.asarray(grid)
            out_lens = [max(len(row) - sk, 0)
                        for row, sk in zip(rows, skip_fronts)]
            lx_out = max(max(out_lens), 1)
            grid_out = np.zeros((bs, lx_out, 8), np.int64)
            for i, (row, sk) in enumerate(zip(rows, skip_fronts)):
                grid_out[i, : out_lens[i]] = grid[i, sk: len(row)]

        with timer.stage("vocode"):
            self._require_vocoder()
            feats = codes_to_features(self.vocos["codebook_weights"],
                                      jnp.asarray(grid_out.transpose(2, 0, 1)),
                                      bins=self.vocos_cfg.codebook_size)
            audio = np.asarray(vocos_decode(self.vocos, self.vocos_cfg, feats, 1))

        with timer.stage("trim"):
            results = []
            hop = self.vocos_cfg.hop_length
            for i, row in enumerate(rows):
                wav = audio[i, : out_lens[i] * hop]
                wav, _ = trim(wav, top_db=cfg.trim_db)
                results.append((rows[i], wav))

        total_audio = sum(len(w) for _, w in results) / self.sr
        self.last_timing = timer.report(audio_seconds=total_audio)
        return results

    @classmethod
    def from_pretrained(cls, model_id: str = "CAMB-AI/MARS5-TTS", *,
                        revision: Optional[str] = None,
                        cache_dir: Optional[str] = None, **kwargs) -> "Mars5TTS":
        """HF-hub-style loader (reference ``Mars5TTS._from_pretrained``,
        inference.py:123-158): downloads/locates ``mars5_ar.safetensors`` and
        ``mars5_nar.safetensors`` for ``model_id`` and builds the pipeline.

        Uses ``huggingface_hub`` when installed; otherwise falls back to an
        already-populated HF cache or MARS5_CACHE directory (zero-egress envs).
        """
        import os
        from pathlib import Path

        names = ("mars5_ar.safetensors", "mars5_nar.safetensors")
        try:
            from huggingface_hub import hf_hub_download
            paths = [hf_hub_download(repo_id=model_id, filename=n, revision=revision,
                                     cache_dir=cache_dir) for n in names]
        except ImportError:
            search = [Path(cache_dir) if cache_dir else None,
                      Path(os.environ.get("MARS5_CACHE", "~/.cache/mars5_tts_tpu")).expanduser(),
                      Path(os.environ.get("HF_HOME", "~/.cache/huggingface")).expanduser()]
            paths = []
            for name in names:
                found = None
                for root in search:
                    if root is None or not root.exists():
                        continue
                    hits = sorted(root.rglob(name))
                    if hits:
                        found = hits[0]
                        break
                if found is None:
                    raise FileNotFoundError(
                        f"{name} not found (huggingface_hub not installed and no "
                        f"cached copy under {[str(s) for s in search if s]}); "
                        f"download the checkpoints and use Mars5TTS.from_local")
                paths.append(found)
        return cls.from_local(paths[0], paths[1], **kwargs)
