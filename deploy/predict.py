"""Replicate/cog-style predictor (reference cog/predict.py equivalent).

Exposes the same deploy shape: a ``Predictor`` with ``setup()`` (loads the model
once) and ``predict(text, ref_audio, ref_transcript, ...)`` returning the path of
the written WAV. Works standalone (no cog import required) so it doubles as a
simple server-side handler.
"""

from __future__ import annotations

import os
import tempfile
from pathlib import Path


class Predictor:
    def setup(self, ar_path=None, nar_path=None, encodec_path=None, vocos_path=None):
        from mars5_tts_tpu.hub import load_codec_params
        from mars5_tts_tpu.pipeline import Mars5TTS

        ar_path = ar_path or os.environ.get("MARS5_AR_CKPT", "mars5_ar.safetensors")
        nar_path = nar_path or os.environ.get("MARS5_NAR_CKPT", "mars5_nar.safetensors")
        encodec_path = encodec_path or os.environ.get("MARS5_ENCODEC_CKPT")
        vocos_path = vocos_path or os.environ.get("MARS5_VOCOS_CKPT")
        # serving defaults to the quantized fast path on TPU (int4 megakernel:
        # QMODES_r05 ar_scored fused4 PASS at the reseed-floor criterion);
        # MARS5_AR_BACKEND/MARS5_NAR_BACKEND=bf16 restores exact
        # reference-parity numerics.
        # Geometry buckets default ON here (one diffusion-scan compile per
        # 64-frame/32-token bucket instead of per utterance geometry — see
        # docs/serving.md); MARS5_NAR_GEN_BUCKET=0 restores exact shapes.
        # Guidance interval: CFG only on the low-noise half of the diffusion
        # trajectory — scored and promoted in QMODES_r05 (feature rel-L2 0.1458
        # vs floor 1.3139, closer to parity than plain int8's 0.1776, NAR stage
        # ~25% cheaper). MARS5_GUIDANCE_INTERVAL=0,1 restores reference CFG.
        gi = tuple(float(v) for v in
                   os.environ.get("MARS5_GUIDANCE_INTERVAL", "0,0.5").split(","))
        kwargs = {"ar_backend": os.environ.get("MARS5_AR_BACKEND", "fused4"),
                  "nar_backend": os.environ.get("MARS5_NAR_BACKEND", "int8"),
                  "nar_gen_bucket": int(os.environ.get("MARS5_NAR_GEN_BUCKET", "64")),
                  "nar_text_bucket": int(os.environ.get("MARS5_NAR_TEXT_BUCKET", "32")),
                  "guidance_interval": gi}
        if encodec_path:
            kwargs["encodec_params"] = load_codec_params(encodec_path, "encodec")
        if vocos_path:
            kwargs["vocos_params"] = load_codec_params(vocos_path, "vocos")
        self.model = Mars5TTS.from_local(ar_path, nar_path, **kwargs)

    def predict(self, text: str, ref_audio: str, ref_transcript: str,
                top_k: int = 100, temperature: float = 0.7,
                freq_penalty: float = 3.0, rep_penalty_window: int = 100,
                out_path: str | None = None) -> str:
        """Synthesize ``text`` cloned from ``ref_audio`` (a WAV path).

        Uses the reference deployment's fixed deep-clone configuration
        (cog/predict.py:17-49).
        """
        from mars5_tts_tpu.audio.io import read_wav, write_wav
        from mars5_tts_tpu.config import InferenceConfig

        audio_in, _ = read_wav(ref_audio, target_sr=24000)
        cfg = InferenceConfig(deep_clone=True, rep_penalty_window=rep_penalty_window,
                              top_k=top_k, temperature=temperature,
                              freq_penalty=freq_penalty)
        _, wav = self.model.tts(text, audio_in, ref_transcript=ref_transcript, cfg=cfg)
        if out_path is None:
            out_path = str(Path(tempfile.mkdtemp()) / "output.wav")
        write_wav(out_path, wav, sr=self.model.sr)
        return out_path
