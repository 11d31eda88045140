"""End-to-end smoke drive: build a tiny fake checkpoint, load it through the
public Mars5TTS API, synthesize shallow + deep clones, and report timings.

Usage: JAX_PLATFORMS=cpu python scripts/e2e_tiny.py
"""

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

import jax

jax.config.update("jax_platforms", "cpu")  # tiny-shape smoke: avoid TPU compiles

import numpy as np

from mars5_tts_tpu import InferenceConfig


def main():
    from tests.fixtures import make_tiny_mars5

    with tempfile.TemporaryDirectory() as d:
        mars5, info = make_tiny_mars5(d)
        mars5.default_T = 8
        t = np.arange(800) / 24000
        ref = (0.4 * np.sin(2 * np.pi * 180 * t)).astype(np.float32)

        cfg = InferenceConfig(deep_clone=False, generate_max_len_override=160,
                              timesteps=8, trim_db=200)
        ar_codes, audio = mars5.tts("hello world", ref, ref_transcript="", cfg=cfg)
        print(f"shallow: {len(ar_codes)} AR codes, {len(audio)} samples "
              f"({len(audio) / 24000:.2f}s)")
        print("timings:", {k: round(v, 3) for k, v in mars5.last_timing["stages_s"].items()})

        cfg2 = InferenceConfig(deep_clone=True, generate_max_len_override=260,
                               timesteps=8, trim_db=200)
        ar2, audio2 = mars5.tts("deep clone test", ref, ref_transcript="a ref", cfg=cfg2)
        print(f"deep: {len(ar2)} AR codes, {len(audio2)} samples")
        print("RTF (tiny/CPU, not meaningful):", round(mars5.last_timing["rtf"], 2))
        print("OK")


if __name__ == "__main__":
    main()
