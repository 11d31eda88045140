"""Checkpoint IO: the reference's dual .pt / .safetensors format (SURVEY.md §2.14).

* ``.safetensors``: model tensors as keys; both BPE tokenizer model files embedded
  as UTF-8 strings in the file *metadata* under ``texttok.model`` /
  ``speechtok.model`` (reference hubconf.py:51-69, inference.py:143-155).
* ``.pt``: a dict with ``'vocab'`` and ``'model'`` keys (inference.py:92-98).

Loading returns the same ``{'vocab': {...}, 'model': {...}}`` dict shape the
reference passes to ``Mars5TTS.__init__``; tensors are numpy (fp16 upcast happens
in the converters). ``save_checkpoint`` writes the safetensors layout so our
checkpoints round-trip into the reference loader too.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def load_checkpoint(path) -> dict:
    """Load a MARS5 AR/NAR checkpoint (.safetensors or .pt) -> {'vocab', 'model'}."""
    path = Path(path)
    if path.suffix == ".safetensors":
        from safetensors import safe_open

        ckpt = {"vocab": {}, "model": {}}
        with safe_open(str(path), framework="np") as f:
            metadata = f.metadata() or {}
            for key in ("texttok.model", "speechtok.model"):
                if key in metadata:
                    ckpt["vocab"][key] = metadata[key]
            for k in f.keys():
                ckpt["model"][k] = f.get_tensor(k)
        return ckpt
    if path.suffix in (".pt", ".pth", ".bin", ".th"):
        import torch

        raw = torch.load(str(path), map_location="cpu", weights_only=False)
        model = raw.get("model", raw)
        vocab = raw.get("vocab", {})
        return {"vocab": vocab,
                "model": {k: v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
                          for k, v in model.items()}}
    raise ValueError(f"unsupported checkpoint format: {path.suffix}")


def save_checkpoint(path, model: dict, vocab: dict | None = None) -> None:
    """Write the reference-compatible safetensors layout (tokenizers in metadata)."""
    from safetensors.numpy import save_file

    tensors = {k: np.ascontiguousarray(np.asarray(v)) for k, v in model.items()}
    metadata = {k: str(v) for k, v in (vocab or {}).items()}
    save_file(tensors, str(path), metadata=metadata or None)


def load_tokenizers(ckpt: dict):
    """Deserialize both BPE tokenizers from checkpoint vocab metadata."""
    import io

    from .text import CodebookTokenizer, GPT4_SPLIT_PATTERN, RegexTokenizer

    texttok = RegexTokenizer(GPT4_SPLIT_PATTERN)
    texttok.load(io.BytesIO(ckpt["vocab"]["texttok.model"].encode("utf-8")))
    speechtok = CodebookTokenizer(GPT4_SPLIT_PATTERN)
    speechtok.load(io.BytesIO(ckpt["vocab"]["speechtok.model"].encode("utf-8")))
    return texttok, speechtok
