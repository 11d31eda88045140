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

        import json

        ckpt = {"vocab": {}, "model": {}}
        with safe_open(str(path), framework="np") as f:
            metadata = f.metadata() or {}
            for key in ("texttok.model", "speechtok.model"):
                if key in metadata:
                    ckpt["vocab"][key] = metadata[key]
            if "mars5_config" in metadata:
                ckpt["config"] = json.loads(metadata["mars5_config"])
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


def save_checkpoint(path, model: dict, vocab: dict | None = None,
                    config: dict | None = None) -> None:
    """Write the reference-compatible safetensors layout (tokenizers in metadata).

    ``config`` (optional) is stored as JSON under the ``mars5_config`` metadata
    key so non-default geometries (e.g. test checkpoints) load exactly.
    """
    import json

    from safetensors.numpy import save_file

    tensors = {k: np.ascontiguousarray(np.asarray(v)) for k, v in model.items()}
    metadata = {k: str(v) for k, v in (vocab or {}).items()}
    if config is not None:
        metadata["mars5_config"] = json.dumps(config)
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


def save_pytree_npz(path, tree) -> None:
    """Save a (dict/list-nested) parameter pytree as .npz with path-encoded keys.

    Note: the native layout is not a stability contract (e.g. attention in-proj
    kernels changed from flat (3D, D) to stacked (3, D, D) in round 2); durable
    interchange goes through the reference-format converters (models/convert.py),
    which are covered by strict round-trip tests.
    """
    import jax

    flat = {}
    for keypath, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        parts = []
        for k in keypath:
            if hasattr(k, "key"):
                parts.append(str(k.key))
            elif hasattr(k, "idx"):
                parts.append(str(k.idx))
            else:
                parts.append(str(k))
        flat["/".join(parts)] = np.asarray(leaf)
    np.savez(str(path), **flat)


def load_pytree_npz(path):
    """Inverse of save_pytree_npz (dicts for string keys, lists for int keys)."""
    data = np.load(str(path))
    root: dict = {}
    for key in data.files:
        parts = key.split("/")
        node = root
        for i, part in enumerate(parts):
            last = i == len(parts) - 1
            if last:
                node[part] = data[key]
            else:
                node = node.setdefault(part, {})

    def finalize(node):
        if not isinstance(node, dict):
            return node
        if node and all(k.isdigit() for k in node):
            return [finalize(node[str(i)]) for i in range(len(node))]
        return {k: finalize(v) for k, v in node.items()}

    return finalize(root)


def load_codec_params(path, kind: str, cfg=None):
    """Load Encodec/Vocos parameters from .npz (our pytree dump) or a torch
    checkpoint (official naming, converted on the fly)."""
    path = str(path)
    if path.endswith(".npz"):
        return load_pytree_npz(path)
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    if kind == "encodec":
        from .models.encodec import EncodecConfig, convert_encodec
        return convert_encodec(sd, cfg or EncodecConfig())
    if kind == "vocos":
        from .models.vocos import VocosConfig, convert_vocos
        return convert_vocos(sd, cfg or VocosConfig())
    raise ValueError(f"unknown codec kind: {kind}")
