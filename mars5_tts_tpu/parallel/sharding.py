"""Tensor-parallel sharding rules for the AR/NAR parameter pytrees.

Megatron-style layout for the AR Mistral blocks (stacked on the layer axis 0,
which always stays unsharded so ``lax.scan`` slices locally):

* wq/wk/wv (L, H*Dh, D): shard the head output axis -> column parallel,
* fused SwiGLU WV (L, 2F, D): column parallel on the 2F axis (the W/V halves
  are split downstream on the activation; XLA inserts any needed reshard —
  correctness is sharding-transparent),
* wo (L, D, H*Dh): shard the input axis -> row parallel (psum on output),
* w1/w3 (L, F, D): column parallel; w2 (L, D, F): row parallel,
* output head (V, D): shard vocab when divisible,
* norms/embeddings: replicated.

The NAR's torch-layout layers store the fused in_proj as (3, D, D) — q/k/v
thirds on a stack axis (ops/attention.torch_mha) — so attention shards
head-aligned with a plain spec: in_proj column-parallel on the per-third
output D axis, out_proj row-parallel (XLA inserts the psum). Head alignment
holds whenever tp divides n_heads (16 for MARS5, so tp in {2,4,8,16}); the
SwiGLU FFN shards W/V column, linear2 row as before.

Every rule degrades to replication when the dimension is not divisible by the
tp size (checked against real shapes), so any model size runs on any mesh.
"""

from __future__ import annotations

import jax
from jax.sharding import PartitionSpec as P


def _maybe(spec: P, shape, tp_size: int) -> P:
    """Replicate instead of shard when any sharded dim is not divisible."""
    for dim, axis in enumerate(spec):
        if axis == "tp" and shape[dim] % tp_size:
            return P(*([None] * len(spec)))
    return spec


def codeclm_specs(params, tp_size: int):
    """PartitionSpec pytree matching a CodecLM parameter pytree."""
    l = params["ar"]["layers"]

    def m(spec, arr):
        return _maybe(spec, arr.shape, tp_size)

    layer_specs = {
        "wq": m(P(None, "tp", None), l["wq"]),
        "wk": m(P(None, "tp", None), l["wk"]),
        "wv": m(P(None, "tp", None), l["wv"]),
        "wo": m(P(None, None, "tp"), l["wo"]),
        "w1": m(P(None, "tp", None), l["w1"]),
        "w3": m(P(None, "tp", None), l["w3"]),
        "w2": m(P(None, None, "tp"), l["w2"]),
        "attention_norm": P(None, None),
        "ffn_norm": P(None, None),
    }

    def rep_like(tree):
        return jax.tree.map(lambda x: P(*([None] * x.ndim)), tree)

    return {
        "embed": m(P("tp", None), params["embed"]),
        "ar": {
            "layers": layer_specs,
            "norm": P(None),
            "output": m(P("tp", None), params["ar"]["output"]),
        },
        "pos_alpha": P(None),
        "ref_chunked_emb": P(None, None, None),
        "spk_identity_emb": P(None, None),
        "spk_encoder": rep_like(params["spk_encoder"]),
    }


def _enc_layer_specs(layer, tp_size: int):
    def m(spec, arr):
        return _maybe(spec, arr.shape, tp_size)

    specs = {k: P(*([None] * v.ndim)) for k, v in layer.items()}
    specs["WV"] = m(P(None, "tp", None), layer["WV"])
    specs["lin2_w"] = m(P(None, None, "tp"), layer["lin2_w"])
    # attention: in_proj (L, 3, D, D) column-parallel on the per-third output
    # D axis (head-aligned whenever tp | n_heads), out_proj row-parallel
    for io, oo in (("sa_in", "sa_out"), ("ca_in", "ca_out")):
        if f"{io}_w" in layer:
            specs[f"{io}_w"] = m(P(None, None, "tp", None), layer[f"{io}_w"])
            specs[f"{io}_b"] = m(P(None, None, "tp"), layer[f"{io}_b"])
            specs[f"{oo}_w"] = m(P(None, None, "tp"), layer[f"{oo}_w"])
    return specs


def nar_specs(params, tp_size: int):
    """PartitionSpec pytree matching a ResidualTransformer parameter pytree."""
    def rep_like(tree):
        return jax.tree.map(lambda x: P(*([None] * x.ndim)), tree)

    specs = rep_like(params)
    for stack in ("encoder", "decoder", "spk_encoder"):
        specs[stack]["layers"] = _enc_layer_specs(params[stack]["layers"], tp_size)
    return specs
