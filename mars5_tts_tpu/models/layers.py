"""torch-``nn.Transformer``-compatible encoder/decoder stacks with SwiGLU FFN.

MARS5 builds its speaker encoders and the NAR encoder-decoder out of torch
``nn.TransformerEncoderLayer`` / ``nn.TransformerDecoderLayer`` with ``norm_first=True``,
``layer_norm_eps=4e-5``, and a monkeypatched SwiGLU feed-forward: ``linear1`` is
replaced by Identity and ``activation`` by ``FNNSwiGLU`` (silu(x·Wᵀ) * x·Vᵀ), leaving
the down-projection in the host layer's ``linear2``
(reference: mars5/model.py:61-67,179-229; mars5/nn_future.py:13-29).

Residual order reproduced exactly (torch norm_first):
    encoder:  x += self_attn(norm1(x)); x += ff(norm2(x))
    decoder:  x += self_attn(norm1(x)); x += cross_attn(norm2(x), mem); x += ff(norm3(x))
with a final stack-level LayerNorm.

Layer parameters are stacked along a leading axis and the stack runs under
``lax.scan`` — one compiled block regardless of depth, and a natural target for
tensor-parallel sharding annotations on the stacked axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.attention import linear, torch_mha
from ..ops.norms import layer_norm

LAYERNORM_EPS = 4e-5

# below this many rows the fused decoder-layer GEMM programs lose to XLA on
# launch overhead (the 61-token encoder stream and tiny tests stay on XLA)
_NAR_FUSED_MIN_ROWS = 1024


def swiglu_ff(p, x):
    """linear2(silu(x·Wᵀ) * x·Vᵀ) — the monkeypatched torch FFN block.

    W and V are stored fused as ``WV`` (2F, D): one matmul then split (output
    rows are independent, so this is bitwise-identical to two dots and halves
    the latency-bound matmul count). Kernels may be int8 dicts (ops/quant.py).
    On the TPU W8A8 decoder path this whole chain instead runs inside the
    fused Pallas FFN program (ops/pallas/nar_fused.fused_ffn via
    decoder_layer_fused); standalone Pallas LN/silu→quant epilogue kernels
    were measured NEGATIVE (+0.06s NAR: XLA's producer-consumer fusions
    already keep these chains near bandwidth) and were removed in round 3 —
    fusing the epilogues is only a win INSIDE the GEMM program.
    """
    from ..ops.quant import linear_any
    wv = linear_any(x, p["WV"])
    w_out, v_out = jnp.split(wv, 2, axis=-1)
    return linear_any(jax.nn.silu(w_out) * v_out, p["lin2_w"], p["lin2_b"])


def encoder_layer(p, x, nhead: int, key_padding_mask=None):
    h = layer_norm(x, p["norm1_w"], p["norm1_b"], LAYERNORM_EPS)
    x = x + torch_mha(
        {"in_proj_w": p["sa_in_w"], "in_proj_b": p["sa_in_b"],
         "out_w": p["sa_out_w"], "out_b": p["sa_out_b"]},
        h, h, nhead, key_padding_mask)
    h = layer_norm(x, p["norm2_w"], p["norm2_b"], LAYERNORM_EPS)
    return x + swiglu_ff(p, h)


def _use_nar_fused(p, x):
    """Fused decoder-layer GEMM kernels (ops/pallas/nar_fused.py): W8A8 sites
    on TPU at decoder-stack geometry. Same math as the unfused W8A8 path
    (groups=1, ~2 bf16-ulp compiler-rounding differences only). Default ON
    (v5e ablation: 12.18 -> 11.45 ms/step with the default site set);
    MARS5_NAR_FUSED=0 to disable."""
    import os
    if os.environ.get("MARS5_NAR_FUSED", "1") != "1":
        return False
    from ..ops.quant import is_quantized
    if not (is_quantized(p["WV"]) and "a8" in p["WV"]):
        return False
    if _nar_fused_interpret():
        return True  # CPU tests: run the fused layer in interpret mode
    if x.shape[0] * x.shape[1] < _NAR_FUSED_MIN_ROWS:
        return False
    from ..ops.pallas import enabled
    return enabled()


def _nar_fused_interpret() -> bool:
    """MARS5_NAR_FUSED_INTERPRET=1: run the fused decoder-layer kernels in
    Pallas interpret mode regardless of backend/geometry — lets CPU tests
    drive the fused (and grouped-quant) path through the real engine."""
    import os
    return os.environ.get("MARS5_NAR_FUSED_INTERPRET", "0") == "1"


def _nar_fused_gsize() -> int:
    """Per-K-group quant granularity (group SIZE, e.g. 128) for the fused
    kernels — the quality knob. 0 = per-row act scales, bit-matching the
    unfused W8A8 path. With MARS5_NARF_GSIZE=g, every fused GEMM quantizes
    activations per (row, K-group of g), and weights quantized with
    quantize_nar(w_gsize=g) add matching per-group weight scales."""
    import os
    return int(os.environ.get("MARS5_NARF_GSIZE", "0"))


def _nar_fused_sites() -> frozenset:
    """Which GEMM sites run fused (ablation knob for the TPU differential
    probe): comma list from {qkv, saout, caq, caout, ffn}. Default = the
    v5e-measured winners (qkv -0.46, ffn -0.50, caq -0.15 ms/step; saout/caout
    measured NEGATIVE: +0.64 ms/step fusing the out-projections, their
    residual-add epilogue beats Mosaic's rates only at the LN-prologue
    sites — see /tmp ablation logs, recorded in CLAUDE.md)."""
    import os
    v = os.environ.get("MARS5_NARF_SITES", "qkv,caq,ffn")
    return frozenset(s.strip() for s in v.split(",") if s.strip())


def nar_w_group_keys() -> tuple:
    """Decoder-stack weights eligible for per-K-group quantization: exactly
    those whose GEMM runs inside a fused Pallas kernel under the current
    MARS5_NARF_SITES (grouped dicts have no per-row scale, so an unfused
    consumer would fail — see ops/quant.quantize_nar). ca_in_w never
    qualifies: its memory-KV rows feed the unfused XLA projection."""
    sites = _nar_fused_sites()
    keys = []
    if "qkv" in sites:
        keys.append("sa_in_w")
    if "saout" in sites:
        keys.append("sa_out_w")
    if "caout" in sites:
        keys.append("ca_out_w")
    if "ffn" in sites:
        keys += ["WV", "lin2_w"]
    return tuple(keys)


def decoder_layer_fused(p, x, memory, nhead: int, tgt_key_padding_mask=None,
                        memory_key_padding_mask=None, interpret: bool = False,
                        q_start: int = 0):
    """decoder_layer with every W8A8 GEMM site fused into a Pallas kernel.

    Same math as ``decoder_layer`` (groups=1; compiler-rounding level): LN
    prologues and
    quant/rescale/residual epilogues run inside the GEMM programs; the SwiGLU
    intermediate never leaves VMEM. Attention cores are unchanged (Pallas
    flash self-attention, XLA cross-attention at tiny Lk).

    ``q_start > 0`` (final-layer fast path): the layer's output rows before
    ``q_start`` are dropped by the caller (deep-clone prompt frames feed the
    heads of NOTHING — engine.model_out_slice discards them), so everything
    after the self-attention K/V projection runs on the ``[q_start:]`` query
    slice only. Keys/values still cover the full sequence; kept rows match the full
    computation exactly at the integer-GEMM sites and to ulp-level at the
    bf16/f32 XLA ops (shape-dependent FMA re-fusion). Returns
    (B, L - q_start, D).
    """
    from ..ops.norms import layer_norm
    from ..ops.pallas.mha import sdpa_pallas
    from ..ops.pallas.nar_fused import fused_linear, fused_ffn
    from ..ops.quant import linear_any, slice_rows
    from ..ops.attention import sdpa

    gsize = _nar_fused_gsize()
    sites = _nar_fused_sites()
    b, l, d = x.shape
    hd = d // nhead

    def gct(k_dim):
        return k_dim // gsize if gsize and k_dim % gsize == 0 else 1

    g = gct(d)
    if "qkv" in sites:
        qkv = fused_linear(x, p["sa_in_w"], ln=(p["norm1_w"], p["norm1_b"]),
                           bias=p["sa_in_b"], eps=LAYERNORM_EPS, groups=g,
                           interpret=interpret)
        q = qkv[..., :d].reshape(b, l, nhead, hd)
        k = qkv[..., d:2 * d].reshape(b, l, nhead, hd)
        v = qkv[..., 2 * d:].reshape(b, l, nhead, hd)
    else:
        h = layer_norm(x, p["norm1_w"], p["norm1_b"], LAYERNORM_EPS)
        qkv = linear_any(h, p["sa_in_w"], p["sa_in_b"])     # (B, L, 3, D)
        q = qkv[..., 0, :].reshape(b, l, nhead, hd)
        k = qkv[..., 1, :].reshape(b, l, nhead, hd)
        v = qkv[..., 2, :].reshape(b, l, nhead, hd)
    if q_start:
        q = q[:, q_start:]
        x = x[:, q_start:]
        l = l - q_start
    a = sdpa_pallas(q, k, v, tgt_key_padding_mask, interpret=interpret)
    a = a.reshape(b, l, d)
    if "saout" in sites:
        x = fused_linear(a, p["sa_out_w"], bias=p["sa_out_b"], residual=x,
                         groups=g, interpret=interpret)
    else:
        x = x + linear_any(a, p["sa_out_w"], p["sa_out_b"])

    if "caq" in sites:
        hq = fused_linear(x, slice_rows(p["ca_in_w"], slice(0, 1)),
                          ln=(p["norm2_w"], p["norm2_b"]), bias=p["ca_in_b"][:1],
                          eps=LAYERNORM_EPS, groups=g, interpret=interpret)
    else:
        h = layer_norm(x, p["norm2_w"], p["norm2_b"], LAYERNORM_EPS)
        hq = linear_any(h, slice_rows(p["ca_in_w"], 0), p["ca_in_b"][0])
    kv = linear_any(memory, slice_rows(p["ca_in_w"], slice(1, None)),
                    p["ca_in_b"][1:])                       # (B, Lk, 2, D)
    lk = kv.shape[1]
    ck = kv[..., 0, :].reshape(b, lk, nhead, hd)
    cv = kv[..., 1, :].reshape(b, lk, nhead, hd)
    mask = None
    if memory_key_padding_mask is not None:
        mask = ~memory_key_padding_mask[:, None, None, :]
    ca = sdpa(hq.reshape(b, l, nhead, hd), ck, cv, mask)
    ca = ca.reshape(b, l, d)
    if "caout" in sites:
        x = fused_linear(ca, p["ca_out_w"], bias=p["ca_out_b"], residual=x,
                         groups=g, interpret=interpret)
    else:
        x = x + linear_any(ca, p["ca_out_w"], p["ca_out_b"])

    if "ffn" in sites:
        return fused_ffn(x, p["norm3_w"], p["norm3_b"], p["WV"], p["lin2_w"],
                         p["lin2_b"], eps=LAYERNORM_EPS, groups=g,
                         groups2=gct(p["lin2_w"]["q"].shape[-1]),
                         interpret=interpret)
    h = layer_norm(x, p["norm3_w"], p["norm3_b"], LAYERNORM_EPS)
    return x + swiglu_ff(p, h)


def decoder_layer(p, x, memory, nhead: int, tgt_key_padding_mask=None,
                  memory_key_padding_mask=None):
    if _use_nar_fused(p, x):
        return decoder_layer_fused(p, x, memory, nhead, tgt_key_padding_mask,
                                   memory_key_padding_mask,
                                   interpret=_nar_fused_interpret())
    h = layer_norm(x, p["norm1_w"], p["norm1_b"], LAYERNORM_EPS)
    x = x + torch_mha(
        {"in_proj_w": p["sa_in_w"], "in_proj_b": p["sa_in_b"],
         "out_w": p["sa_out_w"], "out_b": p["sa_out_b"]},
        h, h, nhead, tgt_key_padding_mask)
    h = layer_norm(x, p["norm2_w"], p["norm2_b"], LAYERNORM_EPS)
    x = x + torch_mha(
        {"in_proj_w": p["ca_in_w"], "in_proj_b": p["ca_in_b"],
         "out_w": p["ca_out_w"], "out_b": p["ca_out_b"]},
        h, memory, nhead, memory_key_padding_mask)
    h = layer_norm(x, p["norm3_w"], p["norm3_b"], LAYERNORM_EPS)
    return x + swiglu_ff(p, h)


def _maybe_remat(fn):
    """Per-layer rematerialization for training (MARS5_TRAIN_REMAT=1).

    Wrapping the scan BODY in jax.checkpoint makes backward memory O(1 layer)
    of activations instead of O(L) — the standard TPU recipe for trading one
    extra forward's FLOPs for HBM during training. Inference paths are
    unaffected (no grads; XLA drops the checkpoint marker)."""
    import os
    if os.environ.get("MARS5_TRAIN_REMAT", "0") == "1":
        return jax.checkpoint(fn)
    return fn


def encoder_stack(p, x, nhead: int, key_padding_mask=None):
    """Run stacked encoder layers (params stacked on axis 0) + final LayerNorm."""

    def step(h, layer_p):
        return encoder_layer(layer_p, h, nhead, key_padding_mask), None

    x, _ = jax.lax.scan(_maybe_remat(step), x, p["layers"])
    return layer_norm(x, p["norm_w"], p["norm_b"], LAYERNORM_EPS)


def _use_nar_mega(p, x, nhead: int) -> bool:
    """Whole-stack Pallas megakernel (ops/pallas/nar_mega.py): all decoder
    layers in ONE program, activations VMEM-resident across the stack,
    weights manually double-buffered from HBM. MARS5_NAR_MEGA=1 to enable
    (default off until the on-chip differential is recorded — VERDICT r2 #4
    go/no-go ladder); MARS5_NAR_MEGA_INTERPRET=1 drives it on CPU tests."""
    import os
    mode = os.environ.get("MARS5_NAR_MEGA", "0")
    interp = os.environ.get("MARS5_NAR_MEGA_INTERPRET", "0") == "1"
    if mode != "1" and not interp:
        return False
    from ..ops.pallas.nar_mega import mega_supported
    if not mega_supported(p["layers"], x, nhead):
        return False
    if interp:
        return True
    if x.shape[0] * x.shape[1] < _NAR_FUSED_MIN_ROWS:
        return False
    from ..ops.pallas import enabled
    return enabled()


def split_decoder_tail(p):
    """Pre-split the stacked decoder layers for the q_tail_start fast path.

    Returns a shallow copy of ``p`` with ``layers_head`` (first N-1 layers,
    stacked) and ``layer_last`` added. Call ONCE outside any step loop: the
    slices copy the weight stacks, and XLA will not hoist them out of an
    enclosing ``while`` if they are traced inside the step (measured
    ~0.7 ms/step of s8 weight copies at MARS5 geometry).
    """
    out = dict(p)
    out["layers_head"] = jax.tree.map(lambda a: a[:-1], p["layers"])
    out["layer_last"] = jax.tree.map(lambda a: a[-1], p["layers"])
    return out


def decoder_stack(p, x, memory, nhead: int, tgt_key_padding_mask=None,
                  memory_key_padding_mask=None, q_tail_start: int = 0):
    """Stacked decoder layers + final LayerNorm.

    ``q_tail_start > 0``: the caller only consumes output rows from that
    index on (deep-clone prompt frames never feed the output heads —
    diffusion/engine.model_out_slice), so the FINAL layer runs its
    post-K/V work on the ``[q_tail_start:]`` query slice (ulp-level identical
    kept rows; see decoder_layer_fused) and the return value is already sliced:
    (B, L - q_tail_start, D). Applied on the fused serving path; other paths
    compute the full grid and slice at the end (same result).
    """
    if _use_nar_mega(p, x, nhead):
        import os
        from ..ops.pallas.nar_mega import mega_decoder_stack
        y = mega_decoder_stack(
            p["layers"], x, memory, nhead, tgt_key_padding_mask,
            memory_key_padding_mask, eps=LAYERNORM_EPS,
            interpret=os.environ.get("MARS5_NAR_MEGA_INTERPRET", "0") == "1")
        y = layer_norm(y, p["norm_w"], p["norm_b"], LAYERNORM_EPS)
        return y[:, q_tail_start:] if q_tail_start else y

    def step(h, layer_p):
        return decoder_layer(layer_p, h, memory, nhead,
                             tgt_key_padding_mask, memory_key_padding_mask), None

    # NOTE: callers running this inside a step loop MUST pre-split the
    # stacked layer weights (split_decoder_tail) — XLA does not hoist the
    # a[:-1]/a[-1] slices out of an enclosing while loop, and the un-hoisted
    # copies cost ~0.7 ms/step at MARS5 geometry (measured, r4 trace). The
    # diffusion engine passes the split via p["layers_head"]/p["layer_last"];
    # the slices below only run for one-shot callers.
    last_layer = p.get("layer_last")
    if last_layer is None and q_tail_start:
        last_layer = jax.tree.map(lambda a: a[-1], p["layers"])
    if q_tail_start and _use_nar_fused(last_layer, x):
        head_layers = p.get("layers_head")
        if head_layers is None:
            head_layers = jax.tree.map(lambda a: a[:-1], p["layers"])
        x, _ = jax.lax.scan(_maybe_remat(step), x, head_layers)
        x = decoder_layer_fused(last_layer, x, memory, nhead,
                                tgt_key_padding_mask, memory_key_padding_mask,
                                interpret=_nar_fused_interpret(),
                                q_start=q_tail_start)
        return layer_norm(x, p["norm_w"], p["norm_b"], LAYERNORM_EPS)

    x, _ = jax.lax.scan(_maybe_remat(step), x, p["layers"])
    x = layer_norm(x, p["norm_w"], p["norm_b"], LAYERNORM_EPS)
    return x[:, q_tail_start:] if q_tail_start else x
