"""Weight-only int8 quantization for HBM-bound decode.

The AR decode step is bandwidth-bound on the ~1.4 GB of bf16 weights it streams
per token; symmetric per-output-channel int8 halves that traffic. Kernels stay in
the torch (out, in) layout: ``w ≈ w_int8 * scale[:, None]``. Matmuls run
int8-weight x bf16-activation on the MXU with fp32 accumulation, then scale.

Quality: per-channel symmetric quantization of transformer weights is the
standard serving recipe (≈0.1% perplexity delta); sampling logits stay fp32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_weight(w, axis: int = -1, levels: int = 127):
    """Symmetric per-output-channel integer quantization: w -> (q, scale).

    ``axis`` is the reduction (input) axis; scales keep the other dims.
    ``levels`` is the max magnitude (127 for int8, 7 for int4 nibbles).
    """
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=axis, keepdims=True)
    scale = (amax / levels).astype(jnp.float32)
    q = jnp.round(w.astype(jnp.float32) / jnp.maximum(scale, 1e-12))
    q = jnp.clip(q, -levels, levels).astype(jnp.int8)
    return q, scale.squeeze(axis)


def linear_q8(x, q, scale, b=None):
    """y = x @ (q * scale).T — int8 weights dequantized on the fly.

    x: (..., in) bf16/fp32; q: (out, in) int8 (or stacked (L, out, in) consumed
    per-layer); scale: (out,).
    """
    y = jax.lax.dot_general(
        x, q,
        dimension_numbers=(((x.ndim - 1,), (q.ndim - 1,)), ((), ())),
        preferred_element_type=jnp.float32)
    y = y * scale.astype(jnp.float32)
    if b is not None:
        y = y + b
    return y.astype(x.dtype)


def quantize_weight_mse(w, levels: int, axis: int = -1,
                        ratios=(1.0, 0.9, 0.8, 0.7, 0.6)):
    """Symmetric int quantization with a per-channel MSE-optimal clip search.

    At int8 the amax scale is already ≈ MSE-optimal for transformer weights
    (CLAUDE.md quant-fidelity notes), but at int4 (``levels=7``) amax wastes
    most of the 15-level grid on the tail of the row distribution: for a
    Gaussian row of ~1.5k entries, clipping at ~0.6-0.8 of amax cuts the
    round-trip MSE by ~20-30%. Pack-time only — the kernels are unchanged.
    Returns (q, scale) like quantize_weight.
    """
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=axis, keepdims=True)
    best_err = None
    best_scale = None
    for r in ratios:
        scale = jnp.maximum(amax * (r / levels), 1e-12)
        q = jnp.clip(jnp.round(wf / scale), -levels, levels)
        err = jnp.sum(jnp.square(q * scale - wf), axis=axis, keepdims=True)
        if best_err is None:
            best_err, best_scale = err, scale
        else:
            take = err < best_err
            best_err = jnp.where(take, err, best_err)
            best_scale = jnp.where(take, scale, best_scale)
    q = jnp.clip(jnp.round(wf / best_scale), -levels, levels).astype(jnp.int8)
    return q, best_scale.squeeze(axis)


def quantize_weight_grouped(w, gsize: int, levels: int = 127):
    """Per-(output-channel, K-group) symmetric int8: finer than per-row.

    w: (..., N, K) with K % gsize == 0. Returns (q (..., N, K) int8,
    sg (..., G, N) f32) where G = K // gsize — the group axis leads the output
    axis to match the fused kernels' (G, N) scale layout. The quantized values
    are group-scaled, so they CANNOT be dequantized with a per-row scale:
    grouped dicts are only consumable by the fused Pallas GEMMs
    (ops/pallas/nar_fused.py), never by the XLA linear_w8a8 path.
    """
    K = w.shape[-1]
    if K % gsize:
        raise ValueError(f"gsize {gsize} does not divide K={K}")
    G = K // gsize
    wf = w.astype(jnp.float32).reshape(*w.shape[:-1], G, gsize)
    amax = jnp.max(jnp.abs(wf), axis=-1, keepdims=True)      # (..., N, G, 1)
    sg = (amax / levels).astype(jnp.float32)
    q = jnp.clip(jnp.round(wf / jnp.maximum(sg, 1e-12)), -levels, levels)
    q = q.astype(jnp.int8).reshape(w.shape)
    sg = jnp.moveaxis(sg[..., 0], -1, -2)                    # (..., G, N)
    return q, sg


def quantize_act(x):
    """Dynamic symmetric per-row (per-token) int8 activation quantization.

    Returns (x_int8, row_scale fp32 with trailing singleton axis).
    """
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    xs = jnp.maximum(amax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
    return xq, xs


def linear_w8a8(x, q, scale, b=None):
    """y ≈ x @ (q * scale).T with int8 activations — int8×int8→int32 MXU dot.

    x: (..., in) bf16/fp32; q: (out, in) int8; scale: (out,) fp32.
    Activations use dynamic per-row symmetric quantization (W8A8 per-token,
    the standard serving recipe); accumulation is int32, rescale fp32.
    """
    xq, xs = quantize_act(x)
    # stacked kernels (e.g. the (3, D, D) attention in_proj) add extra output
    # axes; align the per-row activation scale with them
    xs = xs.reshape(xs.shape[:-1] + (1,) * (q.ndim - 1))
    y = jax.lax.dot_general(
        xq, q,
        dimension_numbers=(((x.ndim - 1,), (q.ndim - 1,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * (xs * scale.astype(jnp.float32))
    if b is not None:
        y = y + b
    return y.astype(x.dtype)


_AR_QUANT_KEYS = ("wq", "wk", "wv", "wo", "w1", "w2", "w3")


def quantize_codeclm(params, act_int8: bool = False):
    """Quantize the AR backbone's block weights + output head to int8.

    Returns a new pytree where each quantized kernel leaf ``w`` becomes a dict
    ``{"q": int8, "s": scales}``; everything else (norms, embeddings, speaker
    encoder) is untouched. Consumed by the decode engine's quantized path.
    With ``act_int8``, the dicts carry ``a8=True`` and matmuls run W8A8
    (int8×int8→int32 on the MXU) instead of weight-only dequant.
    """
    out = jax.tree.map(lambda x: x, params)  # shallow-ish copy
    layers = dict(params["ar"]["layers"])

    def qdict(w):
        q, s = quantize_weight(w, axis=-1)  # (L, out, in) -> scale (L, out)
        # the W8A8 marker is a dict KEY (pytree structure is static under jit;
        # leaf values are traced, so a bool leaf could not drive dispatch).
        # Stacked (L, out, in) kernels get an (L,)-shaped dummy so lax.scan
        # over the layer axis can slice it.
        if not act_int8:
            return {"q": q, "s": s}
        marker = jnp.zeros(q.shape[:1] if q.ndim == 3 else ())
        return {"q": q, "s": s, "a8": marker}

    for k in _AR_QUANT_KEYS:
        layers[k] = qdict(layers[k])
    ar = dict(params["ar"])
    ar["layers"] = layers
    ar["output"] = qdict(params["ar"]["output"])
    out = dict(out)
    out["ar"] = ar
    return out


def is_quantized(w) -> bool:
    return isinstance(w, dict) and ("q" in w or "qt" in w)


def linear_w8a8_t(x, qt, scale, b=None):
    """W8A8 against a pre-transposed (in, out) int8 kernel.

    Uses plain XLA dots (in-graph they run ~350 TOP/s at NAR shapes; standalone
    microbenches that report far less are measuring their own feedback relayout
    — see CLAUDE.md). A fused Pallas GEMM in the transposed (K, N) layout
    measured slower than the XLA emitter at these sizes (the layout was the
    whole gap — see ops/pallas/nar_fused.py for the (N, K) kernels that win).
    """
    xq, xs = quantize_act(x)
    y = jax.lax.dot_general(
        xq, qt,
        dimension_numbers=(((x.ndim - 1,), (qt.ndim - 2,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * (xs * scale.astype(jnp.float32))
    if b is not None:
        y = y + b
    return y.astype(x.dtype)


def slice_rows(w, sl):
    """Slice a kernel (quantized dict or plain array) along its leading axis.

    For flat (out, in) kernels that is the output-row axis; for stacked kernels
    like the (3, D, D) attention in_proj it is the stack axis (``sl`` may be an
    int index or a slice).
    """
    if is_quantized(w):
        if "qt" in w:
            return {"qt": w["qt"][..., sl], "s": w["s"][sl]}
        out = {"q": w["q"][sl], "s": w["s"][sl]}
        if "a8" in w:
            out["a8"] = w["a8"]
        return out
    return w[sl]


_NAR_QUANT_KEYS = ("sa_in_w", "sa_out_w", "ca_in_w", "ca_out_w", "WV", "lin2_w")


def quantize_nar(params, act_int8: bool = True, w_gsize: int = 0,
                 w_group_keys=("sa_in_w", "WV", "lin2_w")):
    """Quantize the NAR encoder/decoder stacks (+8 output heads) to int8.

    The diffusion denoiser is compute-bound (SURVEY §2.7 budget: 200 steps × 2
    CFG forwards); int8×int8→int32 MXU dots with per-token activation quant are
    the precision lever (measured 16.13 → 13.81 ms/step at bench geometry; the
    (out, in) torch layout measured faster under XLA than pre-transposed (K, N),
    and a fused Pallas GEMM measured slower still — see linear_w8a8_t). Kept
    bf16: the speaker encoder (negligible compute, conditioning-critical),
    embeddings, layernorms, attention softmax (fp32), and all diffusion
    posterior math (fp32 — diffusion/ untouched). Grid-divergence vs bf16 is
    characterized in tests/test_quant.py.

    ``w_gsize > 0``: per-(channel, K-group) weight scales ("sg" key, group size
    ``w_gsize``) for the decoder-stack kernels in ``w_group_keys`` — the
    fidelity dial affordable only inside the fused Pallas GEMMs
    (MARS5_NAR_FUSED), which consume the matching per-K-group activation
    scales too. Grouped dicts deliberately omit "s": any XLA-path consumer
    fails loudly instead of dequantizing group-scaled values with a per-row
    scale — which is why ``w_group_keys`` must only name weights whose GEMM
    actually runs fused (ca_in_w never qualifies: its memory-KV rows feed the
    unfused XLA projection; sa_out_w/ca_out_w only if their sites are enabled
    in MARS5_NARF_SITES). Encoder-stack + head weights stay per-row.
    """
    def qdict(w):
        q, s = quantize_weight(w, axis=-1)
        if not act_int8:
            return {"q": q, "s": s}
        marker = jnp.zeros(q.shape[:-2] if q.ndim > 2 else ())
        return {"q": q, "s": s, "a8": marker}

    def qdict_grouped(w):
        if w.shape[-1] % w_gsize:
            return qdict(w)          # K not divisible: per-row fallback
        q, sg = quantize_weight_grouped(w, w_gsize)
        marker = jnp.zeros(q.shape[:-2] if q.ndim > 2 else ())
        return {"q": q, "sg": sg, "a8": marker}

    def keep_or_quantize(w, k, want_grouped):
        """Idempotence: params that already went through quantize_nar pass
        through unchanged (bench.build() quantizes by default since round 4;
        serving scripts layered a second quantize_nar on top and crashed with
        'dict has no attribute astype'). A re-quantize in a DIFFERENT mode is
        unsatisfiable from int8 leaves — fail loudly instead of silently
        keeping the old scales."""
        if is_quantized(w):
            have_grouped = "sg" in w
            # mirror qdict_grouped's K-divisibility fallback when comparing
            if want_grouped and w["q"].shape[-1] % w_gsize:
                want_grouped = False
            if have_grouped != want_grouped or ("a8" in w) != act_int8:
                raise ValueError(
                    f"quantize_nar: leaf {k!r} is already quantized as "
                    f"{'grouped' if have_grouped else 'per-row'}/"
                    f"{'a8' if 'a8' in w else 'weight-only'} but "
                    f"{'grouped' if want_grouped else 'per-row'}/"
                    f"{'a8' if act_int8 else 'weight-only'} was requested — "
                    "re-quantizing int8 leaves cannot change mode; start from "
                    "the bf16 params (e.g. BENCH_NAR=bf16 before bench.build)")
            return w
        if want_grouped:
            return qdict_grouped(w)
        return mk(w)

    mk = qdict
    out = dict(params)
    for stack in ("encoder", "decoder"):
        st = dict(params[stack])
        layers = dict(st["layers"])
        grouped = act_int8 and w_gsize > 0 and stack == "decoder"
        for k in _NAR_QUANT_KEYS:
            if k in layers:
                layers[k] = keep_or_quantize(
                    layers[k], k, grouped and k in w_group_keys)
        st["layers"] = layers
        out[stack] = st
    rd = dict(params["residual_decoder"])
    # (8, n_quant, d): N=1025, XLA path
    rd["lin_w"] = keep_or_quantize(rd["lin_w"], "lin_w", False)
    out["residual_decoder"] = rd
    return out


def index_quant(w, i):
    """Index a stacked kernel (quantized dict or plain array) on axis 0."""
    if is_quantized(w):
        key = "qt" if "qt" in w else "q"
        skey = "sg" if "sg" in w else "s"
        out = {key: w[key][i], skey: w[skey][i]}
        if "a8" in w:
            out["a8"] = w["a8"]
        return out
    return w[i]


def linear_w8a8_grouped(x, q, sg, b=None):
    """W8A8 with per-K-group weight+activation scales — XLA fallback.

    q: (..., N, K) group-scaled int8 (from quantize_weight_grouped);
    sg: (..., G, N) f32. This is the correctness twin of the fused kernels'
    grouped path for consumers off the fused route (CPU tests, small inputs
    under _FUSED_QUANT_MIN_ROWS). It pays G split-dots + G HBM rescales —
    never use it on the hot path (that's what ops/pallas/nar_fused.py is for).
    """
    G = sg.shape[-2]
    K = x.shape[-1]
    gs = K // G
    xf = x.astype(jnp.float32)
    out = None
    for g in range(G):
        sl = slice(g * gs, (g + 1) * gs)
        xq, xs = quantize_act(xf[..., sl])
        xs = xs.reshape(xs.shape[:-1] + (1,) * (q.ndim - 1))
        y = jax.lax.dot_general(
            xq, q[..., sl],
            dimension_numbers=(((x.ndim - 1,), (q.ndim - 1,)), ((), ())),
            preferred_element_type=jnp.int32)
        part = y.astype(jnp.float32) * (xs * sg[..., g, :])
        out = part if out is None else out + part
    if b is not None:
        out = out + b
    return out.astype(x.dtype)


def linear_any(x, w, b=None):
    """linear() that accepts a plain kernel or an int8 dict.

    Dict layouts: {"q" (out,in), "s"} weight-only; +"a8" key = W8A8 (XLA);
    {"q", "sg"} = per-K-group scales (fused-kernel format; slow XLA fallback
    here); {"qt" (in,out), "s"} = W8A8 against a pre-transposed kernel.
    """
    if is_quantized(w):
        if "qt" in w:
            return linear_w8a8_t(x, w["qt"], w["s"], b)
        if "sg" in w:
            return linear_w8a8_grouped(x, w["q"], w["sg"], b)
        if "a8" in w:
            return linear_w8a8(x, w["q"], w["s"], b)
        return linear_q8(x, w["q"], w["s"], b)
    from .attention import linear
    return linear(x, w, b)
