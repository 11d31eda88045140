"""Fused-kernel AR decode engine: int8 megakernel decode for bs=1 serving.

Production single-stream decode path: prefill runs through the bf16 XLA graph
(models/ar.codeclm_prefill), then every generated token goes through ONE Pallas
program (ops/pallas/decode_layer.fused_decode_layers) that streams the whole
int8-quantized backbone + ring KV cache through VMEM once. The output head
(int8, XLA), final RMSNorm, the reference logit pipeline, and inverse-CDF
sampling are shared with the XLA engine (models/ar_decode). Reference semantics
follow mars5/ar_generate.py:15-165; numeric contract (W8A8 per-token dynamic
quantization) is characterized by tests/test_quant.py token-divergence gates.

Batched serving keeps the XLA engine; this path exists to win the bs=1 latency
benchmark (BASELINE configs #1/#2) where the ~470 GB/s practical HBM bandwidth
of the chip — not compute — bounds tokens/s.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.pallas import enabled as pallas_enabled
from ..ops.pallas.decode_layer import (FusedDims, build_fused_pack,
                                       fused_decode_layers,
                                       fused_step_emulation,
                                       fused_step_emulation_batched, make_dims,
                                       quantize_kv_rows)
from ..ops.quant import quantize_weight, linear_q8
from ..ops.norms import rms_norm
from .ar import CodecLMConfig, codeclm_prefill, spk_embedding
from .ar_decode import (ArSampling, RowSampling, _sample_and_update,
                        DecodeState, _bucket)


class FusedState(NamedTuple):
    tokens: jax.Array      # (1, max_len) int32
    cur: jax.Array         # (1,)
    n_gen: jax.Array       # (1,)
    cache_k: jax.Array     # (L, W_pad, d) int8 — layer-flat fused layout
    cache_v: jax.Array     # (L, W_pad, d) int8
    kv_scales: jax.Array   # (L, 2, W_pad) f32 per-position K/V dequant scales
    counts: jax.Array      # (1, V)
    uniforms: jax.Array    # (max_len, 1)
    est_len: jax.Array     # (1,)
    done: jax.Array        # (1,)


def prepare_fused(params, cfg: CodecLMConfig, max_len: int, wbits: int = 8,
                  batch: int = 1):
    """Build the decode-time bundle: quantized pack + head + embed/norm.

    ``params`` are the raw (bf16) CodecLM params; returns (bundle, dims).
    ``wbits``: backbone weight precision — 8 (default, W8A8) or 4
    (nibble-packed int4 weights, halves the dominant weight stream; quality
    characterized in tests/test_quant.py + scripts/bench_quality_modes.py).
    ``batch``: decode rows per kernel step (<= 8) — batched serving amortizes
    the weight stream over the rows; the pack itself is batch-independent.
    """
    dims = make_dims(cfg, max_len, wbits=wbits, batch=batch)
    fp = build_fused_pack(params, cfg, dims)
    import os
    if wbits == 4 and os.environ.get("MARS5_HEAD4", "0") == "1":
        # OPT-IN int4 head (MARS5_HEAD4=1): halves the second-largest
        # per-token stream (~26 ms over a bench decode) but the head error is
        # NOT residual-diluted like backbone int4 — measured ~11% max logit
        # perturbation on Gaussian weights (tests/test_head4.py) vs the int8
        # head's ~0.9%, so it stays off the production default.
        from ..ops.pallas.head4 import pack_head4
        fp["head4_p"], fp["head4_s"] = pack_head4(params["ar"]["output"])
    else:
        hq, hs = quantize_weight(params["ar"]["output"], axis=-1)
        fp["head_q"], fp["head_s"] = hq, hs.astype(jnp.float32)
    fp["final_norm"] = params["ar"]["norm"]
    fp["embed"] = params["embed"]
    return fp, dims


def _head_logits(fp, cfg: CodecLMConfig, h, interpret):
    """Output head: int4 Pallas stream when the pack carries head4, else the
    int8 XLA head. ``interpret`` follows the engine convention (None = jnp
    emulation oracle, True = Pallas interpreter, False = compiled)."""
    if "head4_p" in fp:
        from ..ops.pallas.head4 import head4_logits, head4_logits_emulation
        if interpret is None:
            return head4_logits_emulation(h, fp["head4_p"], fp["head4_s"],
                                          n_vocab=cfg.n_vocab)
        return head4_logits(h, fp["head4_p"], fp["head4_s"],
                            n_vocab=cfg.n_vocab, interpret=bool(interpret))
    return linear_q8(h, fp["head_q"], fp["head_s"]).astype(jnp.float32)


def _fused_backbone_step(fp, dims: FusedDims, cfg: CodecLMConfig, token, pos,
                         cache_k, cache_v, kv_scales, interpret: bool):
    """One-token forward: embed -> megakernel -> final norm -> int8 head."""
    x = fp["embed"][token].astype(jnp.bfloat16)         # (1, d)
    x = jnp.concatenate([x, jnp.zeros((7, dims.dim), jnp.bfloat16)], axis=0)
    if interpret is None:  # pure-jnp emulation (CPU test oracle)
        h, k_new, v_new = fused_step_emulation(
            fp, x, pos, cache_k, cache_v, kv_scales, dims=dims,
            norm_eps=cfg.norm_eps)
    else:
        h, k_new, v_new = fused_decode_layers(
            fp, x, pos, cache_k, cache_v, kv_scales, dims=dims,
            norm_eps=cfg.norm_eps, interpret=interpret)
    h = rms_norm(h[0:1].astype(jnp.bfloat16), fp["final_norm"], cfg.norm_eps)
    logits = _head_logits(fp, cfg, h, interpret)
    slot = jnp.mod(pos, dims.window)
    k8, ks_new = quantize_kv_rows(k_new)      # (L, 1, d) -> (L, 1)
    v8, vs_new = quantize_kv_rows(v_new)
    cache_k = jax.lax.dynamic_update_slice(cache_k, k8, (0, slot, 0))
    cache_v = jax.lax.dynamic_update_slice(cache_v, v8, (0, slot, 0))
    s_new = jnp.concatenate([ks_new, vs_new], axis=1)[:, :, None]  # (L, 2, 1)
    kv_scales = jax.lax.dynamic_update_slice(kv_scales, s_new, (0, 0, slot))
    return logits, cache_k, cache_v, kv_scales


def _fused_body(fp, dims, cfg, s: ArSampling, st: FusedState,
                interpret) -> FusedState:
    last_tok = st.tokens[0, (st.cur[0] - 1).clip(0)]
    logits, ck, cv, kvs = _fused_backbone_step(
        fp, dims, cfg, last_tok[None], st.cur[0], st.cache_k, st.cache_v,
        st.kv_scales, interpret)
    st = st._replace(cache_k=ck, cache_v=cv, kv_scales=kvs)
    # reuse the shared sampling pipeline via the DecodeState duck-type
    upd = _sample_and_update(logits, st, s)
    return upd


@functools.partial(jax.jit, static_argnames=("cfg", "dims", "s", "interpret",
                                              "draw_uniforms"))
def _generate_fused_jit(params, fp, cfg: CodecLMConfig, dims: FusedDims,
                        s: ArSampling, prompt_padded, prompt_len, spk_codes,
                        uniforms, est_len, interpret=False,
                        draw_uniforms=False, seed=0):
    if draw_uniforms:
        # drawn in-graph: the serving wrapper passes a host int seed instead of
        # paying a separate PRNGKey+uniform dispatch round-trip over the axon
        # tunnel (~10-20 ms each) before the decode launches
        uniforms = jax.random.uniform(jax.random.PRNGKey(seed),
                                      (s.max_len, prompt_padded.shape[0]))
    # ---- prefill through the bf16 XLA graph (one pass, batched matmuls) ----
    spk_vec = spk_embedding(params, cfg, spk_codes)
    all_logits, kvs = codeclm_prefill(params, cfg, prompt_padded, spk_vec)
    k_full, v_full = kvs                     # (L, 1, Pb+1, H, D)
    pb = prompt_padded.shape[1]
    d = dims.dim
    k_flat = k_full[:, 0].reshape(dims.n_layers, pb + 1, d)
    v_flat = v_full[:, 0].reshape(dims.n_layers, pb + 1, d)
    k8, ks = quantize_kv_rows(k_flat)        # (L, Pb+1, d), (L, Pb+1)
    v8, vs = quantize_kv_rows(v_flat)
    cache_k = jnp.zeros((dims.n_layers, dims.w_pad, d), jnp.int8)
    cache_v = jnp.zeros_like(cache_k)
    cache_k = cache_k.at[:, : pb + 1].set(k8)
    cache_v = cache_v.at[:, : pb + 1].set(v8)
    kv_scales = jnp.zeros((dims.n_layers, 2, dims.w_pad), jnp.float32)
    kv_scales = kv_scales.at[:, 0, : pb + 1].set(ks)
    kv_scales = kv_scales.at[:, 1, : pb + 1].set(vs)

    last_logits = jnp.take_along_axis(
        all_logits, prompt_len[:, None, None], axis=1)[:, 0].astype(jnp.float32)

    tokens = jnp.zeros((1, s.max_len), jnp.int32)
    tokens = jax.lax.dynamic_update_slice(tokens, prompt_padded.astype(jnp.int32), (0, 0))
    st = FusedState(
        tokens=tokens, cur=prompt_len.astype(jnp.int32),
        n_gen=jnp.zeros((1,), jnp.int32), cache_k=cache_k, cache_v=cache_v,
        kv_scales=kv_scales,
        counts=jnp.zeros((1, cfg.n_vocab), jnp.int32), uniforms=uniforms,
        est_len=est_len.astype(jnp.int32), done=jnp.zeros((1,), bool))
    st = _sample_and_update(last_logits, st, s)

    final = jax.lax.while_loop(
        lambda t: ~jnp.all(t.done),
        lambda t: _fused_body(fp, dims, cfg, s, t, interpret),
        st)
    # one packed int32 row: [final_len, n_gen, tokens...] — the wrapper fetches
    # it in a SINGLE device->host round trip (3 separate fetches cost ~2 extra
    # RPC latencies over the axon tunnel)
    return jnp.concatenate([final.cur, final.n_gen, final.tokens[0]])


def ar_generate_fused(params, fp, cfg: CodecLMConfig, dims: FusedDims, prompt,
                      spk_codes, *, sampling: ArSampling, uniforms=None,
                      seed: int = 0, interpret=False):
    """bs=1 generation via the fused int8 decode kernel (reference-shaped API).

    ``interpret``: False = compiled kernel (TPU), True = Pallas interpreter
    (CPU tests), None = pure-jnp emulation (oracle).
    """
    prompt = np.asarray(prompt)
    window = dims.window
    if len(prompt) + 1 > window:
        raise ValueError(f"prompt length {len(prompt)} exceeds window {window}")
    # host-side numpy only: every eager jnp op here would be its own device
    # RPC; passing np arrays lets the ONE jit dispatch batch all transfers.
    # Prompt/speaker widths are bucketed (as in ar_generate_batched) so the
    # prefill graph compiles once per 64/16-wide bucket, not once per
    # utterance: pad positions past prompt_len hold junk KVs that decode
    # overwrites before ever attending them (cur starts at prompt_len), so
    # real-row numerics are unchanged — the shared-uniform reference-parity
    # suites run through this path.
    pb = min(_bucket(len(prompt)), window - 1)
    prompt_padded = np.zeros((1, pb), np.int32)
    prompt_padded[0, : len(prompt)] = prompt
    prompt_len = np.asarray([len(prompt)], np.int32)
    spk_codes = np.asarray(spk_codes, np.int32)
    sb = _bucket(spk_codes.shape[0], 16)
    spk = np.full((1, sb, spk_codes.shape[1]), cfg.codebook_size - 1, np.int32)
    spk[0, : spk_codes.shape[0]] = spk_codes
    draw = uniforms is None
    if draw:
        uniforms = np.zeros((0,), np.float32)  # placeholder, untraced branch
    else:
        uniforms = np.asarray(uniforms, np.float32)
        if uniforms.ndim == 1:
            uniforms = uniforms[:, None]
    est = np.full((1,), sampling.n_phones_gen, np.int32)
    packed = np.asarray(_generate_fused_jit(
        params, fp, cfg, dims, sampling, prompt_padded, prompt_len, spk,
        uniforms, est, interpret=interpret, draw_uniforms=draw,
        seed=np.int32(seed)))
    final_len, n_gen = int(packed[0]), int(packed[1])
    return packed[2: 2 + final_len], n_gen


# ---------------------------------------------------------------------------
# batched fused decode (dims.batch rows per kernel step)

def _fused_backbone_step_batched(fp, dims: FusedDims, cfg: CodecLMConfig,
                                 tokens, pos_vec, cache_k, cache_v, kv_scales,
                                 interpret):
    """B-token forward: embed -> batched megakernel -> final norm -> int8 head.

    tokens/pos_vec: (B,) int32. Caches are layer-flat batched:
    cache_k/v (L, B, Wp, d) int8, kv_scales (L, 2B, Wp) f32.
    """
    B = dims.batch
    L, Wp, d = dims.n_layers, dims.w_pad, dims.dim
    x = fp["embed"][tokens].astype(jnp.bfloat16)            # (B, d)
    x = jnp.concatenate([x, jnp.zeros((8 - B, d), jnp.bfloat16)], axis=0)
    if interpret is None:  # pure-jnp emulation (CPU test oracle)
        h, k_new, v_new = fused_step_emulation_batched(
            fp, x, pos_vec, cache_k, cache_v, kv_scales, dims=dims,
            norm_eps=cfg.norm_eps)
    else:
        h, k_new, v_new = fused_decode_layers(
            fp, x, pos_vec, cache_k, cache_v, kv_scales, dims=dims,
            norm_eps=cfg.norm_eps, interpret=interpret)
    h = rms_norm(h[:B].astype(jnp.bfloat16), fp["final_norm"], cfg.norm_eps)
    logits = _head_logits(fp, cfg, h, interpret)
    slot = jnp.mod(pos_vec, dims.window)                    # (B,)
    k8, ks_new = quantize_kv_rows(k_new[:, :B])             # (L, B, d), (L, B)
    v8, vs_new = quantize_kv_rows(v_new[:, :B])
    flat = jnp.arange(B) * Wp + slot
    cache_k = (cache_k.reshape(L, B * Wp, d)
               .at[:, flat].set(k8, unique_indices=True).reshape(L, B, Wp, d))
    cache_v = (cache_v.reshape(L, B * Wp, d)
               .at[:, flat].set(v8, unique_indices=True).reshape(L, B, Wp, d))
    sidx = jnp.concatenate([flat, B * Wp + flat])           # K rows then V rows
    svals = jnp.concatenate([ks_new, vs_new], axis=1)       # (L, 2B)
    kv_scales = (kv_scales.reshape(L, 2 * B * Wp)
                 .at[:, sidx].set(svals, unique_indices=True)
                 .reshape(L, 2 * B, Wp))
    return logits, cache_k, cache_v, kv_scales


def _fused_body_batched(fp, dims, cfg, s: ArSampling, st: FusedState,
                        rows, interpret) -> FusedState:
    bs = st.cur.shape[0]
    b_idx = jnp.arange(bs)
    last_tok = st.tokens[b_idx, (st.cur - 1).clip(0)]       # (B,)
    logits, ck, cv, kvs = _fused_backbone_step_batched(
        fp, dims, cfg, last_tok, st.cur, st.cache_k, st.cache_v,
        st.kv_scales, interpret)
    st = st._replace(cache_k=ck, cache_v=cv, kv_scales=kvs)
    return _sample_and_update(logits, st, s, rows)


@functools.partial(jax.jit, static_argnames=("cfg", "dims", "s"))
def _fused_prefill_batched(params, cfg: CodecLMConfig, dims: FusedDims,
                           s: ArSampling, prompt_padded, prompt_len, spk_codes,
                           uniforms, est_len, active,
                           rows: RowSampling | None = None) -> FusedState:
    """Batched bf16-XLA prefill into the fused engine's state (int8 layer-flat
    caches), including the first sampled token. Shared by one-shot batched
    generation and the continuous-serving pool (which prefills per bucket and
    then inserts rows into its live pool state)."""
    B = dims.batch
    L, Wp, d = dims.n_layers, dims.w_pad, dims.dim
    spk_vec = spk_embedding(params, cfg, spk_codes)
    all_logits, kvs = codeclm_prefill(params, cfg, prompt_padded, spk_vec)
    k_full, v_full = kvs                     # (L, B, Pb+1, H, D)
    pb = prompt_padded.shape[1]
    k_flat = k_full.reshape(L, B, pb + 1, d)
    v_flat = v_full.reshape(L, B, pb + 1, d)
    k8, ks = quantize_kv_rows(k_flat)        # (L, B, Pb+1, d), (L, B, Pb+1)
    v8, vs = quantize_kv_rows(v_flat)
    cache_k = jnp.zeros((L, B, Wp, d), jnp.int8).at[:, :, : pb + 1].set(k8)
    cache_v = jnp.zeros((L, B, Wp, d), jnp.int8).at[:, :, : pb + 1].set(v8)
    kv_scales = jnp.zeros((L, 2 * B, Wp), jnp.float32)
    kv_scales = kv_scales.at[:, :B, : pb + 1].set(ks)
    kv_scales = kv_scales.at[:, B:, : pb + 1].set(vs)

    last_logits = jnp.take_along_axis(
        all_logits, prompt_len[:, None, None], axis=1)[:, 0].astype(jnp.float32)

    tokens = jnp.zeros((B, s.max_len), jnp.int32)
    tokens = jax.lax.dynamic_update_slice(
        tokens, prompt_padded.astype(jnp.int32), (0, 0))
    st = FusedState(
        tokens=tokens, cur=prompt_len.astype(jnp.int32),
        n_gen=jnp.zeros((B,), jnp.int32), cache_k=cache_k, cache_v=cache_v,
        kv_scales=kv_scales,
        counts=jnp.zeros((B, cfg.n_vocab), jnp.int32), uniforms=uniforms,
        est_len=est_len.astype(jnp.int32), done=~active)
    return _sample_and_update(last_logits, st, s, rows)


@functools.partial(jax.jit, static_argnames=("cfg", "dims", "s", "interpret",
                                              "draw_uniforms"))
def _generate_fused_batched_jit(params, fp, cfg: CodecLMConfig,
                                dims: FusedDims, s: ArSampling, prompt_padded,
                                prompt_len, spk_codes, uniforms, est_len,
                                active, rows: RowSampling | None = None,
                                interpret=False, draw_uniforms=False, seed=0):
    if draw_uniforms:  # in-graph draw: see _generate_fused_jit
        uniforms = jax.random.uniform(jax.random.PRNGKey(seed),
                                      (s.max_len, prompt_padded.shape[0]))
    st = _fused_prefill_batched(params, cfg, dims, s, prompt_padded,
                                prompt_len, spk_codes, uniforms, est_len,
                                active, rows)
    final = jax.lax.while_loop(
        lambda t: ~jnp.all(t.done),
        lambda t: _fused_body_batched(fp, dims, cfg, s, t, rows, interpret),
        st)
    # packed (B, 2 + max_len): [final_len | n_gen | tokens] — single fetch
    return jnp.concatenate(
        [final.cur[:, None], final.n_gen[:, None], final.tokens], axis=1)


# ---------------------------------------------------------------------------
# continuous-serving pool primitives (fused-engine twins of models/ar_decode's
# make_parked_state / extract_row / insert_row / decode_chunk)

def make_parked_state_fused(cfg: CodecLMConfig, dims: FusedDims,
                            s: ArSampling) -> FusedState:
    """An all-done batch FusedState (every row free) for a continuous batcher."""
    B, L, Wp, d = dims.batch, dims.n_layers, dims.w_pad, dims.dim
    return FusedState(
        tokens=jnp.zeros((B, s.max_len), jnp.int32),
        cur=jnp.zeros((B,), jnp.int32),
        n_gen=jnp.zeros((B,), jnp.int32),
        cache_k=jnp.zeros((L, B, Wp, d), jnp.int8),
        cache_v=jnp.zeros((L, B, Wp, d), jnp.int8),
        kv_scales=jnp.zeros((L, 2 * B, Wp), jnp.float32),
        counts=jnp.zeros((B, cfg.n_vocab), jnp.int32),
        uniforms=jnp.zeros((s.max_len, B), jnp.float32),
        est_len=jnp.zeros((B,), jnp.int32),
        done=jnp.ones((B,), bool))


@jax.jit
def extract_fused_row(state: FusedState, j) -> FusedState:
    """Slice row ``j`` out of a batch FusedState as a 1-row piece.

    kv_scales interleaves K rows [0, B) and V rows [B, 2B): the piece carries
    its K scale at row 0 and V scale at row 1."""
    B = state.cur.shape[0]
    return FusedState(
        tokens=jax.lax.dynamic_slice_in_dim(state.tokens, j, 1, 0),
        cur=jax.lax.dynamic_slice_in_dim(state.cur, j, 1, 0),
        n_gen=jax.lax.dynamic_slice_in_dim(state.n_gen, j, 1, 0),
        cache_k=jax.lax.dynamic_slice_in_dim(state.cache_k, j, 1, 1),
        cache_v=jax.lax.dynamic_slice_in_dim(state.cache_v, j, 1, 1),
        kv_scales=jnp.concatenate([
            jax.lax.dynamic_slice_in_dim(state.kv_scales, j, 1, 1),
            jax.lax.dynamic_slice_in_dim(state.kv_scales, B + j, 1, 1)], 1),
        counts=jax.lax.dynamic_slice_in_dim(state.counts, j, 1, 0),
        uniforms=jax.lax.dynamic_slice_in_dim(state.uniforms, j, 1, 1),
        est_len=jax.lax.dynamic_slice_in_dim(state.est_len, j, 1, 0),
        done=jax.lax.dynamic_slice_in_dim(state.done, j, 1, 0))


@jax.jit
def insert_fused_row(state: FusedState, row: FusedState, b) -> FusedState:
    """Write an extract_fused_row piece into slot ``b`` of a batch FusedState."""
    B = state.cur.shape[0]
    kvs = jax.lax.dynamic_update_slice(
        state.kv_scales, row.kv_scales[:, 0:1], (0, b, 0))
    kvs = jax.lax.dynamic_update_slice(
        kvs, row.kv_scales[:, 1:2], (0, B + b, 0))
    return FusedState(
        tokens=jax.lax.dynamic_update_slice(state.tokens, row.tokens, (b, 0)),
        cur=state.cur.at[b].set(row.cur[0]),
        n_gen=state.n_gen.at[b].set(row.n_gen[0]),
        cache_k=jax.lax.dynamic_update_slice(
            state.cache_k, row.cache_k, (0, b, 0, 0)),
        cache_v=jax.lax.dynamic_update_slice(
            state.cache_v, row.cache_v, (0, b, 0, 0)),
        kv_scales=kvs,
        counts=jax.lax.dynamic_update_slice(state.counts, row.counts, (b, 0)),
        uniforms=jax.lax.dynamic_update_slice(
            state.uniforms, row.uniforms, (0, b)),
        est_len=state.est_len.at[b].set(row.est_len[0]),
        done=state.done.at[b].set(row.done[0]))


@functools.partial(jax.jit, static_argnames=("cfg", "dims", "s", "n_steps",
                                             "interpret"))
def decode_chunk_fused(fp, cfg: CodecLMConfig, dims: FusedDims, s: ArSampling,
                       state: FusedState, n_steps: int,
                       rows: RowSampling | None = None,
                       interpret=False) -> FusedState:
    """Run at most n_steps fused decode iterations (early-out when all done).

    The continuous-batching scheduling quantum on the int8/int4 megakernel:
    rows decode independently, so chunked execution is bit-identical to the
    monolithic while_loop per row (tested against ar_generate_fused_batched)."""
    def cond(carry):
        st, i = carry
        return (~jnp.all(st.done)) & (i < n_steps)

    def body(carry):
        st, i = carry
        return _fused_body_batched(fp, dims, cfg, s, st, rows, interpret), i + 1

    final, _ = jax.lax.while_loop(cond, body, (state, jnp.int32(0)))
    return final


def ar_generate_fused_batched(params, fp, cfg: CodecLMConfig, dims: FusedDims,
                              prompts, spk_codes_list, *,
                              sampling: ArSampling, uniforms=None,
                              seed: int = 0, est_lens=None, rows=None,
                              interpret=False):
    """Batched generation via the fused int8/int4 decode kernel.

    The kernel processes ``dims.batch`` rows per step on the same 8-row
    sublane block the bs=1 path already pads to, so the B-fold amortization of
    the dominant weight stream is nearly free; only attention and the KV
    stream scale with B. API mirrors models/ar_decode.ar_generate_batched;
    ``len(prompts)`` must be <= dims.batch (short batches are padded with
    parked rows).
    """
    B = dims.batch
    n = len(prompts)
    if n > B:
        raise ValueError(f"{n} prompts > kernel batch {B}")
    window = dims.window
    max_p = max(len(p) for p in prompts)
    if max_p + 1 > window:
        raise ValueError(f"prompt length {max_p} exceeds window {window}")
    pb = min(_bucket(max_p), window - 1)
    prompt_padded = np.zeros((B, pb), np.int32)
    prompt_len = np.zeros((B,), np.int32)
    for i, p in enumerate(prompts):
        prompt_padded[i, : len(p)] = np.asarray(p, np.int32)
        prompt_len[i] = len(p)

    max_s = max(c.shape[0] for c in spk_codes_list)
    sb = _bucket(max_s, 16)
    spk = np.full((B, sb, 8), cfg.codebook_size - 1, np.int32)  # pad idx 1024
    for i, c in enumerate(spk_codes_list):
        spk[i, : c.shape[0]] = np.asarray(c, np.int32)

    draw = uniforms is None
    if draw:
        uniforms = np.zeros((0,), np.float32)  # placeholder, untraced branch
    else:
        uniforms = np.asarray(uniforms, np.float32)
    est = np.full((B,), sampling.n_phones_gen, np.int32)
    if est_lens is not None:
        est[:n] = np.asarray(est_lens, np.int32)
    active = np.arange(B) < n
    packed = np.asarray(_generate_fused_batched_jit(
        params, fp, cfg, dims, sampling, prompt_padded,
        prompt_len, spk, uniforms, est, active, rows, interpret=interpret,
        draw_uniforms=draw, seed=np.int32(seed)))
    final_len, n_gen, tokens = packed[:, 0], packed[:, 1], packed[:, 2:]
    return [(tokens[i, : final_len[i]], int(n_gen[i])) for i in range(n)]
