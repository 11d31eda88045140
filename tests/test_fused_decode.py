"""Tests for the fused int8 decode-layer megakernel (ops/pallas/decode_layer).

Three layers of verification, all on CPU:
1. kernel (interpret mode) == pure-jnp emulation, bit-level (same quantized math);
2. emulation with quantization DISABLED == the XLA decode engine step with
   identical dequantized weights — validates the kernel's STRUCTURE (pack
   layout, flat-RoPE convention, mask-fold attention, ring-slot masking,
   self-column semantics) against the tested engine (models/ar_decode), which
   itself is token-parity-tested against the PyTorch reference
   (/root/reference/mars5/ar_generate.py) in tests/test_ar_decode.py;
3. end-to-end fused generation (prefill -> while_loop -> sampling) is
   token-identical between interpret kernel and emulation, and the W8A8
   quantization noise vs the bf16 engine stays within a characterized bound
   (logit error; the token-divergence quality gate lives in test_quant.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mars5_tts_tpu.models.ar import CodecLMConfig, init_codeclm
from mars5_tts_tpu.models.ar_decode import ArSampling, _decode_backbone_step
from mars5_tts_tpu.models.ar_decode_fused import ar_generate_fused, prepare_fused
from mars5_tts_tpu.ops.attention import linear
from mars5_tts_tpu.ops.norms import rms_norm
from mars5_tts_tpu.ops.pallas.decode_layer import (fused_decode_layers,
                                                   fused_step_emulation)
from mars5_tts_tpu.ops.quant import quantize_weight

# geometry constraints of the kernel: dim % 128 == 0, hidden/2 % 128 == 0
CFG = CodecLMConfig(n_vocab=512, dim=256, n_heads=4, n_kv_heads=4, head_dim=64,
                    n_layers=3, hidden_dim=512, sliding_window=24,
                    n_spk_layers=2, spk_hidden_dim=256)
MAX_LEN = 40  # > sliding_window: generation exercises ring wrap


@pytest.fixture(scope="module")
def setup():
    params = init_codeclm(jax.random.PRNGKey(0), CFG, dtype=jnp.bfloat16)
    fp, dims = prepare_fused(params, CFG, max_len=MAX_LEN)
    return params, fp, dims


def _rand_cache(dims, seed):
    """Random int8 ring caches + per-position scales (fused int8-KV layout)."""
    from mars5_tts_tpu.ops.pallas.decode_layer import quantize_kv_rows
    rng = np.random.default_rng(seed)
    c = (rng.standard_normal((dims.n_layers, dims.w_pad, dims.dim)) * 0.1)
    c[:, dims.window:] = 0
    return quantize_kv_rows(jnp.asarray(c, jnp.float32))


@pytest.mark.parametrize("pos", [pytest.param(5, marks=pytest.mark.slow), 30])  # below and beyond the ring window
def test_kernel_matches_emulation(setup, pos):
    params, fp, dims = setup
    x = jax.random.normal(jax.random.PRNGKey(1), (8, dims.dim), jnp.bfloat16)
    x = x.at[1:].set(0)
    (ck, ks), (cv, vs) = _rand_cache(dims, 2), _rand_cache(dims, 3)
    kvs = jnp.stack([ks, vs], axis=1)  # (L, 2, W_pad)
    p = jnp.int32(pos)
    h_e, k_e, v_e = fused_step_emulation(fp, x, p, ck, cv, kvs, dims=dims,
                                         norm_eps=CFG.norm_eps)
    h_k, k_k, v_k = fused_decode_layers(fp, x, p, ck, cv, kvs, dims=dims,
                                        norm_eps=CFG.norm_eps, interpret=True)
    np.testing.assert_allclose(np.asarray(h_k), np.asarray(h_e), rtol=0, atol=1e-5)
    # k/v rows are f32 now (caller quantizes them into the int8 cache); the
    # interpreter and the jnp emulation differ by ~1 ulp in the rope/dot chain.
    np.testing.assert_allclose(np.asarray(k_k), np.asarray(k_e), rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(v_k), np.asarray(v_e), rtol=0, atol=1e-6)


@pytest.mark.parametrize("pos", [pytest.param(5, marks=pytest.mark.slow), 30, pytest.param(70, marks=pytest.mark.slow)])  # chunk 0 only / wrap / mid-chunk
def test_kernel_matches_emulation_kv_chunked(setup, pos):
    """Prefix-chunked KV DMA (kv_chunk > 0): only chunks covering [0, pos]
    are copied; un-DMA'd tail rows must be excluded by the validity mask.
    pos=70 lands mid-chunk-1 with a wide window; pos=30 wraps the small ring
    (full copy fallback predicate)."""
    params, _, _ = setup
    wide = CFG if pos >= 64 else None
    if wide is not None:
        # window > pos so the prefix case is exercised at a 2-chunk geometry
        cfg2 = CodecLMConfig(n_vocab=512, dim=256, n_heads=4, n_kv_heads=4,
                             head_dim=64, n_layers=3, hidden_dim=512,
                             sliding_window=120, n_spk_layers=2,
                             spk_hidden_dim=256)
        params2 = init_codeclm(jax.random.PRNGKey(0), cfg2, dtype=jnp.bfloat16)
        fp, dims = prepare_fused(params2, cfg2, max_len=126)
        eps = cfg2.norm_eps
    else:
        fp, dims = prepare_fused(params, CFG, max_len=MAX_LEN)
        eps = CFG.norm_eps
    import dataclasses
    dims = dataclasses.replace(dims, kv_chunk=64)
    assert dims.w_pad % dims.kv_chunk == 0 and dims.w_pad // dims.kv_chunk > 1
    x = jax.random.normal(jax.random.PRNGKey(1), (8, dims.dim), jnp.bfloat16)
    x = x.at[1:].set(0)
    (ck, ks), (cv, vs) = _rand_cache(dims, 2), _rand_cache(dims, 3)
    kvs = jnp.stack([ks, vs], axis=1)
    p = jnp.int32(pos)
    h_e, k_e, v_e = fused_step_emulation(fp, x, p, ck, cv, kvs, dims=dims,
                                         norm_eps=eps)
    h_k, k_k, v_k = fused_decode_layers(fp, x, p, ck, cv, kvs, dims=dims,
                                        norm_eps=eps, interpret=True)
    np.testing.assert_allclose(np.asarray(h_k), np.asarray(h_e), rtol=0, atol=1e-5)
    # k rope noise grows ~1 ulp with pos magnitude (pre-quantization f32 rows)
    np.testing.assert_allclose(np.asarray(k_k), np.asarray(k_e), rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v_k), np.asarray(v_e), rtol=0, atol=1e-5)


@pytest.mark.parametrize("pos", [pytest.param(5, marks=pytest.mark.slow), 30])
def test_kernel_matches_emulation_w4(setup, pos):
    """int4 nibble-packed mode: interpret kernel == jnp emulation."""
    params, _, _ = setup
    fp4, dims4 = prepare_fused(params, CFG, max_len=MAX_LEN, wbits=4)
    assert dims4.wbits == 4
    assert fp4["pack"].shape[-1] == dims4.dim // 2
    x = jax.random.normal(jax.random.PRNGKey(1), (8, dims4.dim), jnp.bfloat16)
    x = x.at[1:].set(0)
    (ck, ks), (cv, vs) = _rand_cache(dims4, 2), _rand_cache(dims4, 3)
    kvs = jnp.stack([ks, vs], axis=1)
    p = jnp.int32(pos)
    h_e, k_e, v_e = fused_step_emulation(fp4, x, p, ck, cv, kvs, dims=dims4,
                                         norm_eps=CFG.norm_eps)
    h_k, k_k, v_k = fused_decode_layers(fp4, x, p, ck, cv, kvs, dims=dims4,
                                        norm_eps=CFG.norm_eps, interpret=True)
    np.testing.assert_allclose(np.asarray(h_k), np.asarray(h_e), rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(k_k), np.asarray(k_e), rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(v_k), np.asarray(v_e), rtol=0, atol=1e-6)


def test_w4_pack_roundtrip():
    """_pack4/_unpack4 are exact inverses over the full int4 range."""
    from mars5_tts_tpu.ops.pallas.decode_layer import _pack4, _unpack4
    rng = np.random.default_rng(0)
    qa = jnp.asarray(rng.integers(-7, 8, (16, 256)), jnp.int8)
    qb = jnp.asarray(rng.integers(-7, 8, (16, 256)), jnp.int8)
    lo, hi = _unpack4(_pack4(qa, qb))
    np.testing.assert_array_equal(np.asarray(lo), np.asarray(qa))
    np.testing.assert_array_equal(np.asarray(hi), np.asarray(qb))


@pytest.mark.slow
def test_w4_generation_runs(setup):
    """End-to-end int4 generation: emulation == interpret kernel tokens."""
    params, _, _ = setup
    fp4, dims4 = prepare_fused(params, CFG, max_len=MAX_LEN, wbits=4)
    s = ArSampling(temperature=0.7, top_k=50, top_p=0.2, n_phones_gen=100,
                   eos_idx=0, valid_start=10, valid_end=510, max_len=MAX_LEN)
    prompt = np.arange(12, 22)
    spk = np.random.default_rng(0).integers(0, 1024, (20, 8))
    u = np.random.default_rng(1).random((MAX_LEN, 1))
    t_emu, n_emu = ar_generate_fused(params, fp4, CFG, dims4, prompt, spk,
                                     sampling=s, uniforms=u, interpret=None)
    t_int, n_int = ar_generate_fused(params, fp4, CFG, dims4, prompt, spk,
                                     sampling=s, uniforms=u, interpret=True)
    assert n_emu == n_int
    np.testing.assert_array_equal(t_emu, t_int)
    gen = t_emu[len(prompt):]
    assert ((gen >= 10) & (gen < 510)).all()


def test_structure_matches_xla_engine(setup):
    """Unquantized emulation == XLA decode step with dequantized weights."""
    params32 = init_codeclm(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    fp, dims = prepare_fused(params32, CFG, max_len=MAX_LEN)
    W = dims.window

    deq = dict(params32)
    layers = dict(params32["ar"]["layers"])
    for kk in ("wq", "wk", "wv", "wo", "w1", "w2", "w3"):
        q, s = quantize_weight(layers[kk], axis=-1)
        layers[kk] = q.astype(jnp.float32) * s[..., None]
    deq["ar"] = dict(params32["ar"])
    deq["ar"]["layers"] = layers

    rng = np.random.default_rng(0)
    flat = (rng.standard_normal((dims.n_layers, dims.w_pad, dims.dim)) * 0.1
            ).astype(np.float32)
    flat[:, W:] = 0
    flat_v = (rng.standard_normal((dims.n_layers, dims.w_pad, dims.dim)) * 0.1
              ).astype(np.float32)
    flat_v[:, W:] = 0
    ck5 = jnp.asarray(flat[:, None, :W].reshape(
        dims.n_layers, 1, W, CFG.n_heads, CFG.head_dim))
    cv5 = jnp.asarray(flat_v[:, None, :W].reshape(
        dims.n_layers, 1, W, CFG.n_heads, CFG.head_dim))

    tok = jnp.asarray([37], jnp.int32)
    pos = jnp.asarray([30], jnp.int32)  # beyond window: ring semantics
    logits_xla, nk, nv = _decode_backbone_step(deq, CFG, tok, pos, ck5, cv5)

    x = jnp.concatenate([params32["embed"][tok],
                         jnp.zeros((7, dims.dim))], 0)
    h, k_new, v_new = fused_step_emulation(
        fp, x, pos[0], jnp.asarray(flat, jnp.bfloat16),
        jnp.asarray(flat_v, jnp.bfloat16), dims=dims, norm_eps=CFG.norm_eps,
        quantized=False)
    h1 = rms_norm(h[0:1], params32["ar"]["norm"], CFG.norm_eps)
    logits_f = linear(h1, params32["ar"]["output"])

    np.testing.assert_allclose(np.asarray(logits_xla), np.asarray(logits_f),
                               atol=2e-3)
    slot = 30 % W
    np.testing.assert_allclose(
        np.asarray(nk[:, 0, slot].reshape(dims.n_layers, 1, -1)),
        np.asarray(k_new, np.float32), atol=8e-3)  # bf16 rounding of k_new
    np.testing.assert_allclose(
        np.asarray(nv[:, 0, slot].reshape(dims.n_layers, 1, -1)),
        np.asarray(v_new, np.float32), atol=8e-3)


# ---------------------------------------------------------------------------
# batched fused decode (dims.batch > 1)

def _rand_cache_batched(dims, seed):
    """Random batched int8 ring caches: (L, B, Wp, d) + (L, B, Wp) scales."""
    from mars5_tts_tpu.ops.pallas.decode_layer import quantize_kv_rows
    rng = np.random.default_rng(seed)
    c = (rng.standard_normal(
        (dims.n_layers, dims.batch, dims.w_pad, dims.dim)) * 0.1)
    c[:, :, dims.window:] = 0
    return quantize_kv_rows(jnp.asarray(c, jnp.float32))


def test_kernel_matches_emulation_batched(setup):
    """batch=3 kernel (interpret) == per-row bs=1 emulations, bit-level.

    Distinct per-row positions exercise per-row ring-slot masks + RoPE."""
    from mars5_tts_tpu.ops.pallas.decode_layer import (
        fused_step_emulation_batched)
    params, _, _ = setup
    fp, dims = prepare_fused(params, CFG, max_len=MAX_LEN, batch=3)
    assert dims.batch == 3
    x = jax.random.normal(jax.random.PRNGKey(1), (8, dims.dim), jnp.bfloat16)
    x = x.at[dims.batch:].set(0)
    (ck, ks), (cv, vs) = _rand_cache_batched(dims, 2), _rand_cache_batched(dims, 3)
    kvs = jnp.concatenate([ks, vs], axis=1)            # (L, 2B, Wp)
    pos = jnp.asarray([5, 30, 17], jnp.int32)          # below/beyond/below ring
    h_e, k_e, v_e = fused_step_emulation_batched(
        fp, x, pos, ck, cv, kvs, dims=dims, norm_eps=CFG.norm_eps)
    h_k, k_k, v_k = fused_decode_layers(fp, x, pos, ck, cv, kvs, dims=dims,
                                        norm_eps=CFG.norm_eps, interpret=True)
    np.testing.assert_allclose(np.asarray(h_k), np.asarray(h_e), rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(k_k), np.asarray(k_e), rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(v_k), np.asarray(v_e), rtol=0, atol=1e-6)


@pytest.mark.slow
def test_batched_generation_rows_match_single(setup):
    """Each batched row == its standalone 1-row batched run (same uniforms
    column), and interpret kernel == emulation end-to-end."""
    from mars5_tts_tpu.models.ar_decode_fused import ar_generate_fused_batched
    params, _, _ = setup
    s = ArSampling(temperature=0.7, top_k=50, top_p=0.2, n_phones_gen=100,
                   eos_idx=0, valid_start=10, valid_end=510, max_len=MAX_LEN)
    rng = np.random.default_rng(0)
    prompts = [rng.integers(10, 510, n) for n in (10, 6, 13)]
    spks = [rng.integers(0, 1024, (sz, 8)) for sz in (20, 9, 14)]
    u = rng.random((MAX_LEN, 3)).astype(np.float32)

    fp3, dims3 = prepare_fused(params, CFG, max_len=MAX_LEN, batch=3)
    out_emu = ar_generate_fused_batched(params, fp3, CFG, dims3, prompts, spks,
                                        sampling=s, uniforms=u, interpret=None)
    out_int = ar_generate_fused_batched(params, fp3, CFG, dims3, prompts, spks,
                                        sampling=s, uniforms=u, interpret=True)
    for i in range(3):
        assert out_emu[i][1] == out_int[i][1], f"row {i} n_gen diverged"
        np.testing.assert_array_equal(out_emu[i][0], out_int[i][0])

    fp1, dims1 = prepare_fused(params, CFG, max_len=MAX_LEN, batch=1)
    for i in range(3):
        single = ar_generate_fused_batched(
            params, fp1, CFG, dims1, [prompts[i]], [spks[i]], sampling=s,
            uniforms=u[:, i:i + 1], interpret=None)[0]
        assert out_emu[i][1] == single[1], f"row {i}: n_gen mismatch vs single"
        np.testing.assert_array_equal(out_emu[i][0], single[0])
        gen = out_emu[i][0][len(prompts[i]):]
        assert ((gen >= 10) & (gen < 510)).all()


@pytest.mark.slow
def test_fused_continuous_batcher_matches_oneshot(setup):
    """FusedContinuousBatcher (chunked pool, admissions mid-flight) produces
    the same tokens as one-shot ar_generate_fused_batched per request."""
    from mars5_tts_tpu.models.ar_decode_fused import ar_generate_fused_batched
    from mars5_tts_tpu.serving.continuous import (FusedContinuousBatcher,
                                                  Request)
    params, _, _ = setup
    s = ArSampling(temperature=0.7, top_k=50, top_p=0.2, n_phones_gen=100,
                   eos_idx=0, valid_start=10, valid_end=510, max_len=MAX_LEN)
    rng = np.random.default_rng(2)
    n_req = 3
    prompts = [rng.integers(10, 510, int(n)) for n in rng.integers(5, 14, n_req)]
    spks = [rng.integers(0, 1024, (int(m), 8)) for m in rng.integers(4, 9, n_req)]
    uniforms = [rng.random(MAX_LEN).astype(np.float32) for _ in range(n_req)]

    batcher = FusedContinuousBatcher(params, CFG, s, batch_size=2, wbits=8,
                                     chunk_steps=9, prompt_buckets=(16,),
                                     spk_bucket=16, interpret=None)
    reqs = [batcher.submit(Request(prompt=p, spk_codes=k, uniforms=u))
            for p, k, u in zip(prompts, spks, uniforms)]
    completed = batcher.run()
    assert len(completed) == n_req
    assert batcher.chunks_run > 1   # several quanta: admissions mid-flight

    fp1, dims1 = prepare_fused(params, CFG, max_len=MAX_LEN, wbits=8, batch=1)
    for req, p, k, u in zip(reqs, prompts, spks, uniforms):
        (ref_seq, ref_n), = ar_generate_fused_batched(
            params, fp1, CFG, dims1, [p], [k], sampling=s,
            uniforms=u[:, None], interpret=None)
        assert req.n_gen == ref_n, f"n_gen {req.n_gen} != {ref_n}"
        np.testing.assert_array_equal(req.tokens, ref_seq)


@pytest.mark.slow
def test_fused_pool_per_request_sampling(setup):
    """Per-request sampling overrides in the fused pool == standalone fused
    runs whose static ArSampling carries the same values."""
    import dataclasses
    from mars5_tts_tpu.models.ar_decode_fused import ar_generate_fused_batched
    from mars5_tts_tpu.serving.continuous import (FusedContinuousBatcher,
                                                  Request)
    params, _, _ = setup
    s = ArSampling(temperature=0.7, top_k=50, top_p=0.2, n_phones_gen=100,
                   eos_idx=0, valid_start=10, valid_end=510, max_len=MAX_LEN)
    overrides = [{"temperature": 1.2, "top_k": 20}, {"top_p": 0.6}]
    rng = np.random.default_rng(5)
    prompts = [rng.integers(10, 510, n) for n in (8, 11)]
    spks = [rng.integers(0, 1024, (6, 8))] * 2
    uniforms = [rng.random(MAX_LEN).astype(np.float32) for _ in range(2)]

    batcher = FusedContinuousBatcher(params, CFG, s, batch_size=2, wbits=8,
                                     chunk_steps=11, prompt_buckets=(16,),
                                     spk_bucket=16, interpret=None)
    reqs = [batcher.submit(Request(prompt=p, spk_codes=k, uniforms=u,
                                   sampling=o))
            for p, k, u, o in zip(prompts, spks, uniforms, overrides)]
    batcher.run()

    fp1, dims1 = prepare_fused(params, CFG, max_len=MAX_LEN, wbits=8, batch=1)
    for req, p, k, u, o in zip(reqs, prompts, spks, uniforms, overrides):
        s_i = dataclasses.replace(s, **o)
        (ref_seq, ref_n), = ar_generate_fused_batched(
            params, fp1, CFG, dims1, [p], [k], sampling=s_i,
            uniforms=u[:, None], interpret=None)
        assert req.n_gen == ref_n
        np.testing.assert_array_equal(req.tokens, ref_seq)


def test_fused_generation_token_identical(setup):
    params, fp, dims = setup
    s = ArSampling(temperature=0.7, top_k=50, top_p=0.2, n_phones_gen=100,
                   eos_idx=0, valid_start=10, valid_end=510, max_len=MAX_LEN)
    prompt = np.arange(12, 22)
    spk = np.random.default_rng(0).integers(0, 1024, (20, 8))
    u = np.random.default_rng(1).random((MAX_LEN, 1))
    t_emu, n_emu = ar_generate_fused(params, fp, CFG, dims, prompt, spk,
                                     sampling=s, uniforms=u, interpret=None)
    t_int, n_int = ar_generate_fused(params, fp, CFG, dims, prompt, spk,
                                     sampling=s, uniforms=u, interpret=True)
    assert n_emu == n_int
    np.testing.assert_array_equal(t_emu, t_int)
    assert n_emu > 0
    gen = t_emu[len(prompt):]
    assert ((gen >= 10) & (gen < 510)).all()
