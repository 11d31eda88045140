"""Multi-chip sharding: the dp x tp training dry-run on 8 virtual CPU devices."""

import numpy as np
import pytest

import jax


def test_mesh_and_specs():
    from mars5_tts_tpu.models.ar import CodecLMConfig, init_codeclm
    from mars5_tts_tpu.parallel import codeclm_specs, make_mesh

    mesh = make_mesh(dp=2, tp=4)
    assert mesh.shape == {"dp": 2, "tp": 4}

    cfg = CodecLMConfig(n_vocab=64, dim=64, n_heads=4, n_kv_heads=4, head_dim=16,
                        n_layers=2, hidden_dim=96, sliding_window=32,
                        n_spk_layers=2, spk_hidden_dim=192)
    params = init_codeclm(jax.random.PRNGKey(0), cfg)
    specs = codeclm_specs(params, tp_size=4)
    # head axis sharded (4 heads * 16 = 64 divisible by 4)
    assert specs["ar"]["layers"]["wq"] == jax.sharding.PartitionSpec(None, "tp", None)
    # vocab 64 divisible by 4 -> output sharded
    assert specs["ar"]["output"][0] == "tp"
    # indivisible dims fall back to replication
    specs_tp7 = codeclm_specs(params, tp_size=7)
    assert specs_tp7["ar"]["layers"]["wq"] == jax.sharding.PartitionSpec(None, None, None)


@pytest.mark.slow
def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


@pytest.mark.slow
def test_sharded_vs_single_device_loss_match():
    """The dp x tp sharded AR loss equals the single-device loss."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mars5_tts_tpu.models.ar import CodecLMConfig, init_codeclm
    from mars5_tts_tpu.parallel import codeclm_specs, make_mesh, shard_tree
    from mars5_tts_tpu.train import ar_loss_fn

    cfg = CodecLMConfig(n_vocab=64, dim=64, n_heads=4, n_kv_heads=4, head_dim=16,
                        n_layers=2, hidden_dim=96, sliding_window=32,
                        n_spk_layers=2, spk_hidden_dim=192)
    params = init_codeclm(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, 64, (4, 12), dtype=np.int32))
    mask = jnp.ones((4, 11), jnp.float32)
    spk = jnp.asarray(rng.integers(0, 1024, (4, 5, 8), dtype=np.int32))

    single = float(ar_loss_fn(params, cfg, tokens, mask, spk))

    mesh = make_mesh(dp=2, tp=4)
    specs = codeclm_specs(params, tp_size=4)
    params_sh = shard_tree(mesh, params, specs)
    dp_sh = NamedSharding(mesh, P("dp"))
    args = [jax.device_put(x, dp_sh) for x in (tokens, mask, spk)]
    with mesh:
        sharded = float(jax.jit(ar_loss_fn, static_argnums=1)(params_sh, cfg, *args))

    np.testing.assert_allclose(sharded, single, rtol=2e-5)


# ---------------------------------------------------------------- inference

def _ar_setup():
    from mars5_tts_tpu.models.ar import CodecLMConfig, init_codeclm
    from mars5_tts_tpu.models.ar_decode import ArSampling

    cfg = CodecLMConfig.tiny(n_vocab=50)
    params = init_codeclm(jax.random.PRNGKey(0), cfg)
    s = ArSampling(temperature=0.7, top_k=10, top_p=0.9, typical_p=1.0,
                   alpha_frequency=1.0, alpha_presence=0.4, penalty_window=5,
                   eos_penalty_decay=0.5, eos_penalty_factor=1.0,
                   n_phones_gen=8, eos_idx=49, valid_start=20, valid_end=51,
                   max_len=40)
    rng = np.random.default_rng(0)
    n_req = 6  # not a multiple of dp=8: exercises pad rows
    prompts = [rng.integers(0, 20, int(n)) for n in rng.integers(4, 12, n_req)]
    spks = [rng.integers(0, 1024, (4, 8)) for _ in range(n_req)]
    uniforms = [rng.random(s.max_len).astype(np.float32) for _ in range(n_req)]
    return cfg, params, s, prompts, spks, uniforms


@pytest.mark.slow
def test_sharded_ar_decode_bit_identical():
    """DP-sharded batched decode (8 chips) == single-device engine, bitwise.

    Fills SURVEY §5.8's serving half (VERDICT r1 missing #2): replica-per-chip
    decode with the batch axis of DecodeState sharded over the mesh and
    per-request uniform streams.
    """
    from mars5_tts_tpu.models.ar_decode import ar_generate
    from mars5_tts_tpu.serving.multichip import ShardedARDecoder

    cfg, params, s, prompts, spks, uniforms = _ar_setup()
    dec = ShardedARDecoder(params, cfg, s)  # dp=8, tp=1 on the virtual mesh
    assert dec.dp == 8
    outs = dec.generate(prompts, spks, uniforms=uniforms)
    for (toks, n_gen), p, k, u in zip(outs, prompts, spks, uniforms):
        ref_seq, ref_n = ar_generate(params, cfg, p, k, sampling=s, uniforms=u)
        assert n_gen == ref_n
        assert toks.tolist() == ref_seq.tolist()


def test_sharded_ar_decode_with_tp():
    """dp=2 x tp=4 decode: weights megatron-sharded; tokens still match the
    single-device run (fp32 'highest' keeps partitioned matmuls aligned)."""
    from mars5_tts_tpu.models.ar import CodecLMConfig, init_codeclm
    from mars5_tts_tpu.models.ar_decode import ArSampling, ar_generate
    from mars5_tts_tpu.parallel import make_mesh
    from mars5_tts_tpu.serving.multichip import ShardedARDecoder

    cfg = CodecLMConfig(n_vocab=64, dim=64, n_heads=4, n_kv_heads=4, head_dim=16,
                        n_layers=2, hidden_dim=96, sliding_window=40,
                        n_spk_layers=2, spk_hidden_dim=192)
    params = init_codeclm(jax.random.PRNGKey(1), cfg)
    s = ArSampling(temperature=0.7, top_k=10, top_p=0.9, n_phones_gen=8,
                   eos_idx=60, valid_start=20, valid_end=65, max_len=32)
    rng = np.random.default_rng(1)
    prompts = [rng.integers(0, 20, 6), rng.integers(0, 20, 9)]
    spks = [rng.integers(0, 1024, (4, 8)) for _ in range(2)]
    uniforms = [rng.random(s.max_len).astype(np.float32) for _ in range(2)]

    dec = ShardedARDecoder(params, cfg, s, mesh=make_mesh(dp=2, tp=4))
    outs = dec.generate(prompts, spks, uniforms=uniforms)
    for (toks, n_gen), p, k, u in zip(outs, prompts, spks, uniforms):
        ref_seq, ref_n = ar_generate(params, cfg, p, k, sampling=s, uniforms=u)
        assert n_gen == ref_n
        assert toks.tolist() == ref_seq.tolist()


@pytest.mark.slow
def test_sharded_nar_diffusion_matches_single_device():
    from mars5_tts_tpu.config import DSH
    from mars5_tts_tpu.diffusion import (MultinomialDiffusion,
                                         perform_simple_inference)
    from mars5_tts_tpu.models.nar import ResidualTransformerConfig, init_nar
    from mars5_tts_tpu.serving.multichip import ShardedNARDiffusion

    cfg = ResidualTransformerConfig.tiny(n_text_vocab=32)
    params = init_nar(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    bs, Lt, Lc, Lx, T = 8, 5, 7, 11, 6
    batch = (rng.integers(0, 32, (bs, Lt)), rng.integers(0, 1024, (bs, Lc, 8)),
             np.full((bs,), Lt), np.full((bs,), Lc),
             rng.integers(0, 1024, (bs, Lx, 8)), np.zeros((bs, Lx), bool))
    diff = MultinomialDiffusion(cfg.n_quant, timesteps=T)
    dsh = DSH(last_greedy=True, x_0_temp=0.7, guidance_w=3.0, jump_len=1,
              jump_n_sample=1, q0_override_steps=1)
    key = jax.random.key(0, impl="rbg")

    ref = np.asarray(perform_simple_inference(
        params, cfg, tuple(jax.numpy.asarray(b) for b in batch), diff, T, dsh,
        key=key))
    svc = ShardedNARDiffusion(params, cfg)
    out = np.asarray(svc.infer(batch, diff, T, dsh, key=key))
    np.testing.assert_array_equal(out, ref)


@pytest.mark.slow
def test_nar_tp_attention_sharded_logits_match():
    """VERDICT #6: attention shards head-aligned under tp; logits match replicated.

    in_proj kernels are stored (3, D, D) (ops/attention.torch_mha) so the
    per-third output D axis shards with a plain spec; tp=4 over 4 heads is
    head-aligned. Row-parallel out_proj changes the accumulation split, so the
    check is allclose (f32), not bitwise.
    """
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from mars5_tts_tpu.models.nar import (ResidualTransformerConfig, init_nar,
                                          nar_forward)
    from mars5_tts_tpu.parallel import make_mesh, nar_specs
    from mars5_tts_tpu.parallel.mesh import shard_tree

    cfg = ResidualTransformerConfig.tiny(n_text_vocab=32)
    params = init_nar(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    specs = nar_specs(params, tp_size=4)
    dec = specs["decoder"]["layers"]
    assert dec["sa_in_w"] == P(None, None, "tp", None)
    assert dec["sa_out_w"] == P(None, None, "tp")
    assert dec["ca_in_w"] == P(None, None, "tp", None)

    rng = np.random.default_rng(1)
    bs, Lt, Lc, Lx = 2, 5, 7, 11
    args = (jnp.asarray(rng.integers(0, 32, (bs, Lt))),
            jnp.asarray(rng.integers(0, 1024, (bs, Lc, 8))),
            jnp.full((bs,), Lt, jnp.int32), jnp.full((bs,), Lc, jnp.int32),
            jnp.asarray(rng.integers(0, 1024, (bs, Lx, 8))),
            jnp.zeros((bs, Lx), bool), jnp.full((bs,), 3, jnp.int32))

    fwd = jax.jit(lambda p: nar_forward(p, cfg, *args))
    ref = np.asarray(fwd(params))

    mesh = make_mesh(dp=2, tp=4)
    sharded = shard_tree(mesh, params, specs)
    with mesh:
        out = np.asarray(fwd(sharded))
    np.testing.assert_allclose(out, ref, atol=3e-5, rtol=1e-5)
