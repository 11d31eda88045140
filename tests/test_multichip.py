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


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


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
