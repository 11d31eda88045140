"""Training losses, gradients, and checkpoint/resume."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def tiny_train_setup():
    from mars5_tts_tpu.diffusion import MultinomialDiffusion
    from mars5_tts_tpu.models.ar import CodecLMConfig, init_codeclm
    from mars5_tts_tpu.models.nar import ResidualTransformerConfig, init_nar
    from mars5_tts_tpu.train import init_train_state, make_optimizer

    ar_cfg = CodecLMConfig.tiny(n_vocab=64)
    nar_cfg = ResidualTransformerConfig.tiny(n_text_vocab=16)
    diff = MultinomialDiffusion(nar_cfg.n_quant, timesteps=8)
    opt = make_optimizer(1e-3)
    state = init_train_state(init_codeclm(jax.random.PRNGKey(0), ar_cfg),
                             init_nar(jax.random.PRNGKey(1), nar_cfg), opt)
    return ar_cfg, nar_cfg, diff, opt, state


def _batches(ar_cfg, nar_cfg, bs=2):
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, ar_cfg.n_vocab, (bs, 12), dtype=np.int32))
    mask = jnp.ones((bs, 11), jnp.float32)
    spk = jnp.asarray(rng.integers(0, 1024, (bs, 4, 8), dtype=np.int32))
    c_text = jnp.asarray(rng.integers(0, nar_cfg.n_text_vocab, (bs, 5), dtype=np.int32))
    c_codes = jnp.asarray(rng.integers(0, 1024, (bs, 4, 8), dtype=np.int32))
    x0 = jnp.asarray(rng.integers(0, 1024, (bs, 6, 8), dtype=np.int32))
    xpm = jnp.zeros((bs, 6), bool)
    return ((tokens, mask, spk),
            (c_text, c_codes, jnp.full((bs,), 5), jnp.full((bs,), 4), x0, xpm))


@pytest.mark.heavy
def test_ar_loss_matches_manual_ce(tiny_train_setup):
    from mars5_tts_tpu.models.ar import codeclm_forward
    from mars5_tts_tpu.train import ar_loss_fn

    ar_cfg, nar_cfg, diff, opt, state = tiny_train_setup
    (tokens, mask, spk), _ = _batches(ar_cfg, nar_cfg)
    loss = float(ar_loss_fn(state.ar_params, ar_cfg, tokens, mask, spk))
    logits = np.asarray(codeclm_forward(state.ar_params, ar_cfg, tokens[:, :-1],
                                        spk_codes=spk), np.float64)
    logp = logits - np.log(np.exp(logits - logits.max(-1, keepdims=True)).sum(-1, keepdims=True)) - logits.max(-1, keepdims=True)
    tgt = np.asarray(tokens)[:, 1:]
    nll = -np.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    np.testing.assert_allclose(loss, nll.mean(), rtol=1e-4)


@pytest.mark.slow
def test_combined_step_reduces_losses(tiny_train_setup):
    from mars5_tts_tpu.train import make_train_step

    ar_cfg, nar_cfg, diff, opt, state = tiny_train_setup
    ar_b, nar_b = _batches(ar_cfg, nar_cfg)
    step = jax.jit(make_train_step(ar_cfg, nar_cfg, diff, opt))
    metrics0 = None
    for i in range(8):
        state, metrics = step(state, ar_b, nar_b, jax.random.PRNGKey(i))
        metrics0 = metrics0 or {k: float(v) for k, v in metrics.items()}
    assert float(metrics["ar_loss"]) < metrics0["ar_loss"]
    assert int(state.step) == 8
    # grads flowed into both models
    assert np.isfinite(float(metrics["nar_loss"]))


def test_checkpoint_roundtrip(tiny_train_setup, tmp_path):
    from mars5_tts_tpu.models.ar import init_codeclm
    from mars5_tts_tpu.models.nar import init_nar
    from mars5_tts_tpu.train import (init_train_state, restore_train_checkpoint,
                                     save_train_checkpoint)

    ar_cfg, nar_cfg, diff, opt, state = tiny_train_setup
    path = tmp_path / "ckpt"
    save_train_checkpoint(path, state)
    fresh = init_train_state(init_codeclm(jax.random.PRNGKey(7), ar_cfg),
                             init_nar(jax.random.PRNGKey(8), nar_cfg), opt)
    restored = restore_train_checkpoint(path, fresh)
    for a, b in zip(jax.tree.leaves(state.ar_params), jax.tree.leaves(restored.ar_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_production_optimizer_with_remat(tiny_train_setup, monkeypatch):
    """Clip + warmup-cosine schedule + grad accumulation + per-layer remat:
    the step runs, losses stay finite, and MultiSteps applies updates only
    every accum_steps calls (params unchanged on the intermediate step)."""
    from mars5_tts_tpu.models.ar import init_codeclm
    from mars5_tts_tpu.models.nar import init_nar
    from mars5_tts_tpu.train import (init_train_state, make_optimizer,
                                     make_train_step)

    ar_cfg, nar_cfg, diff, _, _ = tiny_train_setup
    monkeypatch.setenv("MARS5_TRAIN_REMAT", "1")
    opt = make_optimizer(1e-3, warmup_steps=2, total_steps=10, clip_norm=1.0,
                         accum_steps=2)
    state = init_train_state(init_codeclm(jax.random.PRNGKey(0), ar_cfg),
                             init_nar(jax.random.PRNGKey(1), nar_cfg), opt)
    step = jax.jit(make_train_step(ar_cfg, nar_cfg, diff, opt))
    ar_b, nar_b = _batches(ar_cfg, nar_cfg)
    p0 = np.asarray(jax.tree.leaves(state.ar_params)[0])
    state1, m1 = step(state, ar_b, nar_b, jax.random.PRNGKey(2))
    # accumulation step 1 of 2: no parameter movement yet
    np.testing.assert_array_equal(np.asarray(jax.tree.leaves(state1.ar_params)[0]), p0)
    # 3 more calls: 2 applied updates; the first lands at warmup lr=0, the
    # second at a real lr -> parameters must move
    m2 = m1
    for k in (3, 4, 5):
        state1, m2 = step(state1, ar_b, nar_b, jax.random.PRNGKey(k))
    assert not np.array_equal(np.asarray(jax.tree.leaves(state1.ar_params)[0]), p0)
    for m in (m1, m2):
        assert np.isfinite(float(m["ar_loss"])) and np.isfinite(float(m["nar_loss"]))
