"""Diffusion parity: schedule math, transitions, and the full RePaint trajectory."""

import numpy as np
import pytest

from tests.conftest import add_reference_to_path, reference_available

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")


@pytest.fixture(scope="module")
def ref_diffuser():
    add_reference_to_path()
    import mars5.diffuser as d
    return d


def test_schedule_tables_parity(ref_diffuser):
    from mars5_tts_tpu.diffusion import MultinomialDiffusion

    ref = ref_diffuser.MultinomialDiffusion(1025, timesteps=200)
    ours = MultinomialDiffusion(1025, timesteps=200)
    for name in ["log_alpha", "log_1_min_alpha", "log_cumprod_alpha",
                 "log_1_min_cumprod_alpha"]:
        np.testing.assert_allclose(np.asarray(getattr(ours, name)),
                                   getattr(ref, name).numpy(), atol=1e-6, err_msg=name)


@pytest.mark.parametrize("jl,jns", [(1, 1), (10, 10), (3, 2)])
def test_get_schedule_parity(ref_diffuser, jl, jns):
    from mars5_tts_tpu.diffusion import get_schedule

    assert get_schedule(200, jl, jns) == ref_diffuser.get_schedule(200, jl, jns)


def test_transitions_parity(ref_diffuser):
    import torch
    import jax.numpy as jnp
    from mars5_tts_tpu.diffusion import MultinomialDiffusion, index_to_log_onehot

    K, T = 17, 20
    ref = ref_diffuser.MultinomialDiffusion(K, timesteps=T)
    ours = MultinomialDiffusion(K, timesteps=T)

    rng = np.random.default_rng(0)
    x = rng.integers(0, K, size=(2, 5, 3))
    x0 = rng.integers(0, K, size=(2, 5, 3))
    t = np.array([7, 0])

    log_xt_ref = ref_diffuser.index_to_log_onehot(torch.tensor(x), K)
    log_x0_ref = ref_diffuser.index_to_log_onehot(torch.tensor(x0), K)
    log_xt = index_to_log_onehot(jnp.asarray(x), K)
    log_x0 = index_to_log_onehot(jnp.asarray(x0), K)
    np.testing.assert_allclose(np.asarray(log_xt), log_xt_ref.numpy(), atol=1e-6)

    for name, rf, jf in [
        ("q_pred_one_timestep",
         lambda: ref.q_pred_one_timestep(log_xt_ref, torch.tensor(t)),
         lambda: ours.q_pred_one_timestep(log_xt, jnp.asarray(t))),
        ("q_pred",
         lambda: ref.q_pred(log_x0_ref, torch.tensor(t)),
         lambda: ours.q_pred(log_x0, jnp.asarray(t))),
        ("q_posterior",
         lambda: ref.q_posterior(log_x0_ref, log_xt_ref, torch.tensor(t)),
         lambda: ours.q_posterior(log_x0, log_xt, jnp.asarray(t))),
    ]:
        np.testing.assert_allclose(np.asarray(jf()), rf().numpy(), atol=1e-5,
                                   err_msg=name)

    # training losses
    log_pred_ref = torch.log_softmax(torch.tensor(
        rng.standard_normal((2, 5, 3, K)).astype(np.float32)), dim=-1)
    lt_ref = ref.compute_Lt(log_x0_ref.float(), log_xt_ref.float(), log_pred_ref,
                            torch.tensor(t))
    lt_ours = ours.compute_Lt(log_x0, log_xt, jnp.asarray(log_pred_ref.numpy()),
                              jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(lt_ours), lt_ref.numpy(), atol=1e-4)


class _RandPatches:
    """Inject deterministic streams into torch.rand_like / torch.randint."""

    def __init__(self, torch, uniform_queue, randint_value=None):
        self.torch = torch
        self.queue = list(uniform_queue)
        self.randint_value = randint_value
        self._orig_rand_like = torch.rand_like
        self._orig_randint = torch.randint

    def __enter__(self):
        t = self.torch

        def fake_rand_like(x, **kw):
            u = self.queue.pop(0)
            assert tuple(u.shape) == tuple(x.shape), (u.shape, x.shape)
            return t.tensor(u)

        def fake_randint(low, high, size, **kw):
            assert self.randint_value is not None
            assert tuple(size) == tuple(self.randint_value.shape)
            return t.tensor(self.randint_value)

        t.rand_like = fake_rand_like
        t.randint = fake_randint
        return self

    def __exit__(self, *a):
        self.torch.rand_like = self._orig_rand_like
        self.torch.randint = self._orig_randint


def _build_uniform_queue(t_lasts, is_reverse, shape, last_greedy, rng):
    """(n_steps, 2, *shape) array + the reference's sequential pop list."""
    n = len(t_lasts)
    uniforms = rng.random((n, 2) + shape).astype(np.float32)
    queue = []
    # NOTE: the reference driver never forwards last_greedy to reverse_diffusion,
    # so the unknown region is SAMPLED at t=0 (1 draw); the known region draws
    # only at t != 0.
    del last_greedy
    for i in range(n):
        if is_reverse[i]:
            queue.append(uniforms[i, 0])
            if t_lasts[i] != 0:
                queue.append(uniforms[i, 1])
        else:
            queue.append(uniforms[i, 0])
    return uniforms, queue


@pytest.mark.parametrize("deep_clone,guidance_w,jl,jns,kevin", [
    (False, 1.0, 1, 1, True),
    (False, 3.0, 1, 1, True),
    (True, 3.0, 1, 1, True),
    (False, 1.0, 3, 2, False),   # RePaint resampling, non-kevin forward steps
])
def test_perform_simple_inference_parity(ref_diffuser, deep_clone, guidance_w, jl, jns, kevin):
    import torch
    import jax.numpy as jnp
    import mars5.model as ref_model

    from mars5_tts_tpu.config import DSH
    from mars5_tts_tpu.diffusion import (MultinomialDiffusion, build_step_plan,
                                         perform_simple_inference)
    from mars5_tts_tpu.models.convert import convert_nar
    from mars5_tts_tpu.models.nar import ResidualTransformerConfig

    torch.manual_seed(11)
    cfg = ResidualTransformerConfig.tiny(n_text_vocab=32)
    K = cfg.n_quant
    T = 6
    ref_net = ref_model.ResidualTransformer(
        n_text_vocab=32, n_quant=K, dim=cfg.dim, nhead=cfg.nhead,
        enc_layers=cfg.enc_layers, dec_layers=cfg.dec_layers,
        n_spk_layers=cfg.n_spk_layers, t_emb_dim=cfg.t_emb_dim,
        p_cond_drop=0, dropout=0).eval()
    params = convert_nar(ref_net.state_dict(), cfg)

    rng = np.random.default_rng(5)
    lt, lc, lx = 7, 5, 6
    c_text = rng.integers(0, 32, size=(1, lt))
    c_codes = rng.integers(0, K - 1, size=(1, lc, 8))
    ctl = np.array([lt])
    ccl = np.array([lc])
    x = rng.integers(0, K - 1, size=(1, lx, 8))
    xpm = np.zeros((1, lx), bool)

    l_total = lx + (lc if deep_clone else 0)
    t_lasts, is_rev, _ = build_step_plan(T, jl, jns)
    last_greedy = True
    uniforms, queue = _build_uniform_queue(
        t_lasts, is_rev, (1, l_total, 8, K), last_greedy, rng)
    x_init = rng.integers(0, K, size=(1, lx, 8))

    dsh_ref = ref_diffuser.DSH(last_greedy=last_greedy, x_0_temp=0.7,
                               guidance_w=guidance_w, deep_clone=deep_clone,
                               jump_len=jl, jump_n_sample=jns, q0_override_steps=2,
                               enable_kevin_scaled_inference=kevin, progress=False)
    ref_diff = ref_diffuser.MultinomialDiffusion(K, timesteps=T)
    batch_t = (torch.tensor(c_text), torch.tensor(c_codes), torch.tensor(ctl),
               torch.tensor(ccl), torch.tensor(x), torch.tensor(xpm))
    with _RandPatches(torch, queue, randint_value=x_init):
        ref_out = ref_diffuser.perform_simple_inference(
            ref_net, batch_t, ref_diff, T, torch.float32, dsh=dsh_ref,
            retain_quant0=True)
    ref_out = ref_out.numpy()

    dsh = DSH(last_greedy=last_greedy, x_0_temp=0.7, guidance_w=guidance_w,
              deep_clone=deep_clone, jump_len=jl, jump_n_sample=jns,
              q0_override_steps=2, enable_kevin_scaled_inference=kevin)
    diff = MultinomialDiffusion(K, timesteps=T)
    ours = perform_simple_inference(
        params, cfg, (c_text, c_codes, ctl, ccl, x, xpm), diff, T, dsh,
        retain_quant0=True, uniforms=uniforms, x_init=x_init)

    np.testing.assert_array_equal(np.asarray(ours), ref_out,
                                  err_msg=f"deep={deep_clone} w={guidance_w} jl={jl}")


def test_two_uniform_samplers_match_dense_distribution():
    """The *_indexed_sample fast draws are distribution-exact vs dense Gumbel.

    Checks (a) the analytic keep-probability equals the softmax of the dense
    indexed transition grid, and (b) empirical marginals over many draws match
    between the fast two-uniform sampler and dense Gumbel-max.
    """
    import jax
    import jax.numpy as jnp
    from mars5_tts_tpu.diffusion import MultinomialDiffusion

    K, T = 17, 50
    diff = MultinomialDiffusion(K, timesteps=T)
    x_idx = jnp.asarray([[3, 11]], jnp.int32)          # (1, 2)
    for t_val in [1, 10, 25, 49]:
        t = jnp.asarray([t_val], jnp.int32)
        dense = np.asarray(jax.nn.softmax(diff.q_pred_indexed(x_idx, t), -1))
        hot_p = dense[0, 0, int(x_idx[0, 0])]
        # analytic p_hot from the two-value structure
        a = float(diff.log_cumprod_alpha[t_val])
        b = float(diff.log_1_min_cumprod_alpha[t_val]) - diff.log_num_classes
        import math
        hot = np.logaddexp(a, b)
        cold = np.logaddexp(math.log(1e-7) + a, b)
        p_hot = 1.0 / (1.0 + (K - 1) * math.exp(cold - hot))
        np.testing.assert_allclose(p_hot, hot_p, rtol=1e-5)
        # cold classes uniform
        others = np.delete(dense[0, 0], int(x_idx[0, 0]))
        np.testing.assert_allclose(others, (1 - hot_p) / (K - 1), rtol=2e-3)

    # empirical marginals: fast sampler vs dense Gumbel, N draws each
    N = 40_000
    t = jnp.asarray([25], jnp.int32)
    key = jax.random.PRNGKey(0)
    u2 = jax.random.uniform(key, (N, 1, 2, 2))
    xs = jnp.broadcast_to(x_idx, (N, 2))
    fast = np.asarray(jax.vmap(
        lambda u: diff.q_pred_indexed_sample(x_idx, t, u))(u2))[:, 0]
    ug = jax.random.uniform(jax.random.fold_in(key, 1), (N, 1, 2, K))
    from mars5_tts_tpu.ops.sampling import gumbel_argmax
    dense_draw = np.asarray(jax.vmap(
        lambda u: gumbel_argmax(diff.q_pred_indexed(x_idx, t), u))(ug))[:, 0]
    for col in range(2):
        f_hot = (fast[:, col] == int(x_idx[0, col])).mean()
        d_hot = (dense_draw[:, col] == int(x_idx[0, col])).mean()
        np.testing.assert_allclose(f_hot, d_hot, atol=0.01)
        # non-hot draws cover the other classes roughly uniformly
        f_others = np.bincount(fast[:, col], minlength=K).astype(float)
        f_others[int(x_idx[0, col])] = 0
        if f_others.sum() > 0:
            f_others /= f_others.sum()
            np.testing.assert_allclose(f_others[f_others > 0], 1 / (K - 1),
                                       rtol=0.35)


def test_scaled_two_uniform_sampler_matches_dense():
    """Kevin-scaled fast draw: analytic keep-prob == dense grid softmax."""
    import jax
    import jax.numpy as jnp
    from mars5_tts_tpu.diffusion import MultinomialDiffusion

    K, T, L = 13, 40, 30
    diff = MultinomialDiffusion(K, timesteps=T)
    rng = np.random.default_rng(0)
    x_idx = jnp.asarray(rng.integers(0, K, (1, L, 2)), jnp.int32)
    t = jnp.asarray([17], jnp.int32)
    c, jl = 2.5, 10
    dense = np.asarray(jax.nn.softmax(
        diff.q_pred_one_timestep_scaled_indexed(x_idx, t, c, jl), -1))
    # fast sampler with u[...,0]=0 always keeps; with u[...,0]=1 never keeps
    u_keep = jnp.zeros((1, L, 2, 2)).at[..., 1].set(0.5)
    kept = np.asarray(diff.q_pred_one_timestep_scaled_indexed_sample(
        x_idx, t, c, jl, u_keep))
    np.testing.assert_array_equal(kept, np.asarray(x_idx))
    # threshold equivalence: P(keep) from dense == p_hot used by the sampler
    # (probe with u0 just below/above the dense hot probability)
    hot_dense = np.take_along_axis(dense, np.asarray(x_idx)[..., None],
                                   -1)[..., 0]
    eps = 1e-4
    u_lo = jnp.zeros((1, L, 2, 2)).at[..., 0].set(
        jnp.asarray(hot_dense - eps)).at[..., 1].set(0.5)
    u_hi = jnp.zeros((1, L, 2, 2)).at[..., 0].set(
        jnp.asarray(hot_dense + eps)).at[..., 1].set(0.5)
    lo = np.asarray(diff.q_pred_one_timestep_scaled_indexed_sample(
        x_idx, t, c, jl, u_lo))
    hi = np.asarray(diff.q_pred_one_timestep_scaled_indexed_sample(
        x_idx, t, c, jl, u_hi))
    assert (lo == np.asarray(x_idx)).all()      # just below p_hot -> keep
    assert (hi != np.asarray(x_idx)).all()      # just above p_hot -> resample


# ------------------------------------------------------------ guidance interval

def _tiny_interval_run(T=6, deep_clone=True, seed=7, **dsh_kwargs):
    """One tiny-NAR engine run; kwargs override DSH fields."""
    import jax
    from mars5_tts_tpu.config import DSH
    from mars5_tts_tpu.diffusion import (MultinomialDiffusion,
                                         perform_simple_inference)
    from mars5_tts_tpu.models.nar import ResidualTransformerConfig, init_nar

    cfg = ResidualTransformerConfig.tiny()
    p = init_nar(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    kc = cfg.n_quant - 1
    batch = (rng.integers(0, 32, (1, 5)), rng.integers(0, kc, (1, 6, 8)),
             np.asarray([5]), np.asarray([6]),
             rng.integers(0, kc, (1, 8, 8)), np.zeros((1, 8), bool))
    diff = MultinomialDiffusion(cfg.n_quant, timesteps=T)
    kwargs = dict(deep_clone=deep_clone, jump_len=1, jump_n_sample=1,
                  x_0_temp=0.7, q0_override_steps=1, guidance_w=3.0,
                  enable_kevin_scaled_inference=True)
    kwargs.update(dsh_kwargs)
    dsh = DSH(**kwargs)
    return np.asarray(perform_simple_inference(
        p, cfg, batch, diff, T, dsh, key=jax.random.key(seed, impl="rbg")))


def test_guidance_interval_default_noop():
    """gi=(0,1) is the reference behavior: bit-identical to the unset field."""
    base = _tiny_interval_run()
    explicit = _tiny_interval_run(guidance_interval=(0.0, 1.0))
    np.testing.assert_array_equal(base, explicit)


def test_guidance_interval_empty_matches_unguided():
    """An empty interval runs every step cond-only == guidance_w=1 exactly
    (the cond rows of the CFG-batched precomputes are the w=1 computation)."""
    no_cfg = _tiny_interval_run(guidance_w=1.0)
    empty = _tiny_interval_run(guidance_w=3.0, guidance_interval=(1.0, 1.0))
    np.testing.assert_array_equal(no_cfg, empty)


def test_guidance_interval_partial():
    """A restrictive interval changes only the guided/unguided mix: it is
    deterministic, in-range, and distinct from both endpoints."""
    # w=50 separates the guided/unguided distributions enough that a branch
    # flip must change tokens — at w=3 on random (near-uniform) tiny-NAR
    # logits the two samples frequently coincide, making ≠ asserts flaky
    full = _tiny_interval_run(guidance_w=50.0)
    none = _tiny_interval_run(guidance_w=1.0)
    half = _tiny_interval_run(guidance_w=50.0, guidance_interval=(0.5, 1.0))
    half2 = _tiny_interval_run(guidance_w=50.0, guidance_interval=(0.5, 1.0))
    np.testing.assert_array_equal(half, half2)
    assert half.min() >= 0 and half.max() < 1025
    assert not np.array_equal(half, full)
    assert not np.array_equal(half, none)


def test_guidance_interval_ragged_smoke():
    """Mixed-voice (ragged deep-clone) batches accept the interval too."""
    import jax
    from mars5_tts_tpu.config import DSH
    from mars5_tts_tpu.diffusion import (MultinomialDiffusion,
                                         perform_simple_inference)
    from mars5_tts_tpu.models.nar import ResidualTransformerConfig, init_nar

    cfg = ResidualTransformerConfig.tiny()
    p = init_nar(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(2)
    kc = cfg.n_quant - 1
    batch = (rng.integers(0, 32, (2, 5)), rng.integers(0, kc, (2, 6, 8)),
             np.asarray([5, 4]), np.asarray([6, 4]),
             rng.integers(0, kc, (2, 8, 8)), np.zeros((2, 8), bool))
    diff = MultinomialDiffusion(cfg.n_quant, timesteps=6)
    dsh = DSH(deep_clone=True, jump_len=1, jump_n_sample=1, x_0_temp=0.7,
              guidance_w=3.0, guidance_interval=(0.5, 1.0),
              enable_kevin_scaled_inference=True)
    grid = np.asarray(perform_simple_inference(
        p, cfg, batch, diff, 6, dsh, key=jax.random.key(1, impl="rbg")))
    assert grid.shape == (2, 8, 8)
    assert grid.min() >= 0 and grid.max() < 1025


# ---------------------------------------------------------------------------
# geometry buckets (serving compile-count control)

def _bucket_run(gen_bucket=0, text_bucket=0, deep_clone=True, bs=1,
                ccl_rows=None, T=6):
    """Tiny engine run under an injected uniform stream, so bucketed and
    exact runs consume identical randomness on the real frames."""
    import jax
    from mars5_tts_tpu.config import DSH
    from mars5_tts_tpu.diffusion import (MultinomialDiffusion,
                                         perform_simple_inference)
    from mars5_tts_tpu.models.nar import ResidualTransformerConfig, init_nar

    cfg = ResidualTransformerConfig.tiny()
    p = init_nar(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(3)
    K = cfg.n_quant
    kc = K - 1
    lt, lc, lx = 7, 5, 6          # deliberately NOT multiples of the buckets
    ccl = np.asarray(ccl_rows if ccl_rows is not None else [lc] * bs)
    c_codes = rng.integers(0, kc, (bs, lc, 8))
    batch = (rng.integers(0, 32, (bs, lt)), c_codes,
             np.asarray([lt] * bs), ccl,
             rng.integers(0, kc, (bs, lx, 8)), np.zeros((bs, lx), bool))
    l_total = lx + (int(ccl.max()) if deep_clone else 0)
    uniforms = rng.random((T, 2, bs, l_total, 8, K)).astype(np.float32)
    x_init = rng.integers(0, K, (bs, lx, 8))
    diff = MultinomialDiffusion(K, timesteps=T)
    dsh = DSH(deep_clone=deep_clone, jump_len=1, jump_n_sample=1,
              x_0_temp=0.7, q0_override_steps=1, guidance_w=3.0,
              enable_kevin_scaled_inference=True, last_greedy=True)
    return np.asarray(perform_simple_inference(
        p, cfg, batch, diff, T, dsh, uniforms=uniforms, x_init=x_init,
        gen_bucket=gen_bucket, text_bucket=text_bucket))


@pytest.mark.parametrize("deep_clone", [True, False])
def test_geometry_bucket_identity(deep_clone):
    """Bucket padding (masked frames/tokens + crop) leaves the real-frame
    grid bit-identical under a shared injected uniform stream — the property
    that makes MARS5_NAR_GEN_BUCKET safe to turn on in serving."""
    exact = _bucket_run(deep_clone=deep_clone)
    bucketed = _bucket_run(gen_bucket=8, text_bucket=4, deep_clone=deep_clone)
    assert bucketed.shape == exact.shape
    np.testing.assert_array_equal(bucketed, exact)


def test_geometry_bucket_identity_ragged():
    """Mixed-voice (ragged deep-clone) rows keep per-row identity too: gen
    pads are appended inside each row's gen segment, positions never shift."""
    exact = _bucket_run(bs=2, ccl_rows=[5, 3])
    bucketed = _bucket_run(bs=2, ccl_rows=[5, 3], gen_bucket=8, text_bucket=4)
    assert bucketed.shape == exact.shape
    np.testing.assert_array_equal(bucketed, exact)


def test_geometry_bucket_noop_when_dividing():
    """A bucket that already divides the lengths changes nothing at all
    (same graph, same draws) — guards the crop slicing."""
    exact = _bucket_run()
    noop = _bucket_run(gen_bucket=3, text_bucket=7)  # 6 % 3 == 0, 7 % 7 == 0
    np.testing.assert_array_equal(noop, exact)
