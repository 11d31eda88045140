"""Multinomial (categorical) diffusion math in log space.

TPU-native re-implementation of the reference ``MultinomialDiffusion``
(mars5/diffuser.py:62-289; lineage: Hoogeboom et al. multinomial diffusion via
RF5/transfusion-asr). The schedule is precomputed in float64 on the host and
stored as fp32 device constants; every transition/posterior is a pure function of
``(log_x, t)`` usable inside ``lax.scan``.

Numerics pinned to the reference:
* cosine alpha-bar schedule with the final ``sqrt`` (diffuser.py:97-109),
* ``MIN_LOG_ARG = 1e-7`` one-hot clamp (diffuser.py:18,45),
* q_posterior's t=0 one-hot override and logsumexp normalization
  (diffuser.py:176-206).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.sampling import gumbel_argmax

MIN_LOG_ARG = 1e-7


def index_to_log_onehot(x, num_classes: int, dtype=jnp.float32):
    """Indices (bs, ...) -> clamped log one-hot (bs, ..., K)."""
    onehot = jax.nn.one_hot(x, num_classes, dtype=dtype)
    return jnp.log(jnp.clip(onehot, min=MIN_LOG_ARG))


def log_add_exp(a, b):
    maximum = jnp.maximum(a, b)
    return maximum + jnp.log(jnp.exp(a - maximum) + jnp.exp(b - maximum))


def _extract(a, t, ndim):
    """a[t] broadcast to ndim dims: (bs,) -> (bs, 1, 1, ...)."""
    out = a[t]
    return out.reshape(out.shape[0], *([1] * (ndim - 1)))


def sum_except_batch(x, num_dims: int = 1):
    return x.reshape(*x.shape[:num_dims], -1).sum(-1)


def cosine_alpha_schedule(timesteps: int, s: float = 0.008) -> np.ndarray:
    """sqrt of the clipped cosine alpha ratios (reference diffuser.py:97-109).

    The reference computes this in torch float32; numpy's fp32 ``cos`` differs by
    ~1 ulp, which amplifies to ~5e-5 in the log tables and can flip downstream
    Gumbel argmaxes. This is a one-time host precompute, so when torch (CPU, baked
    into the image) is importable we use it for bit-exact tables; otherwise the
    numpy path is within 2e-7 of the reference.
    """
    steps = timesteps + 1
    try:
        import torch
        x = torch.linspace(0, timesteps, steps)
        alphas_cumprod = torch.cos(((x / timesteps) + s) / (1 + s) * torch.pi * 0.5) ** 2
        alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
        alphas = torch.clamp(alphas_cumprod[1:] / alphas_cumprod[:-1], 0.001, 1.0)
        return torch.sqrt(alphas).numpy()
    except ImportError:  # pragma: no cover
        x = np.linspace(0, timesteps, steps, dtype=np.float32)
        alphas_cumprod = np.cos(((x / np.float32(timesteps)) + np.float32(s))
                                / np.float32(1 + s) * np.float32(np.pi) * np.float32(0.5)) ** 2
        alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
        alphas = np.clip(alphas_cumprod[1:] / alphas_cumprod[:-1], 0.001, 1.0)
        return np.sqrt(alphas).astype(np.float32)


class MultinomialDiffusion:
    """Schedule holder + categorical diffusion transitions (inference & training)."""

    def __init__(self, num_classes: int, timesteps: int = 100, diffusion_s: float = 0.008):
        self.num_classes = num_classes
        self.num_timesteps = timesteps

        alphas = cosine_alpha_schedule(timesteps, diffusion_s).astype(np.float64)
        log_alpha = np.log(alphas)
        log_cumprod_alpha = np.cumsum(log_alpha)
        log_1_min_alpha = np.log(np.clip(1 - np.exp(log_alpha), 1e-30, None))
        log_1_min_cumprod_alpha = np.log(np.clip(1 - np.exp(log_cumprod_alpha), 1e-30, None))

        assert np.abs(np.logaddexp(log_alpha, log_1_min_alpha)).sum() < 1e-5
        assert np.abs(np.logaddexp(log_cumprod_alpha, log_1_min_cumprod_alpha)).sum() < 1e-5

        self.log_alpha = jnp.asarray(log_alpha, jnp.float32)
        self.log_1_min_alpha = jnp.asarray(log_1_min_alpha, jnp.float32)
        self.log_cumprod_alpha = jnp.asarray(log_cumprod_alpha, jnp.float32)
        self.log_1_min_cumprod_alpha = jnp.asarray(log_1_min_cumprod_alpha, jnp.float32)
        self.log_num_classes = float(np.log(num_classes))

    # -- transitions ---------------------------------------------------------
    def q_pred_one_timestep(self, log_x_t, t):
        """log q(x_t | x_{t-1}) = log C(α_t x + (1-α_t)/K), via the symmetry trick."""
        log_alpha_t = _extract(self.log_alpha, t, log_x_t.ndim)
        log_1_min_alpha_t = _extract(self.log_1_min_alpha, t, log_x_t.ndim)
        return log_add_exp(log_x_t + log_alpha_t,
                           log_1_min_alpha_t - self.log_num_classes)

    def q_pred_one_timestep_scaled(self, log_x_t, t, c, jump_len: int):
        """Sequentially-progressive ("kevin-scaled") forward transition.

        Modulates α along the sequence axis (axis 1 of (bs, L, ..., K)) with the
        sigmoid front ``sig = 1/(1+exp(-(pos - L*c/jump_len + 20)/8))``
        (diffuser.py:136-159). The reference broadcasts the (1, L, 1) front against
        a (bs, 1, 1, 1) α, which only type-checks when L equals the codebook axis —
        a latent bug (its default schedule never runs this path); we broadcast on
        the sequence axis as intended.
        """
        seq_len = log_x_t.shape[1]
        log_alpha_t = _extract(self.log_alpha, t, log_x_t.ndim)
        log_1_min_alpha_t = _extract(self.log_1_min_alpha, t, log_x_t.ndim)
        xax = jnp.arange(seq_len, dtype=jnp.float32)
        aa = seq_len * (c / jump_len)
        sig = 1.0 / (1.0 + jnp.exp(-(xax - aa + 20.0) / 8.0))
        shape = (1, seq_len) + (1,) * (log_x_t.ndim - 2)
        log_alpha_t = jnp.clip(jnp.log(1.0 / sig).reshape(shape) + log_alpha_t, max=0.0)
        log_1_min_alpha_t = jnp.log(sig).reshape(shape) + log_1_min_alpha_t
        return log_add_exp(log_x_t + log_alpha_t,
                           log_1_min_alpha_t - self.log_num_classes)

    def q_pred(self, log_x_start, t):
        """log q(x_t | x_0) = log C(ᾱ_t x_0 + (1-ᾱ_t)/K)."""
        log_cum = _extract(self.log_cumprod_alpha, t, log_x_start.ndim)
        log_1_min_cum = _extract(self.log_1_min_cumprod_alpha, t, log_x_start.ndim)
        return log_add_exp(log_x_start + log_cum,
                           log_1_min_cum - self.log_num_classes)

    # -- indexed (one-hot input) fast paths ------------------------------------
    # When the input distribution is a clamped log one-hot (index_to_log_onehot),
    # every transition value is one of TWO scalars per timestep: the "hot" value
    # log_add_exp(a_t, b_t) and the "cold" value log_add_exp(c + a_t, b_t) with
    # c = log(MIN_LOG_ARG). Computing those scalars and selecting avoids ~6 full
    # passes over the (bs, L, 8, K) tensor per step. The scalar ops are the SAME
    # floating-point operations, so results are bit-identical to the dense path
    # (the e2e parity tests cover this).

    def _two_scalar_select(self, x_idx, a, b):
        """a/b: per-batch scalars broadcast-shaped (bs, 1, ..., 1)."""
        cold_log = jnp.log(jnp.float32(MIN_LOG_ARG))
        hot = log_add_exp(a, b)
        cold = log_add_exp(cold_log + a, b)
        onehot = jax.nn.one_hot(x_idx, self.num_classes, dtype=jnp.bool_)
        return jnp.where(onehot, hot, cold)

    def q_pred_one_timestep_indexed(self, x_idx, t):
        """q_pred_one_timestep(index_to_log_onehot(x_idx), t), computed as a select."""
        nd = x_idx.ndim + 1
        a = _extract(self.log_alpha, t, nd)
        b = _extract(self.log_1_min_alpha, t, nd) - self.log_num_classes
        return self._two_scalar_select(x_idx, a, b)

    def q_pred_indexed(self, x_idx, t):
        """q_pred(index_to_log_onehot(x_idx), t), computed as a select."""
        nd = x_idx.ndim + 1
        a = _extract(self.log_cumprod_alpha, t, nd)
        b = _extract(self.log_1_min_cumprod_alpha, t, nd) - self.log_num_classes
        return self._two_scalar_select(x_idx, a, b)

    def q_pred_one_timestep_scaled_indexed(self, x_idx, t, c, jump_len: int):
        """Indexed kevin-scaled forward transition (per-position two-value select)."""
        nd = x_idx.ndim + 1
        seq_len = x_idx.shape[1]
        a = _extract(self.log_alpha, t, nd)
        b = _extract(self.log_1_min_alpha, t, nd)
        xax = jnp.arange(seq_len, dtype=jnp.float32)
        aa = seq_len * (c / jump_len)
        sig = 1.0 / (1.0 + jnp.exp(-(xax - aa + 20.0) / 8.0))
        shape = (1, seq_len) + (1,) * (nd - 2)
        a = jnp.clip(jnp.log(1.0 / sig).reshape(shape) + a, max=0.0)
        b = jnp.log(sig).reshape(shape) + b - self.log_num_classes
        return self._two_scalar_select(x_idx, a, b)

    def q_posterior_indexed(self, log_x_start, x_t_idx, t, normalize: bool = True):
        """q_posterior with x_t given as indices (one-hot) instead of log-probs.

        ``normalize=False`` skips the final logsumexp: Gumbel-max and argmax
        sampling are invariant to the per-position constant shift, so the
        key-driven engine path drops the two full-grid passes it costs. The
        injected-uniform parity path keeps it (the subtraction perturbs float
        rounding, and those tests assert bit-identical grids).
        """
        t_minus_1 = jnp.maximum(t - 1, 0)
        log_ev = self.q_pred(log_x_start, t_minus_1)
        t_broadcast = t.reshape(-1, *([1] * (log_x_start.ndim - 1)))
        log_ev = jnp.where(t_broadcast == 0, log_x_start, log_ev)
        unnormed = log_ev + self.q_pred_one_timestep_indexed(x_t_idx, t)
        if not normalize:
            return unnormed
        return unnormed - jax.nn.logsumexp(unnormed, axis=-1, keepdims=True)

    # -- two-uniform exact draws from indexed transitions ----------------------
    # Every indexed transition's log-prob grid holds exactly two values per
    # position: `hot` at the current class, `cold` everywhere else. Gumbel-max
    # over that grid keeps the current class with probability
    # p_hot = 1 / (1 + (K-1) exp(cold - hot)) and otherwise picks uniformly
    # among the other K-1 classes — so the draw needs TWO uniforms per
    # position, not K. The key-driven engine path uses these (distribution-
    # identical, ~10x fewer PRNG bits and no (…, K) grid); the injected-uniform
    # parity path keeps the dense Gumbel (its uniforms are position-per-class).

    def _sample_two_value(self, x_idx, a, b, u):
        """u: (*x_idx.shape, 2) uniforms; a/b broadcastable to x_idx.shape."""
        K = self.num_classes
        cold_log = jnp.log(jnp.float32(MIN_LOG_ARG))
        hot = log_add_exp(a, b)
        cold = log_add_exp(cold_log + a, b)
        p_hot = 1.0 / (1.0 + (K - 1) * jnp.exp(cold - hot))
        other = jnp.minimum((u[..., 1] * (K - 1)).astype(jnp.int32), K - 2)
        other = other + (other >= x_idx).astype(jnp.int32)  # skip the hot class
        return jnp.where(u[..., 0] < p_hot, x_idx, other)

    def q_pred_indexed_sample(self, x_idx, t, u):
        """Exact draw from q(x_t | x_0 = x_idx) with 2 uniforms per position."""
        nd = x_idx.ndim
        a = _extract(self.log_cumprod_alpha, t, nd)
        b = _extract(self.log_1_min_cumprod_alpha, t, nd) - self.log_num_classes
        return self._sample_two_value(x_idx, a, b, u)

    def q_pred_one_timestep_indexed_sample(self, x_idx, t, u):
        """Exact draw from q(x_t | x_{t-1} = x_idx) with 2 uniforms per position."""
        nd = x_idx.ndim
        a = _extract(self.log_alpha, t, nd)
        b = _extract(self.log_1_min_alpha, t, nd) - self.log_num_classes
        return self._sample_two_value(x_idx, a, b, u)

    def q_pred_one_timestep_scaled_indexed_sample(self, x_idx, t, c, jump_len, u):
        """Exact draw from the kevin-scaled forward transition (2 uniforms)."""
        nd = x_idx.ndim
        seq_len = x_idx.shape[1]
        a = _extract(self.log_alpha, t, nd)
        b = _extract(self.log_1_min_alpha, t, nd)
        xax = jnp.arange(seq_len, dtype=jnp.float32)
        aa = seq_len * (c / jump_len)
        sig = 1.0 / (1.0 + jnp.exp(-(xax - aa + 20.0) / 8.0))
        shape = (1, seq_len) + (1,) * (nd - 2)
        a = jnp.clip(jnp.log(1.0 / sig).reshape(shape) + a, max=0.0)
        b = jnp.log(sig).reshape(shape) + b - self.log_num_classes
        return self._sample_two_value(x_idx, a, b, u)

    def q_posterior(self, log_x_start, log_x_t, t):
        """log q(x_{t-1} | x_t, x_0) via Bayes, with the t=0 one-hot override."""
        t_minus_1 = jnp.maximum(t - 1, 0)
        log_ev = self.q_pred(log_x_start, t_minus_1)
        t_broadcast = t.reshape(-1, *([1] * (log_x_start.ndim - 1)))
        log_ev = jnp.where(t_broadcast == 0, log_x_start, log_ev)
        unnormed = log_ev + self.q_pred_one_timestep(log_x_t, t)
        return unnormed - jax.nn.logsumexp(unnormed, axis=-1, keepdims=True)

    def p_pred(self, log_x_t, t, log_x0_pred):
        """log p(x_{t-1} | x_t) = q_posterior with the model's x̂0."""
        return self.q_posterior(log_x0_pred, log_x_t, t)

    def log_sample_categorical(self, logprobs, uniform):
        """Gumbel-max draw with injected uniforms (shape = logprobs.shape)."""
        return gumbel_argmax(logprobs, uniform)

    def q_sample(self, log_x_start, t, uniform):
        """x_t ~ q(x_t | x_0)."""
        return self.log_sample_categorical(self.q_pred(log_x_start, t), uniform)

    # -- training losses (reference diffuser.py:238-289) ----------------------
    def multinomial_kl(self, log_prob1, log_prob2, axis: int = -1):
        return (jnp.exp(log_prob1) * (log_prob1 - log_prob2)).sum(axis=axis)

    def compute_Lt(self, log_x_start, log_x_t, log_x0_pred, t, include_kl_prior=True):
        """Variational bound term (KL + t=0 decoder NLL [+ KL prior])."""
        log_true_prob = self.q_posterior(log_x_start, log_x_t, t)
        log_model_prob = self.p_pred(log_x_t, t, log_x0_pred)

        kl = sum_except_batch(self.multinomial_kl(log_true_prob, log_model_prob))
        decoder_nll = sum_except_batch(-(jnp.exp(log_x_start) * log_model_prob).sum(-1))
        mask = (t == 0).astype(kl.dtype)
        loss = mask * decoder_nll + (1.0 - mask) * kl
        if include_kl_prior:
            # NOTE: mirrors the reference exactly (diffuser.py:267-270), including
            # its overwrite of the t=0 decoder-NLL blend with `kl + kl_prior`.
            loss = kl + self.kl_prior(log_x_start)
        return loss

    def kl_prior(self, log_x_start):
        bs = log_x_start.shape[0]
        t = jnp.full((bs,), self.num_timesteps - 1, jnp.int32)
        log_qxT = self.q_pred(log_x_start, t)
        log_uniform = jnp.full_like(log_qxT, -self.log_num_classes)
        return sum_except_batch(self.multinomial_kl(log_qxT, log_uniform))


# Register as a pytree so the schedule tables flow through jit/scan as constants.
def _diff_flatten(d: MultinomialDiffusion):
    children = (d.log_alpha, d.log_1_min_alpha, d.log_cumprod_alpha,
                d.log_1_min_cumprod_alpha)
    aux = (d.num_classes, d.num_timesteps, d.log_num_classes)
    return children, aux


def _diff_unflatten(aux, children):
    d = object.__new__(MultinomialDiffusion)
    (d.log_alpha, d.log_1_min_alpha, d.log_cumprod_alpha,
     d.log_1_min_cumprod_alpha) = children
    d.num_classes, d.num_timesteps, d.log_num_classes = aux
    return d


jax.tree_util.register_pytree_node(MultinomialDiffusion, _diff_flatten, _diff_unflatten)
