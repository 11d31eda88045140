"""Training steps: AR next-token cross-entropy + NAR multinomial-diffusion VB loss.

The reference ships no training code beyond the VB-loss math in its diffuser
(mars5/diffuser.py:238-289); this module supplies the TPU-native training path the
framework needs to be complete: pure loss functions, an optax-based combined
train step, and mesh-sharded (dp x tp) compilation via ``jax.jit`` shardings.

AR objective: teacher-forced next-token CE over the joint text+speech sequence
with an ignore mask (padding + prompt text, mirroring the inference-time
``length_to_mask(first_codec_idx-1)`` convention).
NAR objective: sample t ~ U[0, T), corrupt x0 through q(x_t|x0), predict x̂0 with
train-time CFG conditioning dropout (p_cond_drop, mars5/model.py:286-296), and
minimize the variational bound term from the diffusion math.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from .diffusion.multinomial import MultinomialDiffusion, index_to_log_onehot
from .models.ar import CodecLMConfig, codeclm_forward
from .models.nar import ResidualTransformerConfig, nar_forward


def ar_loss_fn(params, cfg: CodecLMConfig, tokens, loss_mask, spk_codes):
    """Next-token CE.

    tokens: (bs, L); loss_mask: (bs, L-1) — 1 where the target at position i+1
    contributes; spk_codes: (bs, S, 8).
    """
    logits = codeclm_forward(params, cfg, tokens[:, :-1], spk_codes=spk_codes)
    logits = logits.astype(jnp.float32)
    targets = tokens[:, 1:]
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    mask = loss_mask.astype(jnp.float32)
    return (nll * mask).sum() / jnp.maximum(mask.sum(), 1.0)


def nar_loss_fn(params, cfg: ResidualTransformerConfig, diff: MultinomialDiffusion,
                batch, key, p_cond_drop: float = 0.1):
    """Multinomial-diffusion variational bound on a clean batch.

    batch: (c_text, c_codes, c_texts_length, c_codes_length, x0 (bs, L, 8),
            x_padding_mask).
    """
    c_text, c_codes, ctl, ccl, x0, xpm = batch
    bs = x0.shape[0]
    k_t, k_noise, k_drop = jax.random.split(key, 3)
    t = jax.random.randint(k_t, (bs,), 0, diff.num_timesteps)

    log_x0 = index_to_log_onehot(x0, diff.num_classes)
    u = jax.random.uniform(k_noise, x0.shape + (diff.num_classes,))
    x_t = diff.q_sample(log_x0, t, u)

    drop = jax.random.bernoulli(k_drop, p_cond_drop, (bs,))
    logits = nar_forward(params, cfg, c_text, c_codes, ctl, ccl, x_t, xpm, t,
                         drop_cond=drop).astype(jnp.float32)
    log_pred = jax.nn.log_softmax(logits, axis=-1)
    log_xt = index_to_log_onehot(x_t, diff.num_classes)
    vb = diff.compute_Lt(log_x0, log_xt, log_pred, t)  # (bs,)
    # mask padded frames were already excluded from attention; normalize by frames
    return vb.mean() / (x0.shape[1] * x0.shape[2])


class TrainState(NamedTuple):
    ar_params: dict
    ar_opt: optax.OptState
    nar_params: dict
    nar_opt: optax.OptState
    step: jax.Array


def make_optimizer(lr: float = 1e-4, weight_decay: float = 0.01,
                   warmup_steps: int = 0, total_steps: int = 0,
                   clip_norm: float = 0.0, accum_steps: int = 1):
    """Production optimizer: AdamW with optional global-norm clipping,
    linear-warmup + cosine-decay schedule, and gradient accumulation.

    Defaults preserve the round-2 behavior (plain AdamW at a constant lr).
    ``total_steps > 0`` enables the schedule (cosine to 10% of peak);
    ``accum_steps > 1`` wraps in optax.MultiSteps (micro-batching — the
    train step API is unchanged, updates apply every ``accum_steps`` calls).
    """
    sched = lr
    if total_steps > 0:
        sched = optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=lr,
            warmup_steps=max(warmup_steps, 1),
            decay_steps=total_steps, end_value=0.1 * lr)
    parts = []
    if clip_norm > 0:
        parts.append(optax.clip_by_global_norm(clip_norm))
    parts.append(optax.adamw(sched, weight_decay=weight_decay))
    tx = optax.chain(*parts) if len(parts) > 1 else parts[0]
    if accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_steps)
    return tx


def init_train_state(ar_params, nar_params, optimizer) -> TrainState:
    return TrainState(
        ar_params=ar_params, ar_opt=optimizer.init(ar_params),
        nar_params=nar_params, nar_opt=optimizer.init(nar_params),
        step=jnp.int32(0))


def make_train_step(ar_cfg: CodecLMConfig, nar_cfg: ResidualTransformerConfig,
                    diff: MultinomialDiffusion, optimizer,
                    p_cond_drop: float = 0.1):
    """Build the combined (AR + NAR) train step, ready for jit with shardings."""

    def train_step(state: TrainState, ar_batch, nar_batch, key):
        tokens, loss_mask, spk_codes = ar_batch

        ar_l, ar_grads = jax.value_and_grad(ar_loss_fn)(
            state.ar_params, ar_cfg, tokens, loss_mask, spk_codes)
        ar_updates, ar_opt = optimizer.update(ar_grads, state.ar_opt, state.ar_params)
        ar_params = optax.apply_updates(state.ar_params, ar_updates)

        nar_l, nar_grads = jax.value_and_grad(
            lambda p: nar_loss_fn(p, nar_cfg, diff, nar_batch, key, p_cond_drop))(
                state.nar_params)
        nar_updates, nar_opt = optimizer.update(nar_grads, state.nar_opt, state.nar_params)
        nar_params = optax.apply_updates(state.nar_params, nar_updates)

        new_state = TrainState(ar_params=ar_params, ar_opt=ar_opt,
                               nar_params=nar_params, nar_opt=nar_opt,
                               step=state.step + 1)
        return new_state, {"ar_loss": ar_l, "nar_loss": nar_l}

    return train_step


def shard_train_state(mesh, state: TrainState, ar_specs, nar_specs) -> TrainState:
    """Place parameters + optimizer state on a (dp, tp) mesh.

    Optimizer-state leaves whose shape matches a parameter (adam moments) follow
    that parameter's spec; everything else (counts, scalars) replicates. The
    subsequently-jitted train step inherits these input shardings — no
    in_shardings plumbing required.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    def put_params(params, specs):
        return jax.tree.map(put, params, specs)

    def put_opt(opt_state, params, specs):
        flat_params, _ = jax.tree.flatten(params)
        flat_specs, _ = jax.tree.flatten(specs, is_leaf=lambda x: isinstance(x, P))
        by_shape = {}
        for p, s in zip(flat_params, flat_specs):
            by_shape.setdefault(tuple(p.shape), s)

        def place(leaf):
            spec = by_shape.get(tuple(jnp.shape(leaf)), P())
            if len(jnp.shape(leaf)) != len(spec):
                spec = P()
            return put(leaf, spec)

        return jax.tree.map(place, opt_state)

    return TrainState(
        ar_params=put_params(state.ar_params, ar_specs),
        ar_opt=put_opt(state.ar_opt, state.ar_params, ar_specs),
        nar_params=put_params(state.nar_params, nar_specs),
        nar_opt=put_opt(state.nar_opt, state.nar_params, nar_specs),
        step=put(state.step, P()))


def save_train_checkpoint(path, state: TrainState) -> None:
    """Persist the full training state (params + optimizer + step) via orbax."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(str(path), jax.device_get(state))


def restore_train_checkpoint(path, state_like: TrainState) -> TrainState:
    """Restore a training state saved by save_train_checkpoint.

    ``state_like`` provides the target structure/shapes (e.g. a fresh
    init_train_state); restored arrays land on the default device — re-shard
    with shard_train_state afterwards for mesh runs.
    """
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype),
            state_like)
        return ckptr.restore(str(path), abstract)
