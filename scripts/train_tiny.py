"""Smoke training run: tiny AR+NAR models on a synthetic corpus, dp x tp mesh.

Demonstrates the full training path (data -> sharded combined train step ->
falling losses -> checkpoint save in the reference format).

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python scripts/train_tiny.py [STEPS=20]
"""

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

if "cpu" in os.environ.get("JAX_PLATFORMS", "cpu"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp


def main():
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mars5_tts_tpu.data import batches, synthetic_corpus
    from mars5_tts_tpu.diffusion import MultinomialDiffusion
    from mars5_tts_tpu.models.ar import CodecLMConfig, init_codeclm
    from mars5_tts_tpu.models.nar import ResidualTransformerConfig, init_nar
    from mars5_tts_tpu.parallel import codeclm_specs, make_mesh, nar_specs
    from mars5_tts_tpu.train import (init_train_state, make_optimizer,
                                     make_train_step, shard_train_state)

    steps = int(os.environ.get("STEPS", "20"))
    n_devices = len(jax.devices())
    tp = 4 if n_devices % 4 == 0 else 1
    dp = n_devices // tp
    mesh = make_mesh(dp=dp, tp=tp)
    print(f"devices={n_devices} mesh dp={dp} tp={tp}")

    n_text, eos = 64, 64 + 1024  # toy joint vocab: text 64 + speech 1024 + eos
    ar_cfg = CodecLMConfig(n_vocab=n_text + 1024 + 2, dim=64, n_heads=4,
                           n_kv_heads=4, head_dim=16, n_layers=2, hidden_dim=96,
                           sliding_window=128, n_spk_layers=2, spk_hidden_dim=192)
    nar_cfg = ResidualTransformerConfig.tiny(n_text_vocab=n_text)
    diff = MultinomialDiffusion(nar_cfg.n_quant, timesteps=32)

    key = jax.random.PRNGKey(0)
    ar_params = init_codeclm(key, ar_cfg)
    nar_params = init_nar(jax.random.fold_in(key, 1), nar_cfg)
    optimizer = make_optimizer(3e-4)
    state = init_train_state(ar_params, nar_params, optimizer)
    state = shard_train_state(mesh, state, codeclm_specs(ar_params, tp),
                              nar_specs(nar_params, tp))

    corpus = synthetic_corpus(64 * dp, text_vocab=n_text)
    train_step = jax.jit(make_train_step(ar_cfg, nar_cfg, diff, optimizer),
                         donate_argnums=(0,))
    dp_sh = NamedSharding(mesh, P("dp"))

    first = last = None
    it = iter([])
    t0 = time.time()
    with mesh:
        for step in range(steps):
            try:
                ar_b, nar_b = next(it)
            except StopIteration:
                # fixed pad sizes -> one compile for the whole run
                it = batches(corpus, batch_size=2 * dp, seed=step,
                             n_text_vocab_offset=n_text, eos_idx=eos,
                             ar_pad_to=96, spk_pad_to=64, frames_pad_to=64,
                             text_pad_to=24)
                ar_b, nar_b = next(it)
            # pad to fixed bucket shapes to avoid recompiles
            ar_b = tuple(jax.device_put(jnp.asarray(x), dp_sh) for x in ar_b)
            nar_b = tuple(jax.device_put(jnp.asarray(x), dp_sh) for x in nar_b)
            state, metrics = train_step(state, ar_b, nar_b,
                                        jax.random.PRNGKey(1000 + step))
            m = {k: float(v) for k, v in metrics.items()}
            if first is None:
                first = m
            last = m
            if step % max(steps // 5, 1) == 0:
                print(f"step {step}: ar={m['ar_loss']:.4f} nar={m['nar_loss']:.4f}")

    print(f"{steps} steps in {time.time() - t0:.1f}s")
    print(f"ar loss {first['ar_loss']:.4f} -> {last['ar_loss']:.4f} | "
          f"nar loss {first['nar_loss']:.4f} -> {last['nar_loss']:.4f}")
    assert last["ar_loss"] < first["ar_loss"], "AR loss did not decrease"

    # save in the reference-compatible layout (converted-back naming is future
    # work; here we persist the pytree for resume)
    from mars5_tts_tpu.hub import save_pytree_npz
    out = Path(os.environ.get("OUT_DIR", "/tmp/mars5_train_tiny"))
    out.mkdir(parents=True, exist_ok=True)
    save_pytree_npz(out / "ar_params.npz", jax.device_get(state.ar_params))
    save_pytree_npz(out / "nar_params.npz", jax.device_get(state.nar_params))
    print(f"saved params to {out}")


if __name__ == "__main__":
    main()
