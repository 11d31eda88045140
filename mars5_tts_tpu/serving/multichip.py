"""Multi-chip serving: DP (replica-per-chip) sharded inference over a mesh.

The reference is strictly single-device, batch-size-1 (no torch.distributed
anywhere; bs=1 asserted at mars5/ar_generate.py:30). SURVEY §5.8's TPU-native
equivalent: a ``jax.sharding.Mesh`` over ICI where the BATCH axis of the decode
engine's state shards across chips (``dp``) and, optionally, the AR weights
shard megatron-style across ``tp`` (parallel/sharding.py). The engines
themselves (models/ar_decode, diffusion/engine) are pure jitted programs:
sharded inputs make XLA SPMD-partition the whole while_loop/scan with zero code
changes, and decode rows are independent, so DP inference is bit-identical to
single-device runs (tested on an 8-virtual-device CPU mesh in
tests/test_multichip.py; scripts/bench_multichip.py drives real hardware).

Per-request PRNG: each row carries its own uniform stream (seeded per request),
exactly like the single-chip batched engine.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.ar import CodecLMConfig
from ..models.ar_decode import ArSampling, RowSampling, _generate_jit
from ..parallel.mesh import make_mesh, shard_tree
from ..parallel.sharding import codeclm_specs, nar_specs


def _replicated_specs(tree):
    return jax.tree.map(lambda x: P(*([None] * getattr(x, "ndim", 0))), tree)


class ShardedARDecoder:
    """Data-parallel (optionally tensor-parallel) batched AR generation.

    Weights are replicated across ``dp`` (and sharded across ``tp`` when
    ``tp > 1``); every batch-row array shards across ``dp``. The per-row
    decode math is untouched — results are bit-identical to the single-device
    engine under dp-only sharding.
    """

    def __init__(self, params, cfg: CodecLMConfig, sampling: ArSampling, *,
                 mesh: Optional[Mesh] = None, tp: int = 1):
        self.mesh = mesh if mesh is not None else make_mesh(tp=tp)
        self.cfg = cfg
        self.s = sampling
        self.dp = self.mesh.shape["dp"]
        tp_size = self.mesh.shape.get("tp", 1)
        specs = (codeclm_specs(params, tp_size) if tp_size > 1
                 else _replicated_specs(params))
        self.params = shard_tree(self.mesh, params, specs)

    def _shard(self, x, spec):
        return jax.device_put(x, NamedSharding(self.mesh, spec))

    def generate(self, prompts: Sequence[np.ndarray],
                 spk_codes_list: Sequence[np.ndarray], *,
                 uniforms: Optional[Sequence[np.ndarray]] = None,
                 seeds: Optional[Sequence[int]] = None,
                 est_lens: Optional[Sequence[int]] = None,
                 rows: RowSampling | None = None):
        """Batched generation; the batch is padded to a multiple of dp and
        sharded one shard per chip. Returns [(tokens, n_gen)] per request."""
        n_req = len(prompts)
        window = min(self.cfg.sliding_window, self.s.max_len + 1)
        bs = -(-n_req // self.dp) * self.dp
        max_p = max(len(p) for p in prompts)
        if max_p + 1 > window:
            raise ValueError(f"prompt length {max_p} exceeds window {window}")
        pb = min(max(64, -(-max_p // 64) * 64), window - 1)

        prompt_padded = np.zeros((bs, pb), np.int32)
        # pad rows: cursor at max_len -> done after the (discarded) first sample
        prompt_len = np.full((bs,), self.s.max_len, np.int32)
        for i, p in enumerate(prompts):
            prompt_padded[i, : len(p)] = np.asarray(p, np.int32)
            prompt_len[i] = len(p)

        max_s = max(c.shape[0] for c in spk_codes_list)
        sb = max(16, -(-max_s // 16) * 16)
        spk = np.full((bs, sb, 8), self.cfg.codebook_size - 1, np.int32)
        for i, c in enumerate(spk_codes_list):
            spk[i, : c.shape[0]] = np.asarray(c, np.int32)

        u = np.zeros((self.s.max_len, bs), np.float32)
        for i in range(bs):
            if uniforms is not None and i < n_req:
                u[:, i] = np.asarray(uniforms[i], np.float32)
            else:
                seed = (seeds[i] if seeds is not None and i < n_req else i)
                u[:, i] = np.asarray(
                    jax.random.uniform(jax.random.PRNGKey(seed),
                                       (self.s.max_len,)))
        est = np.full((bs,), self.s.n_phones_gen, np.int32)
        if est_lens is not None:
            est[:n_req] = np.asarray(est_lens, np.int32)

        dp = P("dp")
        args = (self._shard(jnp.asarray(prompt_padded), P("dp", None)),
                self._shard(jnp.asarray(prompt_len), dp),
                self._shard(jnp.asarray(spk), P("dp", None, None)),
                self._shard(jnp.asarray(u), P(None, "dp")),
                self._shard(jnp.asarray(est), dp))
        if rows is not None:
            rows = jax.tree.map(lambda x: self._shard(x, dp), rows)
        with self.mesh:
            tokens, final_len, n_gen = _generate_jit(
                self.params, self.cfg, self.s, *args, rows=rows)
        tokens = np.asarray(tokens)
        final_len = np.asarray(final_len)
        n_gen = np.asarray(n_gen)
        return [(tokens[i, : final_len[i]], int(n_gen[i]))
                for i in range(n_req)]


class ShardedNARDiffusion:
    """Data-parallel NAR diffusion: batch rows shard across ``dp``; with
    ``tp > 1`` the denoiser's SwiGLU FFNs shard tensor-parallel."""

    def __init__(self, params, nar_cfg, *, mesh: Optional[Mesh] = None,
                 tp: int = 1):
        self.mesh = mesh if mesh is not None else make_mesh(tp=tp)
        self.cfg = nar_cfg
        tp_size = self.mesh.shape.get("tp", 1)
        specs = (nar_specs(params, tp_size) if tp_size > 1
                 else _replicated_specs(params))
        self.params = shard_tree(self.mesh, params, specs)

    def infer(self, batch, diff, timesteps, dsh, *, key=None, uniforms=None,
              x_init=None):
        """Sharded ``perform_simple_inference``: batch rows across dp.

        The CFG doubling happens inside the engine (batch 2B keeps row i and
        its uncond twin on the same shard boundary pattern — XLA reshards the
        concat automatically over ICI).
        """
        from ..diffusion import perform_simple_inference

        dp_sh = NamedSharding(self.mesh, P("dp"))

        def shard_rows(x):
            x = jnp.asarray(x)
            return jax.device_put(x, NamedSharding(
                self.mesh, P("dp", *([None] * (x.ndim - 1)))))

        batch = tuple(shard_rows(b) for b in batch)
        with self.mesh:
            return perform_simple_inference(self.params, self.cfg, batch, diff,
                                            timesteps, dsh, key=key,
                                            uniforms=uniforms, x_init=x_init)
