"""Continuous-batching AR decode: requests join and leave batch rows mid-flight.

The throughput serving loop for BASELINE config #5: a fixed-size row pool decodes
in fixed-step chunks (the scheduling quantum); between chunks, finished rows are
harvested and waiting requests are prefilled and inserted into free rows.
Rows are computationally independent, so results are bit-identical to standalone
``ar_generate`` runs with the same per-request uniform stream (tested).

Mixed-length queues: prompts are assigned to the smallest of ``prompt_buckets``
that fits (e.g. (64, 256, 576) spans shallow-clone ~30-token prompts and
deep-clone ~510-token prompts), and each admission quantum runs ONE pool-width
prefill per distinct bucket — a 64-wide prefill for shallow requests costs ~1/9
the FLOPs of the deep bucket. Per-request sampling overrides may raise top_k up
to ``max_top_k`` (the pool's static extraction width), independent of the
default ``sampling.top_k``.

Host<->device traffic per quantum: one (bs,) done-flag read, plus per-transition
row inserts/harvests — the decode itself never leaves the device.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from ..models.ar import CodecLMConfig
from ..models.ar_decode import (ArSampling, decode_chunk, extract_row,
                                insert_row, insert_rows_sampling,
                                make_parked_state, prefill_row,
                                rows_from_sampling)


@dataclass
class Request:
    prompt: np.ndarray            # 1-D int token ids
    spk_codes: np.ndarray         # (S, 8) reference codec codes
    seed: int = 0
    uniforms: Optional[np.ndarray] = None  # (max_len,) override (parity harness)
    # per-request sampling overrides (temperature/top_k/top_p/typical_p/
    # alpha_frequency/alpha_presence/penalty_window/eos_penalty_*); top_k may
    # exceed the default sampling's top_k up to the pool's ``max_top_k``:
    sampling: Optional[dict] = None
    # filled on completion:
    tokens: Optional[np.ndarray] = None
    n_gen: Optional[int] = None
    _row: int = -1


class ContinuousBatcher:
    """Fixed-pool continuous batcher over the AR decode engine.

    The pool shares one static ``ArSampling`` (compile shapes: vocab window,
    top-k extraction width = ``max_top_k``, max_len) plus a small set of
    prompt buckets, but every request may override its sampling
    hyperparameters per row (``Request.sampling``) — the logit pipeline runs
    row-wise dynamic.
    """

    def __init__(self, params, cfg: CodecLMConfig, sampling: ArSampling, *,
                 batch_size: int = 4, chunk_steps: int = 64,
                 prompt_buckets: Sequence[int] = (64,), spk_bucket: int = 64,
                 max_top_k: int | None = None, dtype=jnp.float32,
                 prompt_bucket: int | None = None):
        if prompt_bucket is not None:  # back-compat single-bucket spelling
            prompt_buckets = (prompt_bucket,)
        self.prompt_buckets = tuple(sorted(prompt_buckets))
        window = min(cfg.sliding_window, sampling.max_len + 1)
        if self.prompt_buckets[-1] + 1 > window:
            raise ValueError(
                f"prompt bucket {self.prompt_buckets[-1]}+1 exceeds window {window}")
        self.max_top_k = max_top_k if max_top_k is not None else sampling.top_k
        # static compile sampling: extraction width = max_top_k; per-row
        # DEFAULTS still come from the caller's sampling (self.default_s)
        self.params = params
        self.cfg = cfg
        self.default_s = sampling
        self.s = replace(sampling, top_k=self.max_top_k)
        self.batch_size = batch_size
        self.chunk_steps = chunk_steps
        self.spk_bucket = spk_bucket
        self.state = self._make_state(dtype)
        self.rows = rows_from_sampling(sampling, batch_size,
                                       cap_top_k=self.max_top_k)
        self.queue: list[Request] = []
        self.active: dict[int, Request] = {}
        self.completed: list[Request] = []
        self.chunks_run = 0
        self.prefills_by_bucket: dict[int, int] = {b: 0 for b in self.prompt_buckets}

    # ------------------------------------------------- engine hook methods
    # (overridden by FusedContinuousBatcher; everything else is shared)
    def _make_state(self, dtype):
        return make_parked_state(self.cfg, self.s, self.batch_size, dtype)

    def _do_prefill(self, pp, plens, spk, u, rows_b, n_real: int):
        return prefill_row(self.params, self.cfg, self.s, pp, plens, spk, u,
                           rows=rows_b)

    def _insert(self, batch, j: int, slot: int) -> None:
        row = extract_row(batch, jnp.int32(j))
        self.state = insert_row(self.state, row, jnp.int32(slot))

    def _decode(self) -> None:
        self.state = decode_chunk(self.params, self.cfg, self.s, self.state,
                                  self.chunk_steps, rows=self.rows)

    # ------------------------------------------------------------- lifecycle
    def _bucket_for(self, n: int) -> int:
        for b in self.prompt_buckets:
            if n <= b:
                return b
        raise ValueError(
            f"prompt length {n} exceeds bucket {self.prompt_buckets[-1]}")

    def submit(self, request: Request) -> Request:
        self._bucket_for(len(request.prompt))  # validate early
        if request.sampling and request.sampling.get("top_k", 0) > self.max_top_k:
            raise ValueError(
                f"request top_k {request.sampling['top_k']} exceeds pool "
                f"max_top_k {self.max_top_k}")
        self.queue.append(request)
        return request

    def _admit(self) -> None:
        done = np.asarray(self.state.done)
        free = [b for b in range(self.batch_size) if b not in self.active and done[b]]
        take = min(len(free), len(self.queue))
        if take == 0:
            return
        reqs = [self.queue.pop(0) for _ in range(take)]
        slots = free[:take]
        # ONE batched prefill per DISTINCT bucket this quantum (a bs=1 prefill
        # per request serialized the whole pool between quanta). Each prefill
        # is always pool-width so at most len(prompt_buckets) prefill shapes
        # ever compile; pad rows are zeros (their outputs are discarded).
        by_bucket: dict[int, list[tuple[int, Request]]] = {}
        for slot, req in zip(slots, reqs):
            by_bucket.setdefault(self._bucket_for(len(req.prompt)), []).append(
                (slot, req))
        nb = self.batch_size
        for bucket, group in sorted(by_bucket.items()):
            pp = np.zeros((nb, bucket), np.int32)
            plens = np.zeros((nb,), np.int32)
            spk = np.full((nb, self.spk_bucket, 8), self.cfg.codebook_size - 1,
                          np.int32)
            u = np.zeros((self.s.max_len, nb), np.float32)
            row_list = [rows_from_sampling(self.default_s, 1,
                                           cap_top_k=self.max_top_k)] * nb
            for j, (_slot, req) in enumerate(group):
                pp[j, : len(req.prompt)] = np.asarray(req.prompt, np.int32)
                plens[j] = len(req.prompt)
                spk[j, : req.spk_codes.shape[0]] = np.asarray(req.spk_codes,
                                                              np.int32)
                if req.uniforms is not None:
                    u[:, j] = np.asarray(req.uniforms, np.float32)
                else:
                    u[:, j] = np.asarray(jax.random.uniform(
                        jax.random.PRNGKey(req.seed), (self.s.max_len,)))
                row_list[j] = rows_from_sampling(self.default_s, 1,
                                                 req.sampling,
                                                 cap_top_k=self.max_top_k)
            rows_b = jax.tree.map(lambda *xs: jnp.concatenate(xs, 0), *row_list)
            batch = self._do_prefill(jnp.asarray(pp), jnp.asarray(plens),
                                     jnp.asarray(spk), jnp.asarray(u), rows_b,
                                     len(group))
            self.prefills_by_bucket[bucket] += 1
            for j, (slot, req) in enumerate(group):
                self._insert(batch, j, slot)
                self.rows = insert_rows_sampling(self.rows, row_list[j],
                                                 jnp.int32(slot))
                req._row = slot
                self.active[slot] = req

    def _harvest(self) -> None:
        done = np.asarray(self.state.done)
        for b, req in list(self.active.items()):
            if done[b]:
                req.tokens = np.asarray(self.state.tokens[b])[: int(self.state.cur[b])]
                req.n_gen = int(self.state.n_gen[b])
                self.completed.append(req)
                del self.active[b]

    def step(self) -> bool:
        """One scheduling quantum. Returns False when fully idle."""
        self._admit()
        if not self.active:
            return bool(self.queue)
        self._decode()
        self.chunks_run += 1
        self._harvest()
        return bool(self.active or self.queue)

    def run(self, max_quanta: int = 10_000) -> list[Request]:
        """Drain the queue; returns all completed requests."""
        for _ in range(max_quanta):
            if not self.step():
                break
        return self.completed


class FusedContinuousBatcher(ContinuousBatcher):
    """Continuous batcher on the int8/int4 fused decode MEGAKERNEL.

    Same scheduling/bucketing/per-request-sampling semantics as the base
    class, but the pool decodes through the batched fused kernel
    (models/ar_decode_fused): the int4 weight stream (~340 MB/step vs the XLA
    engine's amortized bf16 1.4 GB) is shared by up to 8 rows riding the
    8-sublane block the bs=1 kernel already pads to, so per-row decode cost
    approaches 1/B of the single-stream kernel. Numeric contract is the fused
    engine's (W8A8/int4 + int8 KV), NOT reference parity — quality gates in
    tests/test_quant.py; row results are bit-identical to
    ``ar_generate_fused_batched`` with the same uniforms (tested).

    ``interpret``: None = pure-jnp emulation (CPU tests), False = compiled
    kernel (TPU).
    """

    def __init__(self, params, cfg: CodecLMConfig, sampling: ArSampling, *,
                 batch_size: int = 8, wbits: int = 4, interpret=False,
                 **kw):
        from ..models.ar_decode_fused import prepare_fused
        if not 2 <= batch_size <= 8:
            # batch_size 1 would hit the kernel's unbatched cache layout;
            # use ar_generate_fused for single-stream serving
            raise ValueError("fused pool batch_size must be in [2, 8]")
        self.wbits = wbits
        self.interpret = interpret
        self.fp, self.dims = prepare_fused(params, cfg, sampling.max_len,
                                           wbits=wbits, batch=batch_size)
        super().__init__(params, cfg, sampling, batch_size=batch_size, **kw)

    def _make_state(self, dtype):
        from ..models.ar_decode_fused import make_parked_state_fused
        return make_parked_state_fused(self.cfg, self.dims, self.s)

    def _do_prefill(self, pp, plens, spk, u, rows_b, n_real: int):
        from ..models.ar_decode_fused import _fused_prefill_batched
        active = jnp.arange(self.batch_size) < n_real
        est = jnp.full((self.batch_size,), self.s.n_phones_gen, jnp.int32)
        return _fused_prefill_batched(self.params, self.cfg, self.dims, self.s,
                                      pp, plens, spk, u, est, active,
                                      rows=rows_b)

    def _insert(self, batch, j: int, slot: int) -> None:
        from ..models.ar_decode_fused import extract_fused_row, insert_fused_row
        row = extract_fused_row(batch, jnp.int32(j))
        self.state = insert_fused_row(self.state, row, jnp.int32(slot))

    def _decode(self) -> None:
        from ..models.ar_decode_fused import decode_chunk_fused
        self.state = decode_chunk_fused(self.fp, self.cfg, self.dims, self.s,
                                        self.state, self.chunk_steps,
                                        rows=self.rows,
                                        interpret=self.interpret)
