"""Continuous-batching AR decode: requests join and leave batch rows mid-flight.

The throughput serving loop for BASELINE config #5: a fixed-size row pool decodes
in fixed-step chunks (the scheduling quantum); between chunks, finished rows are
harvested and waiting requests are prefilled (bs=1) and inserted into free rows.
Rows are computationally independent, so results are bit-identical to standalone
``ar_generate`` runs with the same per-request uniform stream (tested).

Host<->device traffic per quantum: one (bs,) done-flag read, plus per-transition
row inserts/harvests — the decode itself never leaves the device.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

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
    # alpha_frequency/alpha_presence/penalty_window/eos_penalty_*); top_k must
    # not exceed the pool ArSampling's static top_k:
    sampling: Optional[dict] = None
    # filled on completion:
    tokens: Optional[np.ndarray] = None
    n_gen: Optional[int] = None
    _row: int = -1


class ContinuousBatcher:
    """Fixed-pool continuous batcher over the AR decode engine.

    The pool shares one static ``ArSampling`` (compile shapes: vocab window,
    top-k extraction width, max_len) plus one prompt/speaker bucket each, but
    every request may override its sampling hyperparameters per row
    (``Request.sampling``) — the logit pipeline runs row-wise dynamic.
    """

    def __init__(self, params, cfg: CodecLMConfig, sampling: ArSampling, *,
                 batch_size: int = 4, chunk_steps: int = 64,
                 prompt_bucket: int = 64, spk_bucket: int = 64,
                 dtype=jnp.float32):
        window = min(cfg.sliding_window, sampling.max_len + 1)
        if prompt_bucket + 1 > window:
            raise ValueError(f"prompt bucket {prompt_bucket}+1 exceeds window {window}")
        self.params = params
        self.cfg = cfg
        self.s = sampling
        self.batch_size = batch_size
        self.chunk_steps = chunk_steps
        self.prompt_bucket = prompt_bucket
        self.spk_bucket = spk_bucket
        self.state = make_parked_state(cfg, sampling, batch_size, dtype)
        self.rows = rows_from_sampling(sampling, batch_size)
        self.queue: list[Request] = []
        self.active: dict[int, Request] = {}
        self.completed: list[Request] = []
        self.chunks_run = 0

    # ------------------------------------------------------------- lifecycle
    def submit(self, request: Request) -> Request:
        if len(request.prompt) > self.prompt_bucket:
            raise ValueError(
                f"prompt length {len(request.prompt)} exceeds bucket {self.prompt_bucket}")
        self.queue.append(request)
        return request

    def _admit(self) -> None:
        done = np.asarray(self.state.done)
        free = [b for b in range(self.batch_size) if b not in self.active and done[b]]
        take = min(len(free), len(self.queue))
        if take == 0:
            return
        # ONE batched prefill for every admission this quantum (a bs=1 prefill
        # per request serialized the whole pool between quanta). The batch is
        # always pool-width so exactly ONE prefill shape ever compiles; pad
        # rows replicate the LAST admitted request and are discarded.
        reqs = [self.queue.pop(0) for _ in range(take)]
        slots = free[:take]
        nb = self.batch_size
        pp = np.zeros((nb, self.prompt_bucket), np.int32)
        plens = np.zeros((nb,), np.int32)
        spk = np.full((nb, self.spk_bucket, 8), self.cfg.codebook_size - 1,
                      np.int32)
        u = np.zeros((self.s.max_len, nb), np.float32)
        row_list = []
        for j in range(nb):
            req = reqs[min(j, take - 1)]
            pp[j, : len(req.prompt)] = np.asarray(req.prompt, np.int32)
            plens[j] = len(req.prompt)
            spk[j, : req.spk_codes.shape[0]] = np.asarray(req.spk_codes, np.int32)
            if req.uniforms is not None:
                u[:, j] = np.asarray(req.uniforms, np.float32)
            else:
                u[:, j] = np.asarray(jax.random.uniform(
                    jax.random.PRNGKey(req.seed), (self.s.max_len,)))
            row_list.append(rows_from_sampling(self.s, 1, req.sampling))
        rows_b = jax.tree.map(lambda *xs: jnp.concatenate(xs, 0), *row_list)
        batch = prefill_row(self.params, self.cfg, self.s, jnp.asarray(pp),
                            jnp.asarray(plens), jnp.asarray(spk),
                            jnp.asarray(u), rows=rows_b)
        for j, (b, req) in enumerate(zip(slots, reqs)):
            row = extract_row(batch, jnp.int32(j))
            self.state = insert_row(self.state, row, jnp.int32(b))
            self.rows = insert_rows_sampling(self.rows, row_list[j], jnp.int32(b))
            req._row = b
            self.active[b] = req

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
        self.state = decode_chunk(self.params, self.cfg, self.s, self.state,
                                  self.chunk_steps, rows=self.rows)
        self.chunks_run += 1
        self._harvest()
        return bool(self.active or self.queue)

    def run(self, max_quanta: int = 10_000) -> list[Request]:
        """Drain the queue; returns all completed requests."""
        for _ in range(max_quanta):
            if not self.step():
                break
        return self.completed
