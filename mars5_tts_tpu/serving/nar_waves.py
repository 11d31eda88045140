"""NAR-stage continuous batching: finished AR rows ride shared diffusion waves.

The serving system is NAR-bound (README: 7.7 s-audio/s/chip AR-only vs 3.35
system), and the 200-step trajectory costs the same per step at bs=1 as at
bs=4 on the frame-padded grid until the MXU saturates — so completed AR
requests are grouped into batched ``perform_simple_inference`` calls ("waves")
instead of diffusing one by one.

Wave compatibility (static shapes + engine contract, diffusion/engine.py):
* same reference-code length Lc (deep clone prepends the prompt to every row —
  the engine mirrors the reference's uniform-prompt assumption,
  mars5/diffuser.py:407-419);
* same text bucket (padded; per-row true lengths flow through c_texts_length);
* same gen-length bucket (padded; per-row true lengths drive x_padding_mask —
  padded frames are masked out of attention and cropped after).

Rows are numerically independent: a wave row's grid is bit-identical to the
same request diffused solo with the same per-position uniforms (tested with
the injected-uniform harness in tests/test_nar_waves.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence

import numpy as np

import jax

from ..config import DSH
from ..diffusion import MultinomialDiffusion, perform_simple_inference
from ..models.nar import ResidualTransformerConfig


@dataclass
class NarRequest:
    c_text: np.ndarray            # (Lt,) BPE text ids
    c_codes: np.ndarray           # (Lc, 8) reference codec codes
    l0_codes: np.ndarray          # (Lg,) AR-decoded L0 codec codes
    seed: int = 0
    grid: Optional[np.ndarray] = None   # (Lg, 8) on completion


def _bucket(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"length {n} exceeds largest bucket {buckets[-1]}")


@dataclass
class NarWaveScheduler:
    """Batches compatible NAR requests into shared diffusion waves."""

    nar_params: object
    nar_cfg: ResidualTransformerConfig
    diff: MultinomialDiffusion
    T: int
    dsh: DSH
    wave_size: int = 4
    gen_buckets: Sequence[int] = (256, 512, 768)
    text_bucket: int = 64
    queue: list = field(default_factory=list)
    completed: list = field(default_factory=list)
    waves_run: int = 0

    def submit(self, request: NarRequest) -> NarRequest:
        _bucket(len(request.l0_codes), self.gen_buckets)  # validate early
        if len(request.c_text) > self.text_bucket:
            raise ValueError(
                f"text length {len(request.c_text)} exceeds bucket "
                f"{self.text_bucket}")
        self.queue.append(request)
        return request

    def _wave_key(self, req: NarRequest):
        return (req.c_codes.shape[0], _bucket(len(req.l0_codes),
                                              self.gen_buckets))

    def _run_wave(self, reqs: list) -> None:
        bs = len(reqs)
        lc = reqs[0].c_codes.shape[0]
        lg_bucket = self._wave_key(reqs[0])[1]
        c_text = np.zeros((bs, self.text_bucket), np.int64)
        ctl = np.zeros((bs,), np.int64)
        c_codes = np.stack([r.c_codes for r in reqs]).astype(np.int64)
        x = np.zeros((bs, lg_bucket, 8), np.int64)
        xpm = np.ones((bs, lg_bucket), bool)
        for j, r in enumerate(reqs):
            c_text[j, : len(r.c_text)] = r.c_text
            ctl[j] = len(r.c_text)
            lg = len(r.l0_codes)
            x[j, :lg] = np.repeat(np.asarray(r.l0_codes)[:, None], 8, axis=1)
            xpm[j, :lg] = False
        batch = (c_text, c_codes, ctl, np.full((bs,), lc, np.int64), x, xpm)
        # per-wave key: rows share the stream (any valid uniforms are a valid
        # draw; solo-vs-wave equivalence is pinned by the injected-uniform
        # harness, not by key equality)
        key = jax.random.key(reqs[0].seed, impl="rbg")
        grid = np.asarray(perform_simple_inference(
            self.nar_params, self.nar_cfg, batch, self.diff, self.T, self.dsh,
            key=key))
        self.waves_run += 1
        for j, r in enumerate(reqs):
            r.grid = grid[j, : len(r.l0_codes)]
            self.completed.append(r)

    def flush(self) -> list:
        """Group the queue into compatible waves and run them all."""
        groups: dict[tuple, list] = {}
        for r in self.queue:
            groups.setdefault(self._wave_key(r), []).append(r)
        self.queue = []
        for _key, reqs in sorted(groups.items()):
            for i in range(0, len(reqs), self.wave_size):
                self._run_wave(reqs[i: i + self.wave_size])
        return self.completed

    def flush_full_waves(self) -> int:
        """Run only FULL waves (wave_size compatible rows); keep the rest
        queued. The overlapped serving loop calls this between AR chunk
        quanta so diffusion starts as soon as a cohort is ready instead of
        after every AR request completes; returns the number of waves run."""
        groups: dict[tuple, list] = {}
        for r in self.queue:
            groups.setdefault(self._wave_key(r), []).append(r)
        ran = 0
        remainder: list = []
        for _key, reqs in sorted(groups.items()):
            n_full = len(reqs) // self.wave_size * self.wave_size
            for i in range(0, n_full, self.wave_size):
                self._run_wave(reqs[i: i + self.wave_size])
                ran += 1
            remainder.extend(reqs[n_full:])
        self.queue = remainder
        return ran
