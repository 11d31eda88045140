"""Per-stage timing / RTF counters.

The reference has no profiling (README roadmap lists it as an open TODO;
SURVEY.md §5.1/§5.5); the BASELINE metrics are RTF and p50 latency, so stage
timing is first-class here. ``StageTimer`` wraps pipeline stages and reports
wall-clock per stage plus real-time factor against produced audio seconds.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field


@dataclass
class StageTimer:
    stages: dict = field(default_factory=dict)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.stages[name] = self.stages.get(name, 0.0) + time.perf_counter() - t0

    @property
    def total(self) -> float:
        return sum(self.stages.values())

    def rtf(self, audio_seconds: float) -> float:
        """Real-time factor: wall seconds per produced audio second (lower=faster)."""
        return self.total / max(audio_seconds, 1e-9)

    def report(self, audio_seconds: float | None = None) -> dict:
        out = {"stages_s": dict(self.stages), "total_s": self.total}
        if audio_seconds is not None:
            out["audio_s"] = audio_seconds
            out["rtf"] = self.rtf(audio_seconds)
        return out
