"""Tunnel health probe: warm host->device->host round-trip latency.

The axon tunnel transiently degrades 3-5x (transfer-bound stages inflate
first; see CLAUDE.md). Before trusting a bad bench number or chasing a
phantom perf regression, run this — a healthy tunnel round-trips the 576 KB
bench-sized buffer in ~0.04 s warm. One JSON line.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp


def main():
    x = np.zeros(144_000, np.float32)  # 576 KB, the bench encodec upload size
    f = jax.jit(lambda a: a.sum())
    t0 = time.perf_counter()
    float(f(jnp.asarray(x)))
    cold = time.perf_counter() - t0
    rts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(jnp.asarray(x)))
        rts.append(time.perf_counter() - t0)
    warm = float(np.median(rts))
    print(json.dumps({
        "metric": "tunnel_rt_576k", "unit": "s", "value": round(warm, 4),
        "detail": {"cold_s": round(cold, 2), "runs_s": [round(r, 4) for r in rts],
                   "healthy": warm < 0.15,
                   "device": str(jax.devices()[0])}}))


if __name__ == "__main__":
    main()
