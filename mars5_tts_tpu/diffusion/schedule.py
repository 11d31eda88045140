"""RePaint resampling schedule (host-side; produces static scan inputs).

``get_schedule`` reproduces the reference time ladder (mars5/diffuser.py:318-333):
descend from T-1 to 0, re-ascending ``jump_len`` steps ``jump_n_sample - 1`` times
every ``jump_len`` levels, with a terminal ``-1`` sentinel.

``build_step_plan`` flattens the reference's Python driver loop
(diffuser.py:440-465) into static per-step arrays — (t_last, is_reverse, c) —
which the engine scans over. ``c`` is the sequentially-progressive offset the
reference threads through forward steps.
"""

from __future__ import annotations

import numpy as np


def get_schedule(t_T: int, jump_len: int = 10, jump_n_sample: int = 10) -> list[int]:
    jumps = {j: jump_n_sample - 1 for j in range(0, t_T - jump_len, jump_len)}
    t = t_T
    ts = []
    while t >= 1:
        t -= 1
        ts.append(t)
        if jumps.get(t, 0) > 0:
            jumps[t] -= 1
            for _ in range(jump_len):
                t += 1
                ts.append(t)
    ts.append(-1)
    return ts


def build_step_plan(t_T: int, jump_len: int = 1, jump_n_sample: int = 1):
    """Static step plan for the scan.

    Returns:
        t_last: (n_steps,) int32 timestep entering each step.
        is_reverse: (n_steps,) bool — True for denoising (descending) steps.
        c: (n_steps,) float32 — progressive offset at the time of each step
           (matters only for forward steps).
    """
    times = get_schedule(t_T, jump_len=jump_len, jump_n_sample=jump_n_sample)
    t_lasts, reverses, cs = [], [], []
    c = 0.0
    for t_last, t_cur in zip(times[:-1], times[1:]):
        if t_cur < t_last:
            if c > jump_n_sample:
                c = 0.0
            c += 1.0 / jump_len
            reverses.append(True)
        else:
            reverses.append(False)
        t_lasts.append(t_last)
        cs.append(c)
    return (np.asarray(t_lasts, np.int32), np.asarray(reverses, bool),
            np.asarray(cs, np.float32))
