"""On-chip probe: exact top-k variants for the AR sampler hot path.

The r4 bench trace shows ``lax.top_k(f32[1,24000], 200)`` costs 94 us/token
(fusion.369, kCustom) — 70 ms of the 607 ms AR stage, the single largest
non-GEMM op in the decode loop. Candidates (all EXACT up to tie index sets,
which are measure-zero for continuous logits):

  a) baseline      lax.top_k(x, 200) over V=24000
  b) blocked       reshape V -> (B, V/B); per-block lax.top_k(200); merge the
                   B*200 candidates with one lax.top_k(200). Any global top-200
                   element is in its block's top-200, so the union is exact.
  c) sortfull      jnp.sort descending, slice 200 (upper bound sanity)
  d) approx        lax.approx_max_k recall .99 (NOT exact; context only)

Each variant is timed inside a 100-iteration lax.scan whose input is perturbed
per step (no CSE), output kept alive; per-iter overhead ~ the fori_loop tax
(CLAUDE.md) applies EQUALLY to all variants, and the baseline's in-scan time
matches its in-graph trace time (94 us) closely enough to rank.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

V = 24_000
K = 200


def time_scan(fn, x, iters=100):
    @jax.jit
    def run(x):
        def step(carry, i):
            vals, idx = fn(carry + i.astype(jnp.float32) * 1e-8)
            # keep both alive; tiny feedback so steps serialize
            return carry + vals.mean() * 1e-9 + idx.sum() * 1e-12, None
        out, _ = jax.lax.scan(step, x, jnp.arange(iters))
        return out
    r = run(x)
    float(r.sum())  # compile+run
    t0 = time.perf_counter()
    r = run(x)
    float(r.sum())
    t1 = time.perf_counter()
    return (t1 - t0) / iters * 1e6  # us/iter


def baseline(x):
    return jax.lax.top_k(x, K)


def blocked(nb):
    def fn(x):
        bs, v = x.shape
        xb = x.reshape(bs * nb, v // nb)
        bv, bi = jax.lax.top_k(xb, K)          # (bs*nb, K)
        base = (jnp.arange(nb, dtype=jnp.int32) * (v // nb))[None, :, None]
        bi = bi.reshape(bs, nb, K) + base
        bv = bv.reshape(bs, nb * K)
        bi = bi.reshape(bs, nb * K)
        mv, mi = jax.lax.top_k(bv, K)          # (bs, K) over candidates
        return mv, jnp.take_along_axis(bi, mi, axis=-1)
    return fn


def sortfull(x):
    s = jnp.sort(x, axis=-1)[:, ::-1][:, :K]
    si = jnp.argsort(-x, axis=-1)[:, :K]
    return s, si


def approx(x):
    return jax.lax.approx_max_k(x, K, recall_target=0.99)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, V)).astype(np.float32))

    # correctness vs baseline first (host compare)
    bv, bi = jax.jit(baseline)(x)
    for name, fn in [("blocked8", blocked(8)), ("blocked4", blocked(4)),
                     ("blocked16", blocked(16))]:
        v2, i2 = jax.jit(fn)(x)
        assert np.allclose(np.asarray(bv), np.asarray(v2)), name
        assert np.array_equal(np.asarray(bi), np.asarray(i2)), name
    print("exactness: blocked4/8/16 match baseline values AND indices")

    for name, fn in [
        ("baseline", baseline),
        ("blocked4", blocked(4)),
        ("blocked8", blocked(8)),
        ("blocked16", blocked(16)),
        ("sortfull", sortfull),
        ("approx.99", approx),
    ]:
        us = time_scan(fn, x)
        print(f"{name:10s} {us:8.1f} us/iter")


if __name__ == "__main__":
    main()
