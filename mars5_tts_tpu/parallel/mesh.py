"""Device mesh construction for multi-chip serving/training.

The reference has no distributed code at all (SURVEY.md §2 preamble, §5.8);
TPU-native scaling here is a ``jax.sharding.Mesh`` over ICI with named axes:

* ``dp`` — data parallel (batch / replica-per-chip serving on v5e-8),
* ``tp`` — tensor parallel (megatron-style sharding of attention heads and FFN
  hidden dims; see parallel/sharding.py).

All collectives are XLA-inserted from sharding annotations (psum/all-gather over
ICI) — no hand-rolled communication backend.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int | None = None, tp: int = 1, devices=None) -> Mesh:
    """Build a (dp, tp) mesh. dp defaults to n_devices // tp."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        if n % tp:
            raise ValueError(f"{n} devices not divisible by tp={tp}")
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f"dp*tp = {dp * tp} != {n} devices")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def shard_tree(mesh: Mesh, tree, specs):
    """Place a pytree onto the mesh according to a PartitionSpec pytree."""
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, specs,
        is_leaf=lambda x: x is None)


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())
