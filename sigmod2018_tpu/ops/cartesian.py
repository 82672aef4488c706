"""Cross product of two disconnected intermediate components.

Reference: CartesianInterResults (inter_res.c:391-428) — a rare path, only
hit when a query's join graph is disconnected.  On device it is one index
computation: output slot t maps to (t // n2, t % n2).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("out_size",))
def cartesian_indices(n1: jax.Array, n2: jax.Array, out_size: int):
    t = jnp.arange(out_size, dtype=jnp.int64)
    n2s = jnp.maximum(n2.astype(jnp.int64), 1)
    valid = t < n1.astype(jnp.int64) * n2s
    i1 = jnp.where(valid, t // n2s, 0).astype(jnp.int32)
    i2 = jnp.where(valid, t % n2s, 0).astype(jnp.int32)
    return i1, i2
