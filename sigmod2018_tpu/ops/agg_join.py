"""Final-join checksum fusion: aggregate pushdown into the probe.

The reference materializes every join's (row_idR, row_idS) pairs and only
then gathers + sums the projection columns (rhjoin.c GetResults →
inter_res.c CalculateQueryResults).  When the join is the *last* operator
of a query, materialization is pure waste: the output of the query is a
handful of uint64 SUMs.  This op computes them inside the probe:

    per probe row i with sorted-build match range [lo_i, hi_i):
        count        += hi_i - lo_i
        sum(b_col_v) += pref_v[hi_i] - pref_v[lo_i]   (prefix sums of the
                                                       build-side view col)
        sum(p_col_v) += (hi_i - lo_i) * p_col_v[i]

All wrap-around uint64.  The multi-million-row intermediate never exists —
for the contest's worst queries this removes the single largest kernel and
the host sync that sized it.

Shapes: build_cols [Vb, Pb], probe_cols [Vp, Pp] — V* may be 0.  Returns
(count u64 scalar, sums_build [Vb] u64, sums_probe [Vp] u64).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_PAD_KEY = jnp.uint64(0xFFFFFFFFFFFFFFFF)


@jax.jit
def join_checksum_fused(build_keys: jax.Array, build_cols: jax.Array,
                        n_build: jax.Array, probe_keys: jax.Array,
                        probe_cols: jax.Array, n_probe: jax.Array):
    Pb = build_keys.shape[0]
    live_b = jnp.arange(Pb, dtype=jnp.int32) < n_build
    k = jnp.where(live_b, build_keys, _PAD_KEY)
    perm = jnp.argsort(k).astype(jnp.int32)
    sk = k[perm]
    sv = jnp.where(live_b[None, :], build_cols, jnp.uint64(0))[:, perm]
    pref = jnp.concatenate(
        [jnp.zeros((sv.shape[0], 1), jnp.uint64), jnp.cumsum(sv, axis=1)], axis=1
    )
    # method="sort": see ops/sort_join.py (duplicate-run degeneracy).
    lo = jnp.minimum(
        jnp.searchsorted(sk, probe_keys, side="left", method="sort"), n_build
    )
    hi = jnp.minimum(
        jnp.searchsorted(sk, probe_keys, side="right", method="sort"), n_build
    )
    Pp = probe_keys.shape[0]
    live_p = jnp.arange(Pp, dtype=jnp.int32) < n_probe
    cnt = jnp.where(live_p, hi - lo, 0).astype(jnp.uint64)
    count = jnp.sum(cnt)
    sums_build = jnp.sum(
        jnp.where(live_p[None, :], pref[:, hi] - pref[:, lo], jnp.uint64(0)), axis=1
    )
    sums_probe = jnp.sum(cnt[None, :] * probe_cols, axis=1)
    return count, sums_build, sums_probe
