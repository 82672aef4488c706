"""Equi-join: sort-build + searchsorted-probe + cumsum-expand.

The reference joins by radix-partitioning both sides on the low key bits and
pointer-chasing a per-bucket bucket-chain hash index (rhjoin.c:141-309).
Pointer chasing has no TPU equivalent; the TPU-native restatement is:

  build:  sort the smaller side's keys once (XLA sort, O(n log n) on device)
  probe:  two vectorized binary searches per probe key give the contiguous
          match range [lo, hi) — every lane independent, no chains
  emit:   expand variable-length ranges into a dense (build_pos, probe_pos)
          pair list via cumsum + one more searchsorted (the classic
          segment-expand trick), into a statically-sized padded output

Output cardinality is data-dependent; the probe phase returns the exact
total so the host picks a power-of-two output class and calls `join_emit`
(two-phase kernels, SURVEY §7.1).  Padding slots carry key 2^64-1 on the
build side and are excluded by clamping match ranges to `n_build`; padded
probe rows get count 0.  A *valid* key equal to 2^64-1 still joins
correctly: its valid copies sort immediately before the padding and the
clamp keeps exactly them.

An alternative Pallas radix-partitioned path lives in radix_join.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_PAD_KEY = jnp.uint64(0xFFFFFFFFFFFFFFFF)


@jax.jit
def join_build(keys: jax.Array, n_valid: jax.Array):
    """Sort the build side.  Returns (sorted_keys, perm) with padding keys
    forced to 2^64-1 so they sort last."""
    P = keys.shape[0]
    live = jnp.arange(P, dtype=jnp.int32) < n_valid
    k = jnp.where(live, keys, _PAD_KEY)
    perm = jnp.argsort(k).astype(jnp.int32)
    return k[perm], perm


@jax.jit
def join_probe_count(sorted_keys: jax.Array, n_build: jax.Array,
                     probe_keys: jax.Array, n_probe: jax.Array):
    """Per-probe-row match ranges and total output cardinality.

    Returns (lo, cnt, ccum, total): lo[i] = first match position in the
    sorted build array, cnt[i] = number of matches, ccum = inclusive cumsum
    of cnt, total = ccum[-1].
    """
    Pp = probe_keys.shape[0]
    # method="sort": the default scan-based binary search degenerates (~1000x)
    # on TPU when the sorted array contains duplicate runs — which every
    # real key column and every cumsum of counts has.  The sort-based
    # lowering is data-independent.
    lo = jnp.searchsorted(sorted_keys, probe_keys, side="left", method="sort")
    hi = jnp.searchsorted(sorted_keys, probe_keys, side="right", method="sort")
    lo = jnp.minimum(lo, n_build).astype(jnp.int32)
    hi = jnp.minimum(hi, n_build).astype(jnp.int32)
    live = jnp.arange(Pp, dtype=jnp.int32) < n_probe
    cnt = jnp.where(live, hi - lo, 0).astype(jnp.int64)
    ccum = jnp.cumsum(cnt)
    total = ccum[-1]
    return lo, cnt, ccum, total


@partial(jax.jit, static_argnames=("out_size",))
def join_emit(perm: jax.Array, lo: jax.Array, ccum: jax.Array,
              total: jax.Array, out_size: int):
    """Expand match ranges into dense (build_pos, probe_pos) pairs.

    build_pos indexes the *original* (unsorted, padded) build input;
    probe_pos indexes the probe input.  Slots >= total are padded with 0.
    """
    t = jnp.arange(out_size, dtype=jnp.int64)
    i = jnp.searchsorted(ccum, t, side="right", method="sort").astype(jnp.int32)
    i = jnp.minimum(i, ccum.shape[0] - 1)
    prev = jnp.where(i > 0, ccum[jnp.maximum(i - 1, 0)], 0)
    j = (t - prev).astype(jnp.int32)
    valid = t < total
    bpos = perm[jnp.where(valid, lo[i] + j, 0)]
    build_pos = jnp.where(valid, bpos, 0).astype(jnp.int32)
    probe_pos = jnp.where(valid, i, 0).astype(jnp.int32)
    return build_pos, probe_pos
