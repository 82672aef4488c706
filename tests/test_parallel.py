"""Multi-chip SPMD tests on the 8-device virtual CPU mesh (conftest.py).

These run unmodified on a real TPU slice; here they validate the shuffle
and the distributed join against a NumPy oracle (SURVEY §4 implication (c)).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sigmod2018_tpu.parallel import (
    make_dist_checksum,
    make_dist_join_checksum,
    make_exchange_counts,
    make_mesh,
    row_sharding,
)

N_DEV = 8
_MASK64 = (1 << 64) - 1


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < N_DEV:
        pytest.skip(f"need {N_DEV} devices")
    return make_mesh(N_DEV)


def _put(mesh, arr):
    return jax.device_put(jnp.asarray(arr), row_sharding(mesh))


def test_dist_checksum_matches_numpy(mesh):
    rng = np.random.default_rng(0)
    col = rng.integers(0, 1 << 63, size=1024, dtype=np.uint64)
    f = make_dist_checksum(mesh)
    got = int(f(_put(mesh, col)))
    want = int(np.add.reduce(col, dtype=np.uint64)) & _MASK64
    assert got == want


def test_exchange_counts_exact(mesh):
    rng = np.random.default_rng(1)
    keys = rng.integers(0, 1000, size=512, dtype=np.uint64)
    f = make_exchange_counts(mesh)
    got = int(f(_put(mesh, keys)))
    # oracle: per (source shard, destination) histogram
    shards = keys.reshape(N_DEV, -1)
    want = max(
        int(np.sum(shard % N_DEV == d))
        for shard in shards
        for d in range(N_DEV)
    )
    assert got == want


def _oracle_join_checksum(r_key, r_val, s_key, s_val, const):
    live = r_val > const
    rk, rv = r_key[live], r_val[live]
    order = np.argsort(rk, kind="stable")
    srk, srv = rk[order], rv[order]
    lo = np.searchsorted(srk, s_key, side="left")
    hi = np.searchsorted(srk, s_key, side="right")
    cnt = (hi - lo).astype(np.uint64)
    pref = np.concatenate([[np.uint64(0)], np.cumsum(srv, dtype=np.uint64)])
    total = int(cnt.sum(dtype=np.uint64))
    sum_b = int(np.sum(pref[hi] - pref[lo], dtype=np.uint64)) & _MASK64
    sum_p = int(np.sum(cnt * s_val.astype(np.uint64), dtype=np.uint64)) & _MASK64
    return total, sum_b, sum_p


@pytest.mark.parametrize("seed,nr,ns,keyspace", [
    (2, 512, 1024, 64),     # many duplicates
    (3, 1024, 512, 100000), # mostly unique
    (4, 256, 256, 1),       # single hot key (extreme skew)
])
def test_dist_join_checksum_matches_oracle(mesh, seed, nr, ns, keyspace):
    rng = np.random.default_rng(seed)
    r_key = rng.integers(0, keyspace, size=nr, dtype=np.uint64)
    r_val = rng.integers(0, 1 << 40, size=nr, dtype=np.uint64)
    s_key = rng.integers(0, keyspace, size=ns, dtype=np.uint64)
    s_val = rng.integers(0, 1 << 40, size=ns, dtype=np.uint64)
    const = np.uint64(1 << 39)

    cap = max(nr, ns) // N_DEV * 4  # generous for the skewed case
    cap = max(cap, nr, ns) if keyspace == 1 else cap
    f = make_dist_join_checksum(mesh, cap=cap)
    total, sum_b, sum_p = f(
        _put(mesh, r_key), _put(mesh, r_val),
        _put(mesh, s_key), _put(mesh, s_val),
        jnp.uint64(const),
    )
    w_total, w_sum_b, w_sum_p = _oracle_join_checksum(r_key, r_val, s_key, s_val, const)
    assert int(total) == w_total
    assert int(sum_b) & _MASK64 == w_sum_b
    assert int(sum_p) & _MASK64 == w_sum_p


def test_pad_key_value_joins_correctly(mesh):
    """2^64-1 is the padding sentinel; a real key with that value must
    still join (the live-prefix clamp keeps exactly the valid copies)."""
    top = np.uint64(_MASK64)
    r_key = np.array([top, 1, 2, top] * 2 * N_DEV, dtype=np.uint64)
    r_val = np.arange(r_key.size, dtype=np.uint64)
    s_key = np.array([top, 3, 1, top] * 2 * N_DEV, dtype=np.uint64)
    s_val = np.arange(s_key.size, dtype=np.uint64)
    const = np.uint64(0)  # keeps all but r_val==0 rows

    f = make_dist_join_checksum(mesh, cap=r_key.size)
    total, sum_b, sum_p = f(
        _put(mesh, r_key), _put(mesh, r_val),
        _put(mesh, s_key), _put(mesh, s_val),
        jnp.uint64(const),
    )
    w = _oracle_join_checksum(r_key, r_val, s_key, s_val, const)
    assert (int(total), int(sum_b) & _MASK64, int(sum_p) & _MASK64) == w
