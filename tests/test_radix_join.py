"""Pallas radix join vs NumPy oracle (interpret mode on CPU; the same
kernel compiles via Mosaic on a real chip)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sigmod2018_tpu.ops.radix_join import (
    MAX_BUCKET,
    bucket_slot_hint,
    radix_join_checksum,
)

_MASK64 = (1 << 64) - 1


def _oracle(bk, bv, pk, pv):
    order = np.argsort(bk, kind="stable")
    sk, eqs = bk[order], [v[order] for v in bv]
    lo = np.searchsorted(sk, pk, "left")
    hi = np.searchsorted(sk, pk, "right")
    cnt = (hi - lo).astype(np.uint64)
    total = int(cnt.sum(dtype=np.uint64))
    sums_b = []
    for v in eqs:
        pref = np.concatenate([[np.uint64(0)], np.cumsum(v, dtype=np.uint64)])
        sums_b.append(int(np.sum(pref[hi] - pref[lo], dtype=np.uint64)) & _MASK64)
    sums_p = [int(np.sum(cnt * v, dtype=np.uint64)) & _MASK64 for v in pv]
    return total, sums_b, sums_p


def _run(bk, bv, pk, pv, bits=4):
    P = 1024
    def pad(a):
        out = np.zeros(P, dtype=np.uint64)
        out[: a.size] = a
        return jnp.asarray(out)

    count, sums_b, sums_p = radix_join_checksum(
        pad(bk), jnp.stack([pad(v) for v in bv]) if bv else jnp.zeros((0, P), jnp.uint64),
        bk.size,
        pad(pk), jnp.stack([pad(v) for v in pv]) if pv else jnp.zeros((0, P), jnp.uint64),
        pk.size,
        bits=bits, interpret=True,
    )
    return (int(count), [int(s) & _MASK64 for s in np.asarray(sums_b)],
            [int(s) & _MASK64 for s in np.asarray(sums_p)])


@pytest.mark.parametrize("seed,nb,npr,keyspace", [
    (0, 500, 800, 50),
    (1, 100, 1000, 10000),
    (2, 3, 5, 2),
    (3, 700, 700, 1),     # single key, all-pairs
])
def test_radix_matches_oracle(seed, nb, npr, keyspace):
    rng = np.random.default_rng(seed)
    bk = rng.integers(0, keyspace, nb, dtype=np.uint64)
    bv = [rng.integers(0, 1 << 40, nb, dtype=np.uint64) for _ in range(2)]
    pk = rng.integers(0, keyspace, npr, dtype=np.uint64)
    pv = [rng.integers(0, 1 << 40, npr, dtype=np.uint64)]
    got = _run(bk, bv, pk, pv)
    want = _oracle(bk, bv, pk, pv)
    assert got == want


def test_radix_extreme_key_values():
    top = np.uint64(_MASK64)
    bk = np.array([0, top, top, 5], dtype=np.uint64)
    bv = [np.array([1, 2, 3, 4], dtype=np.uint64)]
    pk = np.array([top, 5, 0, 7], dtype=np.uint64)
    pv = [np.array([10, 20, 30, 40], dtype=np.uint64)]
    assert _run(bk, bv, pk, pv) == _oracle(bk, bv, pk, pv)


def test_radix_empty_sides():
    bk = np.empty(0, dtype=np.uint64)
    pk = np.array([1, 2], dtype=np.uint64)
    got = _run(bk, [], pk, [np.array([7, 8], dtype=np.uint64)])
    assert got[0] == 0 and got[2] == [0]


def test_slot_hint():
    keys = jnp.asarray(np.array([0, 16, 32, 1], dtype=np.uint64))
    # with bits=4 keys 0,16,32 share bucket 0
    assert int(bucket_slot_hint(keys, jnp.int32(4), 4)) == 3


def test_bucket_overflow_rejected():
    keys = jnp.zeros(MAX_BUCKET * 2, dtype=jnp.uint64)
    vals = jnp.zeros((0, MAX_BUCKET * 2), jnp.uint64)
    with pytest.raises(ValueError, match="bucket overflow"):
        radix_join_checksum(keys, vals, MAX_BUCKET * 2, keys, vals,
                            MAX_BUCKET * 2, bits=0, interpret=True)
