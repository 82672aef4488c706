"""Device-operator unit tests vs NumPy, on padded static shapes."""

import jax.numpy as jnp
import numpy as np

from sigmod2018_tpu import ops
from sigmod2018_tpu.utils.padding import pad_to, size_class


def test_compare_and_positions():
    vals = np.array([5, 1, 9, 3, 7], dtype=np.uint64)
    padded = jnp.asarray(pad_to(vals, 128))
    mask = ops.compare_mask(padded, jnp.int32(5), ">", jnp.uint64(4))
    pos, cnt = ops.mask_positions(mask, out_size=128)
    assert int(cnt) == 3
    np.testing.assert_array_equal(np.asarray(pos)[:3], [0, 2, 4])


def test_padding_not_selected():
    vals = np.array([5, 1], dtype=np.uint64)
    padded = jnp.asarray(pad_to(vals, 128))  # pad fill is 0
    mask = ops.compare_mask(padded, jnp.int32(2), "<", jnp.uint64(100))
    _, cnt = ops.mask_positions(mask, out_size=128)
    assert int(cnt) == 2  # zeros in the padding are masked out


def test_checksum_wraps():
    col = jnp.asarray(pad_to(np.array([2**63, 2**63, 7], dtype=np.uint64), 128))
    rowids = jnp.asarray(pad_to(np.array([0, 1, 2], dtype=np.int32), 128))
    s = ops.checksum(col, rowids, jnp.int32(3))
    assert int(s) == 7


def _run_join(keys_l, keys_r):
    """Full two-phase join; returns set of (l_idx, r_idx) matches."""
    nl, nr = len(keys_l), len(keys_r)
    kl = jnp.asarray(pad_to(np.asarray(keys_l, dtype=np.uint64), size_class(nl)))
    kr = jnp.asarray(pad_to(np.asarray(keys_r, dtype=np.uint64), size_class(nr)))
    build_left = nl <= nr
    kb, nb, kp, np_ = (kl, nl, kr, nr) if build_left else (kr, nr, kl, nl)
    skeys, perm = ops.join_build(kb, jnp.int32(nb))
    lo, cnt, ccum, total = ops.join_probe_count(skeys, jnp.int32(nb), kp, jnp.int32(np_))
    t = int(total)
    if t == 0:
        return set()
    bpos, ppos = ops.join_emit(perm, lo, ccum, total, out_size=size_class(t))
    bpos, ppos = np.asarray(bpos)[:t], np.asarray(ppos)[:t]
    return set(zip(bpos, ppos)) if build_left else set(zip(ppos, bpos))


def test_join_basic():
    got = _run_join([1, 2, 3], [3, 4, 1, 1])
    assert got == {(0, 2), (0, 3), (2, 0)}


def test_join_many_to_many():
    got = _run_join([7, 7], [7, 7, 7])
    assert got == {(i, j) for i in range(2) for j in range(3)}


def test_join_empty():
    assert _run_join([1, 2], [3, 4]) == set()


def test_join_max_key_vs_padding_sentinel():
    # a real key equal to 2^64-1 must still join; padding must not
    m = 2**64 - 1
    got = _run_join([m, 5], [m, m])
    assert got == {(0, 0), (0, 1)}


def test_join_matches_numpy_random():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 50, size=1000).astype(np.uint64)
    b = rng.integers(0, 50, size=700).astype(np.uint64)
    got = _run_join(a, b)
    expect = {(i, j) for i in range(len(a)) for j in range(len(b)) if a[i] == b[j]}
    assert got == expect


def test_cartesian_indices():
    i1, i2 = ops.cartesian_indices(jnp.int64(3), jnp.int64(2), out_size=8)
    pairs = list(zip(np.asarray(i1)[:6], np.asarray(i2)[:6]))
    assert pairs == [(0, 0), (0, 1), (1, 0), (1, 1), (2, 0), (2, 1)]
