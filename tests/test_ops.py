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


# ---- key32 single-limb + presorted fast paths (round 2) ----------------


def _run_join32(keys_l, keys_r):
    """_run_join with the key32 single-limb path forced on."""
    nl, nr = len(keys_l), len(keys_r)
    kl = jnp.asarray(pad_to(np.asarray(keys_l, dtype=np.uint64), size_class(nl)))
    kr = jnp.asarray(pad_to(np.asarray(keys_r, dtype=np.uint64), size_class(nr)))
    build_left = nl <= nr
    kb, nb, kp, np_ = (kl, nl, kr, nr) if build_left else (kr, nr, kl, nl)
    skeys, perm = ops.join_build(kb, jnp.int32(nb), key32=True)
    assert skeys.dtype == jnp.uint32
    lo, cnt, ccum, total = ops.join_probe_count(
        skeys, jnp.int32(nb), kp, jnp.int32(np_))
    t = int(total)
    if t == 0:
        return set()
    bpos, ppos = ops.join_emit(perm, lo, ccum, total, out_size=size_class(t))
    bpos, ppos = np.asarray(bpos)[:t], np.asarray(ppos)[:t]
    return set(zip(bpos, ppos)) if build_left else set(zip(ppos, bpos))


def test_join32_matches_u64_random():
    rng = np.random.default_rng(7)
    a = rng.integers(0, 60, size=900).astype(np.uint64)
    b = rng.integers(0, 60, size=500).astype(np.uint64)
    assert _run_join32(a, b) == _run_join(a, b)


def test_join32_max_u32_key_vs_padding_sentinel():
    # a real key equal to 2^32-1 collides with the u32 padding sentinel
    # AND its k+1 right-edge probe wraps — both must stay exact
    m = 2**32 - 1
    got = _run_join32([m, 5], [m, m, 5])
    assert got == {(0, 0), (0, 1), (1, 2)}


def test_probe_count_max_u64_key_right_edge():
    # combined lo/hi searchsorted: k+1 wraps at dtype max; the right
    # edge must be pinned to n_build, including duplicate max-key runs
    m = 2**64 - 1
    got = _run_join([m, m, 3], [m, 9])
    assert got == {(0, 0), (1, 0)}


def test_fused_presorted_matches_fresh():
    rng = np.random.default_rng(3)
    nb, npr = 700, 1100
    kb = rng.integers(0, 40, size=nb).astype(np.uint64)
    kp = rng.integers(0, 40, size=npr).astype(np.uint64)
    vb = rng.integers(0, 2**63, size=nb).astype(np.uint64)
    vp = rng.integers(0, 2**63, size=npr).astype(np.uint64)
    Pb, Pp = size_class(nb), size_class(npr)
    kbd = jnp.asarray(pad_to(kb, Pb))
    kpd = jnp.asarray(pad_to(kp, Pp))
    vbd = jnp.asarray(pad_to(vb, Pb))[None, :]
    vpd = jnp.asarray(pad_to(vp, Pp))[None, :]
    for key32 in (False, True):
        c1, sb1, sp1 = ops.join_checksum_fused(
            kbd, vbd, jnp.int32(nb), kpd, vpd, jnp.int32(npr), key32=key32)
        sk, perm = ops.join_build(kbd, jnp.int32(nb))  # prep-time u64 sort
        c2, sb2, sp2 = ops.join_checksum_fused_presorted(
            sk, perm, vbd, jnp.int32(nb), kpd, vpd, jnp.int32(npr),
            key32=key32)
        assert int(c1) == int(c2)
        np.testing.assert_array_equal(np.asarray(sb1), np.asarray(sb2))
        np.testing.assert_array_equal(np.asarray(sp1), np.asarray(sp2))
    # and against NumPy ground truth
    cnt = sum(int(np.sum(kb == k)) for k in kp)
    assert int(c1) == cnt
    sb = sum(int(np.sum(vb[kb == k], dtype=np.uint64)) for k in kp) % 2**64
    sp = sum(int(np.sum(kb == k)) * int(v) for k, v in zip(kp, vp)) % 2**64
    assert int(sb1[0]) == sb
    assert int(sp1[0]) == sp


# ---- prep-time key tables (round 2) -------------------------------------


def _key_table(keys):
    """Host build of cumcnt, mirroring engine.device_key_table."""
    u = int(max(keys)) if len(keys) else 0
    bc = np.bincount(np.asarray(keys, dtype=np.int64), minlength=u + 1)
    cumcnt = np.zeros(u + 3, dtype=np.int32)
    cumcnt[1:u + 2] = np.cumsum(bc)
    cumcnt[u + 2] = cumcnt[u + 1]
    return jnp.asarray(cumcnt)


def _run_join_table(keys_b, keys_p):
    """Table-build join (build = keys_b side), returns (b, p) match set."""
    nb, npr = len(keys_b), len(keys_p)
    kb = jnp.asarray(pad_to(np.asarray(keys_b, dtype=np.uint64), size_class(nb)))
    kp = jnp.asarray(pad_to(np.asarray(keys_p, dtype=np.uint64), size_class(npr)))
    tbl = _key_table(keys_b)
    _, perm = ops.join_build(kb, jnp.int32(nb))  # prep sort
    lo, cnt, ccum, total = ops.join_probe_count_table(tbl, kp, jnp.int32(npr))
    t = int(total)
    if t == 0:
        return set()
    bpos, ppos = ops.join_emit(perm, lo, ccum, total, out_size=size_class(t))
    return set(zip(np.asarray(bpos)[:t], np.asarray(ppos)[:t]))


def test_table_join_matches_sorted_join():
    rng = np.random.default_rng(11)
    a = rng.integers(0, 90, size=800).astype(np.uint64)
    b = rng.integers(0, 130, size=1200).astype(np.uint64)  # probe past domain
    got = _run_join_table(a, b)
    expect = {(i, j) for i in range(len(a)) for j in range(len(b))
              if a[i] == b[j]}
    assert got == expect


def test_table_join_probe_out_of_domain_and_boundary():
    # probe keys above the build max (incl. 2^64-1) must yield empty ranges;
    # the domain max itself must match
    got = _run_join_table([3, 7, 7], [7, 8, 2**64 - 1, 3])
    assert got == {(1, 0), (2, 0), (0, 3)}


def test_fused_table_matches_fresh():
    rng = np.random.default_rng(5)
    nb, npr = 600, 1000
    kb = rng.integers(0, 70, size=nb).astype(np.uint64)
    kp = rng.integers(0, 100, size=npr).astype(np.uint64)
    vb = rng.integers(0, 2**63, size=nb).astype(np.uint64)
    vp = rng.integers(0, 2**63, size=npr).astype(np.uint64)
    Pb, Pp = size_class(nb), size_class(npr)
    kbd = jnp.asarray(pad_to(kb, Pb))
    kpd = jnp.asarray(pad_to(kp, Pp))
    vbd = jnp.asarray(pad_to(vb, Pb))[None, :]
    vpd = jnp.asarray(pad_to(vp, Pp))[None, :]
    c1, sb1, sp1 = ops.join_checksum_fused(
        kbd, vbd, jnp.int32(nb), kpd, vpd, jnp.int32(npr))
    tbl = _key_table(kb)
    _, perm = ops.join_build(kbd, jnp.int32(nb))
    c2, sb2, sp2 = ops.join_checksum_fused_table(
        tbl, perm, vbd, jnp.int32(nb), kpd, vpd, jnp.int32(npr))
    assert int(c1) == int(c2)
    np.testing.assert_array_equal(np.asarray(sb1), np.asarray(sb2))
    np.testing.assert_array_equal(np.asarray(sp1), np.asarray(sp2))


def test_fused_table_pref_matches_fresh():
    """Probe-only member (prep-time prefix tables): bit-identical to the
    fresh-sort fused join, including pad handling and u64 wraparound."""
    rng = np.random.default_rng(6)
    nb, npr = 700, 900
    kb = rng.integers(0, 50, size=nb).astype(np.uint64)
    kp = rng.integers(0, 80, size=npr).astype(np.uint64)  # past domain
    vb = rng.integers(0, 2**63, size=nb).astype(np.uint64)
    vp = rng.integers(0, 2**63, size=npr).astype(np.uint64)
    Pb, Pp = size_class(nb), size_class(npr)
    kbd = jnp.asarray(pad_to(kb, Pb))
    kpd = jnp.asarray(pad_to(kp, Pp))
    vbd = jnp.asarray(pad_to(vb, Pb))[None, :]
    vpd = jnp.asarray(pad_to(vp, Pp))[None, :]
    c1, sb1, sp1 = ops.join_checksum_fused(
        kbd, vbd, jnp.int32(nb), kpd, vpd, jnp.int32(npr))
    tbl = _key_table(kb)
    _, perm = ops.join_build(kbd, jnp.int32(nb))  # prep sort
    pref = ops.prefix_by_perm(vbd[0], perm, jnp.int32(nb))[None, :]
    c2, sb2, sp2 = ops.join_checksum_fused_table_pref(
        tbl, pref, kpd, vpd, jnp.int32(npr))
    assert int(c1) == int(c2)
    np.testing.assert_array_equal(np.asarray(sb1), np.asarray(sb2))
    np.testing.assert_array_equal(np.asarray(sp1), np.asarray(sp2))


def test_join_emit_scatter_matches_bruteforce():
    """The scatter+cummax range expansion in join_emit must reproduce
    the brute-force pair set for arbitrary cnt patterns (empty blocks,
    leading/trailing zeros, out_size > total padding)."""
    rng = np.random.default_rng(21)
    for trial in range(20):
        nb = int(rng.integers(1, 40))
        npr = int(rng.integers(1, 60))
        kb = rng.integers(0, 8, size=nb).astype(np.uint64)
        kp = rng.integers(0, 12, size=npr).astype(np.uint64)
        Pb, Pp = size_class(nb), size_class(npr)
        kbd = jnp.asarray(pad_to(kb, Pb))
        kpd = jnp.asarray(pad_to(kp, Pp))
        sk, perm = ops.join_build(kbd, jnp.int32(nb))
        lo, cnt, ccum, total = ops.join_probe_count(
            sk, jnp.int32(nb), kpd, jnp.int32(npr))
        t = int(total)
        out_size = size_class(max(t, 1))
        bpos, ppos = ops.join_emit(perm, lo, ccum, total, out_size=out_size)
        got = sorted(zip(np.asarray(bpos)[:t].tolist(),
                         np.asarray(ppos)[:t].tolist()))
        expect = sorted((i, j) for i in range(nb) for j in range(npr)
                        if kb[i] == kp[j])
        assert got == expect, trial
        # pad slots must be zero
        assert not np.asarray(bpos)[t:].any()
        assert not np.asarray(ppos)[t:].any()
