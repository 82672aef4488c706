"""Pallas radix join v2 vs NumPy oracle.

`force_pallas=True` runs the REAL kernel pipeline (variadic rotated-key
sort -> aligned slot-fill DMA -> streaming dual-count probe) under Pallas
TPU interpret mode on CPU, so the kernel logic itself is covered in CI;
the same code compiles via Mosaic on a real chip (validated on hardware,
see STATUS.md).  Reference semantics: rhjoin.c:13-217, preprocess.c.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from jax.experimental.pallas import tpu as pltpu

from sigmod2018_tpu.ops.radix_join import (
    MAX_SLOTS,
    choose_bits,
    radix_fused_static,
    radix_join_checksum,
    static_radix_plan,
)

_MASK64 = (1 << 64) - 1
ALIGN_PAD = 1024


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


def _run(bk, bv, pk, pv, bits=4, pad_to=4096):
    def pad(a):
        out = np.zeros(pad_to, dtype=np.uint64)
        out[: a.size] = a
        return jnp.asarray(out)

    count, sums_b, sums_p = radix_join_checksum(
        pad(bk),
        jnp.stack([pad(v) for v in bv]) if bv
        else jnp.zeros((0, pad_to), jnp.uint64),
        bk.size,
        pad(pk),
        jnp.stack([pad(v) for v in pv]) if pv
        else jnp.zeros((0, pad_to), jnp.uint64),
        pk.size,
        bits=bits, interpret=True, force_pallas=True,
    )
    return (int(count), [int(s) & _MASK64 for s in np.asarray(sums_b)],
            [int(s) & _MASK64 for s in np.asarray(sums_p)])


@pytest.mark.parametrize("seed,nb,npr,keyspace", [
    (0, 500, 800, 50),
    (1, 100, 1000, 10000),
    (2, 3, 5, 2),
    (3, 700, 700, 1),     # single key, all-pairs (fits MAX_SLOTS)
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


def test_radix_wider_fanout():
    # bits=6 exercises multi-lane-group handling and bucket windows that
    # straddle ALIGN boundaries (4K rows over 64 buckets).
    rng = np.random.default_rng(7)
    bk = rng.integers(0, 900, 4000, dtype=np.uint64)
    bv = [rng.integers(0, 1 << 40, 4000, dtype=np.uint64)]
    pk = rng.integers(0, 900, 4000, dtype=np.uint64)
    pv = [rng.integers(0, 1 << 40, 4000, dtype=np.uint64)]
    assert _run(bk, bv, pk, pv, bits=6) == _oracle(bk, bv, pk, pv)


def test_radix_empty_sides():
    bk = np.empty(0, dtype=np.uint64)
    pk = np.array([1, 2], dtype=np.uint64)
    got = _run(bk, [], pk, [np.array([7, 8], dtype=np.uint64)])
    assert got[0] == 0 and got[2] == [0]


def test_choose_bits_monotone():
    assert choose_bits(1 << 10, 1 << 10) <= choose_bits(1 << 24, 1 << 24)
    assert 6 <= choose_bits(100, 100) <= 14
    assert 6 <= choose_bits(1 << 26, 1 << 26) <= 14


def test_bucket_overflow_rejected():
    n = MAX_SLOTS + ALIGN_PAD
    keys = jnp.zeros(n, dtype=jnp.uint64)  # one key, multiplicity > cap
    vals = jnp.zeros((0, n), jnp.uint64)
    with pytest.raises(ValueError, match="bucket overflow"):
        radix_join_checksum(keys, vals, n, keys, vals, n,
                            bits=4, interpret=True, force_pallas=True)


# ---------------------------------------------------------------------------
# Sync-free static path (radix_fused_static): the engine's at-scale member.
# The occupancy check runs ON DEVICE and picks between the Pallas radix
# branch and the sorted-merge branch of a lax.cond — both covered here.
# ---------------------------------------------------------------------------


def _run_static(bk, bv, pk, pv, pad_to=4096, limbs=2):
    def pad(a):
        out = np.zeros(pad_to, dtype=np.uint64)
        out[: a.size] = a
        return jnp.asarray(out)

    def padv(vs):
        return (jnp.stack([pad(v) for v in vs]) if vs
                else jnp.zeros((0, pad_to), jnp.uint64))

    bits, SPb, SPp = static_radix_plan(pad_to, pad_to)
    with pltpu.force_tpu_interpret_mode():
        count, sums_b, sums_p = radix_fused_static(
            pad(bk), padv(bv), bk.size, pad(pk), padv(pv), pk.size,
            bits=bits, SPb=SPb, SPp=SPp, limbs=limbs)
    return (int(count), [int(s) & _MASK64 for s in np.asarray(sums_b)],
            [int(s) & _MASK64 for s in np.asarray(sums_p)])


@pytest.mark.parametrize("limbs", [1, 2])
def test_static_radix_branch_matches_oracle(limbs):
    # Uniform keys: occupancy under the static slot margin -> the Pallas
    # radix branch executes.  keyspace < 2^32 keeps limbs=1 legal.
    rng = np.random.default_rng(11)
    bk = rng.integers(0, 400, 3000, dtype=np.uint64)
    bv = [rng.integers(0, 1 << 40, 3000, dtype=np.uint64)]
    pk = rng.integers(0, 400, 3500, dtype=np.uint64)
    pv = [rng.integers(0, 1 << 40, 3500, dtype=np.uint64)]
    assert _run_static(bk, bv, pk, pv, limbs=limbs) == _oracle(bk, bv, pk, pv)


def test_static_overflow_takes_merge_branch():
    # One hot key with multiplicity past the slot margin: the on-device
    # cond must route through the sorted-merge branch, still bit-exact.
    rng = np.random.default_rng(12)
    bk = np.full(3000, 7, dtype=np.uint64)
    bv = [rng.integers(0, 1 << 40, 3000, dtype=np.uint64)]
    pk = np.concatenate([np.full(100, 7, np.uint64),
                         rng.integers(0, 50, 400, np.uint64)])
    pv = [rng.integers(0, 1 << 40, 500, dtype=np.uint64)]
    assert _run_static(bk, bv, pk, pv) == _oracle(bk, bv, pk, pv)


def test_static_plan_properties():
    for P in (1 << 12, 1 << 20, 1 << 24):
        bits, SPb, SPp = static_radix_plan(P, P)
        assert 6 <= bits <= 14
        assert SPb % ALIGN_PAD == 0 and SPp % ALIGN_PAD == 0
        # margin: 2x the expected occupancy fits the slots
        assert SPb - ALIGN_PAD >= min(2 * (P >> bits), MAX_SLOTS)


def test_fused_join_auto_off_tpu_is_sort():
    # On the CPU backend the auto path must produce the sort member's
    # exact results (the radix member is TPU/interpret-only).
    from sigmod2018_tpu.ops import fused_join_auto

    rng = np.random.default_rng(13)
    bk = rng.integers(0, 100, 500, dtype=np.uint64)
    bv = [rng.integers(0, 1 << 40, 500, dtype=np.uint64)]
    pk = rng.integers(0, 100, 700, dtype=np.uint64)
    pv = [rng.integers(0, 1 << 40, 700, dtype=np.uint64)]

    def pad(a, n=1024):
        out = np.zeros(n, dtype=np.uint64)
        out[: a.size] = a
        return jnp.asarray(out)

    count, sums_b, sums_p = fused_join_auto(
        pad(bk), jnp.stack([pad(v) for v in bv]), 500,
        pad(pk), jnp.stack([pad(v) for v in pv]), 700)
    got = (int(count), [int(s) & _MASK64 for s in np.asarray(sums_b)],
           [int(s) & _MASK64 for s in np.asarray(sums_p)])
    assert got == _oracle(bk, bv, pk, pv)


def test_static_radix_prep_artifacts_match_unprepped():
    """radix_fused_static with prep-time artifacts (radix_prep_keys +
    pre-sorted value stacks) must be bit-identical to the in-program
    _prep_side path — both sides prepped, one side prepped, none."""
    from sigmod2018_tpu.ops.radix_join import radix_prep_keys

    rng = np.random.default_rng(21)
    pad_to = 4096
    bk = rng.integers(0, 500, 3000, dtype=np.uint64)
    bv = [rng.integers(0, 1 << 40, 3000, dtype=np.uint64)]
    pk = rng.integers(0, 500, 3200, dtype=np.uint64)
    pv = [rng.integers(0, 1 << 40, 3200, dtype=np.uint64)]

    def pad(a):
        out = np.zeros(pad_to, dtype=np.uint64)
        out[: a.size] = a
        return jnp.asarray(out)

    bits, SPb, SPp = static_radix_plan(pad_to, pad_to)
    kb, vb = pad(bk), jnp.stack([pad(v) for v in bv])
    kp, vp = pad(pk), jnp.stack([pad(v) for v in pv])

    def prep(keys, vals, n):
        krot_s, perm, st, ct, mo = radix_prep_keys(keys, jnp.int32(n), bits)
        return (krot_s, st, ct, mo), jnp.take(vals, perm, axis=1)

    pre_b, vb_s = prep(kb, vb, bk.size)
    pre_p, vp_s = prep(kp, vp, pk.size)

    with pltpu.force_tpu_interpret_mode():
        want = radix_fused_static(kb, vb, bk.size, kp, vp, pk.size,
                                  bits=bits, SPb=SPb, SPp=SPp, limbs=2)
        both = radix_fused_static(kb, vb_s, bk.size, kp, vp_s, pk.size,
                                  bits=bits, SPb=SPb, SPp=SPp, limbs=2,
                                  prep_b=pre_b, prep_p=pre_p)
        build_only = radix_fused_static(kb, vb_s, bk.size, kp, vp, pk.size,
                                        bits=bits, SPb=SPb, SPp=SPp,
                                        limbs=2, prep_b=pre_b)
    for got in (both, build_only):
        for g, w in zip(got, want):
            assert np.array_equal(np.asarray(g), np.asarray(w))


def test_engine_uses_radix_artifacts_bit_exact(tmp_path, monkeypatch):
    """CompiledEngine end-to-end with prep radix artifacts: key tables
    gated off + radix threshold lowered, forced radix member (interpret
    mode on CPU) — artifacts must be built, threaded, and bit-exact."""
    import sigmod2018_tpu.ops.radix_join as rj
    from sigmod2018_tpu.config import EngineConfig
    from sigmod2018_tpu.engine.compiled import CompiledEngine
    from sigmod2018_tpu.engine.oracle import execute_query_numpy
    from sigmod2018_tpu.frontend.parser import parse_query
    from sigmod2018_tpu.storage.catalog import Catalog
    from sigmod2018_tpu.storage.relation import Relation, store_relation

    monkeypatch.setattr(rj, "RADIX_MIN_ROWS", 512)
    monkeypatch.setenv("S18_PREP_CACHE", str(tmp_path / "prep"))
    rng = np.random.default_rng(23)
    paths = []
    for i, n in enumerate((900, 700)):
        cols = [rng.integers(0, 300, size=n).astype(np.uint64)
                for _ in range(3)]
        p = tmp_path / f"r{i}"
        store_relation(Relation(columns=cols), str(p))
        paths.append(str(p))
    cat = Catalog.from_files(paths)
    eng = CompiledEngine(cat, EngineConfig(join_algo="radix",
                                           key_table_max=0))
    eng.prefetch()
    assert eng.device_radix_keys(0, 0) is not None, \
        "prep must build radix artifacts under the lowered threshold"
    q = parse_query("0 1|0.0=1.0|0.1 1.2")
    assert eng.execute(q) == execute_query_numpy(q, cat)
