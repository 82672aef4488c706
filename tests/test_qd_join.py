"""Equi-depth (quantile) partition join vs the NumPy oracle.

Runs the REAL kernel pipeline (plain sort -> reshape+halo build
matrices -> probe slot-fill -> shared streaming dual-count kernel)
under Pallas TPU interpret mode on CPU; the same code compiles via
Mosaic on a real chip.  Covers the halo-straddling runs, the on-device
merge fallback (multiplicity > H, probe overflow, 2^64-1 live keys),
both limb widths, and plan sizing.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from jax.experimental.pallas import tpu as pltpu

from sigmod2018_tpu.ops.qd_join import qd_fused_static, qd_static_plan

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
        sums_b.append(int(np.sum(pref[hi] - pref[lo], dtype=np.uint64))
                      & _MASK64)
    sums_p = [int(np.sum(cnt * v, dtype=np.uint64)) & _MASK64 for v in pv]
    return total, sums_b, sums_p


def _run(bk, bv, pk, pv, pad_b=4096, pad_p=4096, SPb=16, H=8, limbs=2):
    def pad(a, n):
        out = np.zeros(n, dtype=np.uint64)
        out[: a.size] = a
        return jnp.asarray(out)

    def padv(vs, n):
        return (jnp.stack([pad(v, n) for v in vs]) if vs
                else jnp.zeros((0, n), jnp.uint64))

    SPb, H, SPp = qd_static_plan(pad_b, pad_p, SPb=SPb, H=H)
    with pltpu.force_tpu_interpret_mode():
        count, sums_b, sums_p = qd_fused_static(
            pad(bk, pad_b), padv(bv, pad_b), bk.size,
            pad(pk, pad_p), padv(pv, pad_p), pk.size,
            SPb=SPb, H=H, SPp=SPp, limbs=limbs)
    return (int(count), [int(s) & _MASK64 for s in np.asarray(sums_b)],
            [int(s) & _MASK64 for s in np.asarray(sums_p)])


@pytest.mark.parametrize("seed,nb,npr,keyspace,limbs", [
    (0, 3000, 3500, 400, 2),     # uniform, multiplicities ~8 < H
    (1, 3000, 3500, 400, 1),     # single-limb fast path
    (2, 100, 3800, 40, 2),       # tiny build: quantile-dense buckets
    (3, 3800, 100, 5000, 2),     # tiny probe: mostly-empty windows
    (4, 2000, 2000, 1 << 36, 2), # huge domain (the bigdom regime)
])
def test_qd_matches_oracle(seed, nb, npr, keyspace, limbs):
    rng = np.random.default_rng(seed)
    bk = rng.integers(0, keyspace, nb, dtype=np.uint64)
    bv = [rng.integers(0, 1 << 40, nb, dtype=np.uint64) for _ in range(2)]
    pk = rng.integers(0, keyspace, npr, dtype=np.uint64)
    pv = [rng.integers(0, 1 << 40, npr, dtype=np.uint64)]
    assert _run(bk, bv, pk, pv, limbs=limbs) == _oracle(bk, bv, pk, pv)


def test_qd_boundary_straddling_runs():
    # Multiplicities just under H placed so runs straddle the SPb=16
    # bucket edges: the halo path must catch every cross-edge match.
    rng = np.random.default_rng(7)
    bk = np.repeat(rng.permutation(600).astype(np.uint64), 7)[:4000]
    bv = [rng.integers(0, 1 << 40, bk.size, dtype=np.uint64)]
    pk = rng.permutation(np.repeat(np.arange(600, dtype=np.uint64), 6))
    pv = [rng.integers(0, 1 << 40, pk.size, dtype=np.uint64)]
    assert _run(bk, bv, pk, pv) == _oracle(bk, bv, pk, pv)


def test_qd_multiplicity_overflow_takes_merge_branch():
    # One hot key with multiplicity >> H: the cond must route through
    # the sorted-merge branch, still bit-exact.
    rng = np.random.default_rng(8)
    bk = np.concatenate([np.full(900, 7, np.uint64),
                         rng.integers(100, 400, 2000, dtype=np.uint64)])
    bv = [rng.integers(0, 1 << 40, bk.size, dtype=np.uint64)]
    pk = rng.integers(0, 400, 1500, dtype=np.uint64)
    pv = [rng.integers(0, 1 << 40, pk.size, dtype=np.uint64)]
    assert _run(bk, bv, pk, pv) == _oracle(bk, bv, pk, pv)


def test_qd_probe_skew_overflow_takes_merge_branch():
    # Probe rows concentrated on one build bucket beyond SPp.
    rng = np.random.default_rng(9)
    bk = np.arange(3000, dtype=np.uint64)
    bv = [rng.integers(0, 1 << 40, 3000, dtype=np.uint64)]
    pk = np.full(3900, 5, np.uint64)  # all probes -> bucket 0
    pv = [rng.integers(0, 1 << 40, 3900, dtype=np.uint64)]
    assert _run(bk, bv, pk, pv) == _oracle(bk, bv, pk, pv)


def test_qd_extreme_key_values():
    top = np.uint64(_MASK64)
    bk = np.array([0, top, top, 5], dtype=np.uint64)
    bv = [np.array([1, 2, 3, 4], dtype=np.uint64)]
    pk = np.array([top, 5, 0, 7], dtype=np.uint64)
    pv = [np.array([10, 20, 30, 40], dtype=np.uint64)]
    # live 2^64-1 keys alias the dead sentinel: merge branch, bit-exact.
    assert _run(bk, bv, pk, pv) == _oracle(bk, bv, pk, pv)


def test_qd_empty_sides():
    bk = np.empty(0, dtype=np.uint64)
    pk = np.array([1, 2], dtype=np.uint64)
    got = _run(bk, [], pk, [np.array([7, 8], np.uint64)])
    assert got[0] == 0 and got[2] == [0]
    got = _run(pk, [np.array([7, 8], np.uint64)], bk, [])
    assert got[0] == 0 and got[1] == [0]


def test_engine_forced_qd_bit_exact(tmp_path, monkeypatch):
    """CompiledEngine end-to-end with S18_JOIN=qd (interpret mode on
    CPU): the fused final join runs through the equi-depth member."""
    from sigmod2018_tpu.config import EngineConfig
    from sigmod2018_tpu.engine.compiled import CompiledEngine
    from sigmod2018_tpu.engine.oracle import execute_query_numpy
    from sigmod2018_tpu.frontend.parser import parse_query
    from sigmod2018_tpu.storage.catalog import Catalog
    from sigmod2018_tpu.storage.relation import Relation, store_relation

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
    eng = CompiledEngine(cat, EngineConfig(join_algo="qd",
                                           key_table_max=0))
    eng.prefetch()
    for text in ("0 1|0.0=1.0|0.1 1.2", "0 1|0.0=1.0&0.1>100|1.1"):
        q = parse_query(text)
        assert eng.execute(q) == execute_query_numpy(q, cat)


def test_qd_plan_properties():
    for P in (1 << 12, 1 << 20, 1 << 24):
        SPb, H, SPp = qd_static_plan(P, P)
        assert P % SPb == 0
        assert H <= SPb
        assert (SPb + H) % 16 == 0
        assert SPp % 1024 == 0
        assert SPp - 1024 >= min(2 * (P // (P // SPb)), 1 << 13)


def test_qd_plan_vmem_guard():
    """The qd member's [SPp, B] probe-slot matrix is a single-buffered
    VMEM window; past ~2^24 probe rows the backend compile failed with
    'Allocation would exceed memory' (observed at 2^25 on the real
    chip).  The plan must fail loudly at trace time instead."""
    import pytest as _pytest

    from sigmod2018_tpu.ops.qd_join import qd_static_plan

    qd_static_plan(1 << 23, 1 << 23)  # fits
    with _pytest.raises(ValueError, match="staircase"):
        qd_static_plan(1 << 25, 1 << 25)
