"""Factorized (Yannakakis) aggregate execution vs the materializing oracle.

The NumPy twin is differentially tested against execute_query_numpy on
every forest query shape (chains, stars, filters, self-joins, view-only
bindings, disconnected components, empty results, wrap-around values);
the JAX executor is then tested against the twin, including a blowup
case no materializing engine can answer.
"""

import numpy as np
import pytest

from sigmod2018_tpu.engine.factorized import (
    execute_query_factorized_np,
    plan_forest,
)
from sigmod2018_tpu.engine.oracle import execute_query_numpy
from sigmod2018_tpu.frontend.parser import parse_query
from sigmod2018_tpu.storage.catalog import Catalog
from sigmod2018_tpu.storage.relation import Relation


def _catalog(seed=0, nrel=4, rows=(300, 250, 200, 150), keyspace=40):
    rng = np.random.default_rng(seed)
    rels = []
    for i in range(nrel):
        cols = [rng.integers(0, keyspace, size=rows[i]).astype(np.uint64)
                for _ in range(3)]
        rels.append(Relation(columns=cols))
    return Catalog(rels)


FOREST_QUERIES = [
    "0 1|0.0=1.0|0.1 1.2",                         # single join
    "0 1 2|0.0=1.0&1.1=2.1|0.2 2.2",               # chain
    "0 1 2 3|0.0=1.0&0.1=2.1&0.2=3.2|1.1 2.2 3.0", # star
    "0 1 2|0.0=1.0&1.1=2.1&0.1>20|0.2",            # chain + filter
    "0 1|0.0=1.0&1.1=1.2|0.1",                     # self-join mask
    "0 1 2 3|0.0=1.0&2.1=3.1|0.1 2.2",             # two components
    "0 1 2|0.0=1.0|0.1 2.2",                       # view-only binding
    "0 1|0.0=1.0&0.1=39&1.2<2|0.1 1.1",            # selective filters
    "0 0|0.0=1.1|0.2 1.0",                         # same relation twice
    "0 1|0.0=1.0&0.1>999|0.1",                     # empty -> NULL
    "0|0.1<20|0.0 0.2",                            # no joins at all
]


@pytest.mark.parametrize("text", FOREST_QUERIES)
def test_np_twin_matches_oracle(text):
    cat = _catalog()
    q = parse_query(text)
    got = execute_query_factorized_np(q, cat)
    assert got is not None
    assert got == execute_query_numpy(q, cat)


def test_np_twin_randomized_chains():
    rng = np.random.default_rng(7)
    cat = _catalog(seed=3, keyspace=15)  # dense keys: big multiplicities
    for _ in range(40):
        nrel = int(rng.integers(2, 5))
        bindings = rng.integers(0, 4, size=nrel)
        preds = [f"{b-1}.{rng.integers(0,3)}={b}.{rng.integers(0,3)}"
                 for b in range(1, nrel)]
        if rng.random() < 0.7:
            op = rng.choice(["<", ">", "="])
            preds.append(f"{rng.integers(0,nrel)}.{rng.integers(0,3)}"
                         f"{op}{rng.integers(0, 20)}")
        views = " ".join(f"{rng.integers(0,nrel)}.{rng.integers(0,3)}"
                         for _ in range(int(rng.integers(1, 4))))
        text = f"{' '.join(map(str, bindings))}|{'&'.join(preds)}|{views}"
        q = parse_query(text)
        got = execute_query_factorized_np(q, cat)
        assert got == execute_query_numpy(q, cat), text


def test_plan_forest_rejects_cycles_and_multiedges():
    assert plan_forest(parse_query(
        "0 1 2|0.0=1.0&1.1=2.1&2.2=0.2|0.1")) is None  # triangle
    assert plan_forest(parse_query(
        "0 1|0.0=1.0&0.1=1.1|0.1")) is None            # duplicate pair
    assert plan_forest(parse_query(
        "0 1|0.0=1.0|0.1")) is not None


def test_np_twin_wraparound_sums():
    # values near 2^64: sums must wrap exactly like the oracle's uint64.
    top = np.uint64((1 << 64) - 3)
    r0 = Relation(columns=[np.array([1, 1, 2], np.uint64),
                           np.array([top, top, top], np.uint64),
                           np.array([0, 1, 2], np.uint64)])
    r1 = Relation(columns=[np.array([1, 1, 1, 2], np.uint64),
                           np.array([top, 5, 6, 7], np.uint64),
                           np.array([3, 4, 5, 6], np.uint64)])
    cat = Catalog([r0, r1])
    q = parse_query("0 1|0.0=1.0|0.1 1.1")
    assert (execute_query_factorized_np(q, cat)
            == execute_query_numpy(q, cat))


def test_np_twin_blowup_query_exact():
    """A query whose smallest intermediate is ~1.6e9 rows: the
    materializing oracle cannot run it (cap guard fires); the factorized
    twin answers, and the answer equals a closed-form hand computation.

    One hot key h with multiplicity m in all three relations: every join
    result tuple is (i, j, k) over hot rows, so count = m^3 and
    sum(1.1) = m^2 * sum of r1's hot values."""
    from sigmod2018_tpu.engine.oracle import OracleOverflow

    m = 1200
    rng = np.random.default_rng(5)
    vals = [rng.integers(0, 1 << 40, m).astype(np.uint64) for _ in range(3)]
    rels = [Relation(columns=[np.full(m, 7, np.uint64), v,
                              rng.integers(0, 9, m).astype(np.uint64)])
            for v in vals]
    cat = Catalog(rels)
    q = parse_query("0 1 2|0.0=1.0&1.0=2.0|1.1 0.1")
    with pytest.raises(OracleOverflow):
        execute_query_numpy(q, cat, max_rows=1_000_000)
    got = execute_query_factorized_np(q, cat)
    mask = (1 << 64) - 1
    want_11 = (m * m * int(np.add.reduce(vals[1], dtype=np.uint64))) & mask
    want_01 = (m * m * int(np.add.reduce(vals[0], dtype=np.uint64))) & mask
    assert got == f"{want_11} {want_01}"


# ---------------------------------------------------------------------------
# JAX executor vs the NumPy twin
# ---------------------------------------------------------------------------


def _engine(cat):
    from sigmod2018_tpu.config import EngineConfig
    from sigmod2018_tpu.engine.executor import JaxEngine

    return JaxEngine(cat, EngineConfig.from_env())


@pytest.mark.parametrize("text", FOREST_QUERIES)
def test_jax_matches_np_twin(text):
    from sigmod2018_tpu.engine.factorized import factorized_result

    cat = _catalog(seed=1, keyspace=25)
    eng = _engine(cat)
    q = parse_query(text)
    res = factorized_result(eng, q)
    assert res is not None
    assert res.line() == execute_query_factorized_np(q, cat)


def test_jax_blowup_query_exact():
    from sigmod2018_tpu.engine.factorized import factorized_result

    m = 1200
    rng = np.random.default_rng(5)
    vals = [rng.integers(0, 1 << 40, m).astype(np.uint64) for _ in range(3)]
    rels = [Relation(columns=[np.full(m, 7, np.uint64), v,
                              rng.integers(0, 9, m).astype(np.uint64)])
            for v in vals]
    cat = Catalog(rels)
    q = parse_query("0 1 2|0.0=1.0&1.0=2.0|1.1 0.1")
    res = factorized_result(_engine(cat), q)
    assert res.line() == execute_query_factorized_np(q, cat)


def test_jax_null_on_empty():
    from sigmod2018_tpu.engine.factorized import factorized_result

    cat = _catalog(seed=2)
    q = parse_query("0 1|0.0=1.0&0.1>999999|0.1 1.1")
    res = factorized_result(_engine(cat), q)
    assert res.line() == "NULL NULL"


# ---------------------------------------------------------------------------
# Engine retry chain: blowup -> factorized (forest) / text order (cyclic)
# ---------------------------------------------------------------------------


def _hot_catalog(m=800):
    # One hot key everywhere: every join order's intermediate is m^2.
    rng = np.random.default_rng(9)
    rels = [Relation(columns=[np.full(m, 7, np.uint64),
                              rng.integers(0, 1 << 40, m).astype(np.uint64),
                              rng.integers(0, 9, m).astype(np.uint64)])
            for _ in range(3)]
    return Catalog(rels)


@pytest.mark.parametrize("compiled", [True, False])
def test_engine_blowup_routes_to_factorized(compiled, tmp_path, monkeypatch):
    """max_intermediate below every order's intermediate: the engine must
    answer via the factorized path, exactly, instead of materializing or
    crashing.  Covers both the compiled and operator-granular engines."""
    from sigmod2018_tpu.config import EngineConfig
    from sigmod2018_tpu.engine.compiled import CompiledEngine
    from sigmod2018_tpu.engine.executor import JaxEngine

    monkeypatch.setenv("S18_PREP_CACHE", str(tmp_path / "prep"))
    cat = _hot_catalog()
    cfg = EngineConfig(max_intermediate=1000)
    eng = (CompiledEngine if compiled else JaxEngine)(cat, cfg)
    q = parse_query("0 1 2|0.0=1.0&1.0=2.0|1.1 0.1")
    assert eng.execute(q) == execute_query_factorized_np(q, cat)


def test_engine_cyclic_blowup_falls_back_to_text_order(tmp_path,
                                                       monkeypatch):
    from sigmod2018_tpu.config import EngineConfig
    from sigmod2018_tpu.engine.compiled import CompiledEngine

    monkeypatch.setenv("S18_PREP_CACHE", str(tmp_path / "prep"))
    cat = _catalog(seed=4, keyspace=8)  # dense keys: triangle blows 1K cap
    cfg = EngineConfig(max_intermediate=1000)
    eng = CompiledEngine(cat, cfg)
    q = parse_query("0 1 2|0.0=1.0&1.1=2.1&2.2=0.2|0.1 2.0")
    assert eng.execute(q) == execute_query_numpy(q, cat)


def test_proactive_factorized_for_blowup_forest(monkeypatch):
    """A forest query whose planned intermediates cross factorize_min
    must answer via message passing (no materialization) and stay
    exact vs the oracle (the scaled-q11 shape: 4-relation chain with
    multiplicative fanout)."""
    import dataclasses

    import numpy as np

    from sigmod2018_tpu.config import EngineConfig
    from sigmod2018_tpu.engine.compiled import CompiledEngine
    from sigmod2018_tpu.engine.oracle import execute_query_numpy
    from sigmod2018_tpu.frontend.parser import parse_query
    from sigmod2018_tpu.storage.catalog import Catalog
    from sigmod2018_tpu.storage.relation import Relation

    rng = np.random.default_rng(3)
    n, dom = 4000, 400  # 10x fanout per join: chain blows up
    rels = [Relation(columns=[rng.integers(0, dom, n).astype(np.uint64),
                              rng.integers(0, 1 << 20, n).astype(np.uint64),
                              rng.integers(0, dom, n).astype(np.uint64)])
            for _ in range(4)]
    cat = Catalog(rels)
    cfg = dataclasses.replace(EngineConfig.from_env(),
                              factorize_min=1 << 16,
                              max_intermediate=1 << 30)
    eng = CompiledEngine(cat, cfg)
    eng.prefetch()
    calls = []
    import sigmod2018_tpu.engine.factorized as fz

    real = fz.factorized_result

    def spy(engine, query):
        calls.append(query.text)
        return real(engine, query)

    monkeypatch.setattr(fz, "factorized_result", spy)
    q = parse_query("0 1 2 3|0.0=1.2&1.2=2.0&2.0=3.2|1.1 0.1")
    got = eng.execute(q)
    assert got == execute_query_numpy(q, cat, max_rows=1 << 28)
    assert calls, "factorized path not taken for the blowup forest"
    # a small-estimate query must keep the materializing path
    calls.clear()
    q2 = parse_query("0 1|0.0=1.2&0.1>1000000|0.1 1.1")
    eng.execute(q2)
    assert not calls
