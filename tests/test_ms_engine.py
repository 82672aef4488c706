"""Engine-level coverage for the merge-staircase member + the
fetch-failure self-heal.

The round-3 zipf/scaled regressions both slipped past CI because no
test drove the ms member THROUGH the engines (only ops-level tests ran
it) and no test covered a program whose failure surfaces at the fetch
(async dispatch defers device errors past every dispatch-time guard).
"""

import dataclasses

import numpy as np
import pytest

from sigmod2018_tpu.config import EngineConfig
from sigmod2018_tpu.engine.compiled import CompiledEngine, SpecResult
from sigmod2018_tpu.engine.executor import JaxEngine, format_batch
from sigmod2018_tpu.engine.oracle import execute_query_numpy
from sigmod2018_tpu.frontend.parser import parse_query
from sigmod2018_tpu.storage.catalog import Catalog
from sigmod2018_tpu.storage.relation import Relation

QUERIES = [
    "0 1|0.0=1.0|0.1 1.2",
    "0 1 2|0.0=1.0&1.1=2.1|0.2 2.0",
    "0 1|0.0=1.0&0.1>250|1.1",
    "2 0|0.2=1.2&0.0<100|0.0 1.0",
    "1 1|0.1=1.2&0.2<300|1.1 0.2",
]


def _catalog(seed=5, rows=3000, dom=500):
    rng = np.random.default_rng(seed)
    rels = [Relation(columns=[rng.integers(0, dom, rows).astype(np.uint64)
                              for _ in range(3)]) for _ in range(3)]
    return Catalog(rels)


@pytest.mark.parametrize("engine_cls", [CompiledEngine, JaxEngine])
def test_ms_member_through_engine(engine_cls):
    """S18_JOIN=ms end-to-end (interpret-mode kernel on CPU): the fused
    final join of every query runs the staircase member."""
    cat = _catalog()
    cfg = dataclasses.replace(EngineConfig.from_env(), join_algo="ms")
    eng = engine_cls(cat, cfg)
    eng.prefetch()
    for q in QUERIES:
        r = eng.execute(parse_query(q))
        got = r if isinstance(r, str) else r.line()
        assert got == execute_query_numpy(parse_query(q), cat), q


class _PoisonPacked:
    """Mimics a device array whose program failed: any materialization
    raises (jax defers program errors to the fetch)."""

    ndim = 1

    def __array__(self, *a, **k):
        raise RuntimeError("deferred device failure")


def test_fetch_retry_recovers_single():
    calls = []
    res = SpecResult(_PoisonPacked(), 2, (), 0, retry=lambda: "")
    res.fetch_retry = lambda: calls.append(1) or "42 43"
    assert res.line() == "42 43"
    assert calls == [1]


def test_fetch_retry_raises_without_handler():
    res = SpecResult(_PoisonPacked(), 1, (), 0, retry=lambda: "")
    with pytest.raises(RuntimeError):
        res.line()


def test_format_batch_survives_poisoned_program():
    """One poisoned program must not fail the whole batch: the flat
    fetch falls back to per-result fetches + per-result recovery."""
    import jax.numpy as jnp

    good = SpecResult(jnp.asarray(np.array([3, 7, 9], np.uint64)), 2,
                      (), 0, retry=lambda: "")
    bad = SpecResult(_PoisonPacked(), 1, (), 0, retry=lambda: "")
    bad.fetch_retry = lambda: "99"
    lines = format_batch([good, bad, "NULL"])
    assert lines == ["7 9", "99", "NULL"]


def test_emitting_ms_path_through_engine(monkeypatch):
    """Intermediate joins take the staircase counting member past the
    crossover (VERDICT r3 #4): force the crossover low and run
    multi-join queries whose intermediate joins then use
    join_probe_count_ms — results must stay bit-exact vs the oracle."""
    import jax
    from sigmod2018_tpu.ops import ms_join

    monkeypatch.setattr(ms_join, "EMIT_MS_MIN_ROWS", 256)
    monkeypatch.setenv("S18_EMIT_MS_FORCE", "1")  # off-TPU: interpret
    calls = []
    real = ms_join.join_probe_count_ms

    def spy(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(ms_join, "join_probe_count_ms", spy)
    jax.clear_caches()  # drop traces that baked the searchsorted member
    cat = _catalog(seed=21, rows=3000, dom=300)
    # key tables would shadow the sorted intermediate-join path
    cfg = dataclasses.replace(EngineConfig.from_env(), key_table_max=0)
    eng = CompiledEngine(cat, cfg)
    eng.prefetch()
    for t in ["0 1 2|0.0=1.0&1.1=2.1|0.2 2.0",
              "0 1 2|0.0=1.0&1.1=2.1&0.1>100|0.2 2.0"]:
        q = parse_query(t)
        got = eng.execute(q)
        assert got == execute_query_numpy(q, cat), t
    assert calls, "staircase counting member never selected"
    jax.clear_caches()  # don't leak spy-traced programs to other tests
