"""Cross-engine SQL validation (SURVEY §4 tier 3).

The reference ships Query2SQL + generated .sql/.tbl fixtures so contest
results can be re-derived in PostgreSQL (Query2SQL.cpp, Parser.cpp:224-251,
workloads/small/small.work.sql).  Here the loop actually closes: every
query of the small workload is translated by frontend/sql.py, executed in
sqlite3 (a third engine sharing no code with the JAX engine or the NumPy
oracle), and its SUMs diffed against the expected checksums.

Exactness: sqlite computes in int64.  Small-workload values are < 2^32
(verified below) and the expected sums are far below 2^63, so int64 SQL
sums equal the engine's mod-2^64 wrap-around sums; sqlite raises on
int64 overflow rather than silently wrapping, so a would-be divergence
fails loudly.
"""

import sqlite3
from pathlib import Path

import numpy as np
import pytest

from sigmod2018_tpu.frontend.parser import parse_query, parse_work_file
from sigmod2018_tpu.frontend.sql import query_to_sql

SMALL = Path("/root/reference/submission/workloads/small")


@pytest.fixture(scope="module")
def sqlite_db():
    if not SMALL.exists():
        pytest.skip("small workload not available")
    db = sqlite3.connect(":memory:")
    names = [
        line.strip().split("/")[-1]
        for line in (SMALL / "small.init").read_text().splitlines()
        if line.strip()
    ]
    for rid, name in enumerate(names):
        raw = np.fromfile(SMALL / name, dtype=np.uint64)
        rows, cols = int(raw[0]), int(raw[1])
        data = raw[2:].reshape(cols, rows)
        assert int(data.max(initial=0)) < 2**63, "int64 SQL math would wrap"
        col_defs = ", ".join(f"c{c} INTEGER" for c in range(cols))
        db.execute(f"CREATE TABLE r{rid} ({col_defs})")
        db.executemany(
            f"INSERT INTO r{rid} VALUES ({', '.join('?' * cols)})",
            np.ascontiguousarray(data.T).astype(np.int64).tolist(),
        )
    db.commit()
    return db


def test_small_workload_via_sqlite(sqlite_db):
    batches = list(parse_work_file((SMALL / "small.work").read_text().splitlines()))
    expected = [
        l.strip() for l in (SMALL / "small.result").read_text().splitlines()
        if l.strip()
    ]
    queries = [q for b in batches for q in b]
    assert len(queries) == len(expected)
    for q, want in zip(queries, expected):
        sql = query_to_sql(q)
        row = sqlite_db.execute(sql).fetchone()
        got = " ".join("NULL" if v is None else str(v) for v in row)
        assert got == want, f"{q.text}\n{sql}\ngot {got} want {want}"


def test_random_queries_vs_numpy_oracle_via_sqlite():
    """sqlite vs the NumPy oracle on randomized catalogs + queries —
    validates the oracle itself (which every differential test trusts)."""
    from sigmod2018_tpu.engine.oracle import execute_query_numpy
    from sigmod2018_tpu.storage.catalog import Catalog
    from sigmod2018_tpu.storage.relation import Relation

    rng = np.random.default_rng(17)
    rels = []
    for n in (120, 90, 60):
        cols = [rng.integers(0, 30, size=n).astype(np.uint64) for _ in range(3)]
        rels.append(Relation(columns=cols))
    cat = Catalog(rels)

    db = sqlite3.connect(":memory:")
    for rid, rel in enumerate(cat.relations):
        col_defs = ", ".join(f"c{c} INTEGER" for c in range(rel.num_columns))
        db.execute(f"CREATE TABLE r{rid} ({col_defs})")
        rows = np.stack([np.asarray(rel.column(c)) for c in
                         range(rel.num_columns)], axis=1).astype(np.int64)
        db.executemany(
            f"INSERT INTO r{rid} VALUES ({', '.join('?' * rel.num_columns)})",
            rows.tolist(),
        )
    db.commit()

    for trial in range(40):
        nrel = int(rng.integers(1, 4))
        bindings = list(rng.integers(0, 3, size=nrel))
        preds = [
            f"{b - 1}.{rng.integers(0, 3)}={b}.{rng.integers(0, 3)}"
            for b in range(1, nrel)
        ]
        if rng.random() < 0.6:
            op = rng.choice(["<", ">", "="])
            preds.append(
                f"{rng.integers(0, nrel)}.{rng.integers(0, 3)}{op}{rng.integers(0, 35)}"
            )
        if not preds:
            preds.append(f"0.0>{rng.integers(0, 25)}")
        views = " ".join(
            f"{rng.integers(0, nrel)}.{rng.integers(0, 3)}"
            for _ in range(int(rng.integers(1, 3)))
        )
        qt = f"{' '.join(map(str, bindings))}|{'&'.join(preds)}|{views}"
        q = parse_query(qt)
        row = db.execute(query_to_sql(q)).fetchone()
        got = " ".join("NULL" if v is None else str(v) for v in row)
        want = execute_query_numpy(q, cat)
        assert got == want, f"{qt}: sqlite {got} oracle {want}"
