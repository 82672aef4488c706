"""Relation storage tests (reference: TestRelation.cpp:15-67)."""

import numpy as np
import pytest

from sigmod2018_tpu.storage.relation import (
    Relation,
    dump_sql,
    load_relation,
    make_identity_relation,
    store_relation,
    store_relation_csv,
)


def test_store_load_roundtrip(tmp_path):
    rel = Relation(
        columns=[
            np.array([1, 2, 3], dtype=np.uint64),
            np.array([2**64 - 1, 0, 42], dtype=np.uint64),
        ]
    )
    p = tmp_path / "rel.bin"
    store_relation(rel, p)
    back = load_relation(p)
    assert back.num_tuples == 3
    assert back.num_columns == 2
    for a, b in zip(rel.columns, back.columns):
        np.testing.assert_array_equal(a, b)


def test_store_load_empty_relation(tmp_path):
    rel = Relation(columns=[np.empty(0, dtype=np.uint64)])
    p = tmp_path / "empty.bin"
    store_relation(rel, p)
    back = load_relation(p)
    assert back.num_tuples == 0
    assert back.num_columns == 1


def test_truncated_file_rejected(tmp_path):
    p = tmp_path / "bad.bin"
    np.array([100, 3], dtype="<u8").tofile(p)  # header promises data
    with pytest.raises(ValueError):
        load_relation(p)


def test_csv_output(tmp_path):
    rel = make_identity_relation(3, 2)
    p = tmp_path / "rel.tbl"
    store_relation_csv(rel, p)
    assert p.read_text() == "0,0\n1,1\n2,2\n"


def test_sql_ddl(tmp_path):
    rel = make_identity_relation(2, 3)
    p = tmp_path / "rel.sql"
    dump_sql(rel, p, "r9")
    text = p.read_text()
    assert "CREATE TABLE r9 (c0 bigint, c1 bigint, c2 bigint);" in text


def test_identity_relation():
    rel = make_identity_relation(5, 2)
    np.testing.assert_array_equal(rel.columns[0], np.arange(5, dtype=np.uint64))


def test_reference_binary_layout(tmp_path):
    # header uint64 rows, uint64 cols, then column-major data
    # (verified against workloads/small/r0 in SURVEY §0)
    rel = Relation(columns=[np.array([7, 8], dtype=np.uint64),
                            np.array([9, 10], dtype=np.uint64)])
    p = tmp_path / "layout.bin"
    store_relation(rel, p)
    raw = np.fromfile(p, dtype="<u8")
    np.testing.assert_array_equal(raw, [2, 2, 7, 8, 9, 10])


def test_prep_stats_cache_roundtrip(tmp_path, monkeypatch):
    """Prep-artifact cache (SURVEY §5 checkpoint row): second
    Catalog.from_files of the same file set loads identical stats from
    the on-disk cache; touching a file invalidates its key."""
    import os

    import numpy as np

    from sigmod2018_tpu.storage import catalog as cat_mod
    from sigmod2018_tpu.storage.catalog import Catalog
    from sigmod2018_tpu.storage.relation import Relation, store_relation

    monkeypatch.setenv("S18_PREP_CACHE", str(tmp_path / "cache"))
    rng = np.random.default_rng(5)
    f = str(tmp_path / "r0")
    rel = Relation(columns=[
        rng.integers(0, 1 << 63, size=100, dtype=np.uint64),
        np.full(100, 0xFFFFFFFFFFFFFFFF, dtype=np.uint64),
    ])
    store_relation(rel, f)

    c1 = Catalog.from_files([f])
    cache_files = list((tmp_path / "cache").glob("stats-*.npz"))
    assert len(cache_files) == 1

    loaded = cat_mod._stats_cache_load([f])
    assert loaded is not None
    c2 = Catalog.from_files([f])
    assert [[vars(s) for s in r] for r in c2.stats] == \
           [[vars(s) for s in r] for r in c1.stats]
    # u survives the uint64 round-trip exactly
    assert c2.stats[0][1].u == 0xFFFFFFFFFFFFFFFF

    # invalidation: rewrite with different mtime
    os.utime(f, ns=(1, 1))
    assert cat_mod._stats_cache_load([f]) is None
