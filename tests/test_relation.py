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
