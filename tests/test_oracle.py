"""NumPy oracle: unit semantics + bit-exactness on the small workload
(the contest's acceptance gate, reference: harness.cpp + small.result)."""

import numpy as np
import pytest

from sigmod2018_tpu.engine.oracle import execute_query_numpy
from sigmod2018_tpu.frontend.parser import parse_query, parse_work_file
from sigmod2018_tpu.storage.catalog import Catalog
from sigmod2018_tpu.storage.relation import Relation, make_identity_relation


@pytest.fixture
def tiny_catalog():
    # r0: identity 10x3; r1: identity 5x2 (Utils::createRelation trick)
    return Catalog([make_identity_relation(10, 3), make_identity_relation(5, 2)])


def test_plain_join_checksum(tiny_catalog):
    # join 10-row identity with 5-row identity: 5 matches, sums 0+..+4 = 10
    out = execute_query_numpy(parse_query("0 1|0.0=1.0|0.0 1.1"), tiny_catalog)
    assert out == "10 10"


def test_filter_then_join(tiny_catalog):
    out = execute_query_numpy(parse_query("0 1|0.0=1.0&0.0>2|0.0"), tiny_catalog)
    assert out == "7"  # rows 3,4 survive both


def test_equal_filter(tiny_catalog):
    out = execute_query_numpy(parse_query("0|0.1=7|0.0 0.2"), tiny_catalog)
    assert out == "7 7"


def test_empty_result_is_null(tiny_catalog):
    out = execute_query_numpy(parse_query("0 1|0.0=1.0&0.0>100|0.0 1.1"), tiny_catalog)
    assert out == "NULL NULL"


def test_self_join():
    r = Relation(columns=[np.array([1, 2, 3], dtype=np.uint64),
                          np.array([1, 5, 3], dtype=np.uint64)])
    cat = Catalog([r])
    out = execute_query_numpy(parse_query("0|0.0=0.1|0.0"), cat)
    assert out == "4"  # rows 0 and 2 match: 1 + 3


def test_cyclic_join_graph(tiny_catalog):
    # triangle: the third predicate degenerates to a same-component selection
    out = execute_query_numpy(
        parse_query("0 1 1|0.0=1.0&1.0=2.0&0.0=2.0|0.0"), tiny_catalog
    )
    assert out == "10"


def test_duplicate_pair_predicate(tiny_catalog):
    out = execute_query_numpy(
        parse_query("0 1|0.0=1.0&0.1=1.1|0.0"), tiny_catalog
    )
    assert out == "10"  # identity columns: both predicates agree


def test_wraparound_checksum():
    big = np.array([2**63, 2**63, 5], dtype=np.uint64)
    cat = Catalog([Relation(columns=[np.arange(3, dtype=np.uint64), big])])
    out = execute_query_numpy(parse_query("0|0.0<100|0.1"), cat)
    assert out == "5"  # 2^63 + 2^63 + 5 mod 2^64


def test_small_workload_bit_exact(small_workload, small_catalog):
    _, work, expected = small_workload
    got = []
    for batch in parse_work_file(work):
        for q in batch:
            got.append(execute_query_numpy(q, small_catalog))
    assert len(got) == len(expected)
    mismatches = [
        (i, g, e) for i, (g, e) in enumerate(zip(got, expected)) if g != e.strip()
    ]
    assert not mismatches, f"{len(mismatches)} mismatches, first: {mismatches[:3]}"
