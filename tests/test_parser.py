"""Parser tests — ported case list from the reference gtest suite
(TestParser.cpp:6-147)."""

from sigmod2018_tpu.frontend.parser import (
    FilterPred,
    JoinPred,
    parse_query,
    parse_work_file,
)
from sigmod2018_tpu.frontend.sql import query_to_sql


def test_parse_relations():
    q = parse_query("0 1|0.0=1.0|0.0")
    assert q.relations == (0, 1)


def test_parse_duplicate_relation_bindings():
    # Same relation bound twice — bindings stay distinct (Parser.hpp:9-35).
    q = parse_query("7 7|0.0=1.1|0.2 1.0")
    assert q.relations == (7, 7)
    j = q.predicates[0]
    assert isinstance(j, JoinPred)
    assert (j.binding1, j.binding2) == (0, 1)
    assert not j.is_self_join


def test_join_vs_filter_classification():
    q = parse_query("0 1 2|0.1=1.1&1.0=2.2&0.1>3000&0.2=42|0.0 1.1")
    kinds = [type(p).__name__ for p in q.predicates]
    assert kinds == ["JoinPred", "JoinPred", "FilterPred", "FilterPred"]
    assert q.predicates[2] == FilterPred(0, 1, ">", 3000)
    assert q.predicates[3] == FilterPred(0, 2, "=", 42)
    # reference split: filters/self-joins at head, joins at tail
    assert len(q.filters_and_selfjoins) == 2
    assert len(q.joins) == 2


def test_self_join_classified_as_filter_group():
    q = parse_query("3|0.0=0.1|0.0")
    p = q.predicates[0]
    assert isinstance(p, JoinPred) and p.is_self_join
    assert q.filters_and_selfjoins == [p]
    assert q.joins == []


def test_filter_comparators():
    for op in "<>=":
        q = parse_query(f"0|0.2{op}123|0.0")
        assert q.predicates[0] == FilterPred(0, 2, op, 123)


def test_filter_constant_on_left():
    # "5<0.2" means the column is greater than 5
    q = parse_query("0|5<0.2|0.0")
    assert q.predicates[0] == FilterPred(0, 2, ">", 5)


def test_selections():
    q = parse_query("0 1|0.0=1.0|0.0 1.1 0.2")
    assert q.views == ((0, 0), (1, 1), (0, 2))


def test_roundtrip_text():
    line = "0 2 4|0.1=1.1&1.0=2.2&0.1>3000|0.0 1.1"
    assert str(parse_query(line)) == line


def test_parse_work_batches():
    lines = ["0|0.0=1|0.0", "F", "1|0.0=2|0.0", "2|0.0=3|0.0", "F"]
    batches = list(parse_work_file(lines))
    assert [len(b) for b in batches] == [1, 2]


def test_query_to_sql():
    q = parse_query("0 1|0.0=1.0&0.1>77|0.0 1.1")
    sql = query_to_sql(q)
    assert sql == (
        "SELECT SUM(r0.c0), SUM(r1.c1) FROM r0 r0, r1 r1 "
        "WHERE r0.c0=r1.c0 and r0.c1>77;"
    )
