"""Native C++ loader/stats vs the NumPy path (reference: relation_map.c)."""

import numpy as np
import pytest

from sigmod2018_tpu.storage.catalog import Catalog, compute_column_stats
from sigmod2018_tpu.storage.relation import Relation, store_relation

native = pytest.importorskip("sigmod2018_tpu.storage.native")


@pytest.fixture(scope="module")
def lib_ok():
    if native._LIB is None:
        pytest.skip("native library unavailable")


def _roundtrip(tmp_path, cols):
    rel = Relation([np.asarray(c, dtype=np.uint64) for c in cols])
    path = tmp_path / "r.bin"
    store_relation(rel, path)
    return str(path)


def test_native_matches_numpy(tmp_path, lib_ok):
    rng = np.random.default_rng(0)
    cols = [rng.integers(0, 1000, 5000, dtype=np.uint64) for _ in range(4)]
    path = _roundtrip(tmp_path, cols)
    loaded = native.load_relations_native([path])
    assert loaded is not None
    rel, stats = loaded[0]
    assert rel.num_tuples == 5000 and rel.num_columns == 4
    for c in range(4):
        np.testing.assert_array_equal(np.asarray(rel.column(c)), cols[c])
        want = compute_column_stats(cols[c])
        got = stats[c]
        assert (got.l, got.u, got.f, got.d, got.fmax) == \
            (want.l, want.u, want.f, want.d, want.fmax)
        # modes can tie arbitrarily; multiplicity must agree
        assert int(np.sum(cols[c] == np.uint64(got.mode))) == got.fmax


def test_native_empty_relation(tmp_path, lib_ok):
    path = _roundtrip(tmp_path, [np.empty(0, dtype=np.uint64)] * 3)
    loaded = native.load_relations_native([path])
    rel, stats = loaded[0]
    assert rel.num_tuples == 0 and rel.num_columns == 3
    assert all(s.f == 0 for s in stats)


def test_catalog_prefers_native_and_agrees(tmp_path, lib_ok):
    rng = np.random.default_rng(1)
    paths = [
        _roundtrip(tmp_path / f"{i}" if (tmp_path / f"{i}").mkdir() or True else "",
                   [rng.integers(0, 50, 200, dtype=np.uint64) for _ in range(2)])
        for i in range(3)
    ]
    cat_native = Catalog.from_files(paths)
    import sigmod2018_tpu.storage.catalog as catmod

    cat_numpy = Catalog([  # direct numpy path
        catmod.load_relation(p) for p in paths
    ])
    for rid in range(3):
        for cid in range(2):
            a = cat_native.column_stats(rid, cid)
            b = cat_numpy.column_stats(rid, cid)
            assert (a.l, a.u, a.f, a.d) == (b.l, b.u, b.f, b.d)
