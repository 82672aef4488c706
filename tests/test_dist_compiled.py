"""Distributed compiled engine on the 8-device virtual CPU mesh:
every join shuffle- or broadcast-executed inside shard_map, bit-exact
against the NumPy oracle, with no GSPMD-inserted cross-shard gathers
(VERDICT r1 #3 done-criteria)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sigmod2018_tpu.config import EngineConfig
from sigmod2018_tpu.engine.oracle import execute_query_numpy
from sigmod2018_tpu.frontend.parser import parse_query
from sigmod2018_tpu.parallel import make_mesh
from sigmod2018_tpu.parallel.dist_compiled import DistCompiledEngine
from sigmod2018_tpu.storage.catalog import Catalog
from sigmod2018_tpu.storage.relation import Relation

N_DEV = 8

QUERIES = [
    "0 1|0.0=1.0|0.1 1.2",                        # single join -> fused SPMD
    "0 1|0.0=1.0&0.1>20|0.1 1.2",                 # filter + fused join
    "0 1 2|0.0=1.0&1.1=2.1|0.2 1.0 2.2",          # chain: shuffle + fused
    "0 1 2|0.0=1.0&1.1=2.1&0.1=1.2|0.2 2.2",      # cycle edge (selection)
    "0 1|0.0=1.0&0.0>100|0.0 1.1",                # empty -> NULL
    "0 0|0.0=1.1|0.2 1.0",                        # same relation twice
    "0 1 2 3|0.0=1.0&1.1=2.1&2.2=3.0|3.1 0.1",    # 4-relation chain
    "0|0.0=0.1|0.2",                              # self-join only
    "2|0.0>5|0.1",                                # filter only
]


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < N_DEV:
        pytest.skip(f"need {N_DEV} devices")
    return make_mesh(N_DEV)


@pytest.fixture(scope="module")
def catalog():
    rng = np.random.default_rng(31)
    rels = []
    for n in (700, 450, 230, 120):
        cols = [rng.integers(0, 60, size=n).astype(np.uint64)
                for _ in range(3)]
        rels.append(Relation(columns=cols))
    return Catalog(rels)


def test_matches_oracle(mesh, catalog):
    eng = DistCompiledEngine(catalog, EngineConfig(), mesh=mesh)
    for qtext in QUERIES:
        q = parse_query(qtext)
        assert eng.execute(q) == execute_query_numpy(q, catalog), qtext
    # every non-selection join took an explicit strategy
    assert eng.join_strategies, "no joins traced through the SPMD builder"
    assert set(eng.join_strategies) <= {"shuffle", "broadcast"}


def test_matches_oracle_no_speculation(mesh, catalog):
    eng = DistCompiledEngine(catalog, EngineConfig(speculate=False),
                             mesh=mesh)
    for qtext in QUERIES:
        q = parse_query(qtext)
        assert eng.execute(q) == execute_query_numpy(q, catalog), qtext


def test_broadcast_join_chosen_for_small_build(mesh, catalog):
    """A small build side must take the all_gather broadcast path."""
    eng = DistCompiledEngine(catalog, EngineConfig(bcast_threshold=1 << 14),
                             mesh=mesh)
    q = parse_query("0 3|0.0=1.0|0.1 1.1")  # relation 3 (120 rows) at binding 1
    assert eng.execute(q) == execute_query_numpy(q, catalog)
    assert "broadcast" in eng.join_strategies


def test_shuffle_join_chosen_for_large_build(mesh, catalog):
    eng = DistCompiledEngine(catalog, EngineConfig(bcast_threshold=0),
                             mesh=mesh)
    q = parse_query("0 1|0.0=1.0|0.1 1.2")
    assert eng.execute(q) == execute_query_numpy(q, catalog)
    assert eng.join_strategies == ["shuffle"]


def test_no_cross_shard_gather_in_hlo(mesh, catalog):
    """The compiled SPMD program's collectives are exactly the ones the
    engine wrote: all-to-all / all-gather / all-reduce.  GSPMD-inserted
    cross-shard gathers would show up as collective-permute + dynamic
    ops or unexpected all-gathers of full columns; shard_map bodies are
    manual, so none may appear."""
    eng = DistCompiledEngine(catalog, EngineConfig(bcast_threshold=0),
                             mesh=mesh)
    q = parse_query("0 1 2|0.0=1.0&1.1=2.1|0.2 1.0 2.2")
    joins, cols_used, n_classes, class_idx = eng._static_plan(q, True)
    from sigmod2018_tpu.engine.compiled import _skeletonize

    skel, consts = _skeletonize(q)
    cols = tuple(eng.device_column(r, c)[0] for r, c in cols_used)
    ns = tuple(eng.device_column(r, c)[1] for r, c in cols_used)
    classes = eng._guess_classes(q, joins, class_idx)
    fn = eng._spmd_program(skel, joins, classes, cols_used, ns)
    hlo = fn.lower(jnp.asarray(consts), *cols).compile().as_text()
    assert "all-to-all" in hlo
    assert "collective-permute" not in hlo


def test_zipf_skew_retry_stays_exact(mesh):
    """Zipf keys blow past the speculated per-chip caps; the pmax
    validation must catch it and the retry must stay bit-exact."""
    rng = np.random.default_rng(41)
    n = 2048
    rels = [
        Relation(columns=[
            np.minimum(rng.zipf(1.3, size=n), 500).astype(np.uint64),
            rng.integers(0, 1 << 30, size=n).astype(np.uint64),
        ]),
        Relation(columns=[
            np.minimum(rng.zipf(1.3, size=n), 500).astype(np.uint64),
            rng.integers(0, 1 << 30, size=n).astype(np.uint64),
        ]),
        Relation(columns=[
            rng.integers(0, 500, size=512).astype(np.uint64),
            rng.integers(0, 1 << 30, size=512).astype(np.uint64),
        ]),
    ]
    cat = Catalog(rels)
    eng = DistCompiledEngine(cat, EngineConfig(max_intermediate=1 << 24),
                             mesh=make_mesh(N_DEV))
    for qtext in [
        "0 1|0.0=1.0|0.1 1.1",
        "0 1 2|0.0=1.0&1.0=2.0|0.1 2.1",
    ]:
        q = parse_query(qtext)
        assert eng.execute(q) == execute_query_numpy(q, cat), qtext


def test_mesh4_shape_agnostic(catalog):
    if len(jax.devices()) < 4:
        pytest.skip("need 4 devices")
    eng = DistCompiledEngine(catalog, EngineConfig(), mesh=make_mesh(4))
    for qtext in QUERIES[:4]:
        q = parse_query(qtext)
        assert eng.execute(q) == execute_query_numpy(q, catalog), qtext


def test_ring_exchange_matches_a2a(mesh, catalog):
    """S18_EXCHANGE=ring: the ppermute neighbor-hop decomposition of the
    shuffle (dist._ring_all_to_all) is bit-equivalent to the XLA
    all_to_all transport on every query shape."""
    eng = DistCompiledEngine(
        catalog, EngineConfig(exchange="ring", bcast_threshold=0),
        mesh=mesh)
    for qtext in QUERIES:
        q = parse_query(qtext)
        assert eng.execute(q) == execute_query_numpy(q, catalog), qtext
    assert "shuffle" in eng.join_strategies


def test_hier_mesh_topology(mesh):
    """hier_mesh/flat_mesh_dcn_last group devices host-major so the 1-D
    shuffle axis keeps same-host chips adjacent (multihost.py; CI fakes
    the host grouping — one process owns all virtual devices)."""
    from sigmod2018_tpu.parallel import flat_mesh_dcn_last, hier_mesh

    hm = hier_mesh(fake_hosts=2)
    assert hm.devices.shape == (2, len(jax.devices()) // 2)
    assert hm.axis_names == ("host", "chip")
    fm = flat_mesh_dcn_last(fake_hosts=2)
    devs = list(fm.devices.reshape(-1))
    half = len(devs) // 2
    # first half of the flat axis = host 0's chips, in order
    assert [d.id for d in devs[:half]] == [d.id for d in hm.devices[0]]


def test_init_distributed_noop_without_env(monkeypatch):
    from sigmod2018_tpu.parallel import init_distributed

    monkeypatch.delenv("S18_COORD_ADDR", raising=False)
    assert init_distributed() is False
