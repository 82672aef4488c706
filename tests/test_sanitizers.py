"""TSan-analogue CI job (SURVEY §5 race-detection row).

The reference wires ASan into debug builds (CMakeLists.txt:10) and its
pthread scheduler's correctness rests on ordering invariants
(preprocess.c:21, structs.h:243-247).  Here races are designed away —
SPMD shard_map programs over immutable functional arrays — so the CI
analogue asserts the properties that design claims:

1. bit-determinism of the shuffle exchange across repeated executions
   (a racy scatter/collective would produce run-to-run diffs),
2. the exchange's exact placement contract (row s on chip d == row d of
   chip s's send buffer) for both the a2a and ring transports,
3. the whole engine running under `jax_debug_nans` (the float analogue
   of a sanitizer: any NaN materializing inside a jitted program raises
   instead of silently corrupting a checksum),
4. thread-hammered batch execution staying bit-identical to the serial
   oracle (io/repl.py's pool is the one host-side concurrency surface).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from sigmod2018_tpu.config import EngineConfig
from sigmod2018_tpu.engine.oracle import execute_query_numpy
from sigmod2018_tpu.frontend.parser import parse_query
from sigmod2018_tpu.parallel import AXIS, exchange_multi
from sigmod2018_tpu.parallel.dist import partition_multi
from sigmod2018_tpu.storage.catalog import Catalog
from sigmod2018_tpu.storage.relation import Relation


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return Mesh(np.array(devs[:8]), (AXIS,))


def _exchange_once(mesh, keys, vals, via):
    ndev = mesh.devices.size
    cap = keys.shape[0] // ndev  # uniform keys: per-dest counts fit

    def step(k, v):
        live = jnp.ones(k.shape, dtype=bool)
        sk, sp, cnt = partition_multi(k, (v,), live, ndev, cap)
        rk, rp, n = exchange_multi(sk, sp, cnt, via=via)
        return rk, rp[0], n.reshape(1)

    fn = shard_map(step, mesh=mesh, in_specs=(P(AXIS), P(AXIS)),
                   out_specs=(P(AXIS), P(AXIS), P(AXIS)))
    return jax.jit(fn)(keys, vals)


@pytest.mark.parametrize("via", ["a2a", "ring"])
def test_exchange_bit_deterministic(mesh, via):
    rng = np.random.default_rng(7)
    keys = jnp.asarray(rng.integers(0, 1 << 32, size=4096, dtype=np.uint64))
    vals = jnp.asarray(rng.integers(0, 1 << 32, size=4096, dtype=np.uint64))
    first = jax.tree_util.tree_map(np.asarray, _exchange_once(mesh, keys, vals, via))
    for _ in range(3):
        again = jax.tree_util.tree_map(np.asarray,
                                       _exchange_once(mesh, keys, vals, via))
        for a, b in zip(first, again):
            np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("via", ["a2a", "ring"])
def test_exchange_placement_contract(mesh, via):
    """Deterministic-ordering assert on the shuffle: after the exchange,
    every received key must land on the chip `key % ndev` names, and the
    received multiset per chip must equal exactly the rows every sender
    destined there — computed independently in NumPy."""
    ndev = mesh.devices.size
    rng = np.random.default_rng(11)
    keys = rng.integers(0, 1 << 20, size=4096, dtype=np.uint64)
    vals = rng.integers(0, 1 << 20, size=4096, dtype=np.uint64)
    rk, rv, n = _exchange_once(mesh, jnp.asarray(keys), jnp.asarray(vals), via)
    rk, rv, n = np.asarray(rk), np.asarray(rv), np.asarray(n)

    per_chip = 4096 // ndev
    recv_per = rk.shape[0] // ndev
    for d in range(ndev):
        got_k = rk[d * recv_per:(d + 1) * recv_per]
        got_v = rv[d * recv_per:(d + 1) * recv_per]
        # live rows: the dist layer pads with _PAD_KEY (all ones)
        mask = got_k != np.uint64(0xFFFFFFFFFFFFFFFF)
        assert np.all(got_k[mask] % ndev == d)
        want = keys[keys % ndev == d]
        want_v = vals[keys % ndev == d]
        np.testing.assert_array_equal(np.sort(got_k[mask]), np.sort(want))
        np.testing.assert_array_equal(np.sort(got_v[mask]), np.sort(want_v))


def test_engine_under_debug_nans():
    """jax_debug_nans on: any NaN inside the engine's jitted programs
    raises immediately (SURVEY §5: pytest + jax_debug_nans CI job)."""
    from sigmod2018_tpu.engine.compiled import CompiledEngine

    rng = np.random.default_rng(3)
    rels = [Relation(columns=[rng.integers(0, 40, size=n).astype(np.uint64)
                              for _ in range(3)])
            for n in (300, 200, 100)]
    cat = Catalog(rels)
    queries = ["0 1|0.0=1.0&0.1>5|0.2 1.1",
               "0 1 2|0.0=1.0&1.1=2.1|2.0 0.1",
               "0|0.0=0.1|0.2"]
    jax.config.update("jax_debug_nans", True)
    try:
        eng = CompiledEngine(cat, EngineConfig())
        for qt in queries:
            q = parse_query(qt)
            assert eng.execute(q) == execute_query_numpy(q, cat), qt
    finally:
        jax.config.update("jax_debug_nans", False)


def test_thread_hammer_bit_identical():
    """64 concurrent queries × 8 threads, twice; both runs must be
    bit-identical to the serial oracle AND to each other."""
    from concurrent.futures import ThreadPoolExecutor

    from sigmod2018_tpu.engine.executor import JaxEngine

    rng = np.random.default_rng(23)
    rels = [Relation(columns=[rng.integers(0, 30, size=n).astype(np.uint64)
                              for _ in range(3)])
            for n in (250, 150, 90)]
    cat = Catalog(rels)
    texts = ["0 1|0.0=1.0|0.1 1.2", "1 2|0.1=1.1&1.0>3|1.2",
             "0 1 2|0.0=1.0&1.1=2.1|0.2 1.0 2.0", "0|0.0>10|0.1"] * 16
    queries = [parse_query(t) for t in texts]
    eng = JaxEngine(cat, EngineConfig())
    want = [execute_query_numpy(q, cat) for q in queries]
    for _ in range(2):
        with ThreadPoolExecutor(8) as pool:
            got = [r.line() for r in pool.map(eng.execute_async, queries)]
        assert got == want
