"""Differential fuzz body: N random queries through every engine mode vs
the NumPy oracle.  argv: [N] [SEED] [mesh].  Used by tests/test_fuzz.py
(CI) and tools/soak.py (chunked multi-process soak).  With the "mesh"
flag (and >= 2 local devices — the caller sets
--xla_force_host_platform_device_count) the matrix swaps in the
distributed engines over the full device mesh."""
import sys

import numpy as np
from sigmod2018_tpu.config import EngineConfig
from sigmod2018_tpu.engine.compiled import CompiledEngine
from sigmod2018_tpu.engine.executor import JaxEngine
from sigmod2018_tpu.engine.oracle import execute_query_numpy
from sigmod2018_tpu.frontend.parser import parse_query
from sigmod2018_tpu.storage.catalog import Catalog
from sigmod2018_tpu.storage.relation import Relation
rng = np.random.default_rng(int(sys.argv[2]) if len(sys.argv) > 2 else 99)
rels = []
for n in (500, 350, 200, 120, 80):
    cols = [rng.integers(0, 50, size=n).astype(np.uint64) for _ in range(3)]
    rels.append(Relation(columns=cols))
# Big-value relations: values past 2^32 (key32 single-limb off) and past
# the key-table domain gate (S18_KEYTABLE) — cover the u64 sort paths
# and joins mixing a table side with a non-table side.  Column 2 stays
# small so joins against the small relations still produce matches.
for n, base in ((150, 1 << 34), (100, 1 << 22)):
    cols = [(base + rng.integers(0, 50, size=n)).astype(np.uint64),
            (base + rng.integers(0, 50, size=n)).astype(np.uint64),
            rng.integers(0, 50, size=n).astype(np.uint64)]
    rels.append(Relation(columns=cols))
cat = Catalog(rels)
if len(sys.argv) > 3 and sys.argv[3] == "mesh":
    import jax

    from sigmod2018_tpu.parallel.dist_compiled import DistCompiledEngine
    from sigmod2018_tpu.parallel.dist_engine import DistJaxEngine

    assert len(jax.devices()) >= 2, "mesh fuzz needs multiple devices"
    engines = [('dist-compiled', DistCompiledEngine(cat, EngineConfig())),
               ('dist-standard', DistJaxEngine(cat, EngineConfig())),
               ('dist-compiled-nospec',
                DistCompiledEngine(cat, EngineConfig(speculate=False)))]
else:
    engines = [('compiled', CompiledEngine(cat, EngineConfig())),
               ('standard', JaxEngine(cat, EngineConfig())),
               ('nofuse', JaxEngine(cat, EngineConfig(fuse_final_join=False))),
               ('compiled-nofuse',
                CompiledEngine(cat, EngineConfig(fuse_final_join=False))),
               ('compiled-nospec',
                CompiledEngine(cat, EngineConfig(speculate=False)))]
fails = 0
N = int(sys.argv[1]) if len(sys.argv) > 1 else 200
for trial in range(N):
    nrel = int(rng.integers(1, 5))
    bindings = list(rng.integers(0, len(rels), size=nrel))
    preds = []
    for b in range(1, nrel):
        preds.append(f'{b-1}.{rng.integers(0,3)}={b}.{rng.integers(0,3)}')
    if rng.random() < 0.3 and nrel >= 2:
        a, b2 = sorted(rng.choice(nrel, size=2, replace=False))
        preds.append(f'{a}.{rng.integers(0,3)}={b2}.{rng.integers(0,3)}')
    if rng.random() < 0.3:
        b3 = int(rng.integers(0, nrel))
        preds.append(f'{b3}.{rng.integers(0,3)}={b3}.{rng.integers(0,3)}')
    if rng.random() < 0.7:
        op = rng.choice(['<','>','='])
        preds.append(f'{rng.integers(0,nrel)}.{rng.integers(0,3)}{op}{rng.integers(0, 60)}')
    if not preds:
        preds.append(f'0.0>{rng.integers(0,50)}')
    views = ' '.join(f'{rng.integers(0, nrel)}.{rng.integers(0, 3)}'
                     for _ in range(int(rng.integers(1, 4))))
    qt = f"{' '.join(map(str, bindings))}|{'&'.join(preds)}|{views}"
    q = parse_query(qt)
    want = execute_query_numpy(q, cat)
    for name, eng in engines:
        got = eng.execute(q)
        if got != want:
            fails += 1
            print('FAIL', name, qt, 'got', got, 'want', want)
    # Repeat on the first engine: a second execution of the same text
    # takes the per-text fast path (cached dispatch closure + learned
    # classes) — differential coverage for its invalidation logic.
    got = engines[0][1].execute(q)
    if got != want:
        fails += 1
        print('FAIL', engines[0][0] + '-repeat', qt, 'got', got,
              'want', want)
print(f'{N} queries x {len(engines)} engines: {fails} failures')
