import time, sys
t0=time.time()
def p(m): print(f"[{time.time()-t0:6.1f}s] {m}", flush=True)
from pathlib import Path
from sigmod2018_tpu.config import EngineConfig
from sigmod2018_tpu.storage.catalog import Catalog
from sigmod2018_tpu.frontend.parser import parse_work_file
SMALL = Path("/root/reference/submission/workloads/small")
init=[str(SMALL/l.strip().split("/")[-1]) for l in (SMALL/"small.init").read_text().splitlines() if l.strip()]
config=EngineConfig.from_env()
catalog=Catalog.from_files(init)
from sigmod2018_tpu.engine.compiled import CompiledEngine
engine=CompiledEngine(catalog, config)
engine.prefetch(); p("prefetch done")
batches=list(parse_work_file((SMALL/"small.work").read_text().splitlines()))
q = batches[3][1]
p(f"query: {q}")
import sigmod2018_tpu.engine.vault as V
orig_build = V.ProgramVault.build
def build(self, key, closure, dyn):
    p(f"VAULT BUILD (miss) key={key[:12]}")
    return orig_build(self, key, closure, dyn)
V.ProgramVault.build = build
orig_acquire = V.ProgramVault.acquire
def acquire(self, key):
    r = orig_acquire(self, key)
    p(f"acquire {key[:12]} -> {'HIT' if r is not None else 'miss'}")
    return r
V.ProgramVault.acquire = acquire
r=engine.execute(q); p(f"result {r}")
