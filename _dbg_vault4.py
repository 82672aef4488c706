import time
t0=time.time()
def p(m): print(f"[{time.time()-t0:6.1f}s] {m}", flush=True)
from pathlib import Path
from sigmod2018_tpu.config import EngineConfig
from sigmod2018_tpu.storage.catalog import Catalog
from sigmod2018_tpu.frontend.parser import parse_work_file
SMALL = Path("/root/reference/submission/workloads/small")
init=[str(SMALL/l.strip().split("/")[-1]) for l in (SMALL/"small.init").read_text().splitlines() if l.strip()]
catalog=Catalog.from_files(init)
from sigmod2018_tpu.engine.compiled import CompiledEngine
engine=CompiledEngine(catalog, EngineConfig.from_env())
engine.prefetch(); p("prefetch done")
batches=list(parse_work_file((SMALL/"small.work").read_text().splitlines()))
q=batches[3][1]
r=engine.execute(q); p(f"result1 {r}")
r=engine.execute(q); p(f"result2 {r}")
