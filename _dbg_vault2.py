import time, traceback
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
import sigmod2018_tpu.engine.vault as V
import jax
orig=V.ProgramVault.build
import jax.export as jex
def build(self, key, closure, dyn):
    p(f"BUILD {key[:12]} ndyn={len(dyn)}")
    try:
        checks=[jex.DisabledSafetyCheck.custom_call("tpu_custom_call"),
                jex.DisabledSafetyCheck.custom_call("Sharding")]
        exp=jex.export(jax.jit(closure), disabled_checks=checks)(*dyn)
        p("export OK, serializing")
        blob=exp.serialize()
        p(f"serialized {len(blob)}B")
    except Exception:
        traceback.print_exc()
    return orig(self, key, closure, dyn)
V.ProgramVault.build=build
r=engine.execute(q); p(f"result {r}")
