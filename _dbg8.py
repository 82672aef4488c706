import sys, hashlib
from pathlib import Path
from sigmod2018_tpu.config import EngineConfig
from sigmod2018_tpu.storage.catalog import Catalog
from sigmod2018_tpu.frontend.parser import parse_work_file
SMALL = Path("/root/reference/submission/workloads/small")
init=[str(SMALL/l.strip().split("/")[-1]) for l in (SMALL/"small.init").read_text().splitlines() if l.strip()]
catalog=Catalog.from_files(init)
from sigmod2018_tpu.engine.compiled import CompiledEngine
import sigmod2018_tpu.engine.compiled as C
engine=CompiledEngine(catalog, EngineConfig.from_env())
engine.prefetch()
batches=list(parse_work_file((SMALL/"small.work").read_text().splitlines()))
q=batches[3][1]
orig=CompiledEngine._prepare_call
cap={}
def pc(self,*a,**k):
    cap['a']=a; return orig(self,*a,**k)
CompiledEngine._prepare_call=pc
import sigmod2018_tpu.engine.vault as V
V.ProgramVault.acquire=lambda self,key: None
V.ProgramVault.build=lambda self,key,fn,dyn: None
V.ProgramVault.note_bad_text=lambda self,t: None
try: engine.execute(q)
except Exception as e: print("exec err", e)
(skel, joins, key32, classes, cols_used, ns, consts, cols, jkeys, scols,
 sperms, tkeys, tcols, fkeys, fprefs, rkeys, rbits, rdatas, rvkeys, rvals)=cap['a']
cfg=engine.config
import jax
fn=jax.jit(lambda consts, cols, scols, sperms, tcols, fprefs, rdatas, rvals: C._run_segments(
    skel, joins, key32, classes, cols_used, ns, cfg.min_pad, cfg.fuse_final_join,
    cfg.join_algo, consts, cols, jkeys, scols, sperms, tkeys, tcols, fkeys, fprefs,
    rkeys, rbits, rvkeys, rdatas, rvals))
low=fn.lower(consts, cols, scols, sperms, tcols, fprefs, rdatas, rvals)
mod=low.compiler_ir()
asm=mod.operation.get_asm(large_elements_limit=None)
Path(sys.argv[1]).write_text(asm)
print("asm sha:", hashlib.sha1(asm.encode()).hexdigest(), "len", len(asm))
asm2=mod.operation.get_asm(large_elements_limit=None, enable_debug_info=True)
Path(sys.argv[1]+".dbg").write_text(asm2)
print("dbg sha:", hashlib.sha1(asm2.encode()).hexdigest())
from jax._src import cache_key as ck
from jax._src import compiler as jcomp
opts = jcomp.get_compile_options(num_replicas=1, num_partitions=1)
backend = jax.devices()[0].client
try:
    k = ck.get(mod, tuple(jax.devices()), opts, backend)
    print("cachekey:", k)
except Exception as e:
    import traceback; traceback.print_exc()
