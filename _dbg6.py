import sys, hashlib
from pathlib import Path
from sigmod2018_tpu.config import EngineConfig
from sigmod2018_tpu.storage.catalog import Catalog
from sigmod2018_tpu.frontend.parser import parse_work_file
SMALL = Path("/root/reference/submission/workloads/small")
init=[str(SMALL/l.strip().split("/")[-1]) for l in (SMALL/"small.init").read_text().splitlines() if l.strip()]
catalog=Catalog.from_files(init)
from sigmod2018_tpu.engine.compiled import CompiledEngine, _run_segments, _program_closure
import sigmod2018_tpu.engine.compiled as C
engine=CompiledEngine(catalog, EngineConfig.from_env())
engine.prefetch()
batches=list(parse_work_file((SMALL/"small.work").read_text().splitlines()))
q=batches[3][1]
# capture statics/dyn by monkeypatching _prepare_call
orig=CompiledEngine._prepare_call
cap={}
def pc(self,*a,**k):
    cap['a']=a; cap['k']=k
    return orig(self,*a,**k)
CompiledEngine._prepare_call=pc
import sigmod2018_tpu.engine.vault as V
V.ProgramVault.acquire=lambda self,key: None
V.ProgramVault.build=lambda self,key,fn,dyn: None
V.ProgramVault.note_bad_text=lambda self,t: None
import jax
oj = jax.jit
# intercept the jit call inside _run_segments? easier: re-lower via engine internals
try:
    engine.execute(q)
except Exception as e:
    print("exec err", e)
# Now find the jitted _run_segments wrapper: lower manually
# reconstruct the exact call from _prepare_call args
(skel, joins, key32, classes, cols_used, ns, consts, cols, jkeys, scols,
 sperms, tkeys, tcols, fkeys, fprefs, rkeys, rbits, rdatas, rvkeys, rvals)=cap['a']
cfg=engine.config
import jax
fn=jax.jit(lambda consts, cols, scols, sperms, tcols, fprefs, rdatas, rvals: C._run_segments(
    skel, joins, key32, classes, cols_used, ns, cfg.min_pad, cfg.fuse_final_join,
    cfg.join_algo, consts, cols, jkeys, scols, sperms, tkeys, tcols, fkeys, fprefs,
    rkeys, rbits, rvkeys, rdatas, rvals))
low=fn.lower(consts, cols, scols, sperms, tcols, fprefs, rdatas, rvals)
txt=low.as_text()
out=Path(sys.argv[1]); out.write_text(txt)
print("hlo sha:", hashlib.sha1(txt.encode()).hexdigest(), "len", len(txt))

# deeper: hash module bytecode + actual jax cache key
from jax._src import cache_key as ck
from jax._src.interpreters import mlir as _mlir
mod = low.compiler_ir()
import io
from jax._src.lib import xla_client as xc
bc = _mlir.module_to_bytecode(mod)
print("bytecode sha:", hashlib.sha1(bc).hexdigest(), "len", len(bc))
client = jax.devices()[0].client
opts = low.compile_args.get("compile_options") if hasattr(low, "compile_args") else None
try:
    exe_opts = low._lowering.compile_args
except Exception:
    exe_opts = None
try:
    key = ck.get(mod, [jax.devices()], jax.devices()[0].client.compile_options if hasattr(client,'compile_options') else None, client)
    print("cache key:", key)
except Exception as e:
    print("key err:", e)
