"""On-TPU smoke gate (VERDICT r3 #2): a <=5-minute warm (~15 min cold)
pre-bench sanity run on the REAL backend covering exactly the failure
classes that interpret-mode CPU CI cannot see:

  * one fused join per member (sort / table / table+pref / radix / qd /
    ms), key32 and u64-limb variants, each validated against the NumPy
    oracle,
  * REPEATED execution of every program (the round-3/4 backend bug
    fired on the SECOND execution of a program, after another program
    had run — a single-execution test passes while serving crashes),
  * a vault build -> cold-restore -> execute round-trip in a fresh
    prep-cache directory,
  * a deliberate staircase-overflow routed through the lax.cond
    fallback branch,
  * a multi-join speculative whole-query program executed three times
    (the exact round-4 crash shape).

Run before every bench:  python tools/smoke_tpu.py
Exits 0 on PASS; nonzero with the failing case named.  A hard deadline
(SMOKE_DEADLINE seconds, default 1500) aborts a wedged compile loudly.
"""

from __future__ import annotations

import os
import sys
import threading
import time

import numpy as np

_T0 = time.monotonic()


def log(msg: str) -> None:
    print(f"[smoke +{time.monotonic() - _T0:6.1f}s] {msg}", flush=True)


def _arm_deadline(seconds: float) -> None:
    def watchdog():
        while time.monotonic() - _T0 < seconds:
            time.sleep(5.0)
        log(f"DEADLINE EXCEEDED ({seconds:.0f}s) — wedged compile?")
        import faulthandler

        faulthandler.dump_traceback(file=sys.stderr)
        os._exit(3)

    threading.Thread(target=watchdog, daemon=True).start()


def main() -> None:
    _arm_deadline(float(os.environ.get("SMOKE_DEADLINE", "1500")))

    import jax
    import jax.numpy as jnp

    from sigmod2018_tpu import ops
    from sigmod2018_tpu.ops import ms_join, qd_join, radix_join

    backend = jax.default_backend()
    log(f"backend={backend} device={jax.devices()[0].device_kind}")
    if backend != "tpu":
        log("WARNING: not on TPU — gate still runs, compiled (not "
            "interpret) kernels only exist on tpu")

    failures: list = []

    def check(name, fn):
        try:
            t0 = time.monotonic()
            fn()
            log(f"PASS {name} ({time.monotonic() - t0:.1f}s)")
        except Exception as exc:  # noqa: BLE001
            log(f"FAIL {name}: {exc!r}")
            failures.append(name)

    # ---- shared fixture: one pair of key/value sides -------------------
    rng = np.random.default_rng(0)
    Pb, Pp = 1 << 18, 1 << 18  # at the radix/ms auto threshold
    nb, npp = Pb - 100, Pp - 177
    dom = 50_000
    kb64 = np.zeros(Pb, np.uint64)
    kb64[:nb] = rng.integers(0, dom, nb)
    kp64 = np.zeros(Pp, np.uint64)
    kp64[:npp] = rng.integers(0, dom, npp)
    vb = rng.integers(0, 1 << 20, (2, Pb)).astype(np.uint64)
    vp = rng.integers(0, 1 << 20, (2, Pp)).astype(np.uint64)

    def oracle(kb, kp):
        """(count, sum_b, sum_p) exact via NumPy."""
        ob = np.sort(kb[:nb])
        lo = np.searchsorted(ob, kp[:npp], "left")
        hi = np.searchsorted(ob, kp[:npp], "right")
        cnt_p = (hi - lo).astype(np.uint64)
        op = np.sort(kp[:npp])
        lo2 = np.searchsorted(op, kb[:nb], "left")
        hi2 = np.searchsorted(op, kb[:nb], "right")
        cnt_b = (hi2 - lo2).astype(np.uint64)
        count = int(cnt_p.sum())
        sb = [(cnt_b * vb[i, :nb]).sum() for i in range(2)]
        sp = [(cnt_p * vp[i, :npp]).sum() for i in range(2)]
        return count, [int(a + b) & ((1 << 64) - 1)
                       for a, b in zip(sb, sp)]

    def member_case(algo, key32, shift=0):
        kb = kb64 << np.uint64(shift)
        kp = kp64 << np.uint64(shift)
        want_count, want_sums = oracle(kb, kp)
        kbj, kpj = jnp.asarray(kb), jnp.asarray(kp)
        vbj, vpj = jnp.asarray(vb), jnp.asarray(vp)

        def run():
            c, sb, sp = ops.fused_join_auto(
                kbj, vbj, jnp.int32(nb), kpj, vpj, jnp.int32(npp),
                algo=algo, key32=key32)
            c = int(jax.block_until_ready(c))
            sums = [int(x) for x in np.asarray(sb + sp)]
            assert c == want_count, (c, want_count)
            assert sums == want_sums, (sums, want_sums)

        # THREE executions: the observed backend bug fired on the
        # second execution of a program, never the first.
        run(); run(); run()

    for algo in ("sort", "radix", "qd", "ms", "auto"):
        check(f"member:{algo}:key32", lambda a=algo: member_case(a, True))
    check("member:ms:u64limbs", lambda: member_case("ms", False, shift=20))
    check("member:auto:u64limbs",
          lambda: member_case("auto", False, shift=20))

    # ---- table + prefix members through the engine ---------------------
    def engine_case():
        import dataclasses
        import tempfile

        from sigmod2018_tpu.config import EngineConfig
        from sigmod2018_tpu.engine.compiled import CompiledEngine
        from sigmod2018_tpu.engine.oracle import execute_query_numpy
        from sigmod2018_tpu.frontend.parser import parse_query
        from sigmod2018_tpu.storage.catalog import Catalog
        from sigmod2018_tpu.storage.relation import Relation

        rng2 = np.random.default_rng(3)
        rels = [Relation(columns=[
            rng2.integers(0, 800, 4000).astype(np.uint64)
            for _ in range(3)]) for _ in range(4)]
        cat = Catalog(rels)
        cfg = EngineConfig.from_env()
        eng = CompiledEngine(cat, cfg)
        eng.prefetch()
        texts = [
            "0 1|0.0=1.0|0.1 1.2",                     # table member
            "0 1 2 3|0.0=1.2&0.0=2.1&0.0=3.2&1.2>295|3.2 0.0",  # r4 crash shape
            "0 1 2|0.0=1.0&1.1=2.1|0.2 2.0",           # 2 intermediates
        ]
        for t in texts:
            q = parse_query(t)
            want = execute_query_numpy(q, cat)
            for rep in range(3):  # repeated: the crash shape needs >= 2
                got = eng.execute(q)
                assert got == want, (t, rep, got, want)
        assert not eng.__dict__.get("_device_poisoned"), \
            "engine fell back to oracle-only serving"

    check("engine:speculative-multijoin-x3", engine_case)

    # ---- vault round-trip in a fresh cache dir --------------------------
    def vault_case():
        import subprocess
        import tempfile

        d = tempfile.mkdtemp(prefix="s18smoke_vault_")
        code = (
            "import numpy as np\n"
            "from sigmod2018_tpu.config import EngineConfig\n"
            "from sigmod2018_tpu.engine.compiled import CompiledEngine\n"
            "from sigmod2018_tpu.engine.oracle import execute_query_numpy\n"
            "from sigmod2018_tpu.frontend.parser import parse_query\n"
            "from sigmod2018_tpu.storage.catalog import Catalog\n"
            "from sigmod2018_tpu.storage.relation import Relation\n"
            "rng = np.random.default_rng(3)\n"
            "rels = [Relation(columns=[rng.integers(0, 800, 4000)"
            ".astype(np.uint64) for _ in range(3)]) for _ in range(2)]\n"
            "cat = Catalog(rels)\n"
            "eng = CompiledEngine(cat, EngineConfig.from_env())\n"
            "eng.prefetch()\n"
            "q = parse_query('0 1|0.0=1.0&0.1>100|0.1 1.2')\n"
            "want = execute_query_numpy(q, cat)\n"
            "got = eng.execute(q)\n"
            "assert got == want, (got, want)\n"
            "eng._vault().wait_loaded()\n"
            "print('VAULT_OK', len(eng._vault()._ready))\n"
        )
        env = dict(os.environ, S18_PREP_CACHE=d)
        for phase in ("build", "restore"):
            r = subprocess.run([sys.executable, "-c", code], env=env,
                               capture_output=True, text=True, timeout=600)
            assert "VAULT_OK" in r.stdout, (phase, r.stdout[-200:],
                                            r.stderr[-500:])
        # in-memory catalogs have no source_paths -> vault may be
        # disabled; accept either, the REPL path covers the real thing

    check("vault:build+restore", vault_case)

    # ---- emitting staircase member (intermediate-join contract) ---------
    def emitting_case():
        from sigmod2018_tpu.ops import sort_join as sj
        from sigmod2018_tpu.ops.ms_join import join_probe_count_ms

        kbj, kpj = jnp.asarray(kb64), jnp.asarray(kp64)
        sk, perm = sj.join_build(kbj, jnp.int32(nb), key32=True)
        a = sj.join_probe_count(sk, jnp.int32(nb), kpj, jnp.int32(npp))
        for _ in range(3):  # repeated-execution guard
            b = join_probe_count_ms(sk, jnp.int32(nb), kpj,
                                    jnp.int32(npp), key32=True)
            assert int(jax.block_until_ready(b[3])) == int(a[3])
        ca, cb_ = np.asarray(a[1]), np.asarray(b[1])
        assert np.array_equal(ca, cb_)

    check("emitting:jpc_ms:key32", emitting_case)

    # ---- proactive factorized service (blowup forest) -------------------
    def factorized_case():
        import dataclasses

        from sigmod2018_tpu.config import EngineConfig
        from sigmod2018_tpu.engine.compiled import CompiledEngine
        from sigmod2018_tpu.engine.factorized import (
            execute_query_factorized_np)
        from sigmod2018_tpu.frontend.parser import parse_query
        from sigmod2018_tpu.storage.catalog import Catalog
        from sigmod2018_tpu.storage.relation import Relation

        rng2 = np.random.default_rng(5)
        rels = [Relation(columns=[
            rng2.integers(0, 500, 50000).astype(np.uint64),
            rng2.integers(0, 1 << 20, 50000).astype(np.uint64)])
            for _ in range(4)]
        cat = Catalog(rels)
        cfg = dataclasses.replace(EngineConfig.from_env(),
                                  factorize_min=1 << 16,
                                  max_intermediate=1 << 30)
        eng = CompiledEngine(cat, cfg)
        eng.prefetch()
        q = parse_query("0 1 2 3|0.0=1.0&1.0=2.0&2.0=3.0|1.1 0.1")
        want = execute_query_factorized_np(q, cat)
        for _ in range(3):
            got = eng.execute(q)
            assert got == want, (got, want)

    check("engine:factorized-blowup-x3", factorized_case)

    # ---- staircase overflow -> searchsorted cond fallback ---------------
    def overflow_case():
        kb = np.zeros(1 << 12, np.uint64)  # all-equal keys: T > T_cap
        kp = np.zeros(1 << 12, np.uint64)
        n = 1 << 12
        W, H, T = ms_join.stair_plan(n, n, 64, 32, slack=0.0)
        cnt, lo = ms_join.staircase_counts(
            jnp.asarray(kb), jnp.int32(n), jnp.asarray(kp), jnp.int32(n),
            W=W, H=H, T_cap=min(T, 64))
        cnt = np.asarray(jax.block_until_ready(cnt))
        assert int(cnt.sum()) == n * n, int(cnt.sum())

    check("ms:overflow-cond-fallback", overflow_case)

    if failures:
        log(f"SMOKE FAILED: {failures}")
        sys.exit(1)
    log("SMOKE PASSED")
    record_pass(backend)


def gate_path(backend: str):
    """The pass-record file for the CURRENT code tag: bench.py refuses
    to time unsmoked code (VERDICT r4 #9 — interpret-mode CI cannot see
    the repeated-execution backend failures this gate exists for)."""
    from sigmod2018_tpu.engine.vault import _code_tag
    from sigmod2018_tpu.storage.catalog import prep_cache_dir

    base = prep_cache_dir()
    if base is None:
        return None
    return os.path.join(base, f"smoke-{backend}-{_code_tag()}.json")


def record_pass(backend: str) -> None:
    import json

    fp = gate_path(backend)
    if fp is None:
        return
    try:
        os.makedirs(os.path.dirname(fp), exist_ok=True)
        with open(fp, "w") as fh:
            json.dump({"passed": True, "backend": backend,
                       "elapsed_s": round(time.monotonic() - _T0, 1)}, fh)
        log(f"gate recorded: {fp}")
    except OSError as exc:
        log(f"gate record failed: {exc!r}")


if __name__ == "__main__":
    main()
