"""Test harness: external oracle + timer (port of submission/harness.cpp).

Forks the engine as a subprocess, feeds the .init file + "Done", waits the
untimed prep window, then streams each query batch and diffs every output
line against the expected .result file.  Elapsed wall-clock ms (timed from
the first batch write to the last result line, harness.cpp:206-208,292) is
printed only when every line matched (harness.cpp:295-300).

Usage:
    python tools/harness.py INIT WORK RESULT [-- CMD...]
    (default CMD: python -m sigmod2018_tpu)

Exit code 0 iff zero mismatches.  Aborts after 100 mismatches
(harness.cpp:16).
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import time
from pathlib import Path

MAX_FAILURES = 100


def parse_batches(work_lines, result_lines):
    """Split the .work stream into batches; attach expected lines."""
    batches = []
    cur = []
    for raw in work_lines:
        line = raw.strip()
        if not line:
            continue
        if line == "F":
            if cur:
                batches.append(cur)
                cur = []
            continue
        cur.append(line)
    if cur:
        batches.append(cur)
    expected = [l.rstrip("\n") for l in result_lines if l.strip()]
    it = iter(expected)
    out = []
    for b in batches:
        # A short .result file is a mismatch to report (like the C++
        # harness), not a StopIteration crash: missing lines become None.
        out.append((b, [next(it, None) for _ in b]))
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("init")
    ap.add_argument("work")
    ap.add_argument("result")
    ap.add_argument("cmd", nargs="*", default=None)
    ap.add_argument("--prep-wait", type=float, default=1.0,
                    help="untimed prep window seconds (harness.cpp:175-177)")
    args = ap.parse_args()

    cmd = args.cmd or [sys.executable, "-m", "sigmod2018_tpu"]
    init_dir = Path(args.init).resolve().parent
    init_lines = [
        l.strip() for l in Path(args.init).read_text().splitlines() if l.strip()
    ]
    batches = parse_batches(
        Path(args.work).read_text().splitlines(),
        Path(args.result).read_text().splitlines(),
    )

    proc = subprocess.Popen(
        cmd, stdin=subprocess.PIPE, stdout=subprocess.PIPE, text=True,
        bufsize=1, cwd=init_dir,
    )
    try:
        for l in init_lines:
            proc.stdin.write(l + "\n")
        proc.stdin.write("Done\n")
        proc.stdin.flush()
        time.sleep(args.prep_wait)

        failures = 0
        total = 0
        t0 = time.perf_counter()
        for queries, expected in batches:
            # Feed from a thread while draining stdout: writing a huge
            # batch before reading deadlocks once both pipes fill (same
            # select()-loop rationale as tools/harness.cpp).
            import threading

            def _feed(qs=queries):
                try:
                    for q in qs:
                        proc.stdin.write(q + "\n")
                    proc.stdin.write("F\n")
                    proc.stdin.flush()
                except (BrokenPipeError, ValueError):
                    pass  # engine died / early abort path closed stdin

            feeder = threading.Thread(target=_feed, daemon=True)
            feeder.start()
            for want in expected:
                got = proc.stdout.readline().rstrip("\n")
                total += 1
                if want is None:
                    failures += 1
                    print(f"MISMATCH q{total}: got {got!r}, no expected line",
                          file=sys.stderr)
                    continue
                if got != want:
                    failures += 1
                    print(f"MISMATCH q{total}: got {got!r} want {want!r}",
                          file=sys.stderr)
                    if failures >= MAX_FAILURES:
                        print("too many failures, aborting", file=sys.stderr)
                        return 1
            feeder.join()
        elapsed_ms = (time.perf_counter() - t0) * 1000.0
    finally:
        try:
            proc.stdin.write("Exit\n")
            proc.stdin.flush()
            proc.stdin.close()
        except Exception:
            pass
        proc.wait(timeout=60)

    if failures == 0:
        print(f"{total} queries, 0 mismatches, {elapsed_ms:.0f} ms")
        return 0
    print(f"{failures}/{total} mismatches", file=sys.stderr)
    return 1


if __name__ == "__main__":
    sys.exit(main())
