"""Native harness robustness: large single-batch workloads must not
deadlock (reference harness uses a select() loop for the same reason,
/root/reference/submission/harness.cpp:196-263).

The deadlock mode: the harness writes the whole batch into the child's
stdin pipe before reading any stdout; an engine that emits results while
the harness is still writing fills its stdout pipe, both ends block.
We drive the harness against a trivial streaming echo engine (answers
every query line immediately) with a 5000-query single batch — the
pre-fix blocking-write harness wedges on this within the pipe capacity
(~64 KiB), the select() version completes.
"""

import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

ECHO_ENGINE = r"""
import sys
# protocol: relation lines until Done (ignored), then one output line per
# query line, emitted IMMEDIATELY (the adversarial streaming case).
for line in sys.stdin:
    if line.strip() == "Done":
        break
for line in sys.stdin:
    s = line.strip()
    if s in ("F", ""):
        continue
    if s == "Exit":
        break
    sys.stdout.write("NULL\n")
    sys.stdout.flush()
"""


@pytest.fixture(scope="module")
def harness_bin():
    subprocess.run(["make", "build/harness"], cwd=REPO, check=True,
                   capture_output=True)
    return REPO / "build" / "harness"


def test_large_single_batch_no_deadlock(tmp_path, harness_bin):
    n = 5000
    init = tmp_path / "big.init"
    work = tmp_path / "big.work"
    result = tmp_path / "big.result"
    engine = tmp_path / "echo_engine.py"
    init.write_text("r0\n")
    # one giant batch, no interior F
    work.write_text("".join(f"0|0.0={i}|0.0\n" for i in range(n)) + "F\n")
    result.write_text("NULL\n" * n)
    engine.write_text(ECHO_ENGINE)

    out = subprocess.run(
        [str(harness_bin), str(init), str(work), str(result), "0.1",
         sys.executable, str(engine)],
        capture_output=True, text=True, timeout=60,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert f"{n} queries, 0 mismatches" in out.stdout


def test_short_result_file_reports_mismatch(tmp_path, harness_bin):
    init = tmp_path / "s.init"
    work = tmp_path / "s.work"
    result = tmp_path / "s.result"
    engine = tmp_path / "echo_engine.py"
    init.write_text("r0\n")
    work.write_text("0|0.0=1|0.0\n0|0.0=2|0.0\nF\n")
    result.write_text("NULL\n")  # one line short
    engine.write_text(ECHO_ENGINE)
    out = subprocess.run(
        [str(harness_bin), str(init), str(work), str(result), "0.1",
         sys.executable, str(engine)],
        capture_output=True, text=True, timeout=30,
    )
    assert out.returncode == 1
    assert "MISMATCH" in out.stderr
