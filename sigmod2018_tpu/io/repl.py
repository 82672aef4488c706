"""stdin/stdout protocol driver (reference: handler.c, main.cpp).

Protocol:
  1. one relation file path per line, until the line "Done"
  2. query lines in batches; "F" ends a batch (the whole batch executes
     then), "Exit" or EOF terminates
  3. one output line per query: space-separated uint64 checksums, or NULL
     per projection on an empty result

The prep phase (loading + stats + device transfer) happens before the first
batch and is untimed by the contest harness (harness.cpp:175-208), so the
engine eagerly pushes all columns to the device and pre-compiles the hot
operator shapes there.
"""

from __future__ import annotations

import sys
from typing import IO, List, Optional

from ..config import EngineConfig
from ..frontend.parser import Query, parse_query
from ..storage.catalog import Catalog


def run_protocol(stdin: IO[str], stdout: IO[str],
                 config: Optional[EngineConfig] = None) -> None:
    config = config or EngineConfig.from_env()

    paths: List[str] = []
    for raw in stdin:
        line = raw.strip()
        if line == "Done":
            break
        if line:
            paths.append(line)

    catalog = Catalog.from_files(paths)

    if config.backend == "numpy":
        from ..engine.oracle import execute_query_numpy

        def run_one(q: Query) -> str:
            return execute_query_numpy(q, catalog)
    else:
        from ..engine.executor import JaxEngine

        engine = JaxEngine(catalog, config)
        engine.prefetch()
        run_one = engine.execute

    def run_isolated(q) -> str:
        # Per-query fault isolation: one bad query must not kill the batch
        # (the reference exits the process on internal errors, query.c:424;
        # we degrade to a NULL line and keep serving).
        try:
            return run_one(q)
        except Exception as exc:  # noqa: BLE001
            print(f"query error: {exc!r} in {q.text!r}", file=sys.stderr)
            return " ".join("NULL" for _ in q.views) if q.views else "NULL"

    batch: List[Query] = []
    for raw in stdin:
        line = raw.strip()
        if line == "Exit":
            break
        if not line:
            continue
        if line == "F":
            for q in batch:
                stdout.write(run_isolated(q) + "\n")
            stdout.flush()
            batch = []
            continue
        try:
            batch.append(parse_query(line))
        except Exception as exc:  # noqa: BLE001
            print(f"parse error: {exc!r} in {line!r}", file=sys.stderr)
            batch.append(Query((), (), ((0, 0),), text=line))
    # Trailing unterminated batch (EOF without final F) still executes,
    # matching the C++ driver's per-line behavior (main.cpp:17-22).
    for q in batch:
        stdout.write(run_isolated(q) + "\n")
    stdout.flush()


def main() -> None:
    run_protocol(sys.stdin, sys.stdout)


if __name__ == "__main__":
    main()
