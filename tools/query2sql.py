"""REPL translating contest queries to SQL (reference: Query2SQL.cpp).

Reads query lines from stdin ('F' lines are skipped), writes one SQL
statement per query — for cross-validation against PostgreSQL/DuckDB with
the `r*.sql` / `r*.tbl` fixtures.
"""

import sys

from sigmod2018_tpu.frontend.parser import parse_query
from sigmod2018_tpu.frontend.sql import query_to_sql

for line in sys.stdin:
    line = line.strip()
    if not line or line in ("F", "Done", "Exit"):
        continue
    print(query_to_sql(parse_query(line)))
