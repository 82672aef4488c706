"""Columnar relation storage.

Binary file layout (reference: relation_map.c:39-51, Relation.cpp:52-86,
verified byte-exact against workloads/small/r0):

    uint64 num_tuples | uint64 num_columns | col0[num_tuples] | col1[...] ...

all little-endian uint64, column-major.  Loading is zero-copy via np.memmap;
the engine backend pushes columns to device (padded) lazily.

Also provides the writers the C++ skeleton has (Relation.cpp:10-50):
binary store, CSV dump, and PostgreSQL DDL — used by the test-fixture
generators and the SQL cross-validation path.
"""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional

import numpy as np


@dataclasses.dataclass
class Relation:
    """An immutable in-memory (or memory-mapped) columnar uint64 table."""

    columns: List[np.ndarray]  # each shape [num_tuples], dtype uint64
    name: str = ""

    @property
    def num_tuples(self) -> int:
        return 0 if not self.columns else int(self.columns[0].shape[0])

    @property
    def num_columns(self) -> int:
        return len(self.columns)

    def column(self, i: int) -> np.ndarray:
        return self.columns[i]


def load_relation(path: str | os.PathLike) -> Relation:
    """mmap a binary relation file (reference: relation_map.c:24-51)."""
    path = os.fspath(path)
    header = np.fromfile(path, dtype="<u8", count=2)
    if header.size < 2:
        raise ValueError(f"{path}: truncated relation header")
    num_tuples, num_cols = int(header[0]), int(header[1])
    expected = 16 + num_tuples * num_cols * 8
    actual = os.path.getsize(path)
    if actual < expected:
        raise ValueError(
            f"{path}: file size {actual} < expected {expected} "
            f"({num_tuples} tuples x {num_cols} cols)"
        )
    if num_tuples == 0 or num_cols == 0:
        return Relation(
            columns=[np.empty(0, dtype=np.uint64) for _ in range(num_cols)],
            name=os.path.basename(path),
        )
    mm = np.memmap(path, dtype="<u8", mode="r", offset=16, shape=(num_cols, num_tuples))
    return Relation(columns=[mm[c] for c in range(num_cols)], name=os.path.basename(path))


def store_relation(rel: Relation, path: str | os.PathLike) -> None:
    """Write the binary format (reference: Relation.cpp:21-35)."""
    with open(path, "wb") as f:
        np.array([rel.num_tuples, rel.num_columns], dtype="<u8").tofile(f)
        for col in rel.columns:
            np.ascontiguousarray(col, dtype="<u8").tofile(f)


def store_relation_csv(rel: Relation, path: str | os.PathLike) -> None:
    """Write one row per line, comma-separated (reference: Relation.cpp:10-19)."""
    with open(path, "w") as f:
        for i in range(rel.num_tuples):
            f.write(",".join(str(int(col[i])) for col in rel.columns))
            f.write("\n")


def dump_sql(rel: Relation, path: str | os.PathLike, table_name: str) -> None:
    """PostgreSQL DDL + COPY-friendly dump (reference: Relation.cpp:37-50)."""
    with open(path, "w") as f:
        cols = ", ".join(f"c{i} bigint" for i in range(rel.num_columns))
        f.write(f"CREATE TABLE {table_name} ({cols});\n")
        csv_name = f"{table_name}.tbl"
        f.write(f"copy {table_name} from '{csv_name}' delimiter ',' NULL '';\n")


def make_identity_relation(num_tuples: int, num_columns: int, name: str = "") -> Relation:
    """Every column is 0..num_tuples-1 — join results become analytically
    predictable (reference: Utils.cpp:7-27, used throughout the gtest suite)."""
    col = np.arange(num_tuples, dtype=np.uint64)
    return Relation(columns=[col.copy() for _ in range(num_columns)], name=name)
