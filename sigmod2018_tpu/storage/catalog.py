"""Catalog: the set of loaded relations + per-column statistics.

The reference's relation_map (relation_map.c:13-98) mmaps every file and
computes per-column stats in three host passes: min/max scan, then a capped
boolean-array distinct count (relation_map.c:52-83; the cap/fold quirk there
makes d an estimate).  Here stats are computed vectorized — NumPy on host by
default, or the optional native C++ loader (storage/native) which overlaps
mmap + stats across threads.  Distinct counts are exact (sort-unique): stats
feed only the planner, so better estimates only improve plans and cannot
affect result correctness.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence

import numpy as np

from .relation import Relation, load_relation


@dataclasses.dataclass
class ColumnStats:
    """l/u = min/max value, f = row count, d = distinct count
    (reference: structs.h:120-126), plus a 1-bucket MCV sketch the
    reference lacks: fmax = multiplicity of the most common value, mode =
    that value.  The sketch exists because the reference's span-based
    equi-join estimate (stats.c:212-234) under-predicts Zipf hot-key
    fanout by orders of magnitude, steering the DP into plans with
    billion-row intermediates."""

    l: int
    u: int
    f: int
    d: int
    fmax: int = 1
    mode: int = 0

    def copy(self) -> "ColumnStats":
        return ColumnStats(self.l, self.u, self.f, self.d, self.fmax,
                           self.mode)


def compute_column_stats(col: np.ndarray, exact_distinct: bool = True) -> ColumnStats:
    n = int(col.shape[0])
    if n == 0:
        return ColumnStats(0, 0, 0, 0)
    cmin = int(col.min())
    cmax = int(col.max())
    if exact_distinct:
        uniq, counts = np.unique(col, return_counts=True)
        d = int(uniq.size)
        top = int(np.argmax(counts))
        fmax, mode = int(counts[top]), int(uniq[top])
    else:
        # cheap estimate: distinct <= min(n, value range)
        d = min(n, cmax - cmin + 1)
        fmax, mode = max(1, n // max(d, 1)), cmin
    return ColumnStats(cmin, cmax, n, d, fmax, mode)


class Catalog:
    """All loaded relations, indexed by relation id (file order on stdin)."""

    def __init__(self, relations: Sequence[Relation], compute_stats: bool = True):
        self.relations: List[Relation] = list(relations)
        self.stats: List[List[ColumnStats]] = []
        if compute_stats:
            self._compute_stats()

    @staticmethod
    def from_files(paths: Sequence[str], compute_stats: bool = True) -> "Catalog":
        try:
            from .native import load_relations_native

            rels = load_relations_native(paths)
            if rels is not None:
                cat = Catalog.__new__(Catalog)
                cat.relations = [r for r, _ in rels]
                cat.stats = [s for _, s in rels]
                return cat
        except ImportError:
            pass
        return Catalog([load_relation(p) for p in paths], compute_stats=compute_stats)

    def _compute_stats(self) -> None:
        self.stats = [
            [compute_column_stats(col) for col in rel.columns]
            for rel in self.relations
        ]

    def relation(self, rid: int) -> Relation:
        return self.relations[rid]

    def column(self, rid: int, cid: int) -> np.ndarray:
        return self.relations[rid].columns[cid]

    def column_stats(self, rid: int, cid: int) -> ColumnStats:
        return self.stats[rid][cid]

    def __len__(self) -> int:
        return len(self.relations)
