"""The JAX query VM: dense row-id intermediate results + operator dispatch.

This is the TPU-native restatement of the reference's interpreter
(ExecuteQuery, query.c:325-467) and intermediate-result machinery
(inter_res.c).  Differences by design (SURVEY §7.1):

- an intermediate component is a dense [A, P] int32 row-id matrix on device
  (A = active bindings, P = power-of-two padded row count) instead of a
  linked list of malloc'd columns (structs.h:97-111),
- every operator is a statically-shaped jitted XLA program; data-dependent
  cardinalities come back to the host as one scalar per operator, which
  picks the next size class,
- the pthread scheduler (scheduler.c) has no equivalent: intra-chip
  parallelism is XLA's, cross-chip parallelism lives in parallel/.

Empty result at any point short-circuits to a NULL line; emptiness is
preserved by every downstream operator, so this matches the oracle's
NULL-iff-final-result-empty semantics (Joiner.cpp:108).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DEFAULT_CONFIG, EngineConfig
from ..frontend.parser import FilterPred, JoinPred, Query
from ..storage.catalog import Catalog
from ..utils.padding import pad_to, size_class
from .. import ops

_MASK64 = (1 << 64) - 1


@dataclasses.dataclass
class Component:
    """One connected piece of the intermediate result."""

    bindings: Tuple[int, ...]  # order matches table rows
    table: jax.Array  # [len(bindings), P] int32 row-ids into base tables
    count: int  # live rows (host)

    def row(self, binding: int) -> jax.Array:
        return self.table[self.bindings.index(binding)]


class JaxEngine:
    """Executes contest queries against a Catalog on the JAX backend."""

    def __init__(self, catalog: Catalog, config: EngineConfig = DEFAULT_CONFIG):
        self.catalog = catalog
        self.config = config
        self._columns: Dict[Tuple[int, int], Tuple[jax.Array, int]] = {}
        self._planner = None
        if config.optimize_joins:
            from ..planner import plan_joins

            self._planner = plan_joins

    # ---- storage ---------------------------------------------------------

    def device_column(self, rid: int, cid: int) -> Tuple[jax.Array, int]:
        """Base column as a padded device array + live length."""
        key = (rid, cid)
        hit = self._columns.get(key)
        if hit is not None:
            return hit
        col = np.asarray(self.catalog.column(rid, cid), dtype=np.uint64)
        n = col.shape[0]
        dev = jnp.asarray(pad_to(col, size_class(n, self.config.min_pad)))
        self._columns[key] = (dev, n)
        return dev, n

    def prefetch(self) -> None:
        """Push every base column to device ahead of the timed phase
        (the contest's prep window is untimed, harness.cpp:175-177)."""
        for rid, rel in enumerate(self.catalog.relations):
            for cid in range(rel.num_columns):
                self.device_column(rid, cid)
        # Block until everything landed.
        for dev, _ in self._columns.values():
            dev.block_until_ready()

    # ---- execution -------------------------------------------------------

    def execute(self, query: Query) -> str:
        components: List[Component] = []

        def find(binding: int) -> Optional[Component]:
            for c in components:
                if binding in c.bindings:
                    return c
            return None

        def col_of(binding: int, column: int) -> Tuple[jax.Array, int]:
            return self.device_column(query.relations[binding], column)

        # ---- phase 1: filters and self-joins ----------------------------
        for pred in query.filters_and_selfjoins:
            if isinstance(pred, FilterPred):
                comp = self._exec_filter(components, find, col_of, pred)
            else:
                comp = self._exec_selfjoin(components, find, col_of, pred)
            if comp.count == 0:
                return _null_line(query)

        # ---- phase 2: joins ----------------------------------------------
        joins = query.joins
        if self._planner is not None and len(joins) > 1:
            joins = self._planner(query, self.catalog)
            if self.config.explain:
                import sys

                order = " -> ".join(str(j) for j in joins)
                print(f"-- plan: {order}", file=sys.stderr)

        for jp in joins:
            comp = self._exec_join(components, find, col_of, jp)
            if comp.count == 0:
                return _null_line(query)

        # ---- phase 3: cartesian of leftovers ------------------------------
        for b, _ in query.views:
            if find(b) is None:
                n = self.catalog.relation(query.relations[b]).num_tuples
                if n == 0:
                    return _null_line(query)
                P = size_class(n, self.config.min_pad)
                ident = jnp.arange(P, dtype=jnp.int32)[None, :]
                components.append(Component((b,), ident, n))
        while len(components) > 1:
            c1, c2 = components[0], components[1]
            total = c1.count * c2.count
            if total == 0:
                return _null_line(query)
            P = size_class(total, self.config.min_pad)
            i1, i2 = ops.cartesian_indices(
                jnp.int64(c1.count), jnp.int64(c2.count), out_size=P
            )
            table = jnp.concatenate(
                [ops.take_cols(c1.table, i1), ops.take_cols(c2.table, i2)], axis=0
            )
            merged = Component(c1.bindings + c2.bindings, table, total)
            components = [merged] + components[2:]

        if not components or components[0].count == 0:
            return _null_line(query)

        # ---- phase 4: checksums -------------------------------------------
        comp = components[0]
        n = jnp.int32(comp.count)
        sums = []
        for b, c in query.views:
            coldev, _ = col_of(b, c)
            sums.append(ops.checksum(coldev, comp.row(b), n))
        return " ".join(str(int(s) & _MASK64) for s in sums)

    # ---- operator implementations ----------------------------------------

    def _shrink(self, comp: Component) -> Component:
        """Drop to a smaller size class when the live count allows it."""
        P = size_class(comp.count, self.config.min_pad)
        if P < comp.table.shape[1]:
            comp = Component(comp.bindings, comp.table[:, :P], comp.count)
        return comp

    def _exec_filter(self, components, find, col_of, pred: FilterPred) -> Component:
        coldev, n_base = col_of(pred.binding, pred.column)
        const = jnp.uint64(pred.value & _MASK64)
        comp = find(pred.binding)
        if comp is None:
            mask = ops.compare_mask(coldev, jnp.int32(n_base), pred.op, const)
            pos, cnt = ops.mask_positions(mask, out_size=coldev.shape[0])
            count = int(cnt)
            new = self._shrink(Component((pred.binding,), pos[None, :], count))
            components.append(new)
            return new
        vals = ops.gather_u64(coldev, comp.row(pred.binding))
        mask = ops.compare_mask(vals, jnp.int32(comp.count), pred.op, const)
        return self._compact(components, comp, mask)

    def _exec_selfjoin(self, components, find, col_of, pred: JoinPred) -> Component:
        c1dev, n_base = col_of(pred.binding1, pred.column1)
        c2dev, _ = col_of(pred.binding1, pred.column2)
        comp = find(pred.binding1)
        if comp is None:
            mask = ops.equal_mask(c1dev, c2dev, jnp.int32(n_base))
            pos, cnt = ops.mask_positions(mask, out_size=c1dev.shape[0])
            count = int(cnt)
            new = self._shrink(Component((pred.binding1,), pos[None, :], count))
            components.append(new)
            return new
        rids = comp.row(pred.binding1)
        mask = ops.equal_mask(
            ops.gather_u64(c1dev, rids), ops.gather_u64(c2dev, rids), jnp.int32(comp.count)
        )
        return self._compact(components, comp, mask)

    def _compact(self, components, comp: Component, mask: jax.Array) -> Component:
        pos, cnt = ops.mask_positions(mask, out_size=comp.table.shape[1])
        count = int(cnt)
        new = self._shrink(Component(comp.bindings, ops.take_cols(comp.table, pos), count))
        components[:] = [c if c is not comp else new for c in components]
        return new

    def _exec_join(self, components, find, col_of, jp: JoinPred) -> Component:
        comp_l = find(jp.binding1)
        comp_r = find(jp.binding2)

        if comp_l is not None and comp_l is comp_r:
            # Both sides live in one component: value-equality selection
            # (reference JoinInterNode, inter_res.c:363-389).
            c1dev, _ = col_of(jp.binding1, jp.column1)
            c2dev, _ = col_of(jp.binding2, jp.column2)
            v1 = ops.gather_u64(c1dev, comp_l.row(jp.binding1))
            v2 = ops.gather_u64(c2dev, comp_l.row(jp.binding2))
            mask = ops.equal_mask(v1, v2, jnp.int32(comp_l.count))
            return self._compact(components, comp_l, mask)

        keys_l, n_l = self._join_keys(col_of, comp_l, jp.binding1, jp.column1)
        keys_r, n_r = self._join_keys(col_of, comp_r, jp.binding2, jp.column2)

        build_left = n_l <= n_r
        keys_b, n_b = (keys_l, n_l) if build_left else (keys_r, n_r)
        keys_p, n_p = (keys_r, n_r) if build_left else (keys_l, n_l)

        sorted_keys, perm = ops.join_build(keys_b, jnp.int32(n_b))
        lo, cnt, ccum, total_dev = ops.join_probe_count(
            sorted_keys, jnp.int32(n_b), keys_p, jnp.int32(n_p)
        )
        total = int(total_dev)
        new = self._merge_join_output(
            components, comp_l, comp_r, jp, build_left, perm, lo, ccum,
            total_dev, total,
        )
        return new

    def _join_keys(self, col_of, comp: Optional[Component], binding: int,
                   column: int) -> Tuple[jax.Array, int]:
        coldev, n_base = col_of(binding, column)
        if comp is None:
            return coldev, n_base
        return ops.gather_u64(coldev, comp.row(binding)), comp.count

    def _merge_join_output(self, components, comp_l, comp_r, jp: JoinPred,
                           build_left: bool, perm, lo, ccum, total_dev,
                           total: int) -> Component:
        if total == 0:
            empty = Component((jp.binding1, jp.binding2),
                              jnp.zeros((2, self.config.min_pad), jnp.int32), 0)
            return empty
        P = size_class(total, self.config.min_pad)
        bpos, ppos = ops.join_emit(perm, lo, ccum, total_dev, out_size=P)
        pos_l, pos_r = (bpos, ppos) if build_left else (ppos, bpos)

        rows: List[jax.Array] = []
        bindings: List[int] = []
        for comp, binding, pos in (
            (comp_l, jp.binding1, pos_l),
            (comp_r, jp.binding2, pos_r),
        ):
            if comp is not None:
                rows.append(ops.take_cols(comp.table, pos))
                bindings.extend(comp.bindings)
                components[:] = [c for c in components if c is not comp]
            else:
                rows.append(pos[None, :])
                bindings.append(binding)
        new = Component(tuple(bindings), jnp.concatenate(rows, axis=0), total)
        components.append(new)
        return new


def _null_line(query: Query) -> str:
    return " ".join("NULL" for _ in query.views)
