"""Static operator DAG: the TPU-native replacement for DataFusion physical plans.

Reference counterpart: Flock serializes DataFusion ``ExecutionPlan`` trees into
env vars and ships them to workers (flock/src/runtime/context.rs:366-398,
distributed_plan/stage.rs).  Under SPMD there is nothing to ship — the "plan"
is a small immutable Python DAG that lowers to one jitted XLA program per
stage.  Node types mirror the operator set Flock's plans contain (filter,
projection, hash aggregate partial/final, hash join, sort, window rank,
coalesce/repartition).

Scalar expressions are plain callables ``cols_dict -> array`` plus a repr
string; node *types* carry the structure the stage planner needs (shuffle
boundaries sit at final aggregates and join builds, planner.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax.numpy as jnp

from flock_tpu.batch import Batch
from flock_tpu.ops import kernels

Expr = Callable[[dict], "jnp.ndarray"]


@dataclass(frozen=True)
class Node:
    def inputs(self) -> tuple["Node", ...]:
        return ()


@dataclass(frozen=True)
class Scan(Node):
    relation: str


@dataclass(frozen=True)
class Filter(Node):
    child: Node
    pred: Expr
    label: str = ""

    def inputs(self):
        return (self.child,)


@dataclass(frozen=True)
class Project(Node):
    child: Node
    exprs: tuple  # tuple[(out_name, str passthrough | Expr)]

    def inputs(self):
        return (self.child,)


@dataclass(frozen=True)
class Aggregate(Node):
    """Grouped aggregation.  ``mode`` mirrors DataFusion's Partial/Final split
    (the shuffle boundary Flock chops stages at, stage.rs:269-367):

    * single  — complete aggregation in one shot,
    * partial — pre-shuffle local aggregation (emits partial sums/counts),
    * final   — post-shuffle re-aggregation of partials.
    """

    child: Node
    group_keys: tuple[str, ...]
    aggs: tuple  # tuple[(in_col|None, fn, out_name)]
    mode: str = "single"
    out_capacity: int | None = None

    def inputs(self):
        return (self.child,)


@dataclass(frozen=True)
class Join(Node):
    """N-to-1 lookup join (see kernels.lookup_join).  ``post_filter`` runs on
    the joined row (probe cols + taken build cols) — e.g. the q4/q9 interval
    predicate b_date_time BETWEEN a_date_time AND expires."""

    build: Node
    probe: Node
    build_key: str
    probe_key: str
    take: tuple  # tuple[(build_col, out_name)]
    post_filter: Expr | None = None

    def inputs(self):
        return (self.build, self.probe)


@dataclass(frozen=True)
class Rank(Node):
    """ROW_NUMBER() OVER (PARTITION BY group ORDER BY order)."""

    child: Node
    group_key: str
    order_col: str
    descending: bool
    rank_name: str
    tiebreak: str | None = None

    def inputs(self):
        return (self.child,)


@dataclass(frozen=True)
class Sort(Node):
    child: Node
    keys: tuple[str, ...]
    descending: tuple[bool, ...] = ()

    def inputs(self):
        return (self.child,)


@dataclass(frozen=True)
class Compact(Node):
    """Densify live rows into a smaller buffer (CoalesceBatchesExec analogue)."""

    child: Node
    out_capacity: int

    def inputs(self):
        return (self.child,)


# ---------------------------------------------------------------------------
# Lowering: plan → function over Batches
# ---------------------------------------------------------------------------


@dataclass
class Lowered:
    """Result of lowering a node: columns + validity + overflow accumulator."""

    cols: dict
    valid: object
    overflow: object


def lower(node: Node, tables: dict[str, Batch], agg_capacity: int | None = None) -> Lowered:
    """Recursively lower a plan over concrete input batches.

    ``agg_capacity`` is the default output capacity for aggregates whose node
    doesn't pin one (chosen by the executor from input sizes).
    """
    if isinstance(node, Scan):
        b = tables[node.relation]
        return Lowered(dict(b.columns), b.valid, jnp.asarray(False))

    if isinstance(node, Filter):
        c = lower(node.child, tables, agg_capacity)
        return Lowered(c.cols, c.valid & node.pred(c.cols), c.overflow)

    if isinstance(node, Project):
        c = lower(node.child, tables, agg_capacity)
        out = {}
        for name, e in node.exprs:
            out[name] = c.cols[e] if isinstance(e, str) else e(c.cols)
        return Lowered(out, c.valid, c.overflow)

    if isinstance(node, Aggregate):
        c = lower(node.child, tables, agg_capacity)
        cap = node.out_capacity or agg_capacity or c.valid.shape[0]
        aggs = list(node.aggs)
        if node.mode == "final":
            # re-aggregate partials: sums of partial sums/counts, min of mins...
            aggs = [(out, {"count": "sum"}.get(fn, fn), out) for (_, fn, out) in aggs]
        cols, valid, ovf = kernels.group_aggregate(
            c.cols, c.valid, list(node.group_keys), aggs, cap)
        return Lowered(cols, valid, c.overflow | ovf)

    if isinstance(node, Join):
        b = lower(node.build, tables, agg_capacity)
        p = lower(node.probe, tables, agg_capacity)
        cols, valid, ovf = kernels.lookup_join(
            b.cols, b.valid, node.build_key,
            p.cols, p.valid, node.probe_key, dict(node.take))
        if node.post_filter is not None:
            valid = valid & node.post_filter(cols)
        return Lowered(cols, valid, b.overflow | p.overflow | ovf)

    if isinstance(node, Rank):
        c = lower(node.child, tables, agg_capacity)
        cols, valid = kernels.rank_in_group(
            c.cols, c.valid, node.group_key, node.order_col,
            node.descending, node.rank_name, node.tiebreak)
        return Lowered(cols, valid, c.overflow)

    if isinstance(node, Sort):
        c = lower(node.child, tables, agg_capacity)
        desc = node.descending or (False,) * len(node.keys)
        cols, valid = kernels.sort_rows(c.cols, c.valid, list(node.keys), desc)
        return Lowered(cols, valid, c.overflow)

    if isinstance(node, Compact):
        c = lower(node.child, tables, agg_capacity)
        cols, valid, ovf = kernels.compact(c.cols, c.valid, node.out_capacity)
        return Lowered(cols, valid, c.overflow | ovf)

    raise TypeError(f"unknown plan node {type(node)}")


def compile_plan(root: Node, agg_capacity: int | None = None):
    """Plan → ``fn(tables: dict[str, Batch]) -> (Batch, overflow: bool array)``.

    The returned function is pure and jittable; jit specializes on the input
    batch capacities (the stream driver reuses a handful of capacity buckets
    to bound recompilation).
    """

    def fn(tables: dict[str, Batch]):
        out = lower(root, tables, agg_capacity)
        return Batch(columns=out.cols, valid=out.valid), out.overflow

    return fn


def walk(root: Node):
    """Post-order traversal (planner utility)."""
    seen = []

    def rec(n):
        for i in n.inputs():
            rec(i)
        seen.append(n)

    rec(root)
    return seen
