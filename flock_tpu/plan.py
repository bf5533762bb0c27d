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
    # planner statistics hint: expected key span of a 4096-row block (sizes the
    # blocked one-hot window, kernels.S_LOC_*); None → default
    s_loc: int | None = None

    def inputs(self):
        return (self.child,)


@dataclass(frozen=True)
class Join(Node):
    """Inner lookup join (see kernels.lookup_join).  ``post_filter`` runs on
    the joined row (probe cols + taken build cols) — e.g. the q4/q9 interval
    predicate b_date_time BETWEEN a_date_time AND expires.

    Duplicate build keys fan out (bounded, duplicate-faithful — DataFusion
    hash-join semantics); ``unique_build=True`` is the catalog's declaration
    that build keys cannot duplicate (e.g. q13's side input), which skips the
    expansion buffer and turns surprise duplicates into an overflow."""

    build: Node
    probe: Node
    build_key: str
    probe_key: str
    take: tuple  # tuple[(build_col, out_name)]
    post_filter: Expr | None = None
    # locality hints (kernels.S_LOC_*): one-hot window sizes for the probe
    # pass and (optionally) blocked build-side slotting
    probe_s_loc: int | None = None
    build_s_loc: int | None = None
    # per-taken-column 8-bit-limb hints for the factored pallas gather
    # (pallas/factored._limb_plan): tuple[(out_name, limbs)] — 3 ⇒ values
    # verified at runtime in [0, 2²⁴), 1 ⇒ [0, 2⁸); violations escape
    take_limbs: tuple = ()
    unique_build: bool = False

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


def _sorted_by(node: Node, key: str) -> bool:
    """True when ``node``'s output rows are grouped-contiguous by ``key``:
    a Rank/Sort on that key below order-preserving Filters/Projects."""
    while True:
        if isinstance(node, Filter):
            node = node.child
        elif isinstance(node, Project):
            src = dict(node.exprs).get(key)
            if not isinstance(src, str):
                return False
            key = src
            node = node.child
        else:
            break
    if isinstance(node, Rank):
        return node.group_key == key
    if isinstance(node, Sort):
        return bool(node.keys) and node.keys[0] == key
    return False


def _slot_dense(node: Node, key: str) -> bool:
    """True when ``node`` lowers to a dense-slot relation keyed on ``key``
    (slot i ↔ key col[0]+i, gaps invalid): single-key Aggregates (all
    dense_group_aggregate branches slot their output) and fused
    join-aggregates.  Callers must still check the key dtype is integral
    (floats take the sort-based, non-slotted path)."""
    while isinstance(node, Project):
        src = dict(node.exprs).get(key)
        if not isinstance(src, str):
            return False
        key = src
        node = node.child
    if isinstance(node, Aggregate):
        return (node.group_keys == (key,)
                and not _sorted_by(node.child, key))
    if isinstance(node, FusedJoinAggregate):
        # a secondary key means dup windows emit >1 row per primary key
        # (fallback's multi-key output is not slotted)
        return node.group_key == key and node.group_key2 is None
    return False


def dup_expand_capacity(n_probe: int) -> int:
    """Join output capacity with fan-out headroom for duplicate build keys:
    half the probe capacity of free tail (128-aligned) on top of whatever
    padding the probe already carries; extras beyond it overflow and the
    drivers widen-and-retry.  Single definition shared by the local and
    distributed lowerings so their retry behavior cannot drift."""
    return n_probe + max((n_probe // 2 + 127) // 128 * 128, 128)


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
        aggs = list(node.aggs)
        if node.mode == "final":
            # re-aggregate partials: sums of partial sums/counts, min of mins...
            aggs = [(out, {"count": "sum"}.get(fn, fn), out) for (_, fn, out) in aggs]
        if (len(node.group_keys) == 1
                and _sorted_by(node.child, node.group_keys[0])):
            # child rows arrive sorted by the group key (Rank/Sort below):
            # segmented scans, no scatter, output keeps the child capacity
            cols, valid, ovf = kernels.sorted_segment_aggregate(
                c.cols, c.valid, node.group_keys[0], aggs)
            return Lowered(cols, valid, c.overflow | ovf)
        cap = node.out_capacity or agg_capacity or c.valid.shape[0]
        cols, valid, ovf = kernels.group_aggregate(
            c.cols, c.valid, list(node.group_keys), aggs, cap,
            s_loc=node.s_loc)
        return Lowered(cols, valid, c.overflow | ovf)

    if isinstance(node, Join):
        b = lower(node.build, tables, agg_capacity)
        p = lower(node.probe, tables, agg_capacity)
        b_slotted = (_slot_dense(node.build, node.build_key)
                     and not jnp.issubdtype(
                         b.cols[node.build_key].dtype, jnp.floating))
        if (b_slotted and _slot_dense(node.probe, node.probe_key)
                and not jnp.issubdtype(
                    p.cols[node.probe_key].dtype, jnp.floating)):
            # both sides are dense-slot aggregates over the same key domain:
            # the join is a shifted contiguous copy (kernels.slot_join)
            cols, valid, ovf = kernels.slot_join(
                b.cols, b.valid, node.build_key,
                p.cols, p.valid, node.probe_key, dict(node.take))
        elif jnp.issubdtype(b.cols[node.build_key].dtype, jnp.floating) \
                or jnp.issubdtype(p.cols[node.probe_key].dtype, jnp.floating):
            # general-key fallback: float keys have no dense slot span —
            # sort the build side and binary-search the probes
            cols, valid = kernels.sorted_lookup_join(
                b.cols, b.valid, node.build_key,
                p.cols, p.valid, node.probe_key, dict(node.take))
            ovf = jnp.asarray(False)
        else:
            exp_cap = None
            if not node.unique_build and not b_slotted:
                exp_cap = dup_expand_capacity(p.valid.shape[0])
            cols, valid, ovf = kernels.lookup_join(
                b.cols, b.valid, node.build_key,
                p.cols, p.valid, node.probe_key, dict(node.take),
                probe_s_loc=node.probe_s_loc, build_s_loc=node.build_s_loc,
                build_slotted=b_slotted,
                take_limbs=dict(node.take_limbs) if node.take_limbs
                else None,
                dup_expand=not node.unique_build, out_capacity=exp_cap)
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

    if isinstance(node, FusedJoinAggregate):
        return _lower_fused(node, tables, agg_capacity)

    raise TypeError(f"unknown plan node {type(node)}")


def fused_dtypes_supported(node: "FusedJoinAggregate",
                           b_cols, p_cols) -> bool:
    """Static pre-check: the fused kernel handles integer aggregation only;
    float min/max/sum columns must take the unfused path (the lowerings call
    this BEFORE choosing, so the decision is a trace-time branch)."""
    from flock_tpu.ops import blocked

    jn = node.join
    take = dict(jn.take)
    slot_like = {dst: b_cols[src] for src, dst in take.items()}
    middle = node.middle
    post = jn.post_filter

    def replay(bcast, pair):
        cols = dict(bcast)
        if post is not None:
            pair = pair & post(cols)
        for nd in middle:
            if isinstance(nd, Filter):
                pair = pair & nd.pred(cols)
            else:
                cols = {nm: (cols[e] if isinstance(e, str) else e(cols))
                        for nm, e in nd.exprs}
        return cols, pair

    try:
        dts = blocked.fused_acc_dtypes(slot_like, p_cols, replay,
                                       _fused_clean_aggs(node))
    except Exception:
        return False
    return all(jnp.issubdtype(dt, jnp.integer) for dt in dts.values())


def _fused_clean_aggs(node: "FusedJoinAggregate") -> list:
    """The aggregate list the CLEAN (unique-build-key) fused pass executes:
    ``wmin:`` winner-carries lower to plain max (the carry is functionally
    dependent on the group key when build keys are unique), and a secondary
    group key is carried as one more max for the same reason.  Duplicate
    build keys escape to the fallback before this approximation can bite."""
    aggs = [(c, "max" if f.startswith("wmin:") else f, o)
            for c, f, o in node.aggs]
    if node.group_key2 is not None:
        aggs.append((node.group_key2, "max", node.group_key2))
    return aggs


def fused_local_pass(node: "FusedJoinAggregate",
                     b_cols, b_valid, p_cols, p_valid):
    """The fused join+filter+aggregate core over already-lowered sides.

    Shared by the single-device lowering and the distributed lowering (where
    the build side arrives broadcast-gathered and the output is a per-shard
    partial).  Returns (out_cols, valid, slot_overflow, escape, span)."""
    from flock_tpu.config import CONFIG
    from flock_tpu.ops import blocked
    from flock_tpu.ops.kernels import AGG_BLOCK, AGG_S_LOC, I32_MAX

    jn = node.join
    span = b_valid.shape[0] + CONFIG.join_span_margin
    take = dict(jn.take)
    slot_aggs = [(src, "max", src) for src in take] \
        + [(None, "count", "__dupcnt")]
    # slotting is a 1:1 scatter of build rows; ascending build keys span a
    # whole block, so the DEFAULT blocked window would always escape — a
    # build_s_loc hint sized to the ascending span (S_LOC_DENSE_IDS) turns
    # the scatter (~25ns/row) into the blocked one-hot
    slots, present, ovf_b = kernels.dense_group_aggregate(
        {jn.build_key: b_cols[jn.build_key],
         **{s: b_cols[s] for s in take}},
        b_valid, jn.build_key, slot_aggs, span,
        allow_blocked=jn.build_s_loc is not None, s_loc=jn.build_s_loc)
    # duplicate build keys (misaligned-generator id wraparound) invalidate
    # the max-collapsed slots AND the functional dependencies the clean pass
    # leans on — escape to the duplicate-faithful fallback join
    has_dups = jnp.any(slots.pop("__dupcnt") > 1)
    m = jnp.min(jnp.where(b_valid, b_cols[jn.build_key], I32_MAX))
    slot_cols = {dst: slots[src] for src, dst in take.items()}

    middle = node.middle
    post = jn.post_filter

    def replay(bcast, pair):
        cols = dict(bcast)
        if post is not None:
            pair = pair & post(cols)
        for nd in middle:
            if isinstance(nd, Filter):
                pair = pair & nd.pred(cols)
            else:  # Project
                cols = {nm: (cols[e] if isinstance(e, str) else e(cols))
                        for nm, e in nd.exprs}
        return cols, pair

    n = p_valid.shape[0]
    pad = (-n) % AGG_BLOCK
    pcols = {k: jnp.pad(v, (0, pad)) for k, v in p_cols.items()}
    pvalid = jnp.pad(p_valid, (0, pad))
    from flock_tpu.pallas import join_agg

    # probe-side locality window: the plan's statistics hint (e.g.
    # S_LOC_AUCTION_OVER_BID, derived from the generator's frontier math)
    # halves the one-hot op count vs the 1024 default when it applies
    import os as _os

    from flock_tpu.pallas import factored

    s_loc = jn.probe_s_loc or AGG_S_LOC
    limbs = dict(jn.take_limbs) if jn.take_limbs else None
    aggs_k = _fused_clean_aggs(node)
    if factored.enabled() and factored.join_preferred() \
            and s_loc <= 2048 and factored.join_agg_eligible(
                slot_cols, pcols, replay, aggs_k, limbs):
        # factored gather→row-filter→aggregate (pallas/factored): the join
        # never materializes and no [B, s_loc] one-hot is ever built
        out, ovalid, esc = factored.factored_join_agg_rebased(
            slot_cols, present, m, pcols, pvalid, jn.probe_key, replay,
            aggs_k, s_loc=s_loc, limbs=limbs)
    elif join_agg.fused_preferred() and join_agg.eligible(
            slot_cols, pcols, replay, aggs_k):
        # Pallas path (opt-in, FLOCK_TPU_PALLAS=2): span accumulators live in
        # VMEM across the grid instead of round-tripping HBM per block (int64
        # timestamps rebase to window-relative int32); the measured default
        # is the XLA fused scan — see join_agg.fused_preferred
        out, ovalid, esc = join_agg.fused_join_aggregate_rebased(
            slot_cols, present, m, pcols, pvalid, jn.probe_key, replay,
            aggs_k)
    else:
        out, ovalid, esc = blocked.blocked_join_aggregate(
            slot_cols, present, m, pcols, pvalid, jn.probe_key, replay,
            aggs_k, span, block=min(AGG_BLOCK, n + pad),
            s_loc=s_loc)
    out[node.group_key] = out.pop("__key")
    return out, ovalid & present, ovf_b, esc | has_dups, span


def _lower_fused(node: "FusedJoinAggregate", tables, agg_capacity) -> Lowered:
    jn = node.join
    b = lower(jn.build, tables, agg_capacity)
    p = lower(jn.probe, tables, agg_capacity)

    if node.fallback is not None and not fused_dtypes_supported(
            node, b.cols, p.cols):
        # float aggregation columns: take the unfused path statically
        return lower(node.fallback, tables, agg_capacity)

    out, valid, ovf_b, esc, span = fused_local_pass(
        node, b.cols, b.valid, p.cols, p.valid)
    import os
    needs_fb = esc | ovf_b
    if os.environ.get("FLOCK_TPU_NO_FALLBACK") or node.fallback is None:
        return Lowered(out, valid, b.overflow | p.overflow | needs_fb)

    # escape/slot-overflow safety net: re-run the ORIGINAL unfused
    # Aggregate(…(Join)) subtree via lax.cond, sized to the fused span so the
    # branch shapes agree (rows are (key, value) pairs either way — slot
    # alignment differs, semantics don't)
    import dataclasses

    from jax import lax

    fb_node = dataclasses.replace(node.fallback, out_capacity=span)
    names = sorted(out)

    def esc_branch():
        fb = lower(fb_node, tables, span)
        return (tuple(fb.cols[nm] for nm in names)
                + (fb.valid, fb.overflow.reshape(())))

    def ok_branch():
        return (tuple(out[nm] for nm in names)
                + (valid, (needs_fb & False).reshape(())))

    picked = lax.cond(needs_fb, esc_branch, ok_branch)
    out2 = dict(zip(names, picked[:-2]))
    return Lowered(out2, picked[-2],
                   b.overflow | p.overflow | picked[-1])


def compile_plan(root: Node, agg_capacity: int | None = None):
    """Plan → ``fn(tables: dict[str, Batch]) -> (Batch, overflow: bool array)``.

    The returned function is pure and jittable; jit specializes on the input
    batch capacities (the stream driver reuses a handful of capacity buckets
    to bound recompilation).
    """

    root = fuse_join_aggregates(root)

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


def referenced_columns(root: Node) -> set[str] | None:
    """Over-approximate the set of column names a plan reads, or None when it
    is not statically determinable (callable exprs hide their reads).

    Drivers use this to project input tables down to the live columns before
    staging them in HBM (the column-pushdown the reference gets from
    DataFusion's ProjectionPushdown pass).  The result may include non-scan
    names (aggregate outputs, projection aliases); callers intersect with the
    actual table columns, which is safe because every read is either a listed
    string or forces the None fallback."""
    cols: set[str] = set()
    for n in walk(root):
        if isinstance(n, Filter):
            return None  # predicate is an opaque callable
        if isinstance(n, Project):
            for _, e in n.exprs:
                if not isinstance(e, str):
                    return None
                cols.add(e)
        elif isinstance(n, Aggregate):
            cols.update(n.group_keys)
            cols.update(c for c, _, _ in n.aggs if c is not None)
            cols.update(f[5:] for _, f, _ in n.aggs if f.startswith("wmin:"))
        elif isinstance(n, Join):
            if n.post_filter is not None:
                return None
            cols.update((n.build_key, n.probe_key))
            cols.update(src for src, _ in n.take)
        elif isinstance(n, Rank):
            cols.update((n.group_key, n.order_col))
            if n.tiebreak:
                cols.add(n.tiebreak)
        elif isinstance(n, Sort):
            cols.update(n.keys)
        elif isinstance(n, FusedJoinAggregate):
            return None  # pre-fusion plans only; fusion happens at compile
    return cols


@dataclass(frozen=True)
class FusedJoinAggregate(Node):
    """Join + (filters/projections) + grouped aggregation fused into one
    blocked pass (ops/blocked.blocked_join_aggregate) — joined rows are never
    materialized.  Produced by ``fuse_join_aggregates`` when an Aggregate's
    primary group key is the join key of a lookup Join below it (the
    winning-bid core of q4/q9).

    ``group_key2`` (optional) is a secondary group key that is a TAKEN build
    column (q4's GROUP BY a_id, category): with unique build keys it is
    functionally dependent on the primary key, so the fused pass groups by
    key1 alone and carries key2 as a max — exactly one live (key1, key2)
    pair per slot.  Duplicate build keys break the dependency; the fused
    pass detects them at runtime and escapes to ``fallback`` (the original
    multi-key Aggregate over the duplicate-faithful fan-out join).  The same
    escape covers ``wmin:`` winner-carry aggregates, which the fused clean
    pass lowers to a plain max under the dependency."""

    join: Join
    middle: tuple            # Filter/Project chain, join-side first
    group_key: str
    aggs: tuple
    fallback: Node = None    # the original Aggregate subtree (escape path)
    out_capacity: int | None = None
    # secondary group key: its aggregate-level name, which is also its name
    # after the replayed middle chain (the fused kernels evaluate aggs on
    # replayed columns, so this is the name the carry-max reads)
    group_key2: str | None = None

    def inputs(self):
        return (self.join,)


def fuse_join_aggregates(node: Node) -> Node:
    """Rewrite Aggregate(…Filter/Project…(Join)) patterns into
    FusedJoinAggregate when the group key is the join key.  Disabled with
    FLOCK_TPU_NO_FUSE=1."""
    import os

    if os.environ.get("FLOCK_TPU_NO_FUSE"):
        return node

    import dataclasses

    def resolve(chain, k):
        """Map a column name top-down through the Project chain, or None."""
        for nd in chain:
            if isinstance(nd, Project):
                src = dict(nd.exprs).get(k)
                if not isinstance(src, str):
                    return None
                k = src
        return k

    def rewrite(n: Node) -> Node:
        if isinstance(n, Aggregate) and len(n.group_keys) in (1, 2):
            chain = []
            cur = n.child
            while isinstance(cur, (Filter, Project)):
                chain.append(cur)
                cur = cur.child
            if isinstance(cur, Join):
                take_outs = set(dict(cur.take).values())
                key = n.group_keys[0]
                k = resolve(chain, key)
                int_aggs = all(fn in ("count", "count_sum", "sum", "min",
                                      "max") or fn.startswith("wmin:")
                               for _, fn, _ in n.aggs)
                # the clean fused pass lowers wmin winner-carries to max,
                # valid only for TAKEN BUILD columns (functionally dependent
                # on the unique join key; duplicates escape to fallback)
                wmin_ok = all(resolve(chain, c) in take_outs
                              for c, fn, _ in n.aggs
                              if fn.startswith("wmin:"))
                # a secondary group key must likewise be a taken build column
                key2 = n.group_keys[1] if len(n.group_keys) == 2 else None
                key2_ok = key2 is None or resolve(chain, key2) in take_outs
                if k in (cur.probe_key, cur.build_key) and int_aggs \
                        and wmin_ok and key2_ok:
                    join = dataclasses.replace(
                        cur, build=rewrite(cur.build),
                        probe=rewrite(cur.probe))
                    return FusedJoinAggregate(
                        join=join, middle=tuple(reversed(chain)),
                        group_key=key, aggs=n.aggs, fallback=n,
                        out_capacity=n.out_capacity, group_key2=key2)
        # generic recursion
        if isinstance(n, Aggregate):
            return dataclasses.replace(n, child=rewrite(n.child))
        if isinstance(n, (Filter, Project, Rank, Sort, Compact)):
            return dataclasses.replace(n, child=rewrite(n.child))
        if isinstance(n, Join):
            return dataclasses.replace(n, build=rewrite(n.build),
                                       probe=rewrite(n.probe))
        return n

    return rewrite(node)
