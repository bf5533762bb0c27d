"""SPMD distributed executor: one jitted program over a device mesh.

Reference counterpart: Flock's distributed mode — a DAG of query stages, each
deployed as N Lambda instances exchanging payloads (flock/src/distributed_plan/,
flock-function/src/aws/actor.rs:425-543).  Under SPMD the whole staged DAG
compiles into ONE XLA program per window: stage boundaries become collectives
(all_to_all for hash shuffles, all_gather for broadcast joins) riding ICI, and
"instances" are mesh shards.

Lowering rules (the DistributedPlanner analogue, planner.rs:26-59):
* Scan/Filter/Project/Compact — purely local;
* Aggregate(single) — local *partial* agg → all_to_all by hash(group keys) →
  local *final* agg (two-phase split exactly where Flock chops stages);
* Join — broadcast the (small, unique-key) build side via all_gather, probe
  locally (skew-immune: the probe side never moves);
* Rank — all_to_all by partition key, then local rank.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from flock_tpu.batch import round_up
from flock_tpu.ops import kernels
from flock_tpu.parallel.mesh import AXIS, make_mesh
from flock_tpu.parallel.shuffle import all_to_all_shuffle, broadcast_gather
from flock_tpu.plan import (
    Aggregate,
    Compact,
    Filter,
    FusedJoinAggregate,
    Join,
    Node,
    Project,
    Rank,
    Scan,
    Sort,
    fuse_join_aggregates,
    fused_local_pass,
)
from flock_tpu.queries.nexmark import QuerySpec
from flock_tpu.runtime.executor import OverflowError


@dataclass
class _Ctx:
    n_shards: int
    agg_capacity: int
    axis: str = AXIS


_SMALL_SORT_ROWS = 1 << 16  # below this, gather-everything beats a shuffle


def _composite_sort_key(cols, keys, desc):
    """MONOTONE int64 routing key for a ≤2-key integer sort, or None when
    inexpressible (floats, >2 keys).  Only ROUTES rows between shards —
    local ordering always uses the real multi-key sort — so it needs
    a ≤ b ⟹ comp(a) ≤ comp(b), never strictness: clipping out-of-range
    int64 values can only collapse distinct keys onto one shard (balance
    cost, caught by the shuffle overflow flag), never mis-order output."""
    import jax.numpy as jnp

    if len(keys) > 2:
        return None
    for k in keys:
        if jnp.issubdtype(cols[k].dtype, jnp.floating):
            return None

    def adj(name, d):
        k = jnp.clip(cols[name].astype(jnp.int64),
                     -(1 << 31) + 1, (1 << 31) - 1)
        return -k if d else k

    if len(keys) == 1:
        k = cols[keys[0]].astype(jnp.int64)
        return -k if desc[0] else k
    return (adj(keys[0], desc[0]) << 32) \
        | ((adj(keys[1], desc[1]) + (1 << 31)) & jnp.int64(0xFFFFFFFF))


def _final_aggs(aggs):
    # count partials re-aggregate with an int32 sum (count_sum) so the final
    # dtype matches the single-device executor's count output.  wmin winner-
    # carries re-aggregate with the same fn (min over shards attaining the
    # global max); the order column it names must keep its name across the
    # partial (true for the engine's plans, where max-agg outputs keep their
    # input name, e.g. q6's __order).
    return tuple((out, {"count": "count_sum"}.get(fn, fn), out)
                 for (_, fn, out) in aggs)


def _expand_cap(n_probe: int, node) -> int | None:
    """Fan-out headroom for duplicate build keys (plan.dup_expand_capacity)."""
    from flock_tpu.plan import dup_expand_capacity

    if node.unique_build:
        return None
    return dup_expand_capacity(n_probe)


def lower_dist(node: Node, tables: dict, ctx: _Ctx):
    """Lower a plan node to (cols, valid, overflow) on the local shard."""
    if isinstance(node, Scan):
        cols, valid = tables[node.relation]
        return dict(cols), valid, jnp.asarray(False)

    if isinstance(node, Filter):
        cols, valid, ovf = lower_dist(node.child, tables, ctx)
        return cols, valid & node.pred(cols), ovf

    if isinstance(node, Project):
        cols, valid, ovf = lower_dist(node.child, tables, ctx)
        out = {}
        for name, e in node.exprs:
            out[name] = cols[e] if isinstance(e, str) else e(cols)
        return out, valid, ovf

    if isinstance(node, Aggregate):
        cols, valid, ovf = lower_dist(node.child, tables, ctx)
        cap = node.out_capacity or ctx.agg_capacity
        keys = list(node.group_keys)
        # partial (local)
        pcols, pvalid, o1 = kernels.group_aggregate(
            cols, valid, keys, list(node.aggs), cap)
        # shuffle partials by key hash; post-partial-agg rows are ≤ one per
        # (producer, key), so per-destination buffers shrink with the shard
        # count (a full-cap buffer would make post-shuffle work grow with n
        # and destroy scaling); the overflow flag guards the bound
        per_dest = min(cap, max(4 * (cap // ctx.n_shards), 2048))
        scols, svalid, o2 = all_to_all_shuffle(
            pcols, pvalid, keys, ctx.n_shards, per_dest_cap=per_dest,
            axis=ctx.axis)
        # final (local)
        fcols, fvalid, o3 = kernels.group_aggregate(
            scols, svalid, keys, list(_final_aggs(node.aggs)), cap)
        return fcols, fvalid, ovf | o1 | o2 | o3

    if isinstance(node, Join):
        bcols, bvalid, o1 = lower_dist(node.build, tables, ctx)
        gcols, gvalid = broadcast_gather(bcols, bvalid, ctx.axis, ctx.n_shards)
        pcols, pvalid, o2 = lower_dist(node.probe, tables, ctx)
        cols, valid, o3 = kernels.lookup_join(
            gcols, gvalid, node.build_key, pcols, pvalid, node.probe_key,
            dict(node.take), dup_expand=not node.unique_build,
            out_capacity=_expand_cap(pvalid.shape[0], node))
        if node.post_filter is not None:
            valid = valid & node.post_filter(cols)
        return cols, valid, o1 | o2 | o3

    if isinstance(node, Rank):
        cols, valid, ovf = lower_dist(node.child, tables, ctx)
        # per-destination buffers sized like the aggregate path (4× the
        # average, floor 2048) so post-shuffle rank work SHRINKS with the
        # shard count instead of growing n_shards× (a full-cap buffer made
        # per-shard post-shuffle capacity n·cap); hot-key skew beyond the 4×
        # headroom raises the overflow flag and the caller widens
        cap = valid.shape[0]
        per_dest = min(cap, max(4 * (cap // ctx.n_shards), 2048))
        scols, svalid, o2 = all_to_all_shuffle(
            cols, valid, [node.group_key], ctx.n_shards,
            per_dest_cap=per_dest, axis=ctx.axis)
        rcols, rvalid = kernels.rank_in_group(
            scols, svalid, node.group_key, node.order_col, node.descending,
            node.rank_name, node.tiebreak)
        return rcols, rvalid, ovf | o2

    if isinstance(node, Sort):
        cols, valid, ovf = lower_dist(node.child, tables, ctx)
        desc = node.descending or (False,) * len(node.keys)
        comp = _composite_sort_key(cols, node.keys, desc)
        if valid.shape[0] * ctx.n_shards <= _SMALL_SORT_ROWS or comp is None:
            # coalesce-to-one-partition (DataFusion SortExec semantics, the
            # stage boundary Flock chops at, stage.rs:329-340): all_gather
            # every shard's rows, sort locally, keep shard 0's copy.  Cheap
            # at small inputs; also the general path for key shapes the
            # composite routing key can't express (>2 keys, floats, two
            # int64 keys)
            gcols, gvalid = broadcast_gather(cols, valid, ctx.axis, ctx.n_shards)
            scols, svalid = kernels.sort_rows(gcols, gvalid,
                                              list(node.keys), desc)
            mine = jax.lax.axis_index(ctx.axis) == 0
            return scols, svalid & mine, ovf
        # sampled range-partitioned sort: per-shard work stays O(local rows)
        # regardless of mesh width.  Sample each shard's sorted keys →
        # all_gather → global splitters → all_to_all rows by key range →
        # local sort.  Shard i then owns the i-th global key range, so the
        # shard-major merged output is globally ordered (equal keys always
        # land on one shard; heavy duplicates bound by the overflow flag).
        from flock_tpu.parallel.shuffle import all_to_all_by_dest

        cap = valid.shape[0]
        i64max = jnp.iinfo(jnp.int64).max
        names = list(cols)
        operands = (jnp.where(valid, comp, i64max),) \
            + tuple(cols[nm] for nm in names) + (valid,)
        s = jax.lax.sort(operands, num_keys=1, is_stable=True)
        scomp, svalid = s[0], s[-1]
        scols = dict(zip(names, s[1:-1]))
        n_valid = jnp.sum(svalid)
        S = 64
        pos = (jnp.arange(S) * n_valid) // S  # evenly spaced valid rows
        samples = jnp.where(n_valid > 0, scomp[pos], i64max)
        allsamp = jnp.sort(jax.lax.all_gather(samples, ctx.axis, tiled=True))
        splitters = allsamp[S * jnp.arange(1, ctx.n_shards)]
        dest = jnp.searchsorted(splitters, scomp, side="right"
                                ).astype(jnp.int32)
        per_dest = min(cap, max(4 * (cap // ctx.n_shards), 2048))
        rcols, rvalid, o2 = all_to_all_by_dest(
            scols, svalid, dest, ctx.n_shards, per_dest, ctx.axis)
        fcols, fvalid = kernels.sort_rows(rcols, rvalid, list(node.keys), desc)
        return fcols, fvalid, ovf | o2

    if isinstance(node, Compact):
        cols, valid, ovf = lower_dist(node.child, tables, ctx)
        cols, valid, o2 = kernels.compact(cols, valid, node.out_capacity)
        return cols, valid, ovf | o2

    if isinstance(node, FusedJoinAggregate):
        # broadcast the build side, run the fused pass locally over the
        # shard's probe rows (a per-shard PARTIAL), then shuffle + final
        # re-aggregate — the same two-phase split as a plain Aggregate
        bcols, bvalid, o1 = lower_dist(node.join.build, tables, ctx)
        pcols, pvalid, o2 = lower_dist(node.join.probe, tables, ctx)
        from flock_tpu.plan import fused_dtypes_supported
        if node.fallback is not None and not fused_dtypes_supported(
                node, bcols, pcols):
            return lower_dist(node.fallback, tables, ctx)
        gcols, gvalid = broadcast_gather(bcols, bvalid, ctx.axis, ctx.n_shards)
        out, valid, ovf_b, esc, span = fused_local_pass(
            node, gcols, gvalid, pcols, pvalid)
        needs_fb = (esc | ovf_b).reshape(())
        import os
        if node.fallback is not None and \
                not os.environ.get("FLOCK_TPU_NO_FALLBACK"):
            # escape safety net, LOCAL to the shard (collective-free, so it
            # is lax.cond-safe under shard_map): sharded substreams dilute
            # the key locality the blocked window assumes — partition p
            # holds every n-th event, so a block spans ~n× the id range of
            # the event-ordered stream and hot shards can escape where the
            # single-device pass would not.  Re-run the unfused join +
            # scatter partial aggregation; the shuffle + final below are
            # common to both branches.
            jn = node.join
            names = sorted(out)
            gkeys = [node.group_key] + (
                [node.group_key2] if node.group_key2 else [])

            def esc_branch():
                jcols, jvalid, jo = kernels.lookup_join(
                    gcols, gvalid, jn.build_key, pcols, pvalid,
                    jn.probe_key, dict(jn.take),
                    dup_expand=not jn.unique_build,
                    out_capacity=_expand_cap(pvalid.shape[0], jn))
                if jn.post_filter is not None:
                    jvalid = jvalid & jn.post_filter(jcols)
                cols2, v2 = dict(jcols), jvalid
                for nd in node.middle:
                    if isinstance(nd, Filter):
                        v2 = v2 & nd.pred(cols2)
                    else:
                        cols2 = {nm: (cols2[e] if isinstance(e, str)
                                      else e(cols2))
                                 for nm, e in nd.exprs}
                pc2, pv2, o5 = kernels.group_aggregate(
                    cols2, v2, gkeys, list(node.aggs), span,
                    allow_blocked=False)
                return (tuple(pc2[nm] for nm in names)
                        + (pv2, (jo | o5).reshape(())))

            def ok_branch():
                return (tuple(out[nm] for nm in names)
                        + (valid, (needs_fb & False).reshape(())))

            picked = jax.lax.cond(needs_fb, esc_branch, ok_branch)
            out = dict(zip(names, picked[:-2]))
            valid = picked[-2]
            needs_fb = picked[-1]
        gkeys = [node.group_key] + ([node.group_key2] if node.group_key2
                                    else [])
        per_dest = min(span, max(4 * (span // ctx.n_shards), 2048))
        scols, svalid, o3 = all_to_all_shuffle(
            out, valid, gkeys, ctx.n_shards,
            per_dest_cap=per_dest, axis=ctx.axis)
        fcols, fvalid, o4 = kernels.group_aggregate(
            scols, svalid, gkeys,
            list(_final_aggs(node.aggs)), span)
        return fcols, fvalid, o1 | o2 | needs_fb | o3 | o4

    raise TypeError(f"unsupported distributed node {type(node)}")


# Module-level strong cache of compiled SPMD programs.  Keyed by the
# (hashable) plan + mesh + capacity signature; entries live for the process
# lifetime, which both shares compiles across executor instances and avoids
# the C++ pjit stale-executable bug seen with per-instance jit closures
# (see runtime/executor.py).
_DIST_COMPILED: dict = {}


@dataclass
class DistributedExecutor:
    """Executes a QuerySpec plan SPMD over an n-shard mesh."""

    spec: QuerySpec
    n_shards: int
    mesh: object = None
    agg_capacity: int | None = None

    def __post_init__(self):
        if self.mesh is None:
            self.mesh = make_mesh(self.n_shards)

    def _fn(self, cap_sig: tuple, agg_cap: int, col_names: tuple):
        key = (self.spec.plan, self.n_shards, self.mesh,
               cap_sig, agg_cap, col_names)
        if key in _DIST_COMPILED:
            return _DIST_COMPILED[key]

        spec_plan = fuse_join_aggregates(self.spec.plan)
        ctx = _Ctx(self.n_shards, agg_cap)

        def local_fn(*flat):
            # flat: per relation, per column array [1, cap] + valid [1, cap]
            tables = {}
            i = 0
            for rel, names, _cap in col_names:
                cols = {n: flat[i + j][0] for j, n in enumerate(names)}
                i += len(names)
                tables[rel] = (cols, flat[i][0])
                i += 1
            cols, valid, ovf = lower_dist(spec_plan, tables, ctx)
            out_names = tuple(sorted(cols))
            return (tuple(cols[n][None] for n in out_names)
                    + (valid[None], ovf.reshape(1, 1)), out_names)

        # resolve output names once via eval_shape-free trick: run lazily
        out_names_box = {}

        def wrapper(*flat):
            outs, names = local_fn(*flat)
            out_names_box["names"] = names
            return outs

        n_in = sum(len(names) + 1 for _, names, _ in col_names)
        fm = jax.jit(jax.shard_map(
            wrapper, mesh=self.mesh,
            in_specs=tuple([P(AXIS, None)] * n_in),
            out_specs=P(AXIS, None),
        ))
        _DIST_COMPILED[key] = (fm, out_names_box)
        return _DIST_COMPILED[key]

    def execute_window(self, shard_tables: list[dict[str, dict[str, np.ndarray]]],
                       capacities: dict[str, int] | None = None):
        """Run one window.  ``shard_tables[i]`` holds shard i's host columns
        per relation.  Returns materialized host columns (all shards merged).

        On capacity overflow the shard capacities double and the window
        retries (the reference's guard-and-retry posture around payload
        limits) — e.g. join fan-out extras under duplicate build keys, whose
        density is generator-stratified and can concentrate on one shard.
        """
        for attempt in range(6):
            try:
                return self._execute_window_once(
                    shard_tables, capacities, widen=2 ** attempt)
            except OverflowError:
                if attempt == 5:
                    raise

    def _execute_window_once(self, shard_tables,
                             capacities: dict[str, int] | None,
                             widen: int = 1):
        n = self.n_shards
        assert len(shard_tables) == n
        rels = sorted({r for st in shard_tables for r in st})
        capacities = capacities or {}

        col_names = []
        flat_inputs = []
        cap_sig = []
        from flock_tpu.batch import Batch
        for rel in rels:
            names = sorted({c for st in shard_tables for c in st.get(rel, {})})
            m = max((len(next(iter(st[rel].values()))) for st in shard_tables
                     if rel in st and st[rel]), default=1)
            cap = (capacities.get(rel) or max(round_up(max(m, 1)), 128)) \
                * widen
            cap_sig.append((rel, cap))
            stacked = {nm: [] for nm in names}
            valids = []
            for st in shard_tables:
                cols = st.get(rel, {nm: np.array([], np.int64) for nm in names})
                b = Batch.from_numpy({nm: cols[nm] for nm in names}, cap)
                for nm in names:
                    stacked[nm].append(np.asarray(b.columns[nm]))
                valids.append(np.asarray(b.valid))
            col_names.append((rel, tuple(names), cap))
            for nm in names:
                flat_inputs.append(np.stack(stacked[nm]))
            flat_inputs.append(np.stack(valids))

        from flock_tpu.config import CONFIG
        from flock_tpu.utils.metrics import METRICS

        agg_cap = self.agg_capacity or (
            max(c for _, c in cap_sig) + CONFIG.agg_span_margin)
        fm, names_box = self._fn(tuple(cap_sig), agg_cap, tuple(col_names))
        METRICS.count(f"q{self.spec.number}.dist_windows")
        METRICS.count(f"q{self.spec.number}.dist_bytes_in",
                      sum(int(np.asarray(a).nbytes) for a in flat_inputs))
        with METRICS.timer(f"q{self.spec.number}.dist_execute_s"):
            outs = fm(*flat_inputs)
        out_names = names_box["names"]
        *col_arrays, valid, ovf = outs
        if bool(np.asarray(ovf).any()):
            raise OverflowError(f"q{self.spec.number} distributed overflow")
        valid = np.asarray(valid).reshape(-1)
        host = {}
        for nm, arr in zip(out_names, col_arrays):
            host[nm] = np.asarray(arr).reshape(valid.shape[0], *np.asarray(arr).shape[2:])[valid]
        return host
