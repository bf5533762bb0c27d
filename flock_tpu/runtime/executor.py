"""Single-device executor — the ``LocalLauncher`` analogue (ground truth).

Reference counterpart: flock/src/launcher/local.rs:30-147 (feed MemTables,
collect the whole plan in-process).  Here: host columns → fixed-capacity
device Batches → one jitted XLA program per (plan, capacity signature) →
host materialization with timestamp restore and dictionary decode.
"""

from __future__ import annotations

from dataclasses import dataclass
import functools
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from flock_tpu.batch import Batch, round_up
from flock_tpu.config import CONFIG
from flock_tpu.plan import compile_plan
from flock_tpu.queries.nexmark import QuerySpec
from flock_tpu.utils.metrics import METRICS


class OverflowError(RuntimeError):
    """A static output capacity was exceeded (the analogue of Flock's payload
    size guards); retry with larger capacities."""


def _pow2_bucket(n: int) -> int:
    """Power-of-two capacity bucket: batches reuse a handful of compiled
    programs instead of one compile per distinct row count."""
    c = 128
    while c < n:
        c *= 2
    return c


# Module-level jitted entry points with the (hashable, immutable) plan as a
# static argument.  Per-executor jit closures previously hit a C++ pjit
# fastpath bug after closure garbage collection (stale executables answering
# with "Execution supplied N buffers but compiled program expected M"); one
# long-lived function per entry point with static plan args sidesteps the
# churn entirely and shares compiled programs across executor instances.


@partial(jax.jit, static_argnums=(0, 1))
def _run_plan(plan, agg_capacity: int, tables: dict[str, Batch]):
    return compile_plan(plan, agg_capacity)(tables)


@partial(jax.jit, static_argnums=(0, 1))
def _run_plan_stacked(plan, agg_capacity: int, stacked: dict[str, Batch]):
    """Run the plan over W stacked windows ([W, cap] columns) in ONE device
    program via lax.map — the micro-batch pipeline form: one dispatch drives
    the whole stream segment, so host→device latency is paid once (and this
    is the honest way to measure device throughput through a high-latency
    control path)."""
    fn = compile_plan(plan, agg_capacity)
    return jax.lax.map(fn, stacked)


@partial(jax.jit, static_argnums=(0, 1, 2, 3, 4))
def _run_plan_session_tables(plan, agg_capacity: int, rel: str, key: str,
                             span_bucket: int, chunks: list[Batch],
                             rank_tab, ok_tab, end_tab, cmin, k, cids):
    """Run the plan over device-RESIDENT chunks, labeling and filtering the
    rows ON DEVICE from three O(key-span) tables: rank_tab (key → session
    label, monotone), ok_tab/end_tab (session's [start, end) chunk range).
    Per-emission transfer is the tables (~KB), not the rows — the TPU-native
    replacement for re-shipping session windows to an aggregator (the
    reference re-invokes with whole windows in the payload,
    window/session.rs:245-263)."""
    from flock_tpu.ops import kernels as _k

    cols = {}
    for c in chunks[0].columns:
        cols[c] = jnp.concatenate([ch.columns[c] for ch in chunks])
    valid_in = jnp.concatenate([ch.valid for ch in chunks])
    cidvec = jnp.concatenate([
        jnp.full((ch.valid.shape[0],), 0, jnp.int32) + cids[i]
        for i, ch in enumerate(chunks)])
    # label/filter via the blocked slot gather instead of three random
    # span-table gathers (~25 ns/row each; measured 3×~0.4 s per 15M-row
    # session flush): bidder keys carry the stream's natural locality, so
    # the one-hot window gather applies (kernels.lookup_join keeps the
    # per-row-gather safety net for locality breaks)
    build = {"__k": cmin + jnp.arange(span_bucket, dtype=jnp.int32),
             "__rank": rank_tab, "__ok": ok_tab, "__end": end_tab}
    joined, hit, _ovf = _k.lookup_join(
        build, jnp.ones((span_bucket,), bool), "__k",
        {"__k": cols[key].astype(jnp.int32)}, valid_in, "__k",
        {"__rank": "__rank", "__ok": "__ok", "__end": "__end"},
        build_slotted=True, probe_s_loc=_k.S_LOC_PERSON_OVER_BID)
    cols["__session"] = jnp.minimum(joined["__rank"], k - 1)
    valid = hit & (joined["__ok"] <= cidvec) & (cidvec < joined["__end"])
    return compile_plan(plan, agg_capacity)(
        {rel: Batch(columns=cols, valid=valid)})


def _consts_fast_shape(plan, rel: str, const_names, key_dtype=None) -> bool:
    """True when the plan is a single-key Aggregate over the driving scan
    whose non-count aggregations all target per-chunk CONSTANT columns —
    q12's shape.  Then min/max/sum over the constant derive from per-chunk
    COUNTS (one cheap count aggregation per chunk) instead of full
    reductions over every row.

    ``key_dtype`` guards the specialization's unconditional int32 key cast
    (_run_plan_consts_fast): a wider group key would silently wrap and
    mis-group, so anything but int32 falls back to the general runner."""
    from flock_tpu.plan import Aggregate, Scan

    if not (isinstance(plan, Aggregate) and isinstance(plan.child, Scan)
            and plan.child.relation == rel and len(plan.group_keys) == 1
            and plan.mode == "single"):
        return False
    if key_dtype is not None and key_dtype != jnp.int32:
        return False
    return all(fn == "count" or (c in const_names
                                 and fn in ("min", "max", "sum"))
               for c, fn, _ in plan.aggs)


@partial(jax.jit, static_argnums=(0, 1, 2, 4))
def _run_plan_consts_fast(plan, agg_capacity: int, rel: str,
                          chunks: list[Batch],
                          const_names: tuple[str, ...],
                          const_vals: jax.Array):
    """The _consts_fast_shape specialization: per-chunk grouped COUNTS (the
    cheapest aggregation form) + tiny [capacity]-vector combines across the
    ≤window chunks recover count/min/max/sum over the constant columns."""
    import numpy as _np

    from flock_tpu.ops import kernels as _k

    key = plan.group_keys[0]
    I64_MAX = _np.int64(2**63 - 1)
    I64_MIN = _np.int64(-(2**63))
    m = functools.reduce(jnp.minimum, [
        jnp.min(jnp.where(ch.valid, ch.columns[key].astype(jnp.int64),
                          I64_MAX)) for ch in chunks]).astype(jnp.int32)
    over = jnp.asarray(False)
    cnts = []
    for ch in chunks:
        k32 = ch.columns[key].astype(jnp.int32)
        out, _ov, esc = _k.dense_group_aggregate(
            {key: k32}, ch.valid, key,
            [(None, "count", "__fast_cnt")], agg_capacity,
            s_loc=plan.s_loc)
        over = over | esc
        # each chunk's aggregation anchors at ITS OWN minimum key; shift the
        # slot vector so every chunk aligns to the window-global base m
        has = jnp.any(ch.valid)
        cmin = jnp.min(jnp.where(ch.valid, k32, _np.int32(2**31 - 1)))
        # keys beyond the shared-base capacity would silently truncate in
        # the alignment slice — flag them as overflow instead
        over = over | (jnp.max(jnp.where(ch.valid, k32, m)) - m
                       >= agg_capacity)
        off = jnp.clip(jnp.where(has, cmin - m, 0), 0, agg_capacity)
        padded = jnp.concatenate(
            [jnp.zeros((agg_capacity,), jnp.int32), out["__fast_cnt"]])
        cnts.append(jax.lax.dynamic_slice(
            padded, (agg_capacity - off,), (agg_capacity,)))
    total = functools.reduce(jnp.add, cnts)
    occ = total > 0
    cols_out = {key: m + jnp.arange(agg_capacity, dtype=jnp.int32)}
    name_idx = {nm: j for j, nm in enumerate(const_names)}
    for c, fn, out_name in plan.aggs:
        if fn == "count":
            cols_out[out_name] = total
            continue
        vals = [const_vals[i, name_idx[c]] for i in range(len(chunks))]
        if fn == "sum":
            acc = functools.reduce(jnp.add, [
                cnt.astype(jnp.int64) * v.astype(jnp.int64)
                for cnt, v in zip(cnts, vals)])
        else:
            sent = I64_MAX if fn == "min" else I64_MIN
            red = jnp.minimum if fn == "min" else jnp.maximum
            acc = functools.reduce(red, [
                jnp.where(cnt > 0, jnp.asarray(v, jnp.int64), sent)
                for cnt, v in zip(cnts, vals)])
        cols_out[out_name] = acc.astype(jnp.int32) \
            if fn != "sum" else acc
    return Batch(columns=cols_out, valid=occ), over


@partial(jax.jit, static_argnums=(0, 1, 2, 4))
def _run_plan_consts(plan, agg_capacity: int, rel: str,
                     chunks: list[Batch], const_names: tuple[str, ...],
                     const_vals: jax.Array):
    """Run the plan over device-resident chunks with per-chunk CONSTANT
    columns synthesized in HBM (e.g. q12's processing-time stamp — the
    reference appends a now() column per payload, global.rs:161-307; here the
    arrival epoch is a traced scalar broadcast on device, so no per-row data
    moves at all)."""
    cols = {}
    for c in chunks[0].columns:
        cols[c] = jnp.concatenate([ch.columns[c] for ch in chunks])
    for j, name in enumerate(const_names):
        cols[name] = jnp.concatenate([
            jnp.full((ch.valid.shape[0],), const_vals[i, j], jnp.int32)
            for i, ch in enumerate(chunks)])
    valid = jnp.concatenate([ch.valid for ch in chunks])
    return compile_plan(plan, agg_capacity)(
        {rel: Batch(columns=cols, valid=valid)})


@partial(jax.jit, static_argnums=(0, 1))
def _run_plan_epochs(plan, agg_capacity: int,
                     epoch_tables: list[dict[str, Batch]],
                     static_tables: dict[str, Batch]):
    merged = dict(static_tables)
    for rel in epoch_tables[0]:
        cols = {}
        for c in epoch_tables[0][rel].columns:
            cols[c] = jnp.concatenate(
                [et[rel].columns[c] for et in epoch_tables])
        valid = jnp.concatenate([et[rel].valid for et in epoch_tables])
        merged[rel] = Batch(columns=cols, valid=valid)
    return compile_plan(plan, agg_capacity)(merged)


@dataclass
class LocalExecutor:
    spec: QuerySpec
    agg_capacity: int | None = None

    def prepare_window(self, tables: dict[str, dict[str, np.ndarray]],
                       capacities: dict[str, int] | None = None
                       ) -> dict[str, Batch]:
        """Host columns → fixed-capacity device Batches (the feed/transfer
        step — feed_data_sources analogue, runtime/context.rs:257-325)."""
        capacities = capacities or {}
        batches = {}
        for rel, cols in tables.items():
            n = len(next(iter(cols.values()))) if cols else 0
            cap = capacities.get(rel) or max(round_up(max(n, 1)), 128)
            batches[rel] = Batch.from_numpy(cols, cap)
        return batches

    def execute_batches(self, batches: dict[str, Batch],
                        check_overflow: bool = True) -> Batch:
        """Run the jitted plan over device-resident Batches (compute only)."""
        agg_cap = self.agg_capacity or (
            max(b.capacity for b in batches.values()) + CONFIG.agg_span_margin)
        METRICS.count(f"q{self.spec.number}.windows")
        METRICS.count(f"q{self.spec.number}.rows_in",
                      sum(b.capacity for b in batches.values()))
        with METRICS.timer(f"q{self.spec.number}.execute_s"):
            out, overflow = _run_plan(self.spec.plan, agg_cap, batches)
        if check_overflow and bool(overflow):
            caps = tuple(sorted((r, b.capacity) for r, b in batches.items()))
            raise OverflowError(
                f"q{self.spec.number}: static capacity exceeded "
                f"(caps={caps}, agg={agg_cap})")
        return out

    def execute_window(self, tables: dict[str, dict[str, np.ndarray]],
                       capacities: dict[str, int] | None = None) -> Batch:
        """Run the query plan over one window's relation tables.

        Returns the device output Batch (padded).  Raises OverflowError if any
        static capacity was exceeded.
        """
        return self.execute_batches(self.prepare_window(tables, capacities))

    def stage_chunk(self, cols: dict[str, np.ndarray], capacity: int | None = None
                    ) -> Batch:
        """One epoch's columns → a device-resident Batch (explicit transfer;
        implicit host-array arguments crawl through remote control paths)."""
        n = len(next(iter(cols.values()))) if cols else 0
        cap = capacity or max(_pow2_bucket(n), 128)
        return jax.device_put(Batch.from_numpy(cols, cap))

    def execute_session_tables(self, chunks: list[Batch], key: str,
                               tables: tuple, cids: np.ndarray,
                               agg_capacity: int,
                               check_overflow: bool = True) -> Batch:
        """Run the plan over staged chunks; rows are labeled/filtered on
        device from the emission's dense tables (see
        ``_run_plan_session_tables``)."""
        rank_tab, ok_tab, end_tab, cmin, k = tables
        span_bucket = len(rank_tab)
        dev = jax.device_put((rank_tab, ok_tab, end_tab,
                              np.int32(cmin), np.int32(k),
                              np.asarray(cids, np.int32)))
        METRICS.count(f"q{self.spec.number}.windows")
        METRICS.count(f"q{self.spec.number}.rows_in",
                      sum(ch.valid.shape[0] for ch in chunks))
        with METRICS.timer(f"q{self.spec.number}.execute_s"):
            out, overflow = _run_plan_session_tables(
                self.spec.plan, agg_capacity, self._driving_relation(),
                key, span_bucket, chunks, *dev)
        if check_overflow and bool(overflow):
            raise OverflowError(
                f"q{self.spec.number}: session capacity exceeded "
                f"(agg={agg_capacity})")
        return out

    def execute_consts(self, chunks: list[Batch], const_cols: dict[str, list],
                       agg_capacity: int, check_overflow: bool = True
                       ) -> Batch:
        """Run the plan over staged chunks + per-chunk constant int32 columns
        (synthesized on device from traced scalars)."""
        names = tuple(sorted(const_cols))
        vals = np.asarray([[const_cols[nm][i] for nm in names]
                           for i in range(len(chunks))], np.int32)
        METRICS.count(f"q{self.spec.number}.windows")
        METRICS.count(f"q{self.spec.number}.rows_in",
                      sum(ch.valid.shape[0] for ch in chunks))
        key_dt = (chunks[0].columns[self.spec.plan.group_keys[0]].dtype
                  if getattr(self.spec.plan, "group_keys", None)
                  and self.spec.plan.group_keys[0] in chunks[0].columns
                  else None)
        runner = (_run_plan_consts_fast
                  if _consts_fast_shape(self.spec.plan,
                                        self._driving_relation(), names,
                                        key_dtype=key_dt)
                  else _run_plan_consts)
        with METRICS.timer(f"q{self.spec.number}.execute_s"):
            out, overflow = runner(
                self.spec.plan, agg_capacity, self._driving_relation(),
                chunks, names, jax.device_put(vals))
        if check_overflow and bool(overflow):
            raise OverflowError(
                f"q{self.spec.number}: const-epoch capacity exceeded "
                f"(agg={agg_capacity})")
        return out

    def _driving_relation(self) -> str:
        rels = [r for r in self.spec.relations if r != "side_input"]
        if len(rels) != 1:
            raise ValueError("chunked execution needs one driving relation")
        return rels[0]

    def execute_epochs(self, epoch_tables: list[dict[str, Batch]],
                       static_tables: dict[str, Batch] | None = None,
                       check_overflow: bool = True) -> Batch:
        """Run the plan over a window formed from device-resident per-epoch
        batches (concatenated in HBM inside the jitted program).
        ``static_tables`` carries bounded side relations (q13 side input)."""
        static_tables = static_tables or {}
        caps = tuple(sorted(
            (rel, b.capacity) for rel, b in epoch_tables[0].items()))
        agg_cap = self.agg_capacity or (
            len(epoch_tables) * max(c for _, c in caps)
            + CONFIG.agg_span_margin)
        METRICS.count(f"q{self.spec.number}.windows")
        METRICS.count(f"q{self.spec.number}.rows_in",
                      len(epoch_tables) * sum(c for _, c in caps))
        with METRICS.timer(f"q{self.spec.number}.execute_s"):
            out, overflow = _run_plan_epochs(self.spec.plan, agg_cap,
                                             epoch_tables, static_tables)
        if check_overflow and bool(overflow):
            raise OverflowError(
                f"q{self.spec.number}: static capacity exceeded "
                f"(w={len(epoch_tables)}, caps={caps}, agg={agg_cap})")
        return out

    def execute_stacked(self, windows: list[dict[str, Batch]],
                        check_overflow: bool = True):
        """Run W same-capacity windows in one device program (lax.map).

        Returns (stacked output Batch with leading W axis, overflow array).
        """
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *windows)
        agg_cap = self.agg_capacity or (
            max(b.capacity for b in windows[0].values())
            + CONFIG.agg_span_margin)
        out, overflow = _run_plan_stacked(self.spec.plan, agg_cap, stacked)
        if check_overflow and bool(np.asarray(overflow).any()):
            raise OverflowError(f"q{self.spec.number}: capacity exceeded")
        return out, overflow

    def materialize(self, out: Batch) -> dict[str, np.ndarray]:
        return materialize_columns(self.spec, out.to_numpy())


def materialize_columns(spec: QuerySpec, host: dict[str, np.ndarray]
                        ) -> dict[str, np.ndarray]:
    """Sink-side finalization shared by local and distributed executors:
    restore absolute timestamps (int32 relative → int64 ms) and recompute
    exact f64 money columns from their integer basis (queries/nexmark.py)."""
    from flock_tpu.batch import TS_BASE

    schema = spec.schema
    result = {}
    for name in schema.names:
        v = host[name]
        if name in schema.timestamp_cols:
            v = v.astype(np.int64) + TS_BASE
        if name in schema.f64_recompute:
            kind, a, b = schema.f64_recompute[name]
            if kind == "mul_lit":
                v = a * host[b].astype(np.float64)
            elif kind == "div":
                v = host[a].astype(np.float64) / np.maximum(host[b], 1)
        # legacy recipes for the hand-built query specs
        elif name == "price" and "price_cents" in host:
            v = 0.908 * host["price_cents"].astype(np.float64)
        elif name == "avg_final" and "sum_final" in host:
            v = host["sum_final"].astype(np.float64) / host["cnt"]
        elif name == "avg_price" and "sum_price" in host:
            v = host["sum_price"].astype(np.float64) / host["cnt"]
        result[name] = v
    return result
