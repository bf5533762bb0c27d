"""Device-resident sessionization: the open-set merge as dense span state.

Reference counterpart: flock-function/src/aws/window/session.rs:64-178 (a
fragment more than ``gap`` seconds after its window's last row closes the
window; idle windows time out as epochs advance).  The generic driver
(runtime/stream.py SessionState) retains rows on the host and re-aggregates
each closed session via device label tables; this module recognizes
INCREMENTALLY AGGREGABLE session plans — a single Aggregate over the driving
scan grouped by ``__session`` whose aggregates are all count/sum/min/max —
and keeps the ENTIRE open-session state as dense per-key accumulators in HBM:

* ``open``/``last_s`` — the open-set membership and last-row-second vectors
  the host previously merged with numpy (+ native C per-key stats);
* one [span] accumulator per aggregate (count add, sum add, min/max merge).

One jitted step per epoch:
  1. grouped count/min/max(/sum) over the epoch's staged rows — the engine's
     fastest aggregation shape (ops/dense_group_aggregate, blocked one-hot);
  2. a CONTIGUOUS window merge into the state accumulators (dynamic slices —
     no scatter: epoch aggregates are dense over the epoch's key span);
  3. gap-close and timeout as O(span) vector masks (sessions closed by a gap
     emit their pre-merge accumulators; the epoch's rows then seed the
     reopened session — exactly SessionState's chunk-range semantics);
  4. closed sessions compact into a small output buffer by cumsum rank + one
     binary search (no sort).

Rows are consumed ONCE, the epoch they arrive; no row chunks are retained,
no label tables ship, and the per-session aggregates ARE the emission — the
answer is the only thing that ever crosses the host boundary.  Epochs fuse
into ≤16-wide ``lax.scan`` chunks (one dispatch each; a relay-style control
path admits ~one request per round-trip, so per-epoch dispatches cost ~RTT
— measured round 5); the next chunk dispatches against the previous one's
unconfirmed state while its overflow flags are fetched, and a flagged
chunk rolls back to its retained start state and reruns with doubled
buckets — the engine's standard guard-and-retry posture.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from flock_tpu.ops import kernels
from flock_tpu.ops.kernels import I32_MAX

I32_MIN = np.int32(-(2**31))


# ---------------------------------------------------------------------------
# Plan-shape gate
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class FastSessionSpec:
    """A session plan the incremental device path can execute.

    ``aggs`` — the Aggregate's (in_col, fn, out) list; ``renames`` — the
    optional top Project's (out_name, agg_out) passthroughs; ``s_loc`` — the
    plan's locality hint for the per-epoch aggregation."""

    aggs: tuple
    renames: tuple | None
    s_loc: int | None


def session_fast_spec(spec, key: str, relation: str) -> FastSessionSpec | None:
    """Gate: Project?(Aggregate(Scan(relation), by __session)) with every
    aggregate incrementally mergeable (count/sum/min/max over scan columns or
    the session key).  Anything else → None (generic label-table path)."""
    from flock_tpu.plan import Aggregate, Project, Scan

    node = spec.plan
    renames = None
    if isinstance(node, Project):
        if not all(isinstance(e, str) for _, e in node.exprs):
            return None
        renames = node.exprs
        node = node.child
    if not (isinstance(node, Aggregate) and node.group_keys == ("__session",)
            and node.mode == "single" and isinstance(node.child, Scan)
            and node.child.relation == relation):
        return None
    for c, fn, _out in node.aggs:
        if fn == "count":
            continue
        if fn not in ("min", "max", "sum") or c in (None, "__session"):
            return None
    return FastSessionSpec(aggs=tuple(node.aggs), renames=renames,
                           s_loc=node.s_loc)


# ---------------------------------------------------------------------------
# Accumulator algebra
# ---------------------------------------------------------------------------


def _acc_plan(fs: FastSessionSpec, key: str, tcol: str):
    """(epoch_aggs, accs) — the per-epoch aggregation list and the state
    accumulators.  ``accs``: name → (epoch_out, fn, dtype, identity).
    Bookkeeping (occupancy count + min/max of the time column → first/last
    second) is always aggregated and shared with same-shaped plan aggs."""
    epoch_aggs = [(None, "count", "__cnt0"), (tcol, "min", "__emn"),
                  (tcol, "max", "__emx")]
    shared = {(None, "count"): "__cnt0", (tcol, "min"): "__emn",
              (tcol, "max"): "__emx"}
    accs: dict[str, tuple] = {}
    for c, fn, out in fs.aggs:
        if c == key and fn in ("min", "max"):
            continue  # an aggregate of the session key IS the slot key
        eff_c = None if fn == "count" else c
        eo = shared.get((eff_c, fn))
        if eo is None:
            eo = f"__e{len(epoch_aggs)}"
            epoch_aggs.append((eff_c, fn, eo))
            shared[(eff_c, fn)] = eo
        if fn == "count":
            accs[out] = (eo, "count", jnp.int32, np.int32(0))
        elif fn == "sum":
            accs[out] = (eo, "sum", jnp.int64, np.int64(0))
        elif fn == "min":
            accs[out] = (eo, "min", jnp.int32, I32_MAX)
        else:
            accs[out] = (eo, "max", jnp.int32, I32_MIN)
    return tuple(epoch_aggs), tuple(sorted(accs.items()))


def _combine(fn: str, a, b):
    if fn in ("count", "sum"):
        return a + b
    return jnp.minimum(a, b) if fn == "min" else jnp.maximum(a, b)


def init_state(S: int, accs) -> dict:
    st = {"open": jnp.zeros((S,), bool),
          "last_s": jnp.full((S,), I32_MIN, jnp.int32)}
    for name, (_eo, _fn, dt, ident) in accs:
        st[name] = jnp.full((S,), ident, dt)
    return st


def grow(state: dict, S2: int, accs) -> dict:
    """Pad state arrays to a wider span (base key unchanged); new slots get
    each accumulator's identity."""
    idents = {"open": False, "last_s": I32_MIN}
    idents.update({name: ident for name, (_e, _f, _d, ident) in accs})
    return _grow(state, S2, tuple(sorted(idents.items())))


@partial(jax.jit, static_argnums=(1, 2))
def _grow(state: dict, S2: int, idents: tuple) -> dict:
    idmap = dict(idents)
    return {name: jnp.concatenate(
        [a, jnp.full((S2 - a.shape[0],), idmap[name], a.dtype)])
        for name, a in state.items()}


# ---------------------------------------------------------------------------
# The per-epoch step
# ---------------------------------------------------------------------------


def step_impl(key: str, tcol: str, epoch_aggs: tuple, accs: tuple,
              SE: int, cap_out: int, s_loc: int | None, may_close: bool,
              gap_s, cutoff_s, m, state: dict, cols: dict, valid):
    """One epoch: aggregate → window-merge → gap/timeout close → compact.
    Pure (unjitted) form — the local driver jits it directly and the
    distributed driver runs it per shard under shard_map (sessions are
    per-key, so key-range shards need NO collectives at all).

    Returns (state', out_cols, out_valid, n_emit, overflow).  ``m`` is the
    state's base key (slot i ↔ key m+i); ``cutoff_s`` the timeout threshold
    in relative seconds (now − gap, session.rs:136-178).  ``may_close=False``
    (host-proven: within ``gap`` seconds of the first data, no session can
    close by gap OR timeout) compiles the merge-only form — no closure masks,
    no compaction, no emission buffers."""
    S = state["open"].shape[0]
    has = jnp.any(valid)

    # 1. per-epoch grouped aggregation (anchored at the epoch's min key)
    e_out, e_occ, e_ovf = kernels.dense_group_aggregate(
        {key: cols[key], **{c: cols[c] for c, _f, _o in epoch_aggs
                            if c is not None}},
        valid, key, list(epoch_aggs), SE, s_loc=s_loc)
    m_e = jnp.min(jnp.where(valid, cols[key], I32_MAX))
    first_s = e_out["__emn"] // 1000
    last_s = e_out["__emx"] // 1000

    # 2. contiguous window merge at [SE].  State buffers are allocated with
    #    an SE-slot TAIL PAD beyond the logical key span (callers allocate
    #    S_logical + SE), so the slice window never clamps for in-range
    #    epochs — the overflow test is on the ACTUAL max key vs the logical
    #    span, not on m_e + SE (which would falsely fire whenever SE spans
    #    the whole state, e.g. the distributed key-range shards).
    mx_e = jnp.max(jnp.where(valid, cols[key], I32_MIN))
    off = jnp.clip(m_e - m, 0, S - SE).astype(jnp.int32)
    span_ovf = has & ((m_e < m) | (mx_e - m >= S - SE))
    w_open = jax.lax.dynamic_slice(state["open"], (off,), (SE,))
    w_last = jax.lax.dynamic_slice(state["last_s"], (off,), (SE,))
    if may_close:
        gap_close = e_occ & w_open & (first_s - w_last > gap_s)
        new_start = e_occ & (gap_close | ~w_open)
    else:
        gap_close = None
        new_start = e_occ & ~w_open

    state2 = dict(state)
    emit_w = {}
    for name, (eo, fn, dt, ident) in accs:
        w_acc = jax.lax.dynamic_slice(state[name], (off,), (SE,))
        emit_w[name] = w_acc                      # pre-merge (old session)
        e_val = e_out[eo].astype(dt)
        merged = jnp.where(
            e_occ, jnp.where(new_start, e_val, _combine(fn, w_acc, e_val)),
            w_acc)
        state2[name] = jax.lax.dynamic_update_slice(state[name], merged,
                                                    (off,))
    state2["open"] = jax.lax.dynamic_update_slice(
        state["open"], w_open | e_occ, (off,))
    state2["last_s"] = jax.lax.dynamic_update_slice(
        state["last_s"], jnp.where(e_occ, last_s.astype(jnp.int32), w_last),
        (off,))

    if not may_close:
        return (state2, {}, jnp.zeros((0,), bool), jnp.int32(0),
                e_ovf | span_ovf)

    # 3. closures: gap-closed (pre-merge values, window coords) ∪ timed-out
    #    (post-merge values, full span) — disjoint: a gap-closed key was just
    #    reopened with a fresh last_s and cannot time out this epoch
    gmask = jax.lax.dynamic_update_slice(
        jnp.zeros((S,), bool), gap_close & has, (off,))
    to = state2["open"] & (state2["last_s"] < cutoff_s)
    emask = gmask | to
    state3 = dict(state2)
    state3["open"] = state2["open"] & ~to
    evals = {}
    for name, (eo, fn, dt, ident) in accs:
        placed = jax.lax.dynamic_update_slice(
            jnp.full((S,), ident, dt), emit_w[name], (off,))
        evals[name] = jnp.where(to, state2[name], placed)
        state3[name] = jnp.where(to, jnp.full((S,), ident, dt), state2[name])

    # 4. compact closed sessions: cumsum rank + binary search (no sort)
    out_cols, out_valid, n_emit = _extract(emask, evals, m, cap_out)
    ovf = e_ovf | span_ovf | (n_emit > cap_out)
    return state3, out_cols, out_valid, n_emit, ovf


@partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5, 6, 7))
def session_scan(key: str, tcol: str, epoch_aggs: tuple, accs: tuple,
                 SE: int, cap_out: int, s_loc: int | None, may_close: bool,
                 gap_s, t0, m, state: dict, cols3: dict, valid2):
    """W epochs in ONE dispatch: lax.scan of the step over stacked
    [W, C] epoch batches.  Through a high-latency control path the relay
    admits ~one request per round-trip (async dispatch does not pipeline —
    measured round 5), so per-epoch dispatches cost ~RTT each; the scan
    pays one.  Returns (state', stacked emissions [W, cap_out], n_emits
    [W], overflows [W])."""
    W = valid2.shape[0]

    def body(st, x):
        cc, vv, widx = x
        st2, oc, _ov, ne, ovf = step_impl(
            key, tcol, epoch_aggs, accs, SE, cap_out, s_loc, may_close,
            gap_s, t0 + widx + 1 - gap_s, m, st, cc, vv)
        return st2, (oc, ne, ovf)

    state2, (ocs, nes, ovfs) = jax.lax.scan(
        body, state, (cols3, valid2, jnp.arange(W, dtype=jnp.int32)))
    return state2, ocs, nes, ovfs


def _extract(emask, evals: dict, m, cap_out: int):
    S = emask.shape[0]
    r_inc = jnp.cumsum(emask.astype(jnp.int32))
    n_emit = r_inc[-1]
    # method='sort': the default 'scan' lowers to a SEQUENTIAL loop on TPU
    # (measured 134 ms at span 512k; 'sort' is a vectorized co-sort, ~ms)
    tgt = jnp.minimum(
        jnp.searchsorted(r_inc, jnp.arange(cap_out, dtype=jnp.int32) + 1,
                         method="sort"),
        S - 1).astype(jnp.int32)
    out_valid = jnp.arange(cap_out) < n_emit
    out = {"__key": m + tgt}
    for name, v in evals.items():
        out[name] = v[tgt]
    return out, out_valid, n_emit


def flush_impl(accs: tuple, cap_out: int, m, state: dict):
    """Close every remaining open session (bounded-run semantics)."""
    evals = {name: state[name] for name, _ in accs}
    return _extract(state["open"], evals, m, cap_out)


session_flush = partial(jax.jit, static_argnums=(0, 1))(flush_impl)


# ---------------------------------------------------------------------------
# Driver loop
# ---------------------------------------------------------------------------


def _bucket(n: int) -> int:
    c = 1024
    while c < n:
        c *= 2
    return c


def closure_gate(min_ev_seen, ev_mn: int, ev_mx: int, nrows: int, t: int,
                 gap: int) -> tuple:
    """(min_ev_seen', may_close) — the event-time closure-possibility gate
    shared by the local and distributed session drivers (one definition so
    their step-form selection cannot drift).

    Closure possibility is an EVENT-time question: every open session's
    last_s is ≥ the lowest event second tracked (``min_ev_seen``; a resume
    must seed it with from_payloads' ev_floor), so neither a timeout
    (cutoff = t+1-gap must exceed some last_s) nor a gap close (some epoch
    first_s − last_s > gap) can happen until these bounds say so — until
    then the merge-only step form applies."""
    if nrows:
        min_ev_seen = ev_mn if min_ev_seen is None \
            else min(min_ev_seen, ev_mn)
    may_close = min_ev_seen is not None and (
        (t + 1 - gap > min_ev_seen)
        or (bool(nrows) and ev_mx - min_ev_seen > gap))
    return min_ev_seen, may_close


def _event_sec_range(tc) -> tuple:
    """(min, max) EVENT second of a host time column, relative to TS_BASE
    (absolute int64 inputs rebase; already-relative inputs pass through)."""
    from flock_tpu.batch import TS_BASE

    if tc is None or not len(tc):
        return (0, 0)
    tmin, tmax = int(np.min(tc)), int(np.max(tc))
    if tmin >= TS_BASE:
        tmin -= TS_BASE
        tmax -= TS_BASE
    return (tmin // 1000, tmax // 1000)


def run_device_sessions(driver, epochs, prestaged, fs: FastSessionSpec,
                        resume_payloads=None, t_base: int = 0):
    """The StreamDriver session loop on the incremental device path.

    Epochs group into chunks of ≤ SCAN_W (uniform capacity bucket and
    closure gate) and each chunk runs as ONE ``session_scan`` dispatch;
    chunk ci+1 dispatches OPTIMISTICALLY against ci's unconfirmed output
    state while ci's overflow flags are fetched, and the flush dispatches
    before the last chunk's confirm — through a high-latency control path
    every fetch costs a full round-trip (~25 ms tunnel RTT), so both the
    per-chunk fusion and the one-chunk confirm lag exist to keep the
    device queue fed.  A flagged chunk rolls back to ITS start state
    (retained for the ≤2 unconfirmed chunks), doubles the buckets, and
    reruns from there.

    ``resume_payloads`` (checkpoint payloads from ``to_payloads``) makes
    the run a REPLACEMENT worker: the state base/span widen to cover the
    restored keys, the open sessions scatter back in via ``from_payloads``,
    and the closure gate's event floor seeds from the restored minimum
    last-row second (the gate's merge-only optimization is sound only
    while every open session's last_s is ≥ the tracked floor).
    ``t_base`` is the ABSOLUTE stream epoch of ``epochs[0]`` — timeout
    cutoffs are stream-absolute seconds, so a resumed run must keep
    counting from where the stream is, not restart at zero."""
    from flock_tpu.runtime.executor import _pow2_bucket
    from flock_tpu.runtime.stream import SessionState, WindowResult

    key, tcol = SessionState.key, SessionState.time_col
    gap = driver.spec.window[1]
    epoch_aggs, accs = _acc_plan(fs, key, tcol)

    # host-side per-epoch metadata: key range + EVENT-second range (four
    # SIMD passes per epoch).  The event-time range drives the may_close
    # gate — closure possibility depends on event seconds, not arrival
    # epochs (late rows can time out sessions long before gap epochs have
    # arrived).
    metas = []
    for t, tables in enumerate(epochs):
        bid = driver._needed_cols(tables["bid"], extra=(key, tcol))
        k = bid[key]
        metas.append((len(k), int(k.min()) if len(k) else 0,
                      int(k.max()) if len(k) else -1, bid,
                      *_event_sec_range(bid.get(tcol))))

    resume_payloads = list(resume_payloads or [])
    r_keys = np.concatenate(
        [np.asarray(p.columns["__key"]) for p in resume_payloads]) \
        if resume_payloads else np.empty(0, np.int64)

    n_ep = len(epochs)
    first = next((t for t in range(n_ep) if metas[t][0]), None)
    if first is None:
        if not len(r_keys):
            return []
        first = 0   # restored sessions still time out across empty epochs
    # the driver consumes the whole epoch list, so the state base and span
    # come from the GLOBAL key range (including restored keys) — a later
    # epoch's key below the first epoch's min must not strand the base
    # (growth cannot rebase downward)
    kmins = [mn for nn, mn, _mx, *_ in metas if nn]
    kmaxs = [mx for nn, _mn, mx, *_ in metas if nn]
    if len(r_keys):
        kmins.append(int(r_keys.min()))
        kmaxs.append(int(r_keys.max()))
    m = min(kmins)
    kmax_all = max(kmaxs)
    S = _bucket(kmax_all - m + 1 + 8192)
    SE = _bucket(max(max((mx - mn + 1 for nn, mn, mx, *_ in metas if nn),
                         default=1), 1))
    cap_out = 8192
    # buffers carry an SE-slot tail pad so the step's window merge never
    # clamps (see step_impl); logical key span stays [m, m+S)
    ev_floor = None
    if resume_payloads:
        state, _ep, ev_floor = from_payloads(resume_payloads, accs, m,
                                             S + SE)
    else:
        state = init_state(S + SE, accs)

    results: list[WindowResult] = []
    retries = 0
    need = sorted({key, tcol} | {c for c, _f, _o in epoch_aggs
                                 if c is not None})

    # host-side closure gates for every epoch (sequential, cheap), then
    # group CONSECUTIVE epochs with equal (capacity bucket, gate) into scan
    # chunks of ≤ SCAN_W — each chunk is ONE device dispatch
    SCAN_W = 16
    gates = []
    mev = ev_floor
    for t in range(n_ep):
        mev, mc = closure_gate(mev, metas[t][4], metas[t][5],
                               metas[t][0], t_base + t, gap)
        gates.append(mc)

    def epoch_cap(t):
        if prestaged is not None and prestaged[t] is not None:
            return prestaged[t].capacity
        return max(_pow2_bucket(metas[t][0]), 128)

    chunks = []   # (t_start, [t...], C, may_close)
    t = first
    while t < n_ep:
        C, mc = epoch_cap(t), gates[t]
        ts = [t]
        t += 1
        while (t < n_ep and len(ts) < SCAN_W and gates[t] == mc
               and epoch_cap(t) == C):
            ts.append(t)
            t += 1
        chunks.append((ts[0], ts, C, mc))

    def staged_cols(t, C):
        """One epoch's columns as [C] device arrays (empty epochs → zeros)."""
        if metas[t][0] == 0:
            z = jnp.zeros((C,), jnp.int32)
            return {c: z for c in need}, jnp.zeros((C,), bool)
        if prestaged is not None and prestaged[t] is not None \
                and prestaged[t].capacity == C:
            b = prestaged[t]
        else:
            b = driver.executor.stage_chunk(metas[t][3], capacity=C)
        return {c: b.columns[c] for c in need}, b.valid

    def dispatch(ci, st):
        t0, ts, C, mc = chunks[ci]
        percols = [staged_cols(t, C) for t in ts]
        cols3 = {c: jnp.stack([pc[0][c] for pc in percols]) for c in need}
        valid2 = jnp.stack([pc[1] for pc in percols])
        st2, ocs, nes, ovfs = session_scan(
            key, tcol, epoch_aggs, accs, SE, cap_out, fs.s_loc, mc,
            np.int32(gap), np.int32(t_base + t0), np.int32(m),
            st, cols3, valid2)
        return st2, (ci, st, ocs, nes, ovfs)

    flush_cap = _bucket(max(kmax_all - m + 1, 1))
    ci = 0
    inflight = None   # one unconfirmed chunk: (ci, start_state, ocs, ne, ovf)
    flushed = None
    while True:
        if ci < len(chunks):
            state, newly = dispatch(ci, state)
            ci += 1
        else:
            newly = None
            if flushed is None:
                # the flush rides the device queue while the host blocks on
                # the last chunk's flags (optimistic like everything else)
                flushed = session_flush(accs, flush_cap, np.int32(m), state)
        if inflight is not None:
            fci, chunk_start, ocs, nes, ovfs = inflight
            ovf_h, ne_h = jax.device_get((ovfs, nes))
            if bool(np.asarray(ovf_h).any()):
                retries += 1
                if retries > 6:
                    raise RuntimeError("device session path: retry budget")
                # grow every bucket (cheap relative to a wrong answer); the
                # span grows by padding the live state (the old tail pad
                # becomes part of the logical span — pad slots hold
                # identities, i.e. valid never-opened sessions); the chunk
                # dispatched against this one's corrupt output is discarded
                SE = SE * 2
                cap_out = cap_out * 2
                S2 = S * 2
                state = grow(chunk_start, S2 + SE, accs)
                S = S2
                ci = fci
                inflight = None
                flushed = None
                continue
            if chunks[fci][3]:
                for w, t in enumerate(chunks[fci][1]):
                    n = int(np.asarray(ne_h)[w])
                    if n:
                        results.append(
                            (t_base + t, {c: a[w] for c, a in ocs.items()},
                             n))
        inflight = newly
        if inflight is None and flushed is not None:
            break

    f_cols, _f_valid, f_n = flushed
    n = int(jax.device_get(f_n))
    if n:
        results.append((t_base + n_ep, f_cols, n))

    return [_materialize(driver, fs, key, et, out_cols, n)
            for et, out_cols, n in results]


def _materialize(driver, fs: FastSessionSpec, key: str, et: int,
                 out_cols: dict, n: int):
    """Exact-slice batched readback: only the live rows cross the tunnel,
    int32 columns ride ONE stacked transfer."""
    from flock_tpu.runtime.executor import materialize_columns
    from flock_tpu.runtime.stream import WindowResult

    ncols = {}
    nr = min(_round1k(n), out_cols["__key"].shape[0])
    i32 = [nm for nm, a in out_cols.items() if a.dtype == jnp.int32]
    if i32:
        stacked = np.asarray(jnp.stack([out_cols[nm][:nr] for nm in i32]))
        for i, nm in enumerate(i32):
            ncols[nm] = stacked[i][:n]
    for nm, a in out_cols.items():
        if nm not in i32:
            ncols[nm] = np.asarray(a[:nr])[:n]

    return WindowResult(("sessions", et),
                        materialize_columns(driver.spec,
                                            finish_names(fs, key, ncols)))


def finish_names(fs: FastSessionSpec, key: str, ncols: dict) -> dict:
    """Map raw emission columns (slot ``__key`` + accumulator outs) to the
    plan's output names: aggregates OF the session key read the slot key;
    the top Project's passthrough renames apply last."""
    host = {}
    for c, fn, out in fs.aggs:
        if c == key and fn in ("min", "max"):
            host[out] = ncols["__key"]
        else:
            host[out] = ncols[out]
    if fs.renames is not None:
        host = {name: host[src] for name, src in fs.renames}
    return host


def _round1k(n: int) -> int:
    return (max(n, 1) + 1023) // 1024 * 1024


# ---------------------------------------------------------------------------
# Checkpoint / resume
# ---------------------------------------------------------------------------


def to_payloads(state: dict, m: int, accs, qid: str, epoch: int):
    """Checkpoint the open sessions through the payload codec.

    Unlike the generic tier (SessionState.to_payloads re-ships every
    retained ROW so the replacement worker can re-aggregate), the device
    tier's state already IS the aggregates: the checkpoint is one payload of
    O(open sessions) — (key, last_s, accumulator...) per open slot.  A
    checkpoint with ZERO open sessions still writes the (empty) payload:
    the epoch watermark must advance, or a crash after every session closed
    would resume from a stale earlier checkpoint and re-emit its windows.
    Reference analogue: the S3 window-state checkpoint (state/s3.rs +
    actor.rs:391-413)."""
    import jax

    from flock_tpu.runtime.payload import FragmentId, Payload

    host = {k: np.asarray(v) for k, v in jax.device_get(state).items()}
    idx = np.flatnonzero(host["open"])
    cols = {"__key": (idx.astype(np.int64) + m),
            "last_s": host["last_s"][idx].astype(np.int64)}
    for name, _spec in accs:
        cols[name] = host[name][idx]
    return [Payload(FragmentId(qid, 0, 1, shuffle_id=0), cols,
                    metadata={"epoch": int(epoch)})]


def from_payloads(payloads, accs, m: int, S_buf: int):
    """Restore a device session state (buffer span ``S_buf``, base ``m``)
    from checkpoint payloads.  Returns (state, restored_epoch, ev_floor);
    raises if a restored key falls outside [m, m+S_buf) — the resuming
    driver picks the base/span from the checkpointed key range plus its own
    forecast.  ``ev_floor`` (None when no sessions were open) is the MINIMUM
    restored last-row second: the resuming driver MUST seed its closure
    gate's event floor with it (closure_gate's soundness rests on
    "every open session's last_s ≥ the lowest event second tracked", which
    a fresh run gets for free but a restore must re-establish)."""
    payloads = list(payloads)
    if not payloads:
        return init_state(S_buf, accs), 0, None
    keys = np.concatenate([np.asarray(p.columns["__key"]) for p in payloads])
    pos = keys - m
    if len(pos) and (pos.min() < 0 or pos.max() >= S_buf):
        raise ValueError("restored session keys outside the state span")
    pos = pos.astype(np.int64)
    open_ = np.zeros(S_buf, bool)
    open_[pos] = True
    last_h = np.concatenate(
        [np.asarray(p.columns["last_s"]) for p in payloads]).astype(np.int32)
    last_s = np.full(S_buf, I32_MIN, np.int32)
    last_s[pos] = last_h
    out = {"open": jnp.asarray(open_), "last_s": jnp.asarray(last_s)}
    for name, (_eo, _fn, dt, ident) in accs:
        buf = np.full(S_buf, ident,
                      np.int64 if dt == jnp.int64 else np.int32)
        buf[pos] = np.concatenate([np.asarray(p.columns[name])
                                   for p in payloads])
        out[name] = jnp.asarray(buf)
    ev_floor = int(last_h.min()) if len(last_h) else None
    return out, max(p.metadata["epoch"] for p in payloads), ev_floor
