"""Generic CEP sequence-pattern matching (``정리/1주차.md:22-25`` — the
book's complex-event-processing surface, of which ``funnel_conversions``
is the fixed 3-step instance).

``match_pattern`` detects an N-step event sequence per key with a
``within`` timeout between consecutive steps.  Steps are either
event-type names (``steps=``, the common sugar) or ARBITRARY SQL
boolean predicates (``conditions=``, Flink CEP ``SimpleCondition`` —
e.g. ``"value > 75"`` twice then ``"event_type = 'purchase'"``).
Predicates always evaluate JVM-side (Catalyst expressions projected
before any stateful scan), never in Python.  Two contiguity modes
mirror Flink CEP:

- ``relaxed`` (CEP ``followedBy``): other events may interleave; each
  step matches the LATEST qualified previous-step event within the
  timeout.
- ``strict`` (CEP ``next``): the N events must be consecutive in the
  key's stream — any interleaved event breaks the match.

Quantifiers: ``times(n)`` is step repetition (each repetition must
bind a DISTINCT earlier event — see below); ``optional`` steps add a
skip path to the level below (middle steps, non-adjacent);
``oneOrMore`` collapses to a single step in completion-emission
semantics but becomes observable through ``mode`` — ``greedy`` binds
each level's LATEST in-window qualifier, ``reluctant`` its EARLIEST
(batch-only; chain-carrying structs, see :func:`match_pattern`).
``within`` bounds each step gap; ``within_total`` the whole-pattern
span (Flink ``Pattern.within``).

Both contiguities have a batch form (chained conditional running-max
windows / lag battery — ONE exchange + ONE sort regardless of N,
linear in events, the 100 TB shape; the naive alternative is N-1
self-joins) and a streaming twin over ``applyInPandasWithState`` with
O(1) state per key (``relaxed``: N-1 timestamps; ``strict``: the last
N-1 events), so per-key state is independent of history length.

Match ordering is (ts, step-rank, tiebreak); predecessors are taken
from STRICTLY earlier positions, so one event never satisfies two
steps of the same match, while same-instant cascades (view, click at
one timestamp) still match — update-before-test, exactly the loop
semantics of a per-record ProcessFunction.
"""

from __future__ import annotations

import json
from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _step_conditions(
    steps: tuple[str, ...] | None,
    conditions: tuple[str, ...] | None,
    type_col: str,
) -> list[str]:
    """Normalize the two pattern spellings into SQL boolean predicates."""
    if (steps is None) == (conditions is None):
        raise ValueError("exactly one of steps/conditions required")
    if steps is not None:
        for s in steps:
            if "'" in s:
                raise ValueError(f"event-type step may not contain quotes: {s!r}")
        out = [f"{type_col} = '{s}'" for s in steps]
    else:
        out = list(conditions)
    if len(out) < 2:
        raise ValueError("a pattern needs at least 2 steps")
    return out


def _normalize_quantifiers(
    quantifiers: tuple[str, ...] | None, n: int, contiguity: str
) -> list[str]:
    """Validate the per-step quantifier vector.  ``optional`` is
    middle-steps-only (the first step anchors the match, the last emits
    it) and relaxed-only; ``oneOrMore`` collapses to ``one`` in
    completion-emission semantics (every repetition refreshes the
    step's binding — see the module docstring) and is accepted in
    relaxed mode as documentation of intent."""
    if quantifiers is None:
        return ["one"] * n
    q = list(quantifiers)
    if len(q) != n:
        raise ValueError(f"quantifiers must have {n} entries, got {len(q)}")
    for i, x in enumerate(q):
        if x not in ("one", "oneOrMore", "optional"):
            raise ValueError(f"unknown quantifier: {x!r}")
        if x != "one" and contiguity != "relaxed":
            raise ValueError(f"{x} requires relaxed contiguity")
        if x == "optional" and (i == 0 or i == n - 1):
            raise ValueError("optional is middle-steps-only")
        if x == "optional" and q[i - 1] == "optional":
            raise ValueError(
                "adjacent optional steps are not supported — fold them "
                "into one step predicate or run two patterns"
            )
    return q


def _rank_expr(conds: list[str]):
    """First-matching-step index (sort tiebreak so earlier stages of a
    same-instant cascade update state before later stages test it)."""
    expr = F.lit(len(conds))
    for i in range(len(conds) - 1, -1, -1):
        expr = F.when(F.expr(conds[i]), F.lit(i)).otherwise(expr)
    return expr


def _with_step_cols(df: DataFrame, conds: list[str]) -> DataFrame:
    """Project one boolean column per step predicate + the sort rank —
    the Catalyst-evaluated pattern alphabet every scan below consumes."""
    out = df
    for i, c in enumerate(conds):
        out = out.withColumn(f"_c{i}", F.coalesce(F.expr(c), F.lit(False)))
    return out.withColumn("_rank", _rank_expr(conds))


def match_pattern(
    df: DataFrame,
    key: str,
    ts: str,
    steps: tuple[str, ...] | None = None,
    within: str = "12 hours",
    type_col: str = "event_type",
    tiebreak: str = "event_id",
    contiguity: str = "relaxed",
    conditions: tuple[str, ...] | None = None,
    emit: str = "completion",
    quantifiers: tuple[str, ...] | None = None,
    mode: str = "greedy",
    within_total: str | None = None,
) -> DataFrame:
    """Batch sequence-pattern match: emit ``(key, tiebreak, ts_ms)`` of
    every event completing the pattern; with ``emit="chain"`` also a
    ``match_chain`` column — the full matched event chain as
    ``"id0>id1>...>idN"`` (Flink ``PatternSelectFunction`` parity: the
    chain is the bound qualifying event per stage, exactly the events
    the per-record loop would have bound; a canonical string, not an
    array, so DuckDB oracles compare it byte-for-byte).

    ``relaxed``: N-1 conditional running-max Window expressions share
    one (key, order) sort — level k's qualifier is "latest
    level-(k-1)-qualified timestamp within ``within``", evaluated over
    a ROWS frame ending 1 PRECEDING so a step never self-satisfies its
    predecessor (chain mode maxes a (ts, id) struct instead of the bare
    ts: same ordering, the id rides along).  ``strict``: one lag battery
    checks the N-1 immediately preceding events' step predicates and
    pairwise gaps.  Either way Catalyst plans a single exchange + sort —
    pattern length N changes only the projection, never the shuffle
    topology.

    Quantifiers (Flink ``Pattern.oneOrMore()/optional()``,
    ``정리/1주차.md:22-25``): ``quantifiers`` is a per-step vector of
    ``"one" | "oneOrMore" | "optional"`` (relaxed-only beyond "one").
    ``optional`` lets the next step connect directly to the previous
    level when the optional step has no in-window binding (its chain
    slot is then absent — ``concat_ws`` skips the null).  ``oneOrMore``
    collapses to ``one`` in completion-emission semantics — every
    repetition refreshes the binding — but becomes OBSERVABLE through
    ``mode``: ``"greedy"`` (default) binds each level to its LATEST
    in-window qualifier, ``"reluctant"`` to its EARLIEST (a range-frame
    min over ``(-within, -1)``; same-instant cascades need greedy —
    RANGE frames cannot split ties).  ``within_total`` bounds the
    whole-pattern span (Flink ``Pattern.within``): completion ts minus
    the bound first-step ts, measured on the EMITTED binding.
    """
    if emit not in ("completion", "chain"):
        raise ValueError(f"unknown emit mode: {emit}")
    if mode not in ("greedy", "reluctant"):
        raise ValueError(f"unknown mode: {mode}")
    conds = _step_conditions(steps, conditions, type_col)
    n = len(conds)
    quant = _normalize_quantifiers(quantifiers, n, contiguity)
    step_us = int(pd.Timedelta(within).total_seconds() * 1_000_000)
    total_us = (
        int(pd.Timedelta(within_total).total_seconds() * 1_000_000)
        if within_total is not None
        else None
    )
    base = _with_step_cols(df.withColumn("_ord", F.unix_micros(ts)), conds)
    if contiguity == "strict":
        if mode != "greedy":
            raise ValueError("strict contiguity has no binding choice")
        w = Window.partitionBy(key).orderBy("_ord", tiebreak)
        cond = F.col(f"_c{n - 1}")
        prev_ord = F.col("_ord")
        for m in range(1, n):
            cond = cond & F.lag(f"_c{n - 1 - m}", m).over(w)
            lagged = F.lag("_ord", m).over(w)
            cond = cond & (prev_ord - lagged <= step_us)
            prev_ord = lagged
        if total_us is not None:
            cond = cond & (F.col("_ord") - F.lag("_ord", n - 1).over(w) <= total_us)
        out_cols = [key, tiebreak, F.unix_millis(ts).alias("ts_ms")]
        if emit == "chain":
            chain = [
                F.lag(tiebreak, m).over(w).cast("string")
                for m in range(n - 1, 0, -1)
            ] + [F.col(tiebreak).cast("string")]
            base = base.withColumn("_chain", F.concat_ws(">", *chain))
            out_cols.append(F.col("_chain").alias("match_chain"))
        return base.withColumn("_m", cond).filter("_m").select(*out_cols)
    if contiguity != "relaxed":
        raise ValueError(f"unknown contiguity: {contiguity}")
    out_cols = [key, tiebreak, F.unix_millis(ts).alias("ts_ms")]
    if mode == "reluctant":
        # Reluctant binds each level to its EARLIEST in-window
        # qualifier: a min over a RANGE frame (-within, -1), so
        # in-window validity is non-nullness by construction.  Unlike
        # greedy (below), bindings carry their chain-so-far and
        # first-step ts INSIDE the struct, captured at qualification
        # time — the earliest binding can expire from the completion
        # row's frame, so at-completion re-evaluation (greedy's trick)
        # would mis-report the chain.  The (o, i) prefix makes struct
        # order total; c/f ride along.  Same-instant cascades need
        # greedy — a RANGE frame cannot split ties.
        wr = Window.partitionBy(key).orderBy("_ord").rangeBetween(-step_us, -1)
        out = base
        for m in range(n - 1):
            if m == 0:
                b = F.when(
                    F.col("_c0"),
                    F.struct(
                        F.col("_ord").alias("o"),
                        F.col(tiebreak).alias("i"),
                        F.col(tiebreak).cast("string").alias("c"),
                        F.col("_ord").alias("f"),
                    ),
                )
            else:
                pred = F.col(f"_s{m - 1}")
                ok = pred["o"].isNotNull()
                if quant[m - 1] == "optional":
                    pred = F.when(ok, pred).otherwise(F.col(f"_s{m - 2}"))
                    ok = ok | F.col(f"_s{m - 2}.o").isNotNull()
                b = F.when(
                    F.col(f"_c{m}") & ok,
                    F.struct(
                        F.col("_ord").alias("o"),
                        F.col(tiebreak).alias("i"),
                        F.concat_ws(
                            ">", pred["c"], F.col(tiebreak).cast("string")
                        ).alias("c"),
                        pred["f"].alias("f"),
                    ),
                )
            out = out.withColumn(f"_s{m}", F.min(b).over(wr))
        pred = F.col(f"_s{n - 2}")
        ok = pred["o"].isNotNull()
        if quant[n - 2] == "optional":
            pred = F.when(ok, pred).otherwise(F.col(f"_s{n - 3}"))
            ok = ok | F.col(f"_s{n - 3}.o").isNotNull()
        qual = F.col(f"_c{n - 1}") & ok
        if total_us is not None:
            qual = qual & (F.col("_ord") - pred["f"] <= total_us)
        if emit == "chain":
            out_cols.append(
                F.concat_ws(
                    ">", pred["c"], F.col(tiebreak).cast("string")
                ).alias("match_chain")
            )
        return out.filter(qual).select(*out_cols)
    w = (
        Window.partitionBy(key)
        .orderBy("_ord", "_rank", tiebreak)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = base
    qual = F.col("_c0")
    valid: list = [None] * n  # in-window validity of level k's binding
    for i in range(1, n):
        if emit == "chain":
            bound = F.when(
                qual,
                F.struct(F.col("_ord").alias("o"), F.col(tiebreak).alias("i")),
            )
            out = out.withColumn(f"_s{i - 1}", F.max(bound).over(w))
            valid[i - 1] = F.col(f"_s{i - 1}.o") >= F.col("_ord") - step_us
        else:
            bound = F.when(qual, F.col("_ord"))
            out = out.withColumn(f"_l{i - 1}", F.max(bound).over(w))
            valid[i - 1] = F.col(f"_l{i - 1}") >= F.col("_ord") - step_us
        q = valid[i - 1]
        if quant[i - 1] == "optional":
            # skip path: connect to the level BELOW the optional step
            q = q | valid[i - 2]
        qual = F.col(f"_c{i}") & q
    if total_us is not None:
        first = F.col("_s0.o") if emit == "chain" else F.col("_l0")
        qual = qual & (F.col("_ord") - first <= total_us)
    if emit == "chain":
        slots = []
        for i in range(n - 1):
            s = F.col(f"_s{i}.i").cast("string")
            if quant[i] == "optional":
                # an optional step rides in the chain only when its
                # binding exists AND is in-window of the completion —
                # otherwise the match skipped it
                s = F.when(valid[i], s)
            slots.append(s)
        out_cols.append(
            F.concat_ws(
                ">", *slots, F.col(tiebreak).cast("string")
            ).alias("match_chain")
        )
    return out.filter(qual).select(*out_cols)


def _relaxed_scan(
    ord_us: np.ndarray,
    type_idx: list[np.ndarray],
    seeds: list[int | None],
    step_us: int,
    quant: list[str] | None = None,
    total_us: int | None = None,
) -> tuple[np.ndarray, list[int | None]]:
    """Vectorized relaxed-contiguity scan over one key's sorted batch:
    N-1 chained forward-fills, each the "latest qualified level-k
    timestamp" visible at every STRICTLY EARLIER position (shift(1)).
    ``quant`` marks optional steps (skip path to the level below);
    ``total_us`` bounds completion − bound-first-step span."""
    nan = np.nan
    ordf = ord_us.astype("float64")
    qual = type_idx[0]
    new_seeds: list[int | None] = []
    prevs: list[np.ndarray] = []
    hits = np.zeros(0, dtype="int64")
    for i in range(1, len(type_idx) + 1):
        seed = seeds[i - 1]
        filled = (
            pd.Series(np.where(qual, ordf, nan))
            .ffill()
            .fillna(nan if seed is None else float(seed))
            .to_numpy()
        )
        new_seeds.append(None if np.isnan(filled[-1]) else int(filled[-1]))
        prev = np.empty_like(filled)
        prev[0] = nan if seed is None else float(seed)
        prev[1:] = filled[:-1]
        prevs.append(prev)
        if i == len(type_idx):
            break
        with np.errstate(invalid="ignore"):
            q = prev >= ordf - step_us
            if quant is not None and quant[i - 1] == "optional":
                q = q | (prevs[i - 2] >= ordf - step_us)
            qual = type_idx[i] & q
        if i == len(type_idx) - 1:
            with np.errstate(invalid="ignore"):
                hits = np.flatnonzero(qual)
    if total_us is not None and len(hits):
        with np.errstate(invalid="ignore"):
            hits = hits[ord_us[hits] - prevs[0][hits] <= total_us]
    return hits, new_seeds


def _relaxed_scan_chain(
    ord_us: np.ndarray,
    ids: np.ndarray,
    type_idx: list[np.ndarray],
    seeds: list[tuple[int | None, int | None]],
    step_us: int,
    quant: list[str] | None = None,
    total_us: int | None = None,
) -> tuple[np.ndarray, list[list[int]], list[tuple[int | None, int | None]]]:
    """Chain-emitting variant of :func:`_relaxed_scan`: each level
    forward-fills the qualifying POSITION (row index), then indexes the
    int64 id array with it, and every hit reports the bound predecessor
    id per level (the values visible at strictly earlier positions —
    identical to the batch struct-max frame).  Timestamps round-trip
    through float64 safely (µs-epochs < 2⁵³); ids never do — a float64
    ffill of raw ids silently corrupts ids above 2⁵³, so only positions
    (always < 2⁵³) are filled as floats.  An optional step's chain slot
    is included only when its binding is in-window of the completion —
    byte-identical to the batch form's ``concat_ws`` null-skip."""
    nan = np.nan
    n = len(type_idx)
    ordf = ord_us.astype("float64")
    pos = np.arange(len(ord_us), dtype="float64")
    qual = type_idx[0]
    new_seeds: list[tuple[int | None, int | None]] = []
    prev_ids: list[np.ndarray] = []
    prev_ts: list[np.ndarray] = []
    hits = np.zeros(0, dtype="int64")
    for i in range(1, n):
        seed_ts, seed_id = seeds[i - 1]
        f_pos = pd.Series(np.where(qual, pos, nan)).ffill().to_numpy()
        has = ~np.isnan(f_pos)
        safe = np.where(has, f_pos, 0).astype("int64")
        f_ts = np.where(
            has, ordf[safe], nan if seed_ts is None else float(seed_ts)
        )
        f_id = np.where(has, ids[safe], 0 if seed_id is None else seed_id)
        new_seeds.append(
            (
                None if np.isnan(f_ts[-1]) else int(f_ts[-1]),
                None if np.isnan(f_ts[-1]) else int(f_id[-1]),
            )
        )
        p_ts = np.empty_like(f_ts)
        p_ts[0] = nan if seed_ts is None else float(seed_ts)
        p_ts[1:] = f_ts[:-1]
        p_id = np.empty_like(f_id)
        p_id[0] = 0 if seed_id is None else seed_id
        p_id[1:] = f_id[:-1]
        prev_ids.append(p_id)
        prev_ts.append(p_ts)
        with np.errstate(invalid="ignore"):
            q = p_ts >= ordf - step_us
            if quant is not None and quant[i - 1] == "optional":
                q = q | (prev_ts[i - 2] >= ordf - step_us)
            qual = type_idx[i] & q
    with np.errstate(invalid="ignore"):
        hits = np.flatnonzero(qual)
        if total_us is not None and len(hits):
            hits = hits[ord_us[hits] - prev_ts[0][hits] <= total_us]
    chains = []
    for h in hits:
        parts = []
        for m in range(n - 1):
            if quant is not None and quant[m] == "optional":
                v = prev_ts[m][h]
                if np.isnan(v) or not (v >= ord_us[h] - step_us):
                    continue
            parts.append(int(prev_ids[m][h]))
        chains.append(parts + [int(ids[h])])
    return hits, chains, new_seeds


def match_pattern_stream(
    df: DataFrame,
    key: str,
    ts: str,
    steps: tuple[str, ...] | None = None,
    within: str = "12 hours",
    type_col: str = "event_type",
    tiebreak: str = "event_id",
    contiguity: str = "relaxed",
    conditions: tuple[str, ...] | None = None,
    emit: str = "completion",
    quantifiers: tuple[str, ...] | None = None,
    mode: str = "greedy",
    within_total: str | None = None,
    reluctant_cap: int = 64,
) -> DataFrame:
    """Streaming twin of :func:`match_pattern` (P1 ProcessFunction
    shape): per key, ``relaxed`` keeps N-1 last-qualified timestamps
    (plus their event ids in chain mode), ``strict`` the last N-1
    events — O(1) state either way, which is what lets the pattern run
    over millions of keys with state in the executor state store.  Step
    predicates are projected to boolean columns JVM-side BEFORE the
    stateful scan, so the Python handler only reads pre-evaluated
    bools.  Batch rows are sorted by (ts, rank, tiebreak) inside the
    handler, so out-of-order arrival WITHIN a micro-batch is handled;
    cross-batch order relies on the source's event-time alignment (same
    contract as every handler in :mod:`..streaming.stateful`).

    Quantifiers and ``within_total`` match the batch form.

    ``mode="reluctant"`` (earliest-in-window binding) inherently needs
    the qualifying-event window in state — O(events per window), not
    O(1) like greedy — because when the earliest qualifier expires the
    binding falls to the NEXT earliest, which must have been retained.
    The streaming form caps that state at ``reluctant_cap`` qualifiers
    per (key, level): qualifiers beyond the cap are dropped (keeping
    the EARLIEST ``reluctant_cap``, which preserves every binding the
    retained window can prove) and the emitted ``overflow`` flag turns
    true for that key from then on.  The post-overflow guarantee is
    scoped to COMPLETION IDENTITY: every emitted (key, event) completion
    is a real batch-reluctant completion (false negatives only, never a
    spurious completion), but a post-overflow ``match_chain`` may bind
    a later retained qualifier than the batch form's (dropped) earliest
    one, so chain CONTENT after overflow is best-effort and flagged.
    ``within_total`` is measured on the earliest binding's first-step
    timestamp, which a cap cannot lower-bound once that binding is
    dropped — a capped run could emit a completion the batch form
    rejects.  To keep the no-false-positive contract exact,
    ``within_total`` therefore DISABLES the cap: state falls back to
    the full qualifying window (still pruned by ``within``, i.e. the
    inherent O(events per window) reluctant cost) and ``overflow``
    stays false.  Restricted to relaxed contiguity; quantifiers match
    the batch reluctant form exactly (``oneOrMore`` collapses to
    ``one``; ``optional`` middle steps take the skip-path fallback);
    equivalence to the batch reluctant form is pinned by
    tests/test_cep_reluctant_stream.py."""
    if emit not in ("completion", "chain"):
        raise ValueError(f"unknown emit mode: {emit}")
    if mode not in ("greedy", "reluctant"):
        raise ValueError(f"unknown mode: {mode}")
    conds = _step_conditions(steps, conditions, type_col)
    n = len(conds)
    if n < 2:
        raise ValueError(
            "match_pattern_stream needs at least 2 steps (a 1-step "
            "pattern is just a filter); got "
            f"{n}"
        )
    quant = _normalize_quantifiers(quantifiers, n, contiguity)
    step_us = int(pd.Timedelta(within).total_seconds() * 1_000_000)
    total_us = (
        int(pd.Timedelta(within_total).total_seconds() * 1_000_000)
        if within_total is not None
        else None
    )
    chain = emit == "chain"
    out_schema = f"{key} long, {tiebreak} long, ts_ms long" + (
        ", match_chain string" if chain else ""
    )
    cols = [f"_c{i}" for i in range(n)]
    prepared = _with_step_cols(df, conds)

    # strict batch orders by (_ord, tiebreak) — no _rank — so the
    # streaming twin must sort identically or same-instant ties diverge
    # between the two forms (relaxed keeps the _rank key: earlier
    # stages of a same-instant cascade update state before later
    # stages test it)
    sort_keys = (
        ["_ord", tiebreak]
        if contiguity == "strict"
        else ["_ord", "_rank", tiebreak]
    )

    def _prep(pdfs: Iterator[pd.DataFrame]) -> pd.DataFrame:
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf["_ord"] = pdf[ts].to_numpy().astype("datetime64[us]").astype("int64")
        return pdf.sort_values(sort_keys, ignore_index=True)

    def _emit(pdf, hits, chains=None):
        out = {
            key: [pdf[key].iloc[0] if len(pdf) else None] * len(hits),
            tiebreak: pdf[tiebreak].to_numpy(dtype="int64")[hits],
            "ts_ms": pdf["_ord"].to_numpy()[hits] // 1_000,
        }
        if chain:
            out["match_chain"] = [">".join(str(i) for i in c) for c in chains]
        return pd.DataFrame(out)

    if mode == "reluctant":
        if contiguity != "relaxed":
            raise ValueError("reluctant streaming requires relaxed contiguity")
        # quantifiers mirror the batch reluctant form exactly:
        # ``oneOrMore`` collapses to ``one`` (completion-emission
        # semantics, see _normalize_quantifiers) and ``optional``
        # middle steps take the skip path — a qualification whose
        # predecessor level holds no in-window binding falls back to
        # the level BELOW the optional step, the batch
        # `when(ok, pred).otherwise(_s{m-2})` fallback (closed the
        # round-9 NotImplementedError; equivalence pinned in
        # tests/test_cep_reluctant_stream.py)
        # within_total is checked against the EARLIEST binding's
        # first-step ts; once the cap drops that binding the check runs
        # on a LATER first-ts and can pass where batch rejects (a false
        # positive).  Exactness wins: within_total disables the cap —
        # state stays bounded by the `within` window-floor prune, the
        # inherent reluctant cost.
        cap = None if total_us is not None else int(reluctant_cap)
        rel_out_schema = out_schema + ", overflow boolean"
        # struct-min order in the batch form is (o, i): sort ties on the
        # tiebreak so list insertion order reproduces it exactly
        rel_sort = ["_ord", tiebreak]

        def handle(
            k: tuple[Any, ...],
            pdfs: Iterator[pd.DataFrame],
            state: GroupState,
        ) -> Iterator[pd.DataFrame]:
            pdf = pd.concat(list(pdfs), ignore_index=True)
            pdf["_ord"] = (
                pdf[ts].to_numpy().astype("datetime64[us]").astype("int64")
            )
            pdf = pdf.sort_values(rel_sort, ignore_index=True)
            if state.exists:
                raw, ov = state.get
                lists = json.loads(raw)
                ov = bool(ov)
            else:
                lists, ov = [[] for _ in range(n - 1)], False
            flags = [pdf[c].to_numpy(dtype=bool) for c in cols]
            ords = pdf["_ord"].to_numpy()
            ids = pdf[tiebreak].to_numpy(dtype="int64")
            out_rows: list[tuple] = []

            def _bind(pred_level: int, o: int):
                # earliest in-window binding at the predecessor level;
                # when that level is an OPTIONAL step with no binding,
                # skip to the level below it (batch reluctant's
                # `when(ok, pred).otherwise(_s{m-2})` fallback —
                # _normalize_quantifiers guarantees optionals are
                # middle-only and never adjacent, so level-1 exists)
                b = next(
                    (e for e in lists[pred_level] if e[0] <= o - 1), None
                )
                if b is None and quant[pred_level] == "optional":
                    b = next(
                        (
                            e
                            for e in lists[pred_level - 1]
                            if e[0] <= o - 1
                        ),
                        None,
                    )
                return b

            for r in range(len(pdf)):
                o, i = int(ords[r]), int(ids[r])
                lo = o - step_us
                # ascending scan: entries below the window floor can
                # never bind this or any later event — prune them (this
                # is what frees cap slots over time)
                for lst in lists:
                    while lst and lst[0][0] < lo:
                        lst.pop(0)
                # completion: earliest retained level-(n-2) binding that
                # is STRICTLY earlier (the batch RANGE frame ends at -1)
                if flags[n - 1][r]:
                    b = _bind(n - 2, o)
                    if b is not None and (
                        total_us is None or o - b[3] <= total_us
                    ):
                        row = (k[0], i, o // 1_000)
                        if chain:
                            row += (f"{b[2]}>{i}",)
                        out_rows.append(row + (ov,))
                # qualification: bindings capture chain-so-far + first
                # ts at qualification time (batch parity); same-event
                # entries can't feed the same event (o' <= o-1)
                for m in range(n - 1):
                    if not flags[m][r]:
                        continue
                    if m == 0:
                        entry = (o, i, str(i) if chain else "", o)
                    else:
                        b = _bind(m - 1, o)
                        if b is None:
                            continue
                        entry = (
                            o,
                            i,
                            f"{b[2]}>{i}" if chain else "",
                            b[3],
                        )
                    if cap is not None and len(lists[m]) >= cap:
                        # keep the earliest `cap` qualifiers: every
                        # binding provable from retained state stays
                        # correct; dropped later qualifiers can only
                        # cause false NEGATIVES after expiries
                        ov = True
                    else:
                        lists[m].append(entry)
            state.update((json.dumps(lists), ov))
            if out_rows:
                names = [key, tiebreak, "ts_ms"] + (
                    ["match_chain"] if chain else []
                ) + ["overflow"]
                yield pd.DataFrame(out_rows, columns=names)

        return prepared.groupBy(key).applyInPandasWithState(
            handle,
            rel_out_schema,
            "buf string, ov boolean",
            "append",
            GroupStateTimeout.NoTimeout,
        )

    if contiguity == "relaxed":
        if chain:
            state_schema = ", ".join(
                f"l{i} long, i{i} long" for i in range(n - 1)
            )
        else:
            state_schema = ", ".join(f"l{i} long" for i in range(n - 1))

        def handle(
            k: tuple[Any, ...],
            pdfs: Iterator[pd.DataFrame],
            state: GroupState,
        ) -> Iterator[pd.DataFrame]:
            pdf = _prep(pdfs)
            type_idx = [pdf[c].to_numpy(dtype=bool) for c in cols]
            ords = pdf["_ord"].to_numpy()
            if chain:
                flat = list(state.get) if state.exists else [None] * (2 * (n - 1))
                seeds = [
                    (flat[2 * i], flat[2 * i + 1]) for i in range(n - 1)
                ]
                hits, chains, new_seeds = _relaxed_scan_chain(
                    ords,
                    pdf[tiebreak].to_numpy(dtype="int64"),
                    type_idx,
                    seeds,
                    step_us,
                    quant,
                    total_us,
                )
                state.update(tuple(x for pair in new_seeds for x in pair))
                if len(hits):
                    yield _emit(pdf.assign(**{key: k[0]}), hits, chains)
            else:
                seeds = list(state.get) if state.exists else [None] * (n - 1)
                hits, new_seeds = _relaxed_scan(
                    ords, type_idx, seeds + [None], step_us, quant, total_us
                )
                state.update(tuple(new_seeds[: n - 1]))
                if len(hits):
                    yield _emit(pdf.assign(**{key: k[0]}), hits)

    elif contiguity == "strict":
        state_schema = "tail string"

        def handle(
            k: tuple[Any, ...],
            pdfs: Iterator[pd.DataFrame],
            state: GroupState,
        ) -> Iterator[pd.DataFrame]:
            tail = json.loads(state.get[0]) if state.exists else []
            pdf = _prep(pdfs)
            carry = len(tail)
            # per-event step-predicate vector (n bools) + ord + id, with
            # the carried last n-1 events prepended
            flags = np.concatenate(
                [
                    np.array([t[0] for t in tail], dtype=bool).reshape(-1, n)
                    if carry
                    else np.zeros((0, n), dtype=bool),
                    np.column_stack([pdf[c].to_numpy(dtype=bool) for c in cols]),
                ]
            )
            ords = np.concatenate(
                [
                    np.array([t[1] for t in tail], dtype="int64"),
                    pdf["_ord"].to_numpy(),
                ]
            )
            ids = np.concatenate(
                [
                    np.array([t[2] for t in tail], dtype="int64"),
                    pdf[tiebreak].to_numpy(dtype="int64"),
                ]
            )
            total = len(ords)
            cond = flags[:, n - 1].copy()
            for m in range(1, n):
                lag_f = np.roll(flags[:, n - 1 - m], m)
                lag_o = np.roll(ords, m)
                prev_o = np.roll(ords, m - 1) if m > 1 else ords
                ok = np.zeros(total, dtype=bool)
                ok[m:] = lag_f[m:] & (prev_o[m:] - lag_o[m:] <= step_us)
                cond = cond & ok
            g_hits = np.flatnonzero(cond)
            g_hits = g_hits[g_hits >= carry]  # completions in THIS batch
            if total_us is not None and len(g_hits):
                g_hits = g_hits[
                    ords[g_hits] - ords[g_hits - (n - 1)] <= total_us
                ]
            hits = g_hits - carry
            chains = [
                [int(ids[g - m]) for m in range(n - 1, -1, -1)]
                for g in g_hits
            ]
            keep = [
                ([bool(b) for b in flags[i]], int(ords[i]), int(ids[i]))
                for i in range(max(0, total - (n - 1)), total)
            ]
            state.update((json.dumps(keep),))
            if len(hits):
                yield _emit(pdf.assign(**{key: k[0]}), hits, chains)

    else:
        raise ValueError(f"unknown contiguity: {contiguity}")

    return prepared.groupBy(key).applyInPandasWithState(
        handle, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
