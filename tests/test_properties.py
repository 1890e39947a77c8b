"""Property-based tests (hypothesis): engine operators vs pure-Python
reference implementations over generated inputs — the randomized layer
on top of the fixed-corpus oracle gate (SURVEY §5's test pyramid).

Hypothesis drives the INPUT GENERATION only; each example runs one
small Spark job, so examples are capped to keep the suite fast.
"""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from stream_processing_with_flink_study_spark.operators import windows
from stream_processing_with_flink_study_spark.plans.queries_text import (
    ROLL_B,
    ROLL_M,
)

_SETTINGS = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _ref_sessionize(ts_list: list[int], gap: float) -> list[int]:
    """Reference gap rule: new session when delta to previous > gap."""
    out, sid = [], 0
    for i, t in enumerate(sorted(ts_list)):
        if i == 0 or t - prev > gap:  # noqa: F821 - assigned below
            sid += 1
        out.append(sid)
        prev = t  # noqa: F841
    return out


@given(
    ts=st.lists(
        st.integers(min_value=0, max_value=500), min_size=1, max_size=30
    ),
    gap=st.integers(min_value=1, max_value=60),
)
@settings(**_SETTINGS)
def test_sessionize_matches_reference_gap_rule(spark, ts, gap):
    rows = [("k", float(t)) for t in ts]
    df = spark.createDataFrame(rows, "k string, ts double")
    got = (
        windows.sessionize(df, ["k"], "ts", float(gap))
        .orderBy("ts", "session_id")
        .collect()
    )
    want = _ref_sessionize(ts, float(gap))
    # ties on ts: session_id is non-decreasing in ts either way; compare
    # the multiset of (sorted-position -> session) via sorted pairing
    assert [r.session_id for r in got] == want


@given(
    tokens=st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=33, max_codepoint=126),
            min_size=1,
            max_size=8,
        ),
        min_size=1,
        max_size=20,
    )
)
@settings(**_SETTINGS)
def test_rolling_fingerprint_matches_recurrence(spark, tokens):
    """The Spark aggregate fold equals the hand-rolled Rabin-Karp
    recurrence over per-token md5 values — including the incremental
    property (hash of tokens[:n] derives from hash of tokens[:n-1])."""
    text = " ".join(tokens)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    toks = df.select(
        "doc_id",
        F.split(F.lower(F.trim("text")), r"\s+").alias("_toks"),
    )
    vals = F.transform(
        F.col("_toks"),
        lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long"),
    )
    rh = F.aggregate(
        vals, F.lit(0).cast("long"), lambda acc, v: (acc * ROLL_B + v) % ROLL_M
    )
    got = toks.select(rh.alias("h")).first().h

    acc = 0
    for t in text.lower().strip().split():
        v = int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
        acc = (acc * ROLL_B + v) % ROLL_M
    assert got == acc


@given(
    fraction=st.floats(min_value=0.0, max_value=1.0),
    keys=st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=200, unique=True),
)
@settings(**_SETTINGS)
def test_deterministic_sample_matches_pure_python(spark, fraction, keys):
    """Engine membership == pure-Python md5 threshold test for any
    fraction and key set (the reproducibility contract)."""
    from stream_processing_with_flink_study_spark.functions import sampling

    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = {r.k for r in sampling.deterministic_sample(df, "k", fraction).collect()}
    cut = sampling._threshold_hex(fraction)
    want = {
        k
        for k in keys
        if hashlib.md5(f"s0|{k}".encode()).hexdigest()[: sampling.HEX_WIDTH] < cut
    }
    assert got == want


@given(
    lengths=st.lists(st.integers(min_value=1, max_value=700), min_size=1, max_size=120),
    budget=st.integers(min_value=64, max_value=512),
)
@settings(**_SETTINGS)
def test_packing_invariants_hold_for_any_lengths(spark, lengths, budget):
    """Every row packed exactly once; no multi-doc pack over budget;
    oversized docs ride alone — for arbitrary length distributions."""
    from stream_processing_with_flink_study_spark.functions import packing

    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(lengths)], "doc_id long, n long"
    )
    rows = packing.pack_sequences(df, "n", budget, num_partitions=3).collect()
    assert sorted(r.doc_id for r in rows) == list(range(len(lengths)))
    packs: dict[int, list[int]] = {}
    for r in rows:
        packs.setdefault(r.pack_id, []).append(r.n_tokens)
    for toks in packs.values():
        assert sum(toks) <= budget or len(toks) == 1
        if len(toks) == 1 and toks[0] > budget:
            pass  # oversized doc riding alone is the documented contract


# --------------------------------------------------------------------------
# forward-decay recurrence (streaming decayed_counts handler math)
# --------------------------------------------------------------------------
@given(
    ts=st.lists(
        st.integers(min_value=0, max_value=10**9), min_size=1, max_size=40
    ),
    cut=st.integers(min_value=0, max_value=40),
    half_life=st.floats(min_value=1e3, max_value=1e9),
)
@settings(max_examples=200, deadline=None)
def test_forward_decay_split_invariance(ts, cut, half_life):
    """Processing a key's events in ONE batch or split at ANY boundary
    must yield the same final decayed score (after re-basing to the last
    event) — the invariant that makes the streaming operator's state
    meaningful across arbitrary micro-batch boundaries."""
    import math

    lam = math.log(2.0) / half_life
    ts = sorted(ts)
    cut = min(cut, len(ts))

    def batch_score(events, score, last):
        if not events:
            return score, last
        t_new = events[-1]
        contrib = sum(math.exp(-lam * (t_new - t)) for t in events)
        if last is None:
            return contrib, t_new
        return score * math.exp(-lam * (t_new - last)) + contrib, t_new

    one_shot, _ = batch_score(ts, 0.0, None)
    s, l = batch_score(ts[:cut], 0.0, None)
    split, _ = batch_score(ts[cut:], s, l if cut else None)
    assert abs(one_shot - split) <= 1e-9 * max(one_shot, 1.0)


# --------------------------------------------------------------------------
# k-token window index cardinality law (substring-dup coverage)
# --------------------------------------------------------------------------
@given(
    n_tokens=st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=6)
)
@settings(**_SETTINGS)
def test_window_index_counts_follow_max_law(spark, n_tokens):
    """Every doc contributes exactly max(n - k + 1, 0) windows (before
    the distinct): short docs vanish instead of fabricating windows via
    Spark's descending-sequence corner."""
    from stream_processing_with_flink_study_spark.plans.queries_quality import (
        _WIN_K,
        _window_index,
    )

    rows = [
        (i, " ".join(f"t{i}_{j}" for j in range(n)))
        for i, n in enumerate(n_tokens)
    ]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.n
        for r in _window_index(corpus, distinct=False)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for i, n in enumerate(n_tokens):
        # doc with all-unique tokens: split("") of empty text yields one
        # empty token, so n=0 behaves as a 1-token doc
        eff = max(n, 1)
        assert got.get(i, 0) == max(eff - _WIN_K + 1, 0)


def test_changepoint_finds_planted_shift(spark):
    """A clean level shift at position k must be recovered exactly, with
    the signed mean shift matching the planted delta."""
    import datetime as dt

    from stream_processing_with_flink_study_spark.plans.queries_tsfeat import (
        changepoint_plan,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for uid, (split, lo, hi) in {1: (15, 10.0, 50.0), 2: (30, 5.0, -20.0)}.items():
        for i in range(40):
            rows.append(
                (uid, i, t0 + dt.timedelta(minutes=i), lo if i < split else hi)
            )
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, value double"
    )
    got = {
        r.user_id: r
        for r in changepoint_plan(df, min_len=20).collect()
    }
    assert got[1].split_k == 15 and abs(got[1].mean_shift - 40.0) < 1e-3
    assert got[2].split_k == 30 and abs(got[2].mean_shift - (-25.0)) < 1e-3


def test_passage_dedup_conserves_distinct_passages(spark):
    """Corpus-wide, the number of KEPT passages equals the number of
    DISTINCT passage texts (each survives exactly once), and kept never
    exceeds total per document."""
    from pyspark.sql import functions as F

    from stream_processing_with_flink_study_spark.functions import text as T
    from stream_processing_with_flink_study_spark.plans import QUERIES

    sf = "/root/testdata/sf0.001"
    out = QUERIES["passage_dedup_reassemble"](spark, sf).toPandas()
    assert (out["n_kept"] <= out["n_passages"]).all()
    assert (out["n_kept"] >= 0).all()

    docs = spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id", T.tokens("text").alias("toks")
    )
    distinct_passages = (
        docs.select(
            F.explode(
                F.sequence(F.lit(1), F.size("toks"), F.lit(16))
            ).alias("start"),
            "toks",
        )
        .select(
            F.array_join(F.slice("toks", F.col("start"), 16), " ").alias("p")
        )
        .agg(F.count_distinct("p").alias("d"))
        .first()
        .d
    )
    assert int(out["n_kept"].sum()) == distinct_passages


def _ref_jaccard_pairs(docs: list[str], n: int, t: float):
    """Pure-Python ground truth: all-pairs exact n-gram Jaccard >= t."""
    sets = []
    for d in docs:
        toks = d.lower().split()
        sets.append(
            {
                " ".join(toks[i : i + n])
                for i in range(len(toks) - n + 1)
            }
        )
    out = set()
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            a, b = sets[i], sets[j]
            if not a or not b:
                continue
            inter = len(a & b)
            if inter / (len(a) + len(b) - inter) >= t:
                out.add((i, j))
    return out


@given(
    seeds=st.lists(
        st.integers(min_value=0, max_value=3), min_size=2, max_size=8
    ),
    edits=st.integers(min_value=0, max_value=2),
    t10=st.integers(min_value=3, max_value=9),
)
@settings(**_SETTINGS)
def test_prefix_filter_jaccard_is_lossless(spark, seeds, edits, t10):
    """PPJoin prefix filtering must return EXACTLY the ground-truth
    pair set for any threshold — losslessness is the whole contract."""
    from stream_processing_with_flink_study_spark.functions.dedup import (
        prefix_filter_jaccard_pairs,
    )

    base = ["alpha beta gamma delta epsilon zeta eta theta iota kappa",
            "one two three four five six seven eight nine ten",
            "red blue green yellow purple orange pink black white gray",
            "ant bee cat dog elk fox gnu hen ibis jay"]
    docs = []
    for k, s in enumerate(seeds):
        words = base[s].split()
        # perturb deterministically by example values to create a mix
        # of near-dups and unrelated docs
        for e in range(edits if k % 2 else 0):
            words[(k + e) % len(words)] = f"x{k}_{e}"
        docs.append(" ".join(words))
    t = t10 / 10.0
    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in prefix_filter_jaccard_pairs(
            df, "text", "doc_id", n=3, threshold=t
        ).collect()
    }
    assert got == _ref_jaccard_pairs(docs, 3, t)


def _ref_skyline(pts):
    """Brute-force 2-D dominance: keep (p, d) iff no other point is
    >= in both dims and > in at least one."""
    out = set()
    for a in pts:
        if not any(
            b[0] >= a[0] and b[1] >= a[1] and (b[0] > a[0] or b[1] > a[1])
            for b in pts
        ):
            out.add(a)
    return out


@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=12),
            st.integers(min_value=0, max_value=12),
        ),
        min_size=1,
        max_size=25,
    )
)
@settings(**_SETTINGS)
def test_skyline_window_form_matches_brute_force(spark, pts):
    """The sorted-running-max skyline (pareto_skyline_orders' plan
    shape) must equal quadratic dominance for any point multiset —
    including duplicates and single-dimension ties."""
    from pyspark.sql.window import Window

    df = spark.createDataFrame(pts, "p long, d long").groupBy(
        "p", "d"
    ).count()
    w = Window.orderBy(F.desc("p"), F.desc("d")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    got = {
        (r["p"], r["d"])
        for r in df.withColumn("m0", F.max("d").over(w))
        .filter(F.col("m0").isNull() | (F.col("d") > F.col("m0")))
        .collect()
    }
    assert got == _ref_skyline(set(pts))


@given(
    st.lists(
        st.tuples(st.integers(0, 1), st.integers(0, 50)),
        min_size=8,
        max_size=40,
    ).filter(lambda xs: 0 < sum(l for l, _ in xs) < len(xs))
)
@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
def test_rank_sum_auc_matches_pair_counting(spark, rows):
    """The window rank-sum AUC (queries_eval.roc_auc_by_source form)
    must equal the O(n²) definition: P(score_pos > score_neg) + ½
    P(tie), for ANY label/score multiset."""
    from pyspark.sql.window import Window

    df = spark.createDataFrame(
        [(l, s) for l, s in rows], "pos INT, score INT"
    )
    ranked = df.select(
        "pos",
        F.rank().over(Window.orderBy("score")).alias("rk"),
        F.count("*").over(Window.partitionBy("score")).alias("nt"),
    )
    got = ranked.agg(
        (
            (
                F.sum(F.col("pos") * (F.col("rk") + (F.col("nt") - 1) / 2.0))
                - F.sum("pos") * (F.sum("pos") + 1) / 2.0
            )
            / (F.sum("pos") * F.sum(F.lit(1) - F.col("pos")))
        ).alias("auc")
    ).first()["auc"]
    pos = [s for l, s in rows if l == 1]
    neg = [s for l, s in rows if l == 0]
    want = sum(
        1.0 if p > n else (0.5 if p == n else 0.0) for p in pos for n in neg
    ) / (len(pos) * len(neg))
    assert abs(got - want) < 1e-9


def test_markov_attribution_invariants(spark):
    """Removal effects must lie in [0, 1] (knocking a channel out can
    only lower absorption), attribution shares must sum to 1, and the
    base conversion probability must dominate every knockout run."""
    from stream_processing_with_flink_study_spark.plans import QUERIES

    from .conftest import SF_SMALL

    pdf = QUERIES["markov_attribution_removal"](spark, SF_SMALL).toPandas()
    assert len(pdf) >= 2
    assert (pdf["p_conv_base"] >= pdf["p_conv_removed"] - 1e-9).all()
    assert ((pdf["removal_effect"] >= -1e-9) & (pdf["removal_effect"] <= 1 + 1e-9)).all()
    assert abs(pdf["attribution"].sum() - 1.0) < 5e-3  # 4dp rounding slack


def test_holt_constant_series_is_flat(spark):
    """On a constant series Holt must return level == the constant and
    trend == 0 at every step (fitted equals the constant from t=1)."""
    months = [(f"m{i:02d}", 100.0) for i in range(12)]
    spark.createDataFrame(months, "month STRING, y DOUBLE").createOrReplaceTempView(
        "holt_const"
    )
    out = spark.sql(
        """
        WITH RECURSIVE monthly AS (
          SELECT CAST(row_number() OVER (ORDER BY month) AS BIGINT) - 1 AS idx,
                 month, y FROM holt_const
        ),
        hw (idx, y, lvl, trend) AS (
          SELECT m0.idx, m0.y, m0.y, m1.y - m0.y
          FROM monthly m0 JOIN monthly m1 ON m0.idx = 0 AND m1.idx = 1
          UNION ALL
          SELECT m.idx, m.y,
                 CAST(0.3 AS DOUBLE) * m.y + 0.7 * (h.lvl + h.trend),
                 CAST(0.1 AS DOUBLE) * ((0.3 * m.y + 0.7 * (h.lvl + h.trend)) - h.lvl)
                   + 0.9 * h.trend
          FROM hw h JOIN monthly m ON m.idx = h.idx + 1
        )
        SELECT * FROM hw
        """
    ).toPandas()
    assert len(out) == 12
    assert (abs(out["lvl"] - 100.0) < 1e-9).all()
    assert (abs(out["trend"]) < 1e-9).all()


def test_bitmap_distinct_equals_exact(spark):
    """Bitmap-aggregate distinct (bucketed construct + OR-merge) must
    equal COUNT(DISTINCT) for any id multiset, including ids far past
    one bucket's 32768-bit span."""
    ids = [0, 1, 5, 32767, 32768, 40000, 123456, 123456, 5, 999999]
    df = spark.createDataFrame([(i,) for i in ids], "uid LONG")
    got = (
        df.groupBy(F.expr("bitmap_bucket_number(uid)").alias("b"))
        .agg(F.expr("bitmap_construct_agg(bitmap_bit_position(uid))").alias("bm"))
        .agg(F.sum(F.expr("bitmap_count(bm)")).alias("nd"))
        .first()["nd"]
    )
    assert got == len(set(ids))
