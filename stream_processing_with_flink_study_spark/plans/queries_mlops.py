"""Pipeline-operations queries (fourth wave): time-decayed engagement
scoring (the streaming heavy-hitters-with-forgetting pattern),
inter-event gap/burstiness profiling, and leakage-safe split
assignment reports.

Scale notes: decayed scores are ONE keyed aggregate over a broadcast
one-row reference time (the decay kernel is a pure per-row expression,
so partial aggregation applies); gap stats are one shuffle-sort per
key; split assignment is a pure per-row hash with a tiny rollup.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources import load_table
from .registry import query

# half-life 7 days, in ms — ln 2 / half_life
DECAY_HALF_LIFE_MS = 7 * 86_400_000
DECAY_LAMBDA = math.log(2.0) / DECAY_HALF_LIFE_MS


@query(
    "decayed_topk_users",
    f"""
    WITH tref AS (SELECT max(epoch_ms(ts)) AS t FROM events),
    scored AS (
      SELECT user_id,
             sum(exp(-{DECAY_LAMBDA!r} * (t - epoch_ms(ts)))) AS score,
             count(*) AS n_events
      FROM events, tref
      GROUP BY user_id
    )
    SELECT user_id, round(score, 4) AS score, n_events
    FROM scored
    ORDER BY score DESC, user_id
    LIMIT 20
    """,
)
def decayed_topk_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-decayed activity ranking (7-day half-life): each
    event contributes ``exp(-λ·(T_ref − t))``, so recent activity
    dominates without any window cutoff — the decayed-count pattern
    behind trending/heavy-hitter feeds.  The decay kernel is a per-row
    JVM expression under a plain keyed SUM (map-side partials apply);
    T_ref is a broadcast one-row max.  Streaming twin:
    ``streaming.stateful.decayed_counts`` (O(1) state per key: score
    referenced at the key's last event, re-based on arrival — the
    classic forward-decay trick; equivalence in
    tests/test_streaming.py)."""
    # persist the 16-byte projection: both the T_ref max and the scoring
    # aggregate consume it — one parquet scan instead of two
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.unix_millis("ts").alias("ms"))
        .persist()
    )
    tref = ev.agg(F.max("ms").alias("t"))
    return (
        ev.crossJoin(F.broadcast(tref))
        .groupBy("user_id")
        .agg(
            F.sum(
                F.exp(F.lit(-DECAY_LAMBDA) * (F.col("t") - F.col("ms")))
            ).alias("score_raw"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy(F.desc("score_raw"), F.asc("user_id"))
        .limit(20)
        .select(
            "user_id", F.round("score_raw", 4).alias("score"), "n_events"
        )
    )


@query(
    "event_gap_stats",
    """
    WITH gaps AS (
      SELECT user_id,
             epoch_ms(ts) - lag(epoch_ms(ts))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_ms
      FROM events
    )
    SELECT user_id,
           count(gap_ms) AS n_gaps,
           round(avg(gap_ms) / 1000.0, 4) AS avg_gap_s,
           round(stddev_samp(gap_ms) / 1000.0, 4) AS std_gap_s,
           round(stddev_samp(gap_ms) / avg(gap_ms), 4) AS burstiness_cv
    FROM gaps
    WHERE gap_ms IS NOT NULL
    GROUP BY user_id
    HAVING count(gap_ms) >= 2
    """,
)
def event_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event gap profile per user: mean/stddev of consecutive
    event gaps and the coefficient of variation (CV > 1 = bursty,
    CV ≈ 1 = Poisson-like, CV < 1 = regular) — the cadence feature
    behind bot detection and session-gap tuning.  One shuffle-sort per
    key for the lag, then a plain keyed aggregate."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "user_id",
        (
            F.unix_millis("ts") - F.lag(F.unix_millis("ts")).over(w)
        ).alias("gap_ms"),
    ).filter(F.col("gap_ms").isNotNull())
    return (
        gaps.groupBy("user_id")
        .agg(
            F.count("gap_ms").alias("n_gaps"),
            F.avg("gap_ms").alias("avg_ms"),
            F.stddev_samp("gap_ms").alias("std_ms"),
        )
        .filter(F.col("n_gaps") >= 2)
        .select(
            "user_id",
            "n_gaps",
            F.round(F.col("avg_ms") / 1000.0, 4).alias("avg_gap_s"),
            F.round(F.col("std_ms") / 1000.0, 4).alias("std_gap_s"),
            F.round(F.col("std_ms") / F.col("avg_ms"), 4).alias(
                "burstiness_cv"
            ),
        )
    )


@query(
    "leakage_safe_splits",
    """
    WITH assigned AS (
      SELECT doc_id, source,
             CASE WHEN substr(md5('split0|' || source), 1, 8) < 'cccccccc'
                    THEN 'train'
                  WHEN substr(md5('split0|' || source), 1, 8) < 'e6666666'
                    THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    )
    SELECT split,
           count(*) AS n_docs,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           round(count(*) * 1.0 / (SELECT count(*) FROM documents), 4)
             AS frac
    FROM assigned
    GROUP BY split
    """,
)
def leakage_safe_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test assignment report: the split is a
    pure function of ``md5(salt|source)`` — every document from one
    source lands in the SAME split, so templated near-duplicates within
    a source can never straddle the train/eval boundary (the
    group-level split rule eval-decontamination assumes).  ~80/10/10 by
    source hash; actual doc fractions drift with per-source volume,
    which is exactly what the report surfaces.  Pure per-row hash, one
    tiny rollup, no shuffle of the corpus itself."""
    docs = load_table(spark, sf_dir, "documents")
    prefix = F.substring(
        F.md5(F.concat(F.lit("split0|"), F.col("source"))), 1, 8
    )
    assigned = docs.select(
        "doc_id",
        "source",
        F.when(prefix < "cccccccc", "train")
        .when(prefix < "e6666666", "val")
        .otherwise("test")
        .alias("split"),
    )
    counts = assigned.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("source").cast("long").alias("n_sources"),
    )
    # corpus total via a window over the <=3-row split frame — keeps the
    # query a single lazy plan (no driver-side count action)
    w = Window.partitionBy()
    return counts.select(
        "split",
        "n_docs",
        "n_sources",
        F.round(F.col("n_docs") * 1.0 / F.sum("n_docs").over(w), 4).alias(
            "frac"
        ),
    )


@query(
    "hard_negatives_topk",
    """
    WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec, label AS q_label
               FROM embeddings WHERE vec_id < 10),
    scored AS MATERIALIZED (
      SELECT q.q_id, e.vec_id AS n_id,
             list_cosine_similarity(q.q_vec::DOUBLE[],
                                    e.embedding::DOUBLE[]) AS sim
      FROM embeddings e CROSS JOIN q
      WHERE e.label != q.q_label
    )
    SELECT q_id, n_id, round(sim, 4) AS cosine_sim, CAST(rank AS INT) AS rank
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
)
def hard_negatives_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: for each query
    vector, the most-similar corpus vectors with a DIFFERENT label —
    the near-miss negatives that make embedding models learn, not the
    easy random ones.  Same broadcast-query / corpus-never-shuffles
    shape as ``embedding_cosine_topk`` with a label-mismatch predicate
    pushed into the scoring join; rank reduction partitions by query.
    """
    from ..functions.similarity import cosine

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_vec"),
        F.col("label").alias("q_label"),
    )
    c = emb.select(
        F.col("vec_id").alias("n_id"),
        F.col("embedding").alias("n_vec"),
        F.col("label").alias("n_label"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("n_label") != F.col("q_label"))
        .select(
            "q_id", "n_id", cosine(F.col("q_vec"), F.col("n_vec")).alias("sim")
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("sim").desc(), F.col("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select(
            "q_id", "n_id", F.round("sim", 4).alias("cosine_sim"), "rank"
        )
    )


@query(
    "next_event_training_pairs",
    """
    WITH seq AS (
      SELECT user_id, event_id, event_type, epoch_ms(ts) AS ts_ms,
             lead(event_type) OVER w AS next_type,
             epoch_ms(ts) - lag(epoch_ms(ts)) OVER w AS gap_prev_ms
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, event_id, event_type, ts_ms, gap_prev_ms, next_type
    FROM seq
    WHERE next_type IS NOT NULL
    """,
)
def next_event_training_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-event-prediction training examples: each event becomes a
    (features → label) pair with the follow-up event type as label and
    the backward gap as a cadence feature — the example-generation pass
    of a sequence-model pipeline.  One shuffle-sort per user computes
    BOTH the lead label and the lag feature in the same window."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ms = F.unix_millis("ts")
    return (
        ev.select(
            "user_id",
            "event_id",
            "event_type",
            ms.alias("ts_ms"),
            (ms - F.lag(ms).over(w)).alias("gap_prev_ms"),
            F.lead("event_type").over(w).alias("next_type"),
        )
        .filter(F.col("next_type").isNotNull())
    )


@query(
    "source_mixing_rates",
    """
    WITH per_source AS (
      SELECT source,
             CAST(sum(len(regexp_split_to_array(lower(trim(text)), '\\s+')))
                  AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ),
    budgeted AS (
      SELECT source, n_tokens,
             sum(n_tokens) OVER () * 0.5 / count(*) OVER () AS budget_s
      FROM per_source
    )
    SELECT source, n_tokens,
           round(least(1.0, budget_s / n_tokens), 4) AS sample_rate,
           CAST(floor(least(1.0, budget_s / n_tokens) * n_tokens) AS BIGINT)
             AS expected_tokens
    FROM budgeted
    """,
)
def source_mixing_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-mixing rates: given a token budget (50% of the corpus)
    split equally across sources, the per-source sampling rate
    ``min(1, budget/tokens)`` that flattens over-represented sources —
    the data-mixing computation behind every pretraining recipe.  One
    keyed aggregate for per-source token counts, then window totals
    over the tiny source frame; nothing driver-side."""
    docs = load_table(spark, sf_dir, "documents")
    per_source = docs.groupBy("source").agg(
        F.sum(F.size(F.split(F.lower(F.trim("text")), r"\s+")))
        .cast("long")
        .alias("n_tokens")
    )
    w = Window.partitionBy()
    budget_s = (
        F.sum("n_tokens").over(w) * 0.5 / F.count(F.lit(1)).over(w)
    )
    rate = F.least(F.lit(1.0), budget_s / F.col("n_tokens"))
    return per_source.select(
        "source",
        "n_tokens",
        F.round(rate, 4).alias("sample_rate"),
        F.floor(rate * F.col("n_tokens")).cast("long").alias(
            "expected_tokens"
        ),
    )


# --------------------------------------------------------------------------
# CUPED variance reduction with a deterministic hash A/B split
# --------------------------------------------------------------------------
@query(
    "cuped_variance_reduction",
    """
    WITH pre AS MATERIALIZED (
      SELECT o_custkey AS k, sum(o_totalprice) AS x FROM orders
      WHERE o_orderdate < DATE '1997-01-01' GROUP BY 1
    ),
    post AS MATERIALIZED (
      SELECT o_custkey AS k, sum(o_totalprice) AS y FROM orders
      WHERE o_orderdate >= DATE '1997-01-01' GROUP BY 1
    ),
    xy AS MATERIALIZED (
      SELECT coalesce(pre.k, post.k) AS k,
             coalesce(x, 0) AS x, coalesce(y, 0) AS y,
             CASE WHEN substr(md5('exp1|' || coalesce(pre.k, post.k)),
                             1, 8) < '80000000'
                  THEN 'A' ELSE 'B' END AS arm
      FROM pre FULL OUTER JOIN post ON post.k = pre.k
    ),
    mom AS (
      SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
      FROM xy
    ),
    th AS (
      SELECT n, sy / n AS my, sx / n AS mx,
             (sxy - sx * sy / n) / (sxx - sx * sx / n) AS theta,
             (syy - sy * sy / n) / (n - 1) AS var_y,
             ((syy - sy * sy / n)
              - (sxy - sx * sy / n) * (sxy - sx * sy / n)
                / (sxx - sx * sx / n)) / (n - 1) AS var_adj
      FROM mom
    ),
    arms AS (
      SELECT sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS n_a,
             sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS n_b,
             avg(CASE WHEN arm = 'A' THEN y END) AS mean_y_a,
             avg(CASE WHEN arm = 'B' THEN y END) AS mean_y_b,
             avg(CASE WHEN arm = 'A'
                      THEN y - (SELECT theta FROM th)
                             * (x - (SELECT mx FROM th)) END) AS adj_a,
             avg(CASE WHEN arm = 'B'
                      THEN y - (SELECT theta FROM th)
                             * (x - (SELECT mx FROM th)) END) AS adj_b
      FROM xy
    )
    SELECT CAST(th.n AS BIGINT) AS n_customers,
           CAST(arms.n_a AS BIGINT) AS n_a,
           CAST(arms.n_b AS BIGINT) AS n_b,
           round(th.theta, 4) AS theta,
           round(arms.mean_y_a, 4) AS mean_y_a,
           round(arms.mean_y_b, 4) AS mean_y_b,
           round(arms.adj_a, 4) AS mean_adj_a,
           round(arms.adj_b, 4) AS mean_adj_b,
           round(1.0 - th.var_adj / th.var_y, 4) AS var_reduction
    FROM th, arms
    """,
)
def cuped_variance_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED (controlled pre-period covariate adjustment) — the
    experimentation-platform primitive: per-customer POST-period spend
    adjusted by θ·(pre-period spend − mean), θ = cov(x,y)/var(x), with
    a deterministic md5 hash A/B split (same salt-hash convention as
    ``leakage_safe_splits`` — assignment is reproducible and
    independent of the covariate).  Reported: θ, per-arm raw and
    adjusted means, and the variance-reduction factor 1 − var(y_adj)/
    var(y) — the % of metric noise the pre-period covariate removes,
    i.e. how much smaller the experiment can be.

    Scale shape: two date-pruned keyed aggregates (pre/post spend) and
    a full-outer merge; θ and the variances assemble from ONE moment
    rollup (n, Σx, Σy, Σxy, Σx², Σy² — map-side combined, scalar
    output) in a single expression on each engine, with rounding
    absorbing summation-order jitter.  Adjusted-mean pass reuses the
    merged frame — nothing quadratic, nothing collected but scalars."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice", "o_orderdate"
    )
    split = F.lit("1997-01-01").cast("date")
    pre = (
        orders.filter(F.col("o_orderdate") < split)
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.sum("o_totalprice").alias("x"))
    )
    post = (
        orders.filter(F.col("o_orderdate") >= split)
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.sum("o_totalprice").alias("y"))
    )
    xy = (
        pre.join(post, "k", "full_outer")
        .select(
            "k",
            F.coalesce("x", F.lit(0.0)).alias("x"),
            F.coalesce("y", F.lit(0.0)).alias("y"),
        )
        .withColumn(
            "arm",
            F.when(
                F.substring(
                    F.md5(F.concat(F.lit("exp1|"), F.col("k"))), 1, 8
                )
                < "80000000",
                "A",
            ).otherwise("B"),
        )
        .persist()
    )
    mom = xy.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    ).first()
    n, sx, sy, sxy, sxx, syy = mom
    if not n:
        # empty cohort: the oracle's groupless rollup emits one row —
        # n_customers 0, every arm count/mean/θ NULL (its sums are
        # NULL); mirror instead of None-arithmetic (round-12 sweep)
        xy.unpersist()
        return spark.createDataFrame(
            [(0,) + (None,) * 8],
            "n_customers long, n_a long, n_b long, theta double, "
            "mean_y_a double, mean_y_b double, mean_adj_a double, "
            "mean_adj_b double, var_reduction double",
        )
    cxy = sxy - sx * sy / n
    vx = sxx - sx * sx / n
    vy = syy - sy * sy / n
    theta = cxy / vx
    mx = sx / n
    var_y = vy / (n - 1)
    var_adj = (vy - cxy * cxy / vx) / (n - 1)
    adj = F.col("y") - F.lit(theta) * (F.col("x") - F.lit(mx))
    arms = xy.agg(
        F.sum(F.when(F.col("arm") == "A", 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("arm") == "B", 1).otherwise(0)).alias("n_b"),
        F.avg(F.when(F.col("arm") == "A", F.col("y"))).alias("mean_y_a"),
        F.avg(F.when(F.col("arm") == "B", F.col("y"))).alias("mean_y_b"),
        F.avg(F.when(F.col("arm") == "A", adj)).alias("adj_a"),
        F.avg(F.when(F.col("arm") == "B", adj)).alias("adj_b"),
    )
    return arms.select(
        F.lit(n).cast("long").alias("n_customers"),
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.round(F.lit(theta), 4).alias("theta"),
        F.round("mean_y_a", 4).alias("mean_y_a"),
        F.round("mean_y_b", 4).alias("mean_y_b"),
        F.round("adj_a", 4).alias("mean_adj_a"),
        F.round("adj_b", 4).alias("mean_adj_b"),
        F.round(F.lit(1.0 - var_adj / var_y), 4).alias("var_reduction"),
    )


MIX_TEMPERATURE = 0.7


@query(
    "mixture_temperature_weights",
    f"""
    WITH per_lang AS (
      SELECT lang,
             CAST(sum(len(string_split_regex(trim(lower(text)), '\\s+')))
                  AS BIGINT) AS n_tokens
      FROM documents GROUP BY lang
    ),
    shares AS (
      SELECT lang, n_tokens,
             round(n_tokens * 1.0 / sum(n_tokens) OVER (), 6) AS p_raw
      FROM per_lang
    )
    SELECT lang, n_tokens, p_raw,
           round(power(p_raw, {MIX_TEMPERATURE})
                 / sum(power(p_raw, {MIX_TEMPERATURE})) OVER (), 4)
             AS p_temp,
           round((power(p_raw, {MIX_TEMPERATURE})
                  / sum(power(p_raw, {MIX_TEMPERATURE})) OVER ()) / p_raw,
                 4) AS upsample_factor
    FROM shares
    """,
)
def mixture_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled language-mixing weights (the multilingual
    pretraining sampler of mT5/XLM-R: ``p_i ∝ p_raw^T`` with T < 1
    flattening the head languages) — per language: raw token share,
    T={MIX_TEMPERATURE} share, and the implied up/down-sampling factor.
    Complements ``source_mixing_rates`` (equal-budget clipping) with
    the smooth-reweighting recipe.

    One scan tokenizes and rolls up per language; shares are window
    ratios over the 5-row language frame.  ``p_raw`` is rounded to 6
    before ``power`` so both engines exponentiate the same double
    (libm pow differs across engines only in the last ulp — far inside
    the 4dp output rounding)."""
    docs = load_table(spark, sf_dir, "documents")
    per_lang = docs.groupBy("lang").agg(
        F.sum(F.size(F.split(F.lower(F.trim("text")), r"\s+")))
        .cast("long")
        .alias("n_tokens")
    )
    w = Window.partitionBy()
    shares = per_lang.select(
        "lang",
        "n_tokens",
        F.round(F.col("n_tokens") * 1.0 / F.sum("n_tokens").over(w), 6).alias(
            "p_raw"
        ),
    )
    powed = F.pow(F.col("p_raw"), MIX_TEMPERATURE)
    p_temp = powed / F.sum(powed).over(w)
    return shares.select(
        "lang",
        "n_tokens",
        "p_raw",
        F.round(p_temp, 4).alias("p_temp"),
        F.round(p_temp / F.col("p_raw"), 4).alias("upsample_factor"),
    )


AB_Z_ALPHA = 1.959964  # two-sided 5%
AB_Z_POWER = 0.841621  # 80% power
AB_MDE = 0.05  # minimum detectable effect, relative


@query(
    "ab_test_sample_size",
    f"""
    WITH s AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             round(avg(value), 4) AS mean_v,
             round(var_samp(value), 4) AS var_v
      FROM events GROUP BY event_type
    )
    SELECT event_type, n, mean_v, var_v,
           CAST(floor(2.0 * {(AB_Z_ALPHA + AB_Z_POWER) ** 2}
                      * var_v / ((mean_v * {AB_MDE})
                                 * (mean_v * {AB_MDE})) + 1) AS BIGINT)
             AS n_per_arm,
           round(2.0 * {(AB_Z_ALPHA + AB_Z_POWER) ** 2} * var_v
                 / ((mean_v * {AB_MDE}) * (mean_v * {AB_MDE})) / n, 4)
             AS arms_per_current_volume
    FROM s
    """,
)
def ab_test_sample_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment power analysis: per metric stream (event type), the
    per-arm sample size needed to detect a {AB_MDE:.0%} relative lift
    in mean value at alpha=0.05 / power=0.80 — the two-sample normal
    approximation ``n = 2 (z_a + z_b)^2 sigma^2 / delta^2`` every A/B
    platform runs before launch, plus how many experiment-arms of
    traffic the CURRENT volume supplies.

    One keyed aggregate; mean and variance are rounded to 4dp before
    the closed-form (so both engines plug identical doubles into
    identical arithmetic — the ceiling can never straddle), and the z
    constants are baked literals, not engine quantile functions."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.round(F.avg("value"), 4).alias("mean_v"),
        F.round(F.var_samp("value"), 4).alias("var_v"),
    )
    k = 2.0 * (AB_Z_ALPHA + AB_Z_POWER) ** 2
    delta2 = (F.col("mean_v") * AB_MDE) * (F.col("mean_v") * AB_MDE)
    raw = k * F.col("var_v") / delta2
    return s.select(
        "event_type",
        "n",
        "mean_v",
        "var_v",
        F.floor(raw + 1).cast("long").alias("n_per_arm"),
        F.round(raw / F.col("n"), 4).alias("arms_per_current_volume"),
    )


SEG_SPLIT_TS = "1998-01-01 00:00:00"


@query(
    "segment_migration_matrix",
    f"""
    WITH h1 AS (
      SELECT o_custkey, round(sum(o_totalprice), 2) AS spend
      FROM orders WHERE o_orderdate < TIMESTAMP '{SEG_SPLIT_TS}'
      GROUP BY o_custkey
    ),
    h2 AS (
      SELECT o_custkey, round(sum(o_totalprice), 2) AS spend
      FROM orders WHERE o_orderdate >= TIMESTAMP '{SEG_SPLIT_TS}'
      GROUP BY o_custkey
    ),
    s1 AS (
      SELECT o_custkey,
             ntile(4) OVER (ORDER BY spend DESC, o_custkey) AS seg1
      FROM h1
    ),
    s2 AS (
      SELECT o_custkey,
             ntile(4) OVER (ORDER BY spend DESC, o_custkey) AS seg2
      FROM h2
    ),
    m AS (
      SELECT coalesce(s1.seg1, 0) AS seg_from,
             coalesce(s2.seg2, 0) AS seg_to,
             count(*) AS n
      FROM s1 FULL OUTER JOIN s2 ON s1.o_custkey = s2.o_custkey
      GROUP BY 1, 2
    )
    SELECT seg_from, seg_to, CAST(n AS BIGINT) AS n,
           round(n * 1.0 / sum(n) OVER (PARTITION BY seg_from), 4)
             AS p_transition
    FROM m
    """,
)
def segment_migration_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer value-segment migration matrix: spend-quartile (1 =
    top) in the first history half vs the second, with segment 0 =
    absent (new or churned) — the transition table behind retention
    dashboards and LTV Markov models, and the longitudinal companion
    to the static ``rfm_customer_segments``.

    Both halves reduce to per-customer frames in one scan each (the
    date predicate pushes to the scan), quartiles are cents-rounded
    ntiles with key tiebreaks (engine-stable cuts, the
    ``decile_lift_loyal`` discipline), and the matrix is a FULL OUTER
    join of the two small frames — absent sides surface as
    appear/churn rows instead of being dropped."""
    orders = load_table(spark, sf_dir, "orders")
    split = F.lit(SEG_SPLIT_TS).cast("timestamp")

    def half(pred, seg_name):
        h = (
            orders.filter(pred)
            .groupBy("o_custkey")
            .agg(F.round(F.sum("o_totalprice"), 2).alias("spend"))
        )
        return h.select(
            "o_custkey",
            F.ntile(4)
            .over(Window.orderBy(F.col("spend").desc(), F.col("o_custkey")))
            .alias(seg_name),
        )

    s1 = half(F.col("o_orderdate") < split, "seg1")
    s2 = half(F.col("o_orderdate") >= split, "seg2")
    m = (
        s1.join(s2, "o_custkey", "full_outer")
        .select(
            F.coalesce(F.col("seg1"), F.lit(0)).alias("seg_from"),
            F.coalesce(F.col("seg2"), F.lit(0)).alias("seg_to"),
        )
        .groupBy("seg_from", "seg_to")
        .agg(F.count("*").alias("n"))
    )
    return m.select(
        "seg_from",
        "seg_to",
        F.col("n").cast("long").alias("n"),
        F.round(
            F.col("n") * 1.0 / F.sum("n").over(Window.partitionBy("seg_from")),
            4,
        ).alias("p_transition"),
    )
