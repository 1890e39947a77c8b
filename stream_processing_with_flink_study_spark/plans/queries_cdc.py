"""Warehouse-ops queries, second batch (eighth wave, continued):
largest-remainder money proration, CDC log compaction to net effects,
Welch's unequal-variance t-test, and pairwise Jensen-Shannon
divergence between source language mixes.

Oracle-determinism notes (see plans/registry.py conventions):
- proration is EXACT integer arithmetic end-to-end: BIGINT cent
  products stay under 2^53-free territory (pure BIGINT div/mod), the
  largest-remainder ranks break ties on line number, and the invariant
  Σalloc = target is checkable as integer equality;
- CDC net-op classification is string/date logic over min_by/max_by
  with unique (date, orderkey) tiebreaks — no floats at all;
- Welch's t and its Satterthwaite df derive from exact integer-cent
  moments, so both engines compute identical doubles; the significance
  flag compares the ROUNDED |t| to the literal critical value;
- JSD terms are rationals of exact counts on a DENSIFIED source×lang
  grid (absent cells coalesce to hard zeros on both sides).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources import load_table
from .registry import query

T_CRIT_95 = 1.96  # two-sided 5% normal critical value (df ≫ 30 here)
CDC_SNAPSHOT_DATE = "1995-01-01"


@query(
    "proration_largest_remainder",
    """
    WITH li AS (
      SELECT l.l_orderkey, l.l_linenumber,
             CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT) AS w,
             CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS t,
             o.o_orderpriority
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    wsum AS (
      SELECT l_orderkey, l_linenumber, o_orderpriority, t, w,
             CAST(sum(w) OVER (PARTITION BY l_orderkey) AS BIGINT) AS ww
      FROM li
    ),
    base AS MATERIALIZED (
      SELECT l_orderkey, l_linenumber, o_orderpriority, t,
             (t * w) // ww AS alloc0,
             (t * w) % ww AS rem
      FROM wsum
    ),
    ranked AS (
      SELECT *,
             row_number() OVER (PARTITION BY l_orderkey
                                ORDER BY rem DESC, l_linenumber) AS rk,
             t - sum(alloc0) OVER (PARTITION BY l_orderkey) AS leftover
      FROM base
    ),
    alloc AS (
      SELECT o_orderpriority, l_orderkey, t,
             alloc0 + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS alloc,
             CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS bumped
      FROM ranked
    ),
    per_order AS (
      SELECT o_orderpriority, l_orderkey,
             max(t) AS t,
             CAST(sum(alloc) AS BIGINT) AS alloc_sum,
             CAST(sum(bumped) AS BIGINT) AS bumped,
             count(*) AS nl
      FROM alloc GROUP BY o_orderpriority, l_orderkey
    )
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(nl) AS BIGINT) AS n_lines,
           CAST(sum(alloc_sum) AS BIGINT) AS total_alloc_cents,
           CAST(sum(bumped) AS BIGINT) AS lines_bumped,
           bool_and(alloc_sum = t) AS balanced
    FROM per_order
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def proration_largest_remainder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prorate each order's header total across its line items
    proportionally to extended price, in EXACT integer cents, using
    the largest-remainder (Hamilton) method: every line gets
    ``⌊T·wᵢ/W⌋`` and the leftover pennies go to the largest
    fractional remainders (line number breaks ties) — the billing /
    revenue-allocation primitive where "sum of parts equals the
    invoice, to the penny" is a hard requirement floats cannot meet.

    The per-order invariant Σalloc = T holds by construction and is
    enforced in tests.  Scale shape: one fact-fact join co-partitioned
    on orderkey, one per-order window for ranks — the same single
    shuffle a groupBy would need; everything is BIGINT div/mod, no
    floats anywhere."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            "l_orderkey",
            "l_linenumber",
            F.floor(F.col("l_extendedprice") * 100 + 0.5)
            .cast("long")
            .alias("w"),
        )
        .join(
            load_table(spark, sf_dir, "orders").select(
                F.col("o_orderkey").alias("l_orderkey"),
                F.floor(F.col("o_totalprice") * 100 + 0.5)
                .cast("long")
                .alias("t"),
                "o_orderpriority",
            ),
            "l_orderkey",
        )
    )
    base = li.withColumn(
        "ww", F.sum("w").over(Window.partitionBy("l_orderkey")).cast("long")
    ).select(
        "l_orderkey",
        "l_linenumber",
        "o_orderpriority",
        "t",
        F.expr("t * w DIV ww").alias("alloc0"),
        F.expr("(t * w) % ww").alias("rem"),
    )
    wo = Window.partitionBy("l_orderkey")
    ranked = base.select(
        "*",
        F.row_number()
        .over(wo.orderBy(F.desc("rem"), "l_linenumber"))
        .alias("rk"),
        (F.col("t") - F.sum("alloc0").over(wo)).alias("leftover"),
    )
    alloc = ranked.select(
        "o_orderpriority",
        "l_orderkey",
        "t",
        (
            F.col("alloc0")
            + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
        ).alias("alloc"),
        F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0).alias(
            "bumped"
        ),
    )
    per_order = alloc.groupBy("o_orderpriority", "l_orderkey").agg(
        F.max("t").alias("t"),
        F.sum("alloc").cast("long").alias("alloc_sum"),
        F.sum("bumped").cast("long").alias("bumped"),
        F.count(F.lit(1)).alias("nl"),
    )
    return (
        per_order.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("nl").cast("long").alias("n_lines"),
            F.sum("alloc_sum").cast("long").alias("total_alloc_cents"),
            F.sum("bumped").cast("long").alias("lines_bumped"),
            F.bool_and(F.col("alloc_sum") == F.col("t")).alias("balanced"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "cdc_net_effect",
    f"""
    WITH log AS (
      SELECT o_custkey AS k, CAST(o_orderdate AS DATE) AS d, o_orderkey,
             CASE WHEN o_orderstatus = 'F' AND o_orderkey % 10 = 0
                  THEN 'D' ELSE 'U' END AS op
      FROM orders
    ),
    pre AS (
      SELECT DISTINCT k FROM log WHERE d < DATE '{CDC_SNAPSHOT_DATE}'
    ),
    win AS (
      SELECT k, CAST(count(*) AS BIGINT) AS n_ops,
             max_by(op, date_diff('day', DATE '1970-01-01', d)
                        * 1000000000000 + o_orderkey) AS last_op
      FROM log WHERE d >= DATE '{CDC_SNAPSHOT_DATE}'
      GROUP BY k
    ),
    net AS (
      SELECT w.k, w.n_ops,
             CASE WHEN w.last_op = 'D' AND p.k IS NOT NULL THEN 'DELETE'
                  WHEN w.last_op = 'D' THEN 'NOOP'
                  WHEN p.k IS NOT NULL THEN 'UPDATE'
                  ELSE 'INSERT' END AS net_op
      FROM win w LEFT JOIN pre p ON p.k = w.k
    )
    SELECT net_op,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(n_ops) AS BIGINT) AS n_ops_compacted,
           round(sum(n_ops) * 1.0 / count(*) - 1e-9, 4)
             AS avg_ops_per_key
    FROM net
    GROUP BY net_op
    ORDER BY net_op
    """,
)
def cdc_net_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC log compaction: collapse a change stream (every order is an
    upsert of its customer's record; finalized orders with key%10=0
    act as deletes) into per-key NET effects against the 1995-01-01
    snapshot — create+delete inside the window cancels to NOOP,
    pre-existing keys net to UPDATE or DELETE, new keys to INSERT.
    This is the Debezium→warehouse merge-prep operator: shipping net
    effects instead of raw ops cuts the MERGE's write amplification by
    avg_ops_per_key.

    Scale shape: ONE groupBy over the windowed log with ``max_by(op,
    (date, orderkey))`` picking the final op (unique tiebreak — no
    sort-the-whole-log step), plus a semi-join-shaped membership probe
    against pre-window keys; all string/integer logic, no floats."""
    orders = load_table(spark, sf_dir, "orders")
    log = orders.select(
        F.col("o_custkey").alias("k"),
        F.to_date("o_orderdate").alias("d"),
        "o_orderkey",
        F.when(
            (F.col("o_orderstatus") == "F") & (F.col("o_orderkey") % 10 == 0),
            "D",
        )
        .otherwise("U")
        .alias("op"),
    )
    pre = (
        log.filter(F.col("d") < F.lit(CDC_SNAPSHOT_DATE))
        .select("k")
        .distinct()
        .withColumn("existed", F.lit(1))
    )
    win = (
        log.filter(F.col("d") >= F.lit(CDC_SNAPSHOT_DATE))
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_ops"),
            F.max_by(
                "op",
                F.datediff("d", F.lit("1970-01-01")).cast("long")
                * F.lit(1000000000000)
                + F.col("o_orderkey"),
            ).alias("last_op"),
        )
    )
    net = win.join(pre, "k", "left").select(
        "n_ops",
        F.when(
            (F.col("last_op") == "D") & F.col("existed").isNotNull(), "DELETE"
        )
        .when(F.col("last_op") == "D", "NOOP")
        .when(F.col("existed").isNotNull(), "UPDATE")
        .otherwise("INSERT")
        .alias("net_op"),
    )
    return (
        net.groupBy("net_op")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.sum("n_ops").cast("long").alias("n_ops_compacted"),
            F.round(
                F.sum("n_ops") * 1.0 / F.count(F.lit(1)) - 1e-9, 4
            ).alias("avg_ops_per_key"),
        )
        .orderBy("net_op")
    )


@query(
    "welch_ttest_segments",
    f"""
    WITH j AS (
      SELECT c.c_mktsegment AS seg,
             CAST(floor(o.o_totalprice) AS BIGINT) AS dol
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE c.c_mktsegment IN ('AUTOMOBILE', 'HOUSEHOLD')
    ),
    m AS (
      SELECT seg, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(dol) AS BIGINT) AS s1,
             CAST(sum(dol * dol) AS BIGINT) AS s2
      FROM j GROUP BY seg
    ),
    p AS (
      SELECT
        max(CASE WHEN seg = 'AUTOMOBILE' THEN n END) AS na,
        max(CASE WHEN seg = 'HOUSEHOLD' THEN n END) AS nb,
        max(CASE WHEN seg = 'AUTOMOBILE'
                 THEN CAST(s1 AS DOUBLE) / n END) AS ma,
        max(CASE WHEN seg = 'HOUSEHOLD'
                 THEN CAST(s1 AS DOUBLE) / n END) AS mb,
        max(CASE WHEN seg = 'AUTOMOBILE'
                 THEN (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n)
                      / (n - 1) END) AS va,
        max(CASE WHEN seg = 'HOUSEHOLD'
                 THEN (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n)
                      / (n - 1) END) AS vb
      FROM m
    )
    SELECT na AS n_auto, nb AS n_household,
           round(ma - 1e-9, 2) AS mean_auto_usd,
           round(mb - 1e-9, 2) AS mean_household_usd,
           round((ma - mb) / sqrt(va / na + vb / nb) - 1e-9, 4)
             AS t_stat,
           round(pow(va / na + vb / nb, 2)
                 / (pow(va / na, 2) / (na - 1)
                    + pow(vb / nb, 2) / (nb - 1)) - 1e-9, 1)
             AS welch_df,
           coalesce(abs(round((ma - mb) / sqrt(va / na + vb / nb)
                           - 1e-9, 4))
                    > {T_CRIT_95!r}, false) AS significant
    FROM p
    """,
)
def welch_ttest_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test for mean order value between
    AUTOMOBILE and HOUSEHOLD customers, with the Welch-Satterthwaite
    effective degrees of freedom — the default two-sample test (never
    assume equal variances) behind every segment-comparison dashboard.
    Means and variances derive from exact integer-DOLLAR moments
    (cents² would pass 2^63 around one million fact rows — dollar
    units keep Σx² exact through sf10), so t and df are
    engine-identical doubles; significance compares the
    ROUNDED |t| against the z critical value (df is ~10⁴ here, where
    t and z coincide to 3 decimals).  One broadcast dim join + one
    map-side-combinable moment aggregate — single fact scan."""
    j = (
        load_table(spark, sf_dir, "orders")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "customer")
                .filter(
                    F.col("c_mktsegment").isin("AUTOMOBILE", "HOUSEHOLD")
                )
                .select(
                    F.col("c_custkey").alias("o_custkey"),
                    F.col("c_mktsegment").alias("seg"),
                )
            ),
            "o_custkey",
        )
        .select(
            "seg",
            F.floor(F.col("o_totalprice")).cast("long").alias("dol"),
        )
    )
    m = j.groupBy("seg").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("dol").cast("long").alias("s1"),
        F.sum(F.col("dol") * F.col("dol")).cast("long").alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("n")
    var = (
        F.col("s2").cast("double")
        - F.col("s1").cast("double") * F.col("s1") / F.col("n")
    ) / (F.col("n") - 1)
    p = m.agg(
        F.max(F.when(F.col("seg") == "AUTOMOBILE", F.col("n"))).alias("na"),
        F.max(F.when(F.col("seg") == "HOUSEHOLD", F.col("n"))).alias("nb"),
        F.max(F.when(F.col("seg") == "AUTOMOBILE", mean)).alias("ma"),
        F.max(F.when(F.col("seg") == "HOUSEHOLD", mean)).alias("mb"),
        F.max(F.when(F.col("seg") == "AUTOMOBILE", var)).alias("va"),
        F.max(F.when(F.col("seg") == "HOUSEHOLD", var)).alias("vb"),
    )
    se2 = F.col("va") / F.col("na") + F.col("vb") / F.col("nb")
    t_r = F.round((F.col("ma") - F.col("mb")) / F.sqrt(se2) - 1e-9, 4)
    return p.select(
        F.col("na").alias("n_auto"),
        F.col("nb").alias("n_household"),
        F.round(F.col("ma") - 1e-9, 2).alias("mean_auto_usd"),
        F.round(F.col("mb") - 1e-9, 2).alias("mean_household_usd"),
        t_r.alias("t_stat"),
        F.round(
            F.pow(se2, 2)
            / (
                F.pow(F.col("va") / F.col("na"), 2) / (F.col("na") - 1)
                + F.pow(F.col("vb") / F.col("nb"), 2) / (F.col("nb") - 1)
            )
            - 1e-9,
            1,
        ).alias("welch_df"),
        # coalesce: "no evidence" on an empty segment is a
        # NON-rejection, not a NULL (the wilcoxon r11 precedent)
        F.coalesce(F.abs(t_r) > T_CRIT_95, F.lit(False)).alias(
            "significant"
        ),
    )


@query(
    "jsd_source_pairs",
    """
    WITH counts AS (
      SELECT source, lang, CAST(count(*) AS BIGINT) AS c
      FROM documents GROUP BY source, lang
    ),
    grid AS (
      SELECT s.source, l.lang, coalesce(c.c, 0) AS c
      FROM (SELECT DISTINCT source FROM documents) s
      CROSS JOIN (SELECT DISTINCT lang FROM documents) l
      LEFT JOIN counts c ON c.source = s.source AND c.lang = l.lang
    ),
    dist AS MATERIALIZED (
      SELECT source, lang,
             CAST(c AS DOUBLE) / sum(c) OVER (PARTITION BY source) AS p
      FROM grid
    ),
    pairs AS (
      SELECT a.source AS s1, b.source AS s2, a.lang,
             a.p AS p, b.p AS q
      FROM dist a JOIN dist b
        ON a.lang = b.lang AND a.source < b.source
    )
    SELECT s1, s2,
           round(sum(CASE WHEN p > 0
                          THEN p / 2 * log2(2 * p / (p + q)) ELSE 0 END
                   + CASE WHEN q > 0
                          THEN q / 2 * log2(2 * q / (p + q)) ELSE 0 END)
                 - 1e-9, 4) AS jsd_bits
    FROM pairs
    GROUP BY s1, s2
    ORDER BY s1, s2
    """,
)
def jsd_source_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between every two sources'
    language mixes — the SYMMETRIC, bounded (≤1 bit) cousin of the
    per-source KL screen (:func:`queries_mining.source_kl_divergence`),
    which is what you actually want for a source-similarity matrix
    (KL is asymmetric and blows up on zeros; JSD handles disjoint
    support gracefully).

    Zero-support correctness: the source×lang grid is DENSIFIED first
    (absent cells are hard zeros on both engines), so p=0 terms drop
    out identically rather than depending on join-miss behavior.
    Scale shape: the corpus reduces to a |S|×|L| cell table in one
    map-side-combined count; the pair join is |S|²·|L| over that tiny
    table — the quadratic never touches facts."""
    docs = load_table(spark, sf_dir, "documents")
    # one fact scan: the |S|×|L| grid (and the pair self-join) derive
    # from the eagerly-materialized cell table, never from documents
    counts = (
        docs.groupBy("source", "lang")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint()
    )
    grid = (
        counts.select("source")
        .distinct()
        .crossJoin(counts.select("lang").distinct())
        .join(counts, ["source", "lang"], "left")
        .select("source", "lang", F.coalesce("c", F.lit(0)).alias("c"))
    )
    dist = grid.select(
        "source",
        "lang",
        (
            F.col("c").cast("double")
            / F.sum("c").over(Window.partitionBy("source"))
        ).alias("p"),
    )
    a = dist.alias("a")
    b = dist.select(
        F.col("source").alias("s2"),
        F.col("lang").alias("lang"),
        F.col("p").alias("q"),
    ).alias("b")
    pairs = a.join(
        b,
        (F.col("a.lang") == F.col("b.lang"))
        & (F.col("a.source") < F.col("b.s2")),
    ).select(
        F.col("a.source").alias("s1"),
        F.col("b.s2").alias("s2"),
        F.col("a.p").alias("p"),
        F.col("b.q").alias("q"),
    )
    term = F.when(
        F.col("p") > 0,
        F.col("p") / 2 * F.log2(2 * F.col("p") / (F.col("p") + F.col("q"))),
    ).otherwise(0.0) + F.when(
        F.col("q") > 0,
        F.col("q") / 2 * F.log2(2 * F.col("q") / (F.col("p") + F.col("q"))),
    ).otherwise(0.0)
    return (
        pairs.groupBy("s1", "s2")
        .agg(F.round(F.sum(term) - 1e-9, 4).alias("jsd_bits"))
        .orderBy("s1", "s2")
    )


@query(
    "shift_share_growth",
    """
    WITH seg AS (
      SELECT c.c_mktsegment AS segment,
             CAST(sum(CASE WHEN o.o_orderdate >= DATE '1996-01-01'
                            AND o.o_orderdate < DATE '1997-01-01'
                           THEN CAST(floor(o.o_totalprice * 100 + 0.5)
                                     AS BIGINT) ELSE 0 END) AS BIGINT)
               AS rev0,
             CAST(sum(CASE WHEN o.o_orderdate >= DATE '1997-01-01'
                            AND o.o_orderdate < DATE '1998-01-01'
                           THEN CAST(floor(o.o_totalprice * 100 + 0.5)
                                     AS BIGINT) ELSE 0 END) AS BIGINT)
               AS rev1
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY c.c_mktsegment
    ),
    tot AS (
      SELECT CAST(sum(rev0) AS BIGINT) AS t0,
             CAST(sum(rev1) AS BIGINT) AS t1
      FROM seg
    )
    SELECT s.segment,
           round(s.rev0 / 100.0 - 1e-9, 2) AS rev_1996_usd,
           round(s.rev1 / 100.0 - 1e-9, 2) AS rev_1997_usd,
           round(100.0 * (s.rev1 - s.rev0) / s.rev0 - 1e-9, 4)
             AS growth_pct,
           round(s.rev0 * (CAST(t.t1 AS DOUBLE) / t.t0 - 1.0) / 100.0
                 - 1e-9, 2) AS national_effect_usd,
           round((s.rev1 - s.rev0
                  - s.rev0 * (CAST(t.t1 AS DOUBLE) / t.t0 - 1.0)) / 100.0
                 - 1e-9, 2) AS competitive_shift_usd,
           round(10000.0 * s.rev1 / t.t1 - 10000.0 * s.rev0 / t.t0
                 - 1e-9, 2) AS share_change_bps
    FROM seg s CROSS JOIN tot t
    ORDER BY s.segment
    """,
)
def shift_share_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shift-share decomposition of 1996→1997 revenue growth per market
    segment: each segment's change splits into the NATIONAL effect
    (what it would have gained growing at the overall rate) and the
    COMPETITIVE shift (out/under-performance vs that counterfactual),
    plus the share change in basis points — the regional-economics
    standard for "did this segment grow, or did the tide lift it?".
    One broadcast dim join, one conditional-sum aggregate over exact
    integer cents; all effects are rationals of exact BIGINTs."""
    j = load_table(spark, sf_dir, "orders").join(
        F.broadcast(
            load_table(spark, sf_dir, "customer").select(
                F.col("c_custkey").alias("o_custkey"),
                F.col("c_mktsegment").alias("segment"),
            )
        ),
        "o_custkey",
    )
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    in96 = (F.col("o_orderdate") >= F.lit("1996-01-01")) & (
        F.col("o_orderdate") < F.lit("1997-01-01")
    )
    in97 = (F.col("o_orderdate") >= F.lit("1997-01-01")) & (
        F.col("o_orderdate") < F.lit("1998-01-01")
    )
    # totals via a whole-frame window on the 5-row segment frame — a
    # separate agg + cross join would rescan the fact join twice
    w_tot = Window.partitionBy()
    seg = j.groupBy("segment").agg(
        F.sum(F.when(in96, cents).otherwise(0)).cast("long").alias("rev0"),
        F.sum(F.when(in97, cents).otherwise(0)).cast("long").alias("rev1"),
    ).select(
        "*",
        F.sum("rev0").over(w_tot).cast("long").alias("t0"),
        F.sum("rev1").over(w_tot).cast("long").alias("t1"),
    )
    g = F.col("t1").cast("double") / F.col("t0") - 1.0
    return (
        seg
        .select(
            "segment",
            F.round(F.col("rev0") / 100.0 - 1e-9, 2).alias("rev_1996_usd"),
            F.round(F.col("rev1") / 100.0 - 1e-9, 2).alias("rev_1997_usd"),
            F.round(
                100.0 * (F.col("rev1") - F.col("rev0")) / F.col("rev0")
                - 1e-9,
                4,
            ).alias("growth_pct"),
            F.round(F.col("rev0") * g / 100.0 - 1e-9, 2).alias(
                "national_effect_usd"
            ),
            F.round(
                (F.col("rev1") - F.col("rev0") - F.col("rev0") * g) / 100.0
                - 1e-9,
                2,
            ).alias("competitive_shift_usd"),
            F.round(
                10000.0 * F.col("rev1") / F.col("t1")
                - 10000.0 * F.col("rev0") / F.col("t0")
                - 1e-9,
                2,
            ).alias("share_change_bps"),
        )
        .orderBy("segment")
    )


@query(
    "fisher_price_index",
    """
    WITH pp AS (
      SELECT l_partkey AS pk,
             CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01'
                  THEN 1 ELSE 0 END AS period,
             CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents,
             CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) AS BIGINT)
               AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY 1, 2
    ),
    matched AS MATERIALIZED (
      SELECT p0.pk,
             CAST(p0.cents AS DOUBLE) / p0.qty AS p0,
             CAST(p1.cents AS DOUBLE) / p1.qty AS p1,
             p0.qty AS q0, p1.qty AS q1
      FROM pp p0 JOIN pp p1 ON p0.pk = p1.pk
      WHERE p0.period = 0 AND p1.period = 1
    ),
    idx AS (
      SELECT CAST(count(*) AS BIGINT) AS n_parts,
             sum(p1 * q0) / sum(p0 * q0) AS laspeyres,
             sum(p1 * q1) / sum(p0 * q1) AS paasche
      FROM matched
    )
    SELECT n_parts,
           round(laspeyres - 1e-9, 4) AS laspeyres,
           round(paasche - 1e-9, 4) AS paasche,
           round(sqrt(laspeyres * paasche) - 1e-9, 4) AS fisher,
           round(100.0 * (sqrt(laspeyres * paasche) - 1.0) - 1e-9, 2)
             AS fisher_inflation_pct
    FROM idx
    """,
)
def fisher_price_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laspeyres, Paasche and Fisher ideal price indices for 1997 vs
    1996 over parts shipped in both years (unit price = revenue/
    quantity per part-year): Laspeyres weights by base-year baskets
    (overstates inflation under substitution), Paasche by current
    baskets (understates), and their geometric mean — Fisher's ideal
    index — is the superlative estimate national statistics agencies
    actually publish.  One filtered scan (the date predicate reaches
    the parquet scan), one (part, year) aggregate in exact integers,
    and a part-keyed self-join of the reduced frame."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    # one-pass conditional pivot (cents/qty per period in one groupBy)
    # — the per-period filter + self-join form scans lineitem twice
    y97 = F.col("l_shipdate") >= F.lit("1997-01-01")
    ecents = F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
    iqty = F.floor(F.col("l_quantity") + 0.5).cast("long")
    both = (
        li.groupBy(F.col("l_partkey").alias("pk"))
        .agg(
            F.sum(F.when(~y97, ecents).otherwise(0)).cast("long").alias("c0"),
            F.sum(F.when(~y97, iqty).otherwise(0)).cast("long").alias("q0"),
            F.sum(F.when(y97, ecents).otherwise(0)).cast("long").alias("c1"),
            F.sum(F.when(y97, iqty).otherwise(0)).cast("long").alias("q1"),
        )
        .filter((F.col("q0") > 0) & (F.col("q1") > 0))
        .select(
            "pk",
            (F.col("c0").cast("double") / F.col("q0")).alias("p0"),
            (F.col("c1").cast("double") / F.col("q1")).alias("p1"),
            "q0",
            "q1",
        )
    )
    idx = both.agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        (
            F.sum(F.col("p1") * F.col("q0")) / F.sum(F.col("p0") * F.col("q0"))
        ).alias("laspeyres"),
        (
            F.sum(F.col("p1") * F.col("q1")) / F.sum(F.col("p0") * F.col("q1"))
        ).alias("paasche"),
    )
    fisher = F.sqrt(F.col("laspeyres") * F.col("paasche"))
    return idx.select(
        "n_parts",
        F.round(F.col("laspeyres") - 1e-9, 4).alias("laspeyres"),
        F.round(F.col("paasche") - 1e-9, 4).alias("paasche"),
        F.round(fisher - 1e-9, 4).alias("fisher"),
        F.round(100.0 * (fisher - 1.0) - 1e-9, 2).alias(
            "fisher_inflation_pct"
        ),
    )


# --------------------------------------------------------------------------
# stratified IPW: does order priority cause late first shipment?
# --------------------------------------------------------------------------
_IPW_SQL = """
WITH firsts AS MATERIALIZED (
  SELECT l_orderkey, min(CAST(l_shipdate AS DATE)) AS first_ship
  FROM {lineitem} GROUP BY 1
),
base AS MATERIALIZED (
  SELECT c.c_mktsegment AS s,
         CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
              THEN 1 ELSE 0 END AS t,
         CASE WHEN {DD} > 60 THEN 1 ELSE 0 END AS y
  FROM {orders} o
  JOIN {customer} c ON c.c_custkey = o.o_custkey
  JOIN firsts li ON li.l_orderkey = o.o_orderkey
),
strat AS MATERIALIZED (
  SELECT s, CAST(count(*) AS BIGINT) AS n_s,
         CAST(sum(t) AS BIGINT) AS n1,
         CAST(sum(t * y) AS BIGINT) AS y1,
         CAST(sum((1 - t) * y) AS BIGINT) AS y0
  FROM base GROUP BY s
),
ok AS (SELECT * FROM strat WHERE n1 > 0 AND n1 < n_s),
est AS MATERIALIZED (
  SELECT CAST(sum(n_s) AS BIGINT) AS n,
         CAST(count(*) AS BIGINT) AS k_strata,
         sum(CAST(y1 AS DOUBLE) * n_s / n1) AS ht1,
         sum(CAST(y0 AS DOUBLE) * n_s / (n_s - n1)) AS ht0,
         sum(CAST(y1 AS DOUBLE)) / sum(n1) AS naive1,
         sum(CAST(y0 AS DOUBLE)) / sum(n_s - n1) AS naive0
  FROM ok
)
SELECT n, k_strata,
       round(naive1 - naive0 - 1e-9, 4) + 0.0 AS naive_diff,
       round(ht1 / n - ht0 / n - 1e-9, 4) + 0.0 AS ate_ipw,
       round((naive1 - naive0) - (ht1 / n - ht0 / n) - 1e-9, 4) + 0.0
         AS confounding_bias
FROM est
"""


@query(
    "ipw_priority_lateness",
    _IPW_SQL.replace("{lineitem}", "lineitem")
    .replace("{orders}", "orders")
    .replace("{customer}", "customer")
    .replace(
        "{DD}",
        "date_diff('day', CAST(o.o_orderdate AS DATE), li.first_ship)",
    ),
)
def ipw_priority_lateness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified inverse-propensity-weighted ATE: the effect of
    urgent/high order priority on late first shipment (>60 days),
    controlling for market segment — the workhorse causal estimator
    when treatment isn't randomized.  Within-stratum propensity
    e(s) = n₁ₛ/nₛ is EXACT (no logistic fit to disagree on), and with
    stratum-constant propensities the Horvitz-Thompson, Hajek, and
    blocking estimators coincide algebraically — the reported
    ``ate_ipw`` is all three; ``confounding_bias`` is what the naive
    difference-in-means got wrong.

    Scale shape: one lineitem rollup to first-ship, two fact joins,
    then ALL estimation on the 5-row stratum frame of exact counts.
    Strata with no treated or no control units drop out (standard
    positivity screen).  tests/test_stattests.py runs the same
    estimator (:func:`ipw_ate_frame`) on a planted confounded frame
    where the true effect is zero — the naive diff must show the
    confounding, the IPW must remove it."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "ipw_lineitem"
    )
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "ipw_orders"
    )
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "ipw_customer"
    )
    return spark.sql(
        _IPW_SQL.replace("{lineitem}", "ipw_lineitem")
        .replace("{orders}", "ipw_orders")
        .replace("{customer}", "ipw_customer")
        .replace(
            "{DD}",
            "datediff(li.first_ship, CAST(o.o_orderdate AS DATE))",
        )
        .replace(" MATERIALIZED", "")
    )


def ipw_ate_frame(base: DataFrame) -> DataFrame:
    """Stratified-IPW estimator over any (s, t, y) frame — factored
    out so tests can plant confounding; see
    :func:`ipw_priority_lateness`."""
    base.createOrReplaceTempView("ipw_base_frame")
    sql = _IPW_SQL.replace(" MATERIALIZED", "")
    head = sql.index("strat AS")
    return base.sparkSession.sql(
        "WITH " + sql[head:].replace("FROM base", "FROM ipw_base_frame")
    )
