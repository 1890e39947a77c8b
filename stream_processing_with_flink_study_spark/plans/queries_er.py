"""Entity-resolution and attribution queries (ninth wave):
Fellegi-Sunter probabilistic record linkage with m/u log-weights,
identity stitching (alias-graph connected components to a canonical
user), and exact 3-channel Shapley-value marketing attribution.

Oracle-determinism notes (see plans/registry.py conventions):
- the Fellegi-Sunter agreement weights are PRECOMPUTED double literals
  (log2 of the m/u ratios), so each pair's score is a sum of two
  literal doubles — bit-identical across engines; decision thresholds
  compare those exact doubles to literal cutoffs nowhere near them;
- the synthetic "dirty file" perturbations (balance shift, segment
  flip) are md5-seeded and integer-valued, so both engines build the
  same file B;
- identity-stitch components aggregate exact integers (counts, cent
  sums); the oracle replays the component merge as a recursive
  min-label CTE, like ``dbscan_grid_clusters``;
- Shapley values are literal-weighted sums of exact-integer conversion
  rates over the densified 8-coalition grid, written as the SAME
  expression tree on both sides and rounded once at output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from ..sources import load_table
from .queries_audit import _spark_uniform, _sql_uniform
from .registry import query

# Fellegi-Sunter m/u parameters -> log2(m/u) agreement / disagreement
# weights, precomputed so neither engine does the log itself.
FS_W_SEG_AGREE = 2.247927513443585  # log2(0.95 / 0.20)
FS_W_SEG_DISAGREE = -4.0  # log2(0.05 / 0.80)
FS_W_BAL_AGREE = 6.491853096329675  # log2(0.90 / 0.01)
FS_W_BAL_DISAGREE = -3.3074285251922473  # log2(0.10 / 0.99)
FS_THRESHOLD_LINK = 4.0
FS_THRESHOLD_POSSIBLE = 0.0
FS_BAL_TOL_CENTS = 500
FS_FLIP_RATE = 0.1

ONE_THIRD = 0.3333333333333333
ONE_SIXTH = 0.16666666666666666


# --------------------------------------------------------------------------
# Fellegi-Sunter probabilistic record linkage
# --------------------------------------------------------------------------
@query(
    "fellegi_sunter_linkage",
    f"""
    WITH a AS (
      SELECT c_custkey, c_nationkey, c_mktsegment,
             CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
      FROM customer
    ),
    b AS (
      SELECT c_custkey, c_nationkey,
             CASE WHEN {_sql_uniform("concat('fs0|', c_custkey)")}
                       < {FS_FLIP_RATE}
                  THEN 'UNKNOWN' ELSE c_mktsegment END AS c_mktsegment,
             CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
               + (c_custkey % 701) - 350 AS cents
      FROM customer
    ),
    scored AS MATERIALIZED (
      SELECT a.c_nationkey AS nationkey,
             a.c_custkey = b.c_custkey AS is_true_pair,
             (CASE WHEN a.c_mktsegment = b.c_mktsegment
                   THEN {FS_W_SEG_AGREE} ELSE {FS_W_SEG_DISAGREE} END)
             + (CASE WHEN abs(a.cents - b.cents) <= {FS_BAL_TOL_CENTS}
                     THEN {FS_W_BAL_AGREE} ELSE {FS_W_BAL_DISAGREE} END)
               AS score
      FROM a JOIN b ON a.c_nationkey = b.c_nationkey
    )
    SELECT nationkey,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(CASE WHEN score >= {FS_THRESHOLD_LINK}
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_link,
           CAST(sum(CASE WHEN score >= {FS_THRESHOLD_POSSIBLE}
                         AND score < {FS_THRESHOLD_LINK}
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_possible,
           CAST(sum(CASE WHEN is_true_pair
                         AND score >= {FS_THRESHOLD_LINK}
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_true_links,
           CAST(sum(CASE WHEN is_true_pair THEN 1 ELSE 0 END) AS BIGINT)
             AS n_true_pairs,
           round(CAST(sum(CASE WHEN is_true_pair
                               AND score >= {FS_THRESHOLD_LINK}
                          THEN 1 ELSE 0 END) AS DOUBLE)
                 / sum(CASE WHEN is_true_pair THEN 1 ELSE 0 END)
                 - 1e-9, 4) AS recall,
           round(CAST(sum(CASE WHEN is_true_pair
                               AND score >= {FS_THRESHOLD_LINK}
                          THEN 1 ELSE 0 END) AS DOUBLE)
                 / nullif(sum(CASE WHEN score >= {FS_THRESHOLD_LINK}
                              THEN 1 ELSE 0 END), 0)
                 - 1e-9, 4) AS precision
    FROM scored GROUP BY nationkey ORDER BY nationkey
    """,
)
def fellegi_sunter_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter probabilistic record linkage (JASA 1969 — the
    theory every production MDM/ER system implements): match a clean
    customer file against a deterministically-dirtied copy (10% of
    segments flipped, balances shifted by up to ±$3.50), comparing
    field-agreement patterns with log2(m/u) evidence weights and
    classifying pairs link / possible / non-link by summed weight.
    Unlike ``fuzzy_name_match`` (pure edit distance), this is the
    probabilistic-evidence half of linkage: per-field m/u parameters,
    additive log-likelihood scores, a reject region, and
    precision/recall against the known true mapping.

    Scale shape: candidate pairs are generated ONLY inside nationkey
    blocks (the standard quadratic guard — comparisons are
    sum-of-block-squares, not corpus²); the score is a branch-free
    per-pair expression, and the decision rollup is one aggregation.
    At 100 TB you'd block on a higher-cardinality key (zip, name
    prefix) — the plan shape is identical."""
    cust = load_table(spark, sf_dir, "customer")
    a = cust.select(
        "c_custkey",
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") * 100 + 0.5).cast("long").alias("cents"),
    )
    b = cust.select(
        F.col("c_custkey").alias("b_custkey"),
        F.col("c_nationkey"),
        F.when(
            _spark_uniform(F.concat(F.lit("fs0|"), F.col("c_custkey")))
            < FS_FLIP_RATE,
            F.lit("UNKNOWN"),
        )
        .otherwise(F.col("c_mktsegment"))
        .alias("b_mktsegment"),
        (
            F.floor(F.col("c_acctbal") * 100 + 0.5).cast("long")
            + (F.col("c_custkey") % 701)
            - 350
        ).alias("b_cents"),
    )
    score = F.when(
        F.col("c_mktsegment") == F.col("b_mktsegment"),
        F.lit(FS_W_SEG_AGREE),
    ).otherwise(F.lit(FS_W_SEG_DISAGREE)) + F.when(
        F.abs(F.col("cents") - F.col("b_cents")) <= FS_BAL_TOL_CENTS,
        F.lit(FS_W_BAL_AGREE),
    ).otherwise(F.lit(FS_W_BAL_DISAGREE))
    scored = a.join(b, "c_nationkey").select(
        F.col("c_nationkey").alias("nationkey"),
        (F.col("c_custkey") == F.col("b_custkey")).alias("is_true_pair"),
        score.alias("score"),
    )
    is_link = (F.col("score") >= FS_THRESHOLD_LINK).cast("int")
    is_possible = (
        (F.col("score") >= FS_THRESHOLD_POSSIBLE)
        & (F.col("score") < FS_THRESHOLD_LINK)
    ).cast("int")
    true_link = (F.col("is_true_pair") & (F.col("score") >= FS_THRESHOLD_LINK)).cast(
        "int"
    )
    return (
        scored.groupBy("nationkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum(is_link).cast("long").alias("n_link"),
            F.sum(is_possible).cast("long").alias("n_possible"),
            F.sum(true_link).cast("long").alias("n_true_links"),
            F.sum(F.col("is_true_pair").cast("int"))
            .cast("long")
            .alias("n_true_pairs"),
        )
        .select(
            "nationkey",
            "n_pairs",
            "n_link",
            "n_possible",
            "n_true_links",
            "n_true_pairs",
            F.round(
                F.col("n_true_links") / F.col("n_true_pairs") - 1e-9, 4
            ).alias("recall"),
            F.round(
                F.col("n_true_links")
                / F.nullif(F.col("n_link"), F.lit(0))
                - 1e-9,
                4,
            ).alias("precision"),
        )
        .orderBy("nationkey")
    )


# --------------------------------------------------------------------------
# identity stitching (alias graph -> canonical user)
# --------------------------------------------------------------------------
@query(
    "identity_stitch_components",
    """
    WITH RECURSIVE sig AS (
      SELECT DISTINCT user_id,
             concat(CAST(json_extract_string(props, '$.k') AS BIGINT),
                    '|', CAST(CAST(ts AS DATE) AS VARCHAR),
                    '|', hour(ts)) AS skey
      FROM events WHERE event_type = 'signup'
    ),
    rare AS MATERIALIZED (
      SELECT skey,
             min(user_id) AS u1, max(user_id) AS u2
      FROM sig GROUP BY skey
      HAVING count(DISTINCT user_id) = 2
    ),
    edges AS MATERIALIZED (
      SELECT DISTINCT u1, u2 FROM rare
    ),
    verts AS MATERIALIZED (
      SELECT DISTINCT user_id AS v FROM events
    ),
    sym AS MATERIALIZED (
      SELECT u1 AS u, u2 AS v FROM edges
      UNION ALL SELECT u2, u1 FROM edges
    ),
    reach (v, lbl) AS (
      SELECT v, v FROM verts
      UNION
      SELECT s.v, r.lbl FROM reach r JOIN sym s ON s.u = r.v
    ),
    comp AS (
      SELECT v AS user_id, min(lbl) AS canonical FROM reach GROUP BY v
    ),
    stitched AS (
      SELECT c.canonical, e.user_id, e.value
      FROM events e JOIN comp c ON e.user_id = c.user_id
    )
    SELECT canonical,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_aliases,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS value_cents
    FROM stitched
    GROUP BY canonical
    HAVING count(DISTINCT user_id) >= 2
    ORDER BY canonical
    """,
)
def identity_stitch_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Identity stitching (the MDM / CDP "identity graph" primitive):
    two user ids are aliases when they are the ONLY two ids that emit a
    signup sharing the same (prop-k, day, hour) fingerprint — the
    shared-rare-signal rule real pipelines apply to device ids and
    hashed emails (keys touched by >2 users are hubs and must NOT
    merge, or the graph collapses).  Alias edges feed the engine's
    dataflow connected components; every event is then re-keyed to the
    component's canonical (minimum) user and per-identity rollups run
    over the stitched key.

    Scale shape: fingerprint extraction is one scan + groupBy on the
    fingerprint (rare-key filter HAVING count=2 keeps hub keys out and
    the edge list linear); CC is the same |E|-messages-per-round loop
    the dedup clusters use (`operators/graph.py:28`); the final rollup
    re-shuffles events once on the stitched key.  The oracle replays
    the merge as a recursive min-label CTE."""
    from ..operators.graph import connected_components

    ev = load_table(spark, sf_dir, "events")
    sig = (
        ev.filter(F.col("event_type") == "signup")
        .select(
            "user_id",
            F.concat(
                F.get_json_object("props", "$.k").cast("long").cast("string"),
                F.lit("|"),
                F.col("ts").cast("date").cast("string"),
                F.lit("|"),
                F.hour("ts").cast("string"),
            ).alias("skey"),
        )
        .distinct()
    )
    rare = (
        sig.groupBy("skey")
        .agg(
            F.min("user_id").alias("u1"),
            F.max("user_id").alias("u2"),
            F.count_distinct("user_id").alias("nu"),
        )
        .filter(F.col("nu") == 2)
    )
    edges = rare.select("u1", "u2").distinct()
    verts = ev.select(F.col("user_id").alias("v")).distinct()
    comp = connected_components(
        edges, src="u1", dst="u2", vertices=verts, vertex_col="v"
    )
    stitched = ev.select(
        "user_id",
        F.floor(F.col("value") * 100 + 0.5).cast("long").alias("cents"),
    ).join(
        # no broadcast hint: the id->canonical map is user-cardinality
        # (unbounded at 100 TB) — AQE broadcasts it while it's small and
        # shuffle-joins co-partitioned on user_id once it isn't
        comp.select(
            F.col("id").alias("user_id"), F.col("comp").alias("canonical")
        ),
        "user_id",
    )
    return (
        stitched.groupBy("canonical")
        .agg(
            F.count_distinct("user_id").cast("long").alias("n_aliases"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("cents").cast("long").alias("value_cents"),
        )
        .filter(F.col("n_aliases") >= 2)
        .orderBy("canonical")
    )


# --------------------------------------------------------------------------
# exact Shapley-value attribution
# --------------------------------------------------------------------------
@query(
    "shapley_attribution",
    f"""
    WITH per_user AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS cut
      FROM events GROUP BY user_id
    ),
    touched AS (
      SELECT e.user_id,
             CAST(max(CASE WHEN e.event_type = 'view'
                           AND (p.cut IS NULL OR e.ts < p.cut)
                      THEN 1 ELSE 0 END) * 4
                + max(CASE WHEN e.event_type = 'click'
                           AND (p.cut IS NULL OR e.ts < p.cut)
                      THEN 1 ELSE 0 END) * 2
                + max(CASE WHEN e.event_type = 'signup'
                           AND (p.cut IS NULL OR e.ts < p.cut)
                      THEN 1 ELSE 0 END) AS BIGINT) AS mask,
             max(CASE WHEN p.cut IS NOT NULL THEN 1 ELSE 0 END) AS conv
      FROM events e JOIN per_user p ON e.user_id = p.user_id
      GROUP BY e.user_id
    ),
    grid AS (
      SELECT CAST(g.range AS BIGINT) AS mask FROM range(8) g
    ),
    v AS MATERIALIZED (
      SELECT g.mask,
             coalesce(CAST(sum(t.conv) AS DOUBLE)
                      / nullif(count(t.user_id), 0), 0.0) AS v,
             CAST(count(t.user_id) AS BIGINT) AS n_users
      FROM grid g LEFT JOIN touched t ON t.mask = g.mask
      GROUP BY g.mask
    ),
    pv AS (
      SELECT max(CASE WHEN mask = 0 THEN v END) AS v0,
             max(CASE WHEN mask = 1 THEN v END) AS v1,
             max(CASE WHEN mask = 2 THEN v END) AS v2,
             max(CASE WHEN mask = 3 THEN v END) AS v3,
             max(CASE WHEN mask = 4 THEN v END) AS v4,
             max(CASE WHEN mask = 5 THEN v END) AS v5,
             max(CASE WHEN mask = 6 THEN v END) AS v6,
             max(CASE WHEN mask = 7 THEN v END) AS v7,
             CAST(sum(n_users) AS BIGINT) AS n_users
      FROM v
    ),
    phi AS (
      SELECT 'click' AS channel,
             {ONE_THIRD} * (v2 - v0) + {ONE_SIXTH} * (v6 - v4)
             + {ONE_SIXTH} * (v3 - v1) + {ONE_THIRD} * (v7 - v5) AS shapley,
             v0, v7, n_users FROM pv
      UNION ALL
      SELECT 'signup',
             {ONE_THIRD} * (v1 - v0) + {ONE_SIXTH} * (v5 - v4)
             + {ONE_SIXTH} * (v3 - v2) + {ONE_THIRD} * (v7 - v6),
             v0, v7, n_users FROM pv
      UNION ALL
      SELECT 'view',
             {ONE_THIRD} * (v4 - v0) + {ONE_SIXTH} * (v6 - v2)
             + {ONE_SIXTH} * (v5 - v1) + {ONE_THIRD} * (v7 - v3),
             v0, v7, n_users FROM pv
    )
    SELECT channel, round(shapley - 1e-9, 4) + 0.0 AS shapley_value,
           round(v0 - 1e-9, 4) + 0.0 AS v_none,
           round(v7 - 1e-9, 4) + 0.0 AS v_full,
           n_users
    FROM phi ORDER BY channel
    """,
)
def shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Shapley-value attribution over three marketing channels
    (view / click / signup touches before the first purchase) — the
    game-theoretic credit split (Shapley 1953; Zhao et al. 2018 for
    ad attribution) that, unlike last-touch or the Markov
    removal-effect (``markov_attribution``), uniquely satisfies
    efficiency + symmetry + dummy axioms.  The coalition value v(S) is
    the conversion rate of users whose pre-purchase touchset is
    exactly S; with 3 channels the 8-coalition lattice is enumerable,
    so the Shapley sum is computed EXACTLY — no sampling.

    Efficiency (Σφ = v(full) − v(none)) is pinned in
    ``tests/test_wave9.py``.  Scale shape: one scan to per-user masks
    (groupBy user), one 8-row grid aggregate; the φ formulas are
    literal-weighted sums over a single pivoted row — channel count
    is the only exponential term, and it's a constant 3."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "cut"
        )
    )
    pre = F.col("cut").isNull() | (F.col("ts") < F.col("cut"))

    def bit(t: str, w: int) -> F.Column:
        return F.max(
            F.when((F.col("event_type") == t) & pre, 1).otherwise(0)
        ) * w

    touched = (
        ev.join(per_user, "user_id")
        .groupBy("user_id")
        .agg(
            (bit("view", 4) + bit("click", 2) + bit("signup", 1))
            .cast("long")
            .alias("mask"),
            F.max(
                F.when(F.col("cut").isNotNull(), 1).otherwise(0)
            ).alias("conv"),
        )
    )
    grid = spark.range(8).select(F.col("id").cast("long").alias("mask"))
    v = (
        grid.join(touched, "mask", "left")
        .groupBy("mask")
        .agg(
            F.coalesce(
                F.sum("conv").cast("double")
                / F.nullif(F.count("user_id"), F.lit(0)),
                F.lit(0.0),
            ).alias("v"),
            F.count("user_id").cast("long").alias("n_users"),
        )
    )
    pv = v.agg(
        *[
            F.max(F.when(F.col("mask") == m, F.col("v"))).alias(f"v{m}")
            for m in range(8)
        ],
        F.sum("n_users").cast("long").alias("n_users"),
    )
    c = {m: F.col(f"v{m}") for m in range(8)}
    phi_click = (
        ONE_THIRD * (c[2] - c[0])
        + ONE_SIXTH * (c[6] - c[4])
        + ONE_SIXTH * (c[3] - c[1])
        + ONE_THIRD * (c[7] - c[5])
    )
    phi_signup = (
        ONE_THIRD * (c[1] - c[0])
        + ONE_SIXTH * (c[5] - c[4])
        + ONE_SIXTH * (c[3] - c[2])
        + ONE_THIRD * (c[7] - c[6])
    )
    phi_view = (
        ONE_THIRD * (c[4] - c[0])
        + ONE_SIXTH * (c[6] - c[2])
        + ONE_SIXTH * (c[5] - c[1])
        + ONE_THIRD * (c[7] - c[3])
    )
    rows = pv.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("click").alias("channel"),
                    phi_click.alias("shapley"),
                ),
                F.struct(
                    F.lit("signup").alias("channel"),
                    phi_signup.alias("shapley"),
                ),
                F.struct(
                    F.lit("view").alias("channel"),
                    phi_view.alias("shapley"),
                ),
            )
        ).alias("s"),
        F.col("v0"),
        F.col("v7"),
        F.col("n_users"),
    )
    return rows.select(
        F.col("s.channel").alias("channel"),
        (F.round(F.col("s.shapley") - 1e-9, 4) + 0.0).alias("shapley_value"),
        (F.round(F.col("v0") - 1e-9, 4) + 0.0).alias("v_none"),
        (F.round(F.col("v7") - 1e-9, 4) + 0.0).alias("v_full"),
        "n_users",
    ).orderBy("channel")
