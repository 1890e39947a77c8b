"""Robust statistics / evaluation-harness queries (seventh wave, part
2): Theil–Sen robust trend, cross-source quantile normalization, Qini
uplift curve, split-conformal prediction intervals, and a grid-bucketed
geospatial distance join.

These round out the offline-eval toolbox: a slope estimate outliers
can't drag (Theil–Sen), a distribution aligner for heterogeneous
sources (quantile normalization — the batch-effect fix from
bioinformatics, equally the multi-corpus length equalizer), the
uplift-modeling scorecard (Qini), distribution-free prediction
intervals with finite-sample coverage (split conformal), and the
nearest-facility join every logistics/geo feature needs, bucketed so it
never goes quadratic.

Scale shapes: every query reduces its fact table in one keyed pass
before any window or join; the all-pairs constructions (Theil–Sen
slopes, the geo oracle) run only over group-reduced frames (months,
grid cells) and each docstring states the bounded-cardinality argument
plus the swap-in at 100 TB (repeated-median windows, latitude-banded
cells).

Cross-engine determinism (registry.py conventions): money flows as
BIGINT cents, interpolated percentiles are Spark ``percentile`` ≡
DuckDB ``quantile_cont`` over identical exact inputs, threshold
comparisons happen on values both engines hold bit-identically, and
ntile orderings always carry a key tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources import load_table
from .registry import query

QN_TILES = 100  # quantile-normalization resolution
GEO_RADIUS_KM = 500.0
GEO_LAT_CELL = 5  # degrees; ±60 lat clamp keeps 10° lon ≥ 500 km
GEO_LON_CELL = 10


@query(
    "theil_sen_monthly_trend",
    """
    WITH m AS (
      SELECT (year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1 AS t,
             CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY 1
    ),
    slopes AS (
      SELECT (b.cents - a.cents) * 1.0 / (b.t - a.t) AS s
      FROM m a JOIN m b ON b.t > a.t
    ),
    sl AS (SELECT round(quantile_cont(s, 0.5), 6) AS slope FROM slopes),
    ic AS (
      SELECT quantile_cont(m.cents - (SELECT slope FROM sl) * m.t, 0.5)
             AS icept
      FROM m
    )
    SELECT CAST((SELECT count(*) FROM m) AS BIGINT) AS n_months,
           round((SELECT slope FROM sl) / 100.0, 4) AS slope_usd_per_month,
           round((SELECT icept FROM ic) / 100.0, 4) AS intercept_usd
    """,
)
def theil_sen_monthly_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend of monthly order revenue: the median of
    all pairwise slopes, with the median-residual intercept — the slope
    estimator with a 29% breakdown point, immune to the month outliers
    that drag OLS (compare ``ols_price_model``'s closed form).

    Scale shape: orders reduce to ONE ~80-row month frame (exact BIGINT
    cents) in a single keyed pass; the all-pairs slope set is C(80,2) ≈
    3.2k rows over the localCheckpointed series — the quadratic step
    runs on the reduced frame, never the fact table.  For multi-decade
    series the swap-in is the repeated-median over bounded time windows
    (same frame, windowed pair explode).

    Determinism: slopes divide exact BIGINT cents by exact month gaps
    (IEEE division → bit-identical); the median interpolates identical
    doubles on both engines; the slope is re-rounded to 6 decimals
    BEFORE residuals so the intercept median sees identical inputs."""
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    m = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            (
                (F.year("o_orderdate") - 1995) * 12 + F.month("o_orderdate") - 1
            ).alias("t")
        )
        .agg(F.sum(cents).cast("long").alias("cents"))
        .localCheckpoint()
    )
    a = m.alias("a")
    b = m.alias("b")
    slopes = a.join(b, F.col("b.t") > F.col("a.t")).select(
        (
            (F.col("b.cents") - F.col("a.cents")) * 1.0
            / (F.col("b.t") - F.col("a.t"))
        ).alias("s")
    )
    sl = slopes.agg(F.round(F.expr("percentile(s, 0.5)"), 6).alias("slope"))
    resid = m.crossJoin(F.broadcast(sl)).select(
        (F.col("cents") - F.col("slope") * F.col("t")).alias("r"), "slope"
    )
    # groupless agg (not groupBy("slope")): over an empty series a
    # groupBy emits 0 rows where the oracle's scalar subqueries still
    # emit the single NULL-fit row — a groupless agg always yields
    # exactly 1 row in both engines (round-12 degenerate sweep)
    ic = resid.agg(F.expr("percentile(r, 0.5)").alias("icept"))
    n = m.agg(F.count(F.lit(1)).cast("long").alias("n_months"))
    return n.crossJoin(F.broadcast(sl)).crossJoin(F.broadcast(ic)).select(
        "n_months",
        F.round(F.col("slope") / 100.0, 4).alias("slope_usd_per_month"),
        F.round(F.col("icept") / 100.0, 4).alias("intercept_usd"),
    )


@query(
    "quantile_normalize_sources",
    f"""
    WITH tiled AS (
      SELECT source, n_chars,
             ntile({QN_TILES}) OVER (
               PARTITION BY source ORDER BY n_chars, doc_id
             ) AS q
      FROM documents
    ),
    per AS (
      SELECT source, q,
             round(sum(n_chars) * 1.0 / count(*), 4) AS mean_chars
      FROM tiled GROUP BY source, q
    ),
    ref AS (
      SELECT q, round(avg(mean_chars) - 1e-9, 4) AS norm_ref
      FROM per GROUP BY q
    )
    SELECT p.source, p.q, p.mean_chars, r.norm_ref,
           round(r.norm_ref - p.mean_chars, 4) AS shift
    FROM per p JOIN ref r ON r.q = p.q
    WHERE p.q % 10 = 0
    ORDER BY p.source, p.q
    """,
)
def quantile_normalize_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization of document length across sources: rank
    each doc into {QN_TILES} within-source tiles, define the reference
    distribution as the cross-source mean of per-tile means, and report
    the per-source shift each tile needs — the batch-effect aligner
    (Bolstad et al.) applied to corpus length equalization before
    mixing heterogeneous sources into one training set.

    Scale shape: one ntile window partitioned BY SOURCE (parallel
    across sources; at 100 TB the exact ntile swaps for
    approx-percentile bin edges, same downstream shape), then all
    aggregation runs over the |sources|×{QN_TILES} reduced frame.

    Determinism: tile cuts order by (n_chars, doc_id) — fully keyed;
    per-tile means divide exact integer sums; the cross-source mean of
    ROUNDED means gets the −1e-9 half-boundary guard before its own
    rounding."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    tiled = docs.select(
        "source", "n_chars", F.ntile(QN_TILES).over(w).alias("q")
    )
    per = tiled.groupBy("source", "q").agg(
        F.round(F.sum("n_chars") * 1.0 / F.count(F.lit(1)), 4).alias(
            "mean_chars"
        )
    )
    ref = per.groupBy("q").agg(
        F.round(F.avg("mean_chars") - 1e-9, 4).alias("norm_ref")
    )
    return (
        per.join(F.broadcast(ref), "q")
        .filter(F.col("q") % 10 == 0)
        .select(
            "source",
            "q",
            "mean_chars",
            "norm_ref",
            F.round(F.col("norm_ref") - F.col("mean_chars"), 4).alias("shift"),
        )
        .orderBy("source", "q")
    )


@query(
    "qini_uplift_deciles",
    """
    WITH cust AS (
      SELECT c.c_custkey,
             c.c_custkey % 2 AS treat,
             round(c.c_acctbal, 2) AS score,
             CASE WHEN o.o_custkey IS NULL THEN 0 ELSE 1 END AS conv
      FROM customer c
      LEFT JOIN (SELECT DISTINCT o_custkey FROM orders) o
        ON o.o_custkey = c.c_custkey
    ),
    scored AS (
      SELECT *, ntile(10) OVER (ORDER BY score DESC, c_custkey) AS decile
      FROM cust
    ),
    per AS (
      SELECT decile,
             sum(treat) AS n_t, sum(1 - treat) AS n_c,
             sum(treat * conv) AS y_t, sum((1 - treat) * conv) AS y_c
      FROM scored GROUP BY decile
    ),
    cum AS (
      SELECT decile,
             CAST(sum(n_t) OVER w AS BIGINT) AS cn_t,
             CAST(sum(n_c) OVER w AS BIGINT) AS cn_c,
             CAST(sum(y_t) OVER w AS BIGINT) AS cy_t,
             CAST(sum(y_c) OVER w AS BIGINT) AS cy_c
      FROM per
      WINDOW w AS (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW)
    )
    SELECT decile, cn_t, cn_c, cy_t, cy_c,
           round(cy_t - cy_c * 1.0 * cn_t / cn_c, 4) AS qini,
           round(cy_t * 1.0 / cn_t - cy_c * 1.0 / cn_c, 4) AS uplift_rate
    FROM cum ORDER BY decile
    """,
)
def qini_uplift_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qini uplift curve by score decile: cumulative incremental
    conversions ``Q(k) = Yt(k) − Yc(k)·Nt(k)/Nc(k)`` plus the per-point
    rate uplift — THE evaluation curve for uplift/targeting models
    (Radcliffe), here over a deterministic key-parity pseudo-assignment
    (an A/A-shaped harness: real experiments swap in their assignment
    column, and a flat curve here is itself the sanity check).

    Scale shape: one distinct-buyers semi-side reduced from orders
    joins the customer dimension; the ntile runs over customers (a
    dimension, |C| ≪ |O|) and everything after is a 10-row window.

    Determinism: every count is an exact BIGINT; the decile cut orders
    by cents-rounded balance with the customer key as tiebreak."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        (F.col("c_custkey") % 2).alias("treat"),
        F.round("c_acctbal", 2).alias("score"),
    )
    buyers = (
        load_table(spark, sf_dir, "orders").select("o_custkey").distinct()
    )
    base = cust.join(
        buyers, cust.c_custkey == buyers.o_custkey, "left"
    ).select(
        "c_custkey",
        "treat",
        "score",
        F.when(F.col("o_custkey").isNull(), 0).otherwise(1).alias("conv"),
    )
    scored = base.withColumn(
        "decile",
        F.ntile(10).over(Window.orderBy(F.col("score").desc(), "c_custkey")),
    )
    per = scored.groupBy("decile").agg(
        F.sum("treat").alias("n_t"),
        F.sum(1 - F.col("treat")).alias("n_c"),
        F.sum(F.col("treat") * F.col("conv")).alias("y_t"),
        F.sum((1 - F.col("treat")) * F.col("conv")).alias("y_c"),
    )
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    cum = per.select(
        "decile",
        F.sum("n_t").over(w).cast("long").alias("cn_t"),
        F.sum("n_c").over(w).cast("long").alias("cn_c"),
        F.sum("y_t").over(w).cast("long").alias("cy_t"),
        F.sum("y_c").over(w).cast("long").alias("cy_c"),
    )
    return cum.select(
        "decile",
        "cn_t",
        "cn_c",
        "cy_t",
        "cy_c",
        F.round(
            F.col("cy_t") - F.col("cy_c") * 1.0 * F.col("cn_t") / F.col("cn_c"),
            4,
        ).alias("qini"),
        F.round(
            F.col("cy_t") * 1.0 / F.col("cn_t")
            - F.col("cy_c") * 1.0 / F.col("cn_c"),
            4,
        ).alias("uplift_rate"),
    ).orderBy("decile")


@query(
    "conformal_interval_eval",
    """
    WITH o AS (
      SELECT c.c_mktsegment AS seg,
             o_orderkey % 2 AS part,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders JOIN customer c ON c.c_custkey = o_custkey
    ),
    model AS (
      SELECT seg,
             CAST(count(*) AS BIGINT) AS n_cal,
             CAST(floor(sum(cents) * 1.0 / count(*) + 0.5) AS BIGINT)
               AS pred_cents
      FROM o WHERE part = 0 GROUP BY seg
    ),
    qhat AS (
      SELECT o.seg,
             quantile_cont(abs(o.cents - m.pred_cents), 0.9) AS q_cents
      FROM o JOIN model m ON m.seg = o.seg
      WHERE o.part = 0 GROUP BY o.seg
    ),
    test AS (
      SELECT o.seg,
             CAST(count(*) AS BIGINT) AS n_test,
             CAST(sum(CASE WHEN abs(o.cents - m.pred_cents) <= q.q_cents
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_covered
      FROM o
      JOIN model m ON m.seg = o.seg
      JOIN qhat q ON q.seg = o.seg
      WHERE o.part = 1 GROUP BY o.seg
    )
    SELECT m.seg AS segment, m.n_cal, t.n_test,
           round(m.pred_cents / 100.0, 2) AS pred_usd,
           round(q.q_cents / 100.0, 2) AS qhat_usd,
           round(t.n_covered * 1.0 / t.n_test, 4) AS coverage
    FROM model m JOIN qhat q ON q.seg = m.seg JOIN test t ON t.seg = m.seg
    ORDER BY segment
    """,
)
def conformal_interval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction intervals: fit a trivial per-segment
    mean predictor on the calibration half (even order keys), take the
    90th percentile of absolute calibration residuals as ``q̂``, and
    measure empirical coverage of ``pred ± q̂`` on the test half — the
    distribution-free interval recipe (Vovk; Lei et al.) whose coverage
    guarantee needs only exchangeability, as a pure two-pass DataFrame
    plan.

    Scale shape: the fact table joins the customer dimension once and
    reduces per (segment, half); the model and q̂ frames are
    |segments|-row broadcasts back onto the aggregation — no per-row
    state, second "pass" is a dimension join, not a rescan.

    Determinism: money is exact BIGINT cents; the predictor is
    floor-rounded to an exact integer before residuals, so residuals
    are exact ints, the interpolated percentile sees identical inputs,
    and the coverage comparison compares bit-identical values."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("ck"), F.col("c_mktsegment").alias("seg")
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("ck"))
        .select(
            "seg",
            (F.col("o_orderkey") % 2).alias("part"),
            F.floor(F.col("o_totalprice") * 100 + 0.5)
            .cast("long")
            .alias("cents"),
        )
        .persist()
    )
    cal = o.filter(F.col("part") == 0)
    model = cal.groupBy("seg").agg(
        F.count(F.lit(1)).cast("long").alias("n_cal"),
        F.floor(F.sum("cents") * 1.0 / F.count(F.lit(1)) + 0.5)
        .cast("long")
        .alias("pred_cents"),
    )
    qhat = (
        cal.join(F.broadcast(model), "seg")
        .groupBy("seg")
        .agg(
            F.expr("percentile(abs(cents - pred_cents), 0.9)").alias("q_cents")
        )
    )
    test = (
        o.filter(F.col("part") == 1)
        .join(F.broadcast(model), "seg")
        .join(F.broadcast(qhat), "seg")
        .groupBy("seg")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.sum(
                F.when(
                    F.abs(F.col("cents") - F.col("pred_cents"))
                    <= F.col("q_cents"),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_covered"),
        )
    )
    return (
        model.join(qhat, "seg")
        .join(test, "seg")
        .select(
            F.col("seg").alias("segment"),
            "n_cal",
            "n_test",
            F.round(F.col("pred_cents") / 100.0, 2).alias("pred_usd"),
            F.round(F.col("q_cents") / 100.0, 2).alias("qhat_usd"),
            F.round(F.col("n_covered") * 1.0 / F.col("n_test"), 4).alias(
                "coverage"
            ),
        )
        .orderBy("segment")
    )


_GEO_C_LAT = "((c_custkey * 37) % 1200) / 10.0 - 60.0"
_GEO_C_LON = "((c_custkey * 73) % 3600) / 10.0 - 180.0"
_GEO_S_LAT = "((s_suppkey * 41) % 1200) / 10.0 - 60.0"
_GEO_S_LON = "((s_suppkey * 79) % 3600) / 10.0 - 180.0"


def _haversine_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    return (
        f"2 * 6371.0 * asin(sqrt("
        f"sin(radians(({lat2}) - ({lat1})) / 2)"
        f" * sin(radians(({lat2}) - ({lat1})) / 2)"
        f" + cos(radians({lat1})) * cos(radians({lat2}))"
        f" * sin(radians(({lon2}) - ({lon1})) / 2)"
        f" * sin(radians(({lon2}) - ({lon1})) / 2)))"
    )


@query(
    "geo_grid_neighbor_join",
    f"""
    WITH c AS (
      SELECT c_custkey, {_GEO_C_LAT} AS lat, {_GEO_C_LON} AS lon
      FROM customer
    ),
    s AS (
      SELECT s_suppkey, {_GEO_S_LAT} AS lat, {_GEO_S_LON} AS lon
      FROM supplier
    ),
    pairs AS (
      SELECT c.c_custkey, s.s_suppkey,
             round({_haversine_sql("c.lat", "c.lon", "s.lat", "s.lon")}
                   - 1e-9, 3) + 0.0 AS dist_km
      FROM c, s
    )
    SELECT c_custkey, s_suppkey, dist_km
    FROM pairs WHERE dist_km <= {GEO_RADIUS_KM}
    ORDER BY dist_km, c_custkey, s_suppkey
    """,
)
def geo_grid_neighbor_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geospatial radius join: every (customer, supplier) pair within
    {GEO_RADIUS_KM} km by exact haversine distance, found via a
    lat/lon GRID-CELL equi-join (coordinates are synthesized
    deterministically from the keys — the container ships no geo data —
    clamped to ±60° latitude).

    Scale shape — the point of the query: the naive form is a full
    cross join (the ORACLE runs exactly that, so driver parity PROVES
    the grid prune lossless).  The Spark plan instead buckets both
    sides into {GEO_LAT_CELL}°×{GEO_LON_CELL}° cells and equi-joins the
    customer cell against the 9 neighbor cells of each supplier
    (longitude wraps mod 360°): candidates drop from |C|·|S| to cell
    occupancy products.  Cell size is chosen so no ≤{GEO_RADIUS_KM} km
    pair can escape the 3×3 neighborhood at |lat| ≤ 60° (10° lon ≥
    500 km there); at production scale the cells become
    latitude-banded widths to lift the clamp, and the supplier
    broadcast becomes a cell-keyed shuffle join with the same plan.

    Determinism: trig inputs derive from exact integer arithmetic
    identically on both engines; the rounded distance (−1e-9 guard)
    is what both the threshold and the ordering compare."""
    cdf = load_table(spark, sf_dir, "customer").selectExpr(
        "c_custkey", f"{_GEO_C_LAT} AS lat", f"{_GEO_C_LON} AS lon"
    )
    sdf = load_table(spark, sf_dir, "supplier").selectExpr(
        "s_suppkey", f"{_GEO_S_LAT} AS lat", f"{_GEO_S_LON} AS lon"
    )
    n_lon_cells = 360 // GEO_LON_CELL
    ccell = cdf.select(
        "c_custkey",
        "lat",
        "lon",
        F.floor((F.col("lat") + 90) / GEO_LAT_CELL).alias("la"),
        F.floor((F.col("lon") + 180) / GEO_LON_CELL).alias("lo"),
    )
    offsets = F.expr(
        "explode(transform(sequence(0, 8), i -> "
        "struct(i div 3 - 1 AS dla, i % 3 - 1 AS dlo)))"
    )
    scell = (
        sdf.select("s_suppkey", "lat", "lon",
                   F.floor((F.col("lat") + 90) / GEO_LAT_CELL).alias("sla"),
                   F.floor((F.col("lon") + 180) / GEO_LON_CELL).alias("slo"))
        .select("*", offsets.alias("o"))
        .select(
            F.col("s_suppkey"),
            F.col("lat").alias("s_lat"),
            F.col("lon").alias("s_lon"),
            (F.col("sla") + F.col("o.dla")).alias("la"),
            F.pmod(F.col("slo") + F.col("o.dlo"), F.lit(n_lon_cells)).alias(
                "lo"
            ),
        )
    )
    dist = F.round(
        2
        * 6371.0
        * F.asin(
            F.sqrt(
                F.pow(F.sin(F.radians(F.col("s_lat") - F.col("lat")) / 2), 2)
                + F.cos(F.radians("lat"))
                * F.cos(F.radians("s_lat"))
                * F.pow(
                    F.sin(F.radians(F.col("s_lon") - F.col("lon")) / 2), 2
                )
            )
        )
        - 1e-9,
        3,
    )
    return (
        ccell.join(F.broadcast(scell), ["la", "lo"])
        .select("c_custkey", "s_suppkey", (dist + 0.0).alias("dist_km"))
        .filter(F.col("dist_km") <= GEO_RADIUS_KM)
        .orderBy("dist_km", "c_custkey", "s_suppkey")
    )


# --------------------------------------------------------------------------
# geofence point-in-polygon classification
# --------------------------------------------------------------------------
# literal fences over the 2-D embedding plane: a convex hexagon "zone"
# and a triangular "restricted" pocket inside it
GEOFENCE_HEX = (
    (0.25, 0.0), (0.125, 0.2165), (-0.125, 0.2165),
    (-0.25, 0.0), (-0.125, -0.2165), (0.125, -0.2165),
)
GEOFENCE_TRI = ((0.0, 0.02), (0.1, 0.15), (-0.1, 0.15))


def _pip_sql(px: str, py: str, poly) -> str:
    """Ray-casting parity as a sum of literal edge-crossing terms —
    identical expression text on both engines."""
    terms = []
    n = len(poly)
    for i in range(n):
        x1, y1 = poly[i]
        x2, y2 = poly[(i + 1) % n]
        terms.append(
            f"(CASE WHEN ({y1} > {py}) <> ({y2} > {py})"
            f" AND {px} < {x1} + ({py} - {y1}) * ({x2} - {x1})"
            f" / ({y2} - {y1}) THEN 1 ELSE 0 END)"
        )
    return "((" + " + ".join(terms) + ") % 2 = 1)"


_GEOFENCE_SQL = f"""
WITH pts AS (
  SELECT vec_id,
         embedding[{{ix}}] AS px, embedding[{{iy}}] AS py
  FROM {{embeddings}}
),
zoned AS (
  SELECT vec_id, px, py,
         CASE WHEN {_pip_sql("px", "py", GEOFENCE_TRI)} THEN 'restricted'
              WHEN {_pip_sql("px", "py", GEOFENCE_HEX)} THEN 'zone'
              ELSE 'outside' END AS fence
  FROM pts
)
SELECT fence,
       CAST(count(*) AS BIGINT) AS n_points,
       round(CAST(sum(CAST(floor(px * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)
             / count(*) / 1000000.0 - 1e-9, 4) AS centroid_x,
       round(CAST(sum(CAST(floor(py * 1000000 + 0.5) AS BIGINT)) AS DOUBLE)
             / count(*) / 1000000.0 - 1e-9, 4) AS centroid_y,
       round(max(px * px + py * py) - 1e-9, 4) AS max_r2
FROM zoned GROUP BY fence ORDER BY fence
"""


@query(
    "geofence_point_in_polygon",
    _GEOFENCE_SQL.format(embeddings="embeddings", ix=1, iy=2),
)
def geofence_point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geofencing / point-in-polygon classification (the location-zone
    primitive behind delivery zones, air-quality districts, and
    restricted-area alerts): each 2-D point is tested against a convex
    hexagonal zone with a triangular restricted pocket by RAY-CASTING
    parity — the polygon's edges unroll into literal crossing terms, so
    membership is a branch-free scalar expression, no UDF and no
    geometry library.

    Both engines evaluate the IDENTICAL edge-term text on identical
    doubles, so every membership call agrees bit-for-bit.  Scale shape:
    pure per-row expression + one aggregate — the classic pre-filter
    before exact geo joins; for polygon SETS you'd grid-index first
    (`grid_geo_join`) and run this test only inside candidate cells."""
    emb = load_table(spark, sf_dir, "embeddings")
    emb.createOrReplaceTempView("geofence_embeddings")
    # Spark SQL array subscripts are 0-based; DuckDB's are 1-based —
    # the shared text takes the index as a parameter
    return spark.sql(
        _GEOFENCE_SQL.format(
            embeddings="geofence_embeddings", ix=0, iy=1
        )
    )


# --------------------------------------------------------------------------
# RANSAC line fit on the daily revenue trend (md5-seeded consensus)
# --------------------------------------------------------------------------
RANSAC_CANDS = 64

_RANSAC_SQL = f"""
WITH days AS {{MAT}}(
  SELECT {{DD}} AS t,
         CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS y
  FROM {{orders}} GROUP BY 1
),
cand AS ({{SPINE}}),
draw AS {{MAT}}(
  -- candidate s samples 2 days: the 2 smallest md5('ransac|s|t') keys
  SELECT c.s, d.t, d.y,
         row_number() OVER (
           PARTITION BY c.s
           ORDER BY md5(concat('ransac|', c.s, '|', d.t)), d.t
         ) AS rn
  FROM days d CROSS JOIN cand c
),
lines AS {{MAT}}(
  SELECT s,
         (CAST(y2 - y1 AS DOUBLE)) / (t2 - t1) AS b,
         y1 - (CAST(y2 - y1 AS DOUBLE)) / (t2 - t1) * t1 AS a
  FROM (
    SELECT s,
           max(CASE WHEN rn = 1 THEN t END) AS t1,
           max(CASE WHEN rn = 1 THEN y END) AS y1,
           max(CASE WHEN rn = 2 THEN t END) AS t2,
           max(CASE WHEN rn = 2 THEN y END) AS y2
    FROM draw WHERE rn <= 2 GROUP BY s
  ) WHERE t2 <> t1
),
thr AS (
  SELECT CAST(floor(0.1 * avg(CAST(y AS DOUBLE)) + 0.5) AS BIGINT) AS h
  FROM days
),
votes AS {{MAT}}(
  SELECT l.s, CAST(count(*) AS BIGINT) AS inliers
  FROM days d CROSS JOIN lines l CROSS JOIN thr
  WHERE abs(d.y - (l.a + l.b * d.t)) <= thr.h
  GROUP BY l.s
),
best AS {{MAT}}(
  SELECT s, inliers FROM votes ORDER BY inliers DESC, s LIMIT 1
),
refit AS {{MAT}}(
  -- exact-integer OLS over the winning consensus set
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(d.t) AS BIGINT) AS st,
         CAST(sum(d.y) AS BIGINT) AS sy,
         CAST(sum(d.t * d.t) AS BIGINT) AS stt,
         CAST(sum(d.t * d.y) AS BIGINT) AS sty
  FROM days d CROSS JOIN (SELECT l.* FROM lines l JOIN best b ON b.s = l.s) l
  CROSS JOIN thr
  WHERE abs(d.y - (l.a + l.b * d.t)) <= thr.h
),
naive AS {{MAT}}(
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(t) AS BIGINT) AS st,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(t * t) AS BIGINT) AS stt,
         CAST(sum(t * y) AS BIGINT) AS sty
  FROM days
)
SELECT naive.n AS n_days,
       CAST({RANSAC_CANDS} AS BIGINT) AS n_candidates,
       best.inliers AS best_inliers,
       round(CAST(best.inliers AS DOUBLE) / naive.n - 1e-9, 4) + 0.0
         AS inlier_share,
       round((CAST(refit.n AS DOUBLE) * refit.sty
              - CAST(refit.st AS DOUBLE) * refit.sy)
             / (CAST(refit.n AS DOUBLE) * refit.stt
                - CAST(refit.st AS DOUBLE) * refit.st) - 1e-9, 4) + 0.0
         AS slope_ransac,
       round((CAST(naive.n AS DOUBLE) * naive.sty
              - CAST(naive.st AS DOUBLE) * naive.sy)
             / (CAST(naive.n AS DOUBLE) * naive.stt
                - CAST(naive.st AS DOUBLE) * naive.st) - 1e-9, 4) + 0.0
         AS slope_ols
FROM naive CROSS JOIN best CROSS JOIN refit
"""


def _ransac_sql(orders: str, dd: str, spine: str, mat: str) -> str:
    return (
        _RANSAC_SQL.replace("{orders}", orders)
        .replace("{DD}", dd)
        .replace("{SPINE}", spine)
        .replace("{MAT}", mat)
    )


@query(
    "ransac_trend_fit",
    _ransac_sql(
        "orders",
        "date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))",
        f"SELECT unnest(range(1, {RANSAC_CANDS + 1})) AS s",
        "MATERIALIZED ",
    ),
)
def ransac_trend_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANSAC consensus line through the daily-revenue series: 64
    md5-seeded 2-point candidate lines, each voted on by every day
    within a 10%-of-mean residual band; the winner is refit by exact
    OLS on its consensus set, reported against the all-points OLS
    slope.  RANSAC is the robust fit that survives gross outliers
    Theil-Sen and Huber both dilute — the planted test
    (tests/test_wave13.py) drops 20% wild contamination on a known
    slope and RANSAC must still recover it while plain OLS visibly
    bends.

    Determinism: the "random" 2-point draws are the 2 smallest
    md5('ransac|s|t') strings per candidate — reproducible in any
    engine (the ``permutation_test_segments`` seeding pattern);
    candidate slopes are fixed IEEE trees over integer dollars, the
    inlier predicate compares against an integer threshold, and the
    refit/naive OLS moments are exact BIGINTs.  Winner ties break on
    candidate id.

    Scale shape: one fact rollup to O(days); the vote stage is
    |days| × 64 — bounded by calendar × candidates, independent of
    corpus rows."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "ransac_orders"
    )
    # the O(days) rollup is referenced by 5 downstream CTEs: checkpoint
    # it so the fact table is scanned ONCE, not once per reference
    spark.sql(
        "SELECT datediff(CAST(o_orderdate AS DATE), DATE '1992-01-01')"
        " AS t, CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT)"
        " AS y FROM ransac_orders GROUP BY 1"
    ).localCheckpoint().createOrReplaceTempView("ransac_days_mat")
    sql = _ransac_sql(
        "unused",
        "unused",
        f"SELECT explode(sequence(1, {RANSAC_CANDS})) AS s",
        "",
    )
    head = sql.index("cand AS")
    return spark.sql(
        "WITH " + sql[head:].replace("FROM days", "FROM ransac_days_mat")
    )


def ransac_frame(days: DataFrame) -> DataFrame:
    """RANSAC over any (t, y) integer frame — factored out so tests can
    plant contamination; see :func:`ransac_trend_fit`."""
    days.createOrReplaceTempView("ransac_days_frame")
    sql = _ransac_sql(
        "unused",
        "unused",
        f"SELECT explode(sequence(1, {RANSAC_CANDS})) AS s",
        "",
    )
    head = sql.index("cand AS")
    return days.sparkSession.sql(
        "WITH "
        + sql[head:].replace("FROM days", "FROM ransac_days_frame")
    )


# --------------------------------------------------------------------------
# Hill estimator: tail index of the order-value distribution
# --------------------------------------------------------------------------
HILL_KS = (50, 100, 200)

_HILL_SQL = f"""
WITH v AS {{MAT}}(
  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM {{orders}}
),
ranked AS {{MAT}}(
  SELECT cents,
         row_number() OVER (ORDER BY cents DESC) AS rk
  FROM v
),
ks AS (
  SELECT CAST(50 AS BIGINT) AS k UNION ALL SELECT 100
  UNION ALL SELECT 200
),
thresh AS {{MAT}}(
  SELECT k.k, r.cents AS xk
  FROM ks k JOIN ranked r ON r.rk = k.k + 1
),
hill AS {{MAT}}(
  -- 1e-6-quantized log exceedance ratios -> exact integer sums
  SELECT t.k,
         CAST(sum(CAST(floor(ln(CAST(r.cents AS DOUBLE) / t.xk)
                             * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
           AS slog,
         t.xk
  FROM thresh t JOIN ranked r ON r.rk <= t.k
  GROUP BY t.k, t.xk
)
SELECT k AS top_k,
       round(xk / 100.0 - 1e-9, 2) + 0.0 AS threshold_usd,
       round(CAST(slog AS DOUBLE) / k / 1000000.0 - 1e-9, 6) + 0.0
         AS hill_gamma,
       round(CAST(k AS DOUBLE) * 1000000.0 / slog - 1e-9, 4) + 0.0
         AS tail_alpha
FROM hill ORDER BY k
"""


@query(
    "hill_tail_index",
    _HILL_SQL.replace("{orders}", "orders").replace(
        "{MAT}", "MATERIALIZED "
    ),
)
def hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator of the order-value tail index at k = 50/100/200
    upper order statistics: γ̂ = (1/k)Σ ln(x_(i)/x_(k+1)), α̂ = 1/γ̂ —
    the standard heavy-tail diagnostic (α < 2 ⇒ infinite variance:
    means and CLT-based intervals on revenue are then untrustworthy).
    Reading γ across several k is the poor-man's Hill plot; TPC-H
    order values are bounded (light-tailed), so α comes out large —
    the planted Pareto test (tests/test_wave16.py via
    :func:`hill_frame`) pins exact recovery of a known α instead.

    Determinism: thresholds are exact positional order statistics on
    integer cents (descending rank with ties broken by value
    equality); each log exceedance quantizes to an exact 1e-6 integer
    before the sum.  Scale shape: one global top-(k+1) sort (the
    percentile pattern) and an O(k) aggregate."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "hill_orders"
    )
    return spark.sql(
        _HILL_SQL.replace("{orders}", "hill_orders").replace("{MAT}", "")
    )


def hill_frame(v: DataFrame) -> DataFrame:
    """Hill fit over any single-column (cents) integer frame; see
    :func:`hill_tail_index`."""
    v.createOrReplaceTempView("hill_v_frame")
    sql = _HILL_SQL.replace("{MAT}", "")
    head = sql.index("ranked AS")
    return v.sparkSession.sql(
        "WITH v AS (SELECT CAST(cents AS BIGINT) AS cents"
        " FROM hill_v_frame),\n" + sql[head:]
    )


# --------------------------------------------------------------------------
# Gumbel block-maxima fit: T-year return levels of daily revenue
# --------------------------------------------------------------------------
_GUMBEL_SQL = """
WITH days AS {MAT}(
  SELECT year(CAST(o_orderdate AS DATE)) AS yr, {DD} AS t,
         CAST(sum(CAST(floor(o_totalprice / 100) AS BIGINT)) AS BIGINT)
           AS y
  FROM {orders} GROUP BY 1, 2
),
maxima AS {MAT}(
  SELECT yr, CAST(max(y) AS BIGINT) AS m FROM days GROUP BY yr
),
mm AS {MAT}(
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(m) AS BIGINT) AS s1,
         CAST(sum(m * m) AS BIGINT) AS s2
  FROM maxima
),
fit AS {MAT}(
  -- Gumbel method of moments: beta = s*sqrt(6)/pi, mu = mean - gamma*beta
  SELECT n,
         CAST(s1 AS DOUBLE) / n AS mean_m,
         sqrt((s2 - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1))
           * 0.7796968012336793 AS beta
  FROM mm
),
gum AS {MAT}(
  SELECT n, mean_m, beta,
         mean_m - 0.5772156649015329 * beta AS mu
  FROM fit
),
grid AS (
  SELECT CAST(5 AS BIGINT) AS t_years UNION ALL SELECT 10
  UNION ALL SELECT 50
)
SELECT g.t_years,
       gum.n AS n_blocks,
       round(gum.mu * 100.0 - 1e-9, 2) + 0.0 AS gumbel_mu_usd,
       round(gum.beta * 100.0 - 1e-9, 2) + 0.0 AS gumbel_beta_usd,
       round((gum.mu - gum.beta
              * ln(-ln(1.0 - 1.0 / g.t_years))) * 100.0 - 1e-9, 2)
         + 0.0 AS return_level_usd
FROM grid g CROSS JOIN gum
ORDER BY g.t_years
"""


@query(
    "gumbel_return_levels",
    _GUMBEL_SQL.replace("{orders}", "orders")
    .replace(
        "{DD}",
        "date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))",
    )
    .replace("{MAT}", "MATERIALIZED "),
)
def gumbel_return_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extreme-value return levels: fit a Gumbel to the ANNUAL maxima
    of daily revenue (method of moments — β = s·√6/π with the literal
    constant, μ = m̄ − γ_E·β) and invert the CDF for the 5/10/50-year
    return levels — "the biggest day we should provision for once in T
    years", the capacity-planning twin of VaR (which reads the
    5%-quantile tail; this reads the once-in-T-blocks extreme).

    Determinism: block maxima are exact BIGINT (hundred-dollar units);
    mean/std are fixed IEEE trees over the two exact moments; √6/π and
    the Euler-Mascheroni constant are compile-time literals so no
    engine evaluates a transcendental beyond the single ln(−ln(1−1/T))
    per grid row, absorbed by the 2-dp rounding.  tests/test_wave16.py
    pins monotonicity in T, return level ≥ fitted μ, and exact
    recovery on a planted Gumbel grid sample.

    Scale shape: one fact rollup to O(days), an O(years) maxima frame,
    O(1) fit."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "gum_orders"
    )
    return spark.sql(
        _GUMBEL_SQL.replace("{orders}", "gum_orders")
        .replace(
            "{DD}",
            "datediff(CAST(o_orderdate AS DATE), DATE '1992-01-01')",
        )
        .replace("{MAT}", "")
    )


def gumbel_frame(maxima: DataFrame) -> DataFrame:
    """Gumbel fit over any single-column (m) integer maxima frame; see
    :func:`gumbel_return_levels`."""
    maxima.createOrReplaceTempView("gum_m_frame")
    sql = _GUMBEL_SQL.replace("{MAT}", "")
    head = sql.index("mm AS ")
    return maxima.sparkSession.sql(
        "WITH maxima AS (SELECT CAST(m AS BIGINT) AS m"
        " FROM gum_m_frame),\n" + sql[head:]
    )


# --------------------------------------------------------------------------
# quantile regression via exact-integer pinball-loss grid fit
# --------------------------------------------------------------------------
QR_TAUS10 = (5, 9)  # tau * 10: median and the 90th-percentile line
QR_INTERCEPTS = tuple(range(10_000_000, 48_000_001, 2_500_000))  # cents
QR_SLOPES = (-2000, -1000, -500, -200, 0, 200, 500, 1000, 2000)  # cents/day
QR_EPOCH = "1995-01-01"


def _qr_grid_values() -> str:
    rows = [
        f"({t10}, {a}, {b})"
        for t10 in QR_TAUS10
        for a in QR_INTERCEPTS
        for b in QR_SLOPES
    ]
    return ", ".join(rows)


@query(
    "quantile_regression_grid",
    f"""
    WITH pts AS (
      SELECT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS yc,
             date_diff('day', DATE '{QR_EPOCH}',
                       CAST(o_orderdate AS DATE)) AS x
      FROM orders
    ),
    grid(t10, a, b) AS (VALUES {_qr_grid_values()}),
    losses AS (
      SELECT g.t10, g.a, g.b,
             CAST(sum(CASE WHEN p.yc - (g.a + g.b * p.x) >= 0
                           THEN g.t10 * (p.yc - (g.a + g.b * p.x))
                           ELSE (10 - g.t10)
                                * ((g.a + g.b * p.x) - p.yc)
                      END) AS BIGINT) AS loss10
      FROM pts p CROSS JOIN grid g
      GROUP BY 1, 2, 3
    )
    SELECT round(t10 / 10.0, 1) AS tau,
           round(a / 100.0, 2) AS intercept_usd,
           CAST(b AS BIGINT) AS slope_cents_per_day,
           loss10 AS pinball_loss10_cents
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY t10 ORDER BY loss10, a, b) AS r
      FROM losses
    ) WHERE r = 1
    """,
)
def quantile_regression_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile regression (median and 90th-percentile lines of order
    value over time) fit by exact-integer pinball loss over a literal
    candidate grid — the grid-argmin idiom of ``adstock_grid_fit``
    extended to Koenker's check loss.  Completes the robust-fit family
    (Huber IRLS / RANSAC / Theil-Sen estimate the CENTER; quantile
    lines bound the tails, the spread diagnostic a revenue pipeline
    actually wants).

    Determinism: prices quantize to exact cents, days are integers, so
    every candidate's loss is one BIGINT sum — argmin tie-breaks
    (loss, intercept, slope).  One scan, one aggregate over rows ×
    |grid|; the grid is a broadcast literal table, so the fit runs at
    any corpus size without a second pass (unlike IRLS, which iterates)."""
    pts = load_table(spark, sf_dir, "orders").select(
        F.floor(F.col("o_totalprice") * 100.0 + 0.5)
        .cast("long")
        .alias("yc"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit(QR_EPOCH).cast("date")
        ).alias("x"),
    )
    # the grid rides as a literal array<struct> inlined per row — all
    # whole-stage codegen with map-side partial aggregation into |grid|
    # groups (measured fastest vs BroadcastNestedLoop crossJoin and a
    # dummy-key BroadcastHashJoin; the floor is the rows × |grid| exact
    # integer work itself, which is the point of an exact grid fit).
    # The 252 literal structs are ONE parsed SQL expression: building
    # them as nested F.struct(F.lit(...)) objects cost ~2000 py4j round
    # trips (~6 s of pure driver time per run, round-12 profile); the
    # single expr string is one parse in the JVM for the same plan.
    grid_arr = F.expr(
        "array("
        + ", ".join(
            f"struct({t10} AS t10, CAST({a} AS BIGINT) AS a,"
            f" CAST({b} AS BIGINT) AS b)"
            for t10 in QR_TAUS10
            for a in QR_INTERCEPTS
            for b in QR_SLOPES
        )
        + ")"
    )
    r = F.col("yc") - (F.col("a") + F.col("b") * F.col("x"))
    pin = F.when(r >= 0, F.col("t10") * r).otherwise(
        (10 - F.col("t10")) * (-r)
    )
    # the driver parquet is one row group (unsplittable — guide §2.5),
    # so without an explicit repartition the rows × |grid| inline
    # explode and its partial aggregation run in ONE task; spreading
    # the 16-byte (yc, x) rows first costs a tiny shuffle and
    # parallelizes the 288-way explode (2.4 s -> 0.3 s map side at
    # sf0.1, and the same balance argument holds wherever scans are
    # coarser than the explode amplification)
    pts = pts.repartition(spark.sparkContext.defaultParallelism)
    losses = (
        pts.select("yc", "x", F.inline(grid_arr))
        .groupBy("t10", "a", "b")
        .agg(F.sum(pin).cast("long").alias("loss10"))
    )
    w = Window.partitionBy("t10").orderBy("loss10", "a", "b")
    return (
        losses.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .select(
            F.round(F.col("t10") / 10.0, 1).alias("tau"),
            F.round(F.col("a") / 100.0, 2).alias("intercept_usd"),
            F.col("b").cast("long").alias("slope_cents_per_day"),
            F.col("loss10").alias("pinball_loss10_cents"),
        )
    )


# --------------------------------------------------------------------------
# propensity-score matching ATT (nearest-control on the covariate)
# --------------------------------------------------------------------------
@query(
    "propensity_match_att",
    """
    WITH spend AS (
      SELECT o_custkey AS k,
             CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                  AS BIGINT) AS oc
      FROM orders GROUP BY 1
    ),
    cust AS (
      SELECT c_custkey AS key,
             CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS bal,
             CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END
               AS treated,
             coalesce(s.oc, 0) AS outc
      FROM customer LEFT JOIN spend s ON s.k = c_custkey
    ),
    seq AS (
      SELECT *,
        last_value(CASE WHEN treated = 0 THEN
            struct_pack(bal := bal, key := key, outc := outc) END
            IGNORE NULLS)
          OVER (ORDER BY bal, key
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
          AS prev_c,
        first_value(CASE WHEN treated = 0 THEN
            struct_pack(bal := bal, key := key, outc := outc) END
            IGNORE NULLS)
          OVER (ORDER BY bal, key
                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
          AS next_c
      FROM cust
    ),
    m AS (
      SELECT key, outc,
        CASE
          WHEN prev_c IS NULL THEN next_c
          WHEN next_c IS NULL THEN prev_c
          WHEN (bal - prev_c.bal) < (next_c.bal - bal) THEN prev_c
          WHEN (bal - prev_c.bal) > (next_c.bal - bal) THEN next_c
          WHEN prev_c.key < next_c.key THEN prev_c
          ELSE next_c
        END AS ctrl
      FROM seq WHERE treated = 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_treated,
           round((sum(outc - ctrl.outc) * 1.0 / count(*)) / 100.0, 4)
             AS att_usd,
           round((sum(outc) * 1.0 / count(*)) / 100.0, 4)
             AS avg_treated_usd,
           round((sum(ctrl.outc) * 1.0 / count(*)) / 100.0, 4)
             AS avg_matched_usd
    FROM m
    """,
)
def propensity_match_att(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Propensity-score-matching ATT — completes the causal battery
    (DiD / IV-2SLS / RDD / stratified-IPW exist; matching was the
    missing classic): every treated customer (BUILDING segment) is
    matched with replacement to its nearest control on the balance
    covariate, and the average treatment effect on the treated is the
    mean matched outcome difference (total spend).

    Matching WITHOUT a quadratic join: one union frame sorted by
    (balance, key) gives each treated row its nearest control below
    (``last IGNORE NULLS`` over preceding rows) and above (the same
    running frame under the REVERSED sort — Spark executes
    unbounded-preceding frames as O(n) accumulators, where an
    unbounded-following frame recomputes per row, O(n²));
    the closer of the two wins, ties broken by
    absolute gap then control key — exact integer cents everywhere, so
    both engines pick the identical match.  The global-order window is
    customer-DIMENSION-sized (never fact-sized); at extreme dim
    cardinality the same construction bands by balance range with
    boundary duplication.

    Determinism: balances and outcomes quantize to exact cents; the
    choice CASE and the final means divide exact BIGINTs through one
    shared tree."""
    spend_cents = F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long")
    spend = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.sum(spend_cents).cast("long").alias("oc"))
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(spend, F.col("c_custkey") == F.col("k"), "left")
        .select(
            F.col("c_custkey").alias("key"),
            F.floor(F.col("c_acctbal") * 100.0 + 0.5)
            .cast("long")
            .alias("bal"),
            F.when(F.col("c_mktsegment") == "BUILDING", 1)
            .otherwise(0)
            .alias("treated"),
            F.coalesce(F.col("oc"), F.lit(0)).cast("long").alias("outc"),
        )
    )
    ctrl_struct = F.when(
        F.col("treated") == 0,
        F.struct(
            F.col("bal").alias("bal"),
            F.col("key").alias("key"),
            F.col("outc").alias("outc"),
        ),
    )
    # BOTH neighbor windows as running (unbounded-PRECEDING) frames:
    # next_c is "last control so far" under the REVERSED sort — Spark
    # executes unbounded-preceding frames as an O(n) running
    # accumulator, while an unbounded-FOLLOWING frame recomputes per
    # row (O(n²): 7s -> ms on the sf0.1 customer dim)
    w_fwd = Window.orderBy(F.asc("bal"), F.asc("key")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_rev = Window.orderBy(F.desc("bal"), F.desc("key")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    seq = cust.select(
        "key",
        "bal",
        "treated",
        "outc",
        F.last(ctrl_struct, ignorenulls=True).over(w_fwd).alias("prev_c"),
        F.last(ctrl_struct, ignorenulls=True).over(w_rev).alias("next_c"),
    )
    p, n = F.col("prev_c"), F.col("next_c")
    dp = F.col("bal") - p["bal"]
    dn = n["bal"] - F.col("bal")
    ctrl = (
        F.when(p.isNull(), n)
        .when(n.isNull(), p)
        .when(dp < dn, p)
        .when(dp > dn, n)
        .when(p["key"] < n["key"], p)
        .otherwise(n)
    )
    m = seq.filter(F.col("treated") == 1).select(
        "key", "outc", ctrl.alias("ctrl")
    )
    cnt = F.count(F.lit(1))
    return m.agg(
        cnt.cast("long").alias("n_treated"),
        F.round(
            (F.sum(F.col("outc") - F.col("ctrl")["outc"]) * 1.0 / cnt)
            / 100.0,
            4,
        ).alias("att_usd"),
        F.round((F.sum("outc") * 1.0 / cnt) / 100.0, 4).alias(
            "avg_treated_usd"
        ),
        F.round(
            (F.sum(F.col("ctrl")["outc"]) * 1.0 / cnt) / 100.0, 4
        ).alias("avg_matched_usd"),
    )
