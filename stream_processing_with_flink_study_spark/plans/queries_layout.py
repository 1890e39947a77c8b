"""Data-layout analytics: Z-order clustering keys and zone-map pruning
evaluation — the physical-design half of the 100 TB story.

At warehouse scale the scan you AVOID is the cheapest scan: engines
skip whole files/row-groups whose per-block min/max ("zone map") cannot
satisfy the predicate, and multi-dimensional locality (Z-order, as in
Delta/Iceberg ``OPTIMIZE ZORDER BY``) is what makes skipping work for
more than one column.  These queries make that story measurable on the
engine's own tables — and both are EXACT integer computations, so they
carry full cross-engine value oracles.

Bit-interleaving is generated once as a dialect-neutral expression
tree (Spark ``shiftleft``/``shiftrightunsigned``/``&`` vs DuckDB
``<<``/``>>``/``&`` — identical int64 semantics on non-negative
inputs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import query

Z_BITS = 12  # day index and supplier key both fit 12 bits at any test SF
DAY0 = "1995-01-01"  # min l_shipdate is 1995-01-02
# fixed 2-D predicate: ~100-day ship window x 4 supplier keys
DAY_LO, DAY_HI = 400, 499
SK_LO, SK_HI = 2, 5
NAT_BLOCK = 1024  # natural layout: ~insertion order (orderkey ranges)
DAY_BLOCK = 16  # date-sorted layout: ~fortnight files
Z_SHIFT = 12  # z-order layout: 4096 possible buckets over the 24-bit curve


def _interleave_expr(x: str, y: str, bits: int, dialect: str) -> str:
    """Morton/Z-order interleave of two ``bits``-bit non-negative ints:
    bit j of x lands at 2j, bit j of y at 2j+1.  Emitted as an unrolled
    sum — identical exact int64 arithmetic in both engines."""
    terms = []
    for j in range(bits):
        if dialect == "spark":
            terms.append(
                f"shiftleft(shiftrightunsigned({x}, {j}) & 1, {2 * j})"
            )
            terms.append(
                f"shiftleft(shiftrightunsigned({y}, {j}) & 1, {2 * j + 1})"
            )
        else:
            terms.append(f"((({x} >> {j}) & 1) << {2 * j})")
            terms.append(f"((({y} >> {j}) & 1) << {2 * j + 1})")
    return " + ".join(terms)


def _hilbert_stage_exprs(s: int) -> tuple[str, str, str]:
    """One level of the iterative Hilbert xy→d walk (level size ``s``,
    halving per stage): quadrant digit into ``hd``, then the
    reflect/swap rotation of (hx, hy) for the next level.  Emitted as
    dialect-free SQL (CASE / & / integer arithmetic evaluate
    identically in Spark SQL and DuckDB on non-negative int64), so the
    SAME text drives both engines.  The quadrant CASE is the xor-free
    form of ``(3·rx) ^ ry`` (engines differ on ^); the rotation uses
    the LEVEL size (both the s- and n-reflections are valid Hilbert
    constructions — bijectivity + unit-step adjacency of this one are
    pinned against the textbook Python walk in tests/test_layout.py).
    """
    rx = f"(CASE WHEN (hx & {s}) > 0 THEN 1 ELSE 0 END)"
    ry = f"(CASE WHEN (hy & {s}) > 0 THEN 1 ELSE 0 END)"
    quad = (
        f"(CASE WHEN {rx} = 1 AND {ry} = 1 THEN 2"
        f" WHEN {rx} = 1 THEN 3"
        f" WHEN {ry} = 1 THEN 1 ELSE 0 END)"
    )
    d = f"hd + {s * s} * {quad}"
    x = (
        f"(CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1"
        f" THEN {s} - 1 - hy ELSE hy END) ELSE hx END)"
    )
    y = (
        f"(CASE WHEN {ry} = 0 THEN (CASE WHEN {rx} = 1"
        f" THEN {s} - 1 - hx ELSE hx END) ELSE hy END)"
    )
    return d, x, y


def _hilbert_levels(bits: int, levels: int | None = None) -> list[int]:
    out = [1 << j for j in range(bits - 1, -1, -1)]
    return out if levels is None else out[:levels]


# Both layout queries bucket on hd >> Z_SHIFT, and each walk level
# contributes 2 index bits from the top — so only the first
# Z_BITS - Z_SHIFT/2 levels can reach the bucket bits.  The dropped
# tail contributes at most Σ 3s² = 4095 < 2^Z_SHIFT, so the truncated
# walk yields the IDENTICAL bucket (pinned in tests) at half the
# per-row expression cost — this is the knob a 100 TB OPTIMIZE job
# turns too: curve precision only down to the file size, never the
# row.
HILBERT_BUCKET_LEVELS = Z_BITS - Z_SHIFT // 2


def _hilbert_ctes(bits: int, base: str, levels: int | None = None) -> str:
    """Chained CTE stages h1..hK over ``base`` (which must expose
    hx, hy, hd plus any carried columns via *): each stage rewrites
    (hd, hx, hy) from the previous stage's values."""
    parts = []
    prev = base
    for k, s in enumerate(_hilbert_levels(bits, levels), start=1):
        d, x, y = _hilbert_stage_exprs(s)
        parts.append(
            f"h{k} AS (SELECT * REPLACE ({d} AS hd, {x} AS hx,"
            f" {y} AS hy) FROM {prev})"
        )
        prev = f"h{k}"
    return ",\n    ".join(parts)


def _hilbert_spark(
    df: DataFrame, bits: int, levels: int | None = None
) -> DataFrame:
    """The same staged walk as :func:`_hilbert_ctes`, as chained
    selectExpr stages — every stage's expressions read the INPUT row,
    so the rewrite semantics match the CTE chain exactly."""
    out = df
    keep = [c for c in df.columns if c not in ("hd", "hx", "hy")]
    for s in _hilbert_levels(bits, levels):
        d, x, y = _hilbert_stage_exprs(s)
        out = out.selectExpr(
            *keep, f"{d} AS hd", f"{x} AS hx", f"{y} AS hy"
        )
    return out


def _zorder_oracle() -> str:
    z = _interleave_expr("d", "sk", Z_BITS, "duckdb")
    return f"""
    WITH base AS MATERIALIZED (
      SELECT date_diff('day', DATE '{DAY0}', CAST(l_shipdate AS DATE)) AS d,
             l_suppkey % {2 ** Z_BITS} AS sk
      FROM lineitem
    ),
    keyed AS (SELECT d, sk, {z} AS z FROM base)
    SELECT CAST(z >> {Z_SHIFT} AS BIGINT) AS z_bucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(min(d) AS BIGINT) AS d_min, CAST(max(d) AS BIGINT) AS d_max,
           CAST(min(sk) AS BIGINT) AS sk_min, CAST(max(sk) AS BIGINT) AS sk_max,
           CAST(max(d) - min(d) + max(sk) - min(sk) AS BIGINT) AS zone_span
    FROM keyed GROUP BY 1
    """


@query("zorder_layout_keys", oracle=_zorder_oracle())
def zorder_layout_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering keys over lineitem's (ship-day,
    supplier) plane, rolled up per curve bucket with each bucket's zone
    map (min/max of BOTH dimensions) and its combined span — the
    locality readout: Z-buckets bound both columns at once, which is
    what lets one layout serve predicates on either (the
    ``OPTIMIZE ZORDER BY`` effect).  Pure unrolled shift/mask integer
    expressions inside whole-stage codegen; one scan, one exchange."""
    n = 2 ** Z_BITS
    base = load_table(spark, sf_dir, "lineitem").selectExpr(
        f"datediff(l_shipdate, DATE '{DAY0}') AS d",
        f"l_suppkey % {n} AS sk",
    )
    keyed = base.selectExpr(
        "d", "sk", _interleave_expr("d", "sk", Z_BITS, "spark") + " AS z"
    )
    return keyed.groupBy(
        F.shiftrightunsigned("z", Z_SHIFT).cast("long").alias("z_bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("d").cast("long").alias("d_min"),
        F.max("d").cast("long").alias("d_max"),
        F.min("sk").cast("long").alias("sk_min"),
        F.max("sk").cast("long").alias("sk_max"),
        (
            F.max("d") - F.min("d") + F.max("sk") - F.min("sk")
        ).cast("long").alias("zone_span"),
    )


def _zonemap_oracle() -> str:
    selects = []
    for layout, blk in (
        ("natural", f"okey // {NAT_BLOCK}"),
        ("date_sorted", f"d // {DAY_BLOCK}"),
        ("zorder", f"z >> {Z_SHIFT}"),
        ("hilbert", f"h >> {Z_SHIFT}"),
    ):
        selects.append(f"""
    SELECT '{layout}' AS layout,
           CAST(count(*) AS BIGINT) AS n_blocks,
           CAST(count(*) FILTER (hit) AS BIGINT) AS blocks_scanned,
           CAST(sum(n) AS BIGINT) AS rows_total,
           CAST(coalesce(sum(n) FILTER (hit), 0) AS BIGINT) AS rows_scanned,
           CAST(coalesce(sum(m) FILTER (hit), 0) AS BIGINT) AS rows_matching,
           round(count(*) FILTER (hit) * 1.0 / count(*) - 1e-9, 4)
             AS scan_block_pct
    FROM (
      SELECT {blk} AS blk, count(*) AS n,
             sum(CASE WHEN d BETWEEN {DAY_LO} AND {DAY_HI}
                       AND sk BETWEEN {SK_LO} AND {SK_HI}
                      THEN 1 ELSE 0 END) AS m,
             (min(d) <= {DAY_HI} AND max(d) >= {DAY_LO}
              AND min(sk) <= {SK_HI} AND max(sk) >= {SK_LO}) AS hit
      FROM keyed GROUP BY 1
    )""")
    u = " UNION ALL ".join(selects)
    return f"""
    WITH h0 AS (
      SELECT l_orderkey AS okey,
             date_diff('day', DATE '{DAY0}', CAST(l_shipdate AS DATE)) AS d,
             l_suppkey % {2 ** Z_BITS} AS sk,
             {_interleave_expr(
                 f"date_diff('day', DATE '{DAY0}', CAST(l_shipdate AS DATE))",
                 f"(l_suppkey % {2 ** Z_BITS})",
                 Z_BITS,
                 "duckdb",
             )} AS z,
             date_diff('day', DATE '{DAY0}', CAST(l_shipdate AS DATE)) AS hx,
             l_suppkey % {2 ** Z_BITS} AS hy,
             CAST(0 AS BIGINT) AS hd
      FROM lineitem
    ),
    {_hilbert_ctes(Z_BITS, "h0", HILBERT_BUCKET_LEVELS)},
    keyed AS MATERIALIZED (
      SELECT okey, d, sk, z, hd AS h FROM h{HILBERT_BUCKET_LEVELS}
    )
    {u}
    ORDER BY layout
    """


@query("zone_map_pruning_eval", oracle=_zonemap_oracle())
def zone_map_pruning_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map (min/max data-skipping) effectiveness of four physical
    layouts under the same 2-D predicate (a ~100-day ship window × 4
    supplier keys): ``natural`` (orderkey ranges ≈ insertion order),
    ``date_sorted`` (fortnight files — perfect on the date dimension,
    blind on supplier), ``zorder`` (Morton buckets — bounds both), and
    ``hilbert`` (Hilbert buckets — the curve with unit-step adjacency,
    so blocks never contain the Morton curve's quadrant jumps; the
    layout Iceberg/Databricks moved to after ZORDER for exactly this
    reason).
    Per layout: block count, blocks whose min/max zones overlap the
    predicate, rows scanned vs rows actually matching (the
    false-positive I/O).  ``rows_matching`` summed over scanned blocks
    is layout-invariant — a built-in self-check.

    Scale shape: blocks are VALUE-bucketed (file-partitioning style),
    so each layout is one groupBy over the shared projected base —
    never a global row_number sort, which would serialize 100 TB
    through one task.  The base is checkpointed once; the three layout
    aggregates and the final union read the cache, not the parquet."""
    n = 2 ** Z_BITS
    base = (
        _hilbert_spark(
            load_table(spark, sf_dir, "lineitem")
            .selectExpr(
                "l_orderkey AS okey",
                f"datediff(l_shipdate, DATE '{DAY0}') AS d",
                f"l_suppkey % {n} AS sk",
            )
            .selectExpr(
                "okey", "d", "sk",
                _interleave_expr("d", "sk", Z_BITS, "spark") + " AS z",
                "d AS hx", "sk AS hy", "CAST(0 AS BIGINT) AS hd",
            ),
            Z_BITS,
            HILBERT_BUCKET_LEVELS,
        )
        .selectExpr("okey", "d", "sk", "z", "hd AS h")
        .localCheckpoint()
    )
    match = (
        (F.col("d") >= DAY_LO) & (F.col("d") <= DAY_HI)
        & (F.col("sk") >= SK_LO) & (F.col("sk") <= SK_HI)
    ).cast("long")
    out = None
    for layout, blk in (
        ("natural", (F.col("okey") / NAT_BLOCK).cast("long")),
        ("date_sorted", (F.col("d") / DAY_BLOCK).cast("long")),
        ("zorder", F.shiftrightunsigned("z", Z_SHIFT)),
        ("hilbert", F.shiftrightunsigned("h", Z_SHIFT)),
    ):
        zones = base.groupBy(blk.alias("blk")).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(match).alias("m"),
            (
                (F.min("d") <= DAY_HI) & (F.max("d") >= DAY_LO)
                & (F.min("sk") <= SK_HI) & (F.max("sk") >= SK_LO)
            ).alias("hit"),
        )
        row = zones.agg(
            F.lit(layout).alias("layout"),
            F.count(F.lit(1)).cast("long").alias("n_blocks"),
            # coalesce: the oracle's count(*) FILTER (hit) is 0 over
            # zero blocks where a bare sum is NULL (round-12 sweep)
            F.coalesce(F.sum(F.col("hit").cast("long")), F.lit(0))
            .cast("long")
            .alias("blocks_scanned"),
            F.sum("n").cast("long").alias("rows_total"),
            F.coalesce(
                F.sum(F.when(F.col("hit"), F.col("n"))), F.lit(0)
            ).cast("long").alias("rows_scanned"),
            F.coalesce(
                F.sum(F.when(F.col("hit"), F.col("m"))), F.lit(0)
            ).cast("long").alias("rows_matching"),
            F.round(
                F.sum(F.col("hit").cast("long"))
                / F.count(F.lit(1)) - 1e-9,
                4,
            ).alias("scan_block_pct"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def _hilbert_oracle() -> str:
    return f"""
    WITH h0 AS (
      SELECT date_diff('day', DATE '{DAY0}', CAST(l_shipdate AS DATE))
               AS d,
             l_suppkey % {2 ** Z_BITS} AS sk,
             date_diff('day', DATE '{DAY0}', CAST(l_shipdate AS DATE))
               AS hx,
             l_suppkey % {2 ** Z_BITS} AS hy,
             CAST(0 AS BIGINT) AS hd
      FROM lineitem
    ),
    {_hilbert_ctes(Z_BITS, "h0", HILBERT_BUCKET_LEVELS)}
    SELECT CAST(hd >> {Z_SHIFT} AS BIGINT) AS h_bucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(min(d) AS BIGINT) AS d_min, CAST(max(d) AS BIGINT) AS d_max,
           CAST(min(sk) AS BIGINT) AS sk_min, CAST(max(sk) AS BIGINT) AS sk_max,
           CAST(max(d) - min(d) + max(sk) - min(sk) AS BIGINT) AS zone_span
    FROM h{HILBERT_BUCKET_LEVELS} GROUP BY 1
    """


@query("hilbert_layout_keys", oracle=_hilbert_oracle())
def hilbert_layout_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert-curve clustering keys over the same (ship-day, supplier)
    plane as ``zorder_layout_keys`` — the stronger space-filling curve:
    consecutive curve positions are ALWAYS grid neighbors (unit-step
    adjacency, pinned in tests/test_layout.py), so curve buckets never
    straddle the Morton curve's quadrant-boundary jumps and per-bucket
    zone maps bound both dimensions tighter on average.  The index is
    the iterative quadrant walk unrolled into {Z_BITS} exact-integer
    CASE stages — chained ``selectExpr`` rewrites here, the identical
    expression text as chained CTEs in the DuckDB oracle — entirely
    inside whole-stage codegen: one scan, one exchange, no UDF.

    This is the key a 100 TB ``OPTIMIZE ... BY hilbert(d, sk)`` would
    range-partition on; ``zone_map_pruning_eval`` measures the
    resulting skip rates head-to-head against natural / date-sorted /
    Z-order under the same predicate."""
    n = 2 ** Z_BITS
    base = load_table(spark, sf_dir, "lineitem").selectExpr(
        f"datediff(l_shipdate, DATE '{DAY0}') AS d",
        f"l_suppkey % {n} AS sk",
        f"datediff(l_shipdate, DATE '{DAY0}') AS hx",
        f"l_suppkey % {n} AS hy",
        "CAST(0 AS BIGINT) AS hd",
    )
    keyed = _hilbert_spark(base, Z_BITS, HILBERT_BUCKET_LEVELS)
    return keyed.groupBy(
        F.shiftrightunsigned("hd", Z_SHIFT).cast("long").alias("h_bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("d").cast("long").alias("d_min"),
        F.max("d").cast("long").alias("d_max"),
        F.min("sk").cast("long").alias("sk_min"),
        F.max("sk").cast("long").alias("sk_max"),
        (
            F.max("d") - F.min("d") + F.max("sk") - F.min("sk")
        ).cast("long").alias("zone_span"),
    )
