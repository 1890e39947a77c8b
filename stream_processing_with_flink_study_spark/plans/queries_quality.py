"""Data-quality and corpus-hygiene batteries (training-pipeline
extensions, third wave): exact substring-duplication coverage (the
suffix-style dedup signal from "Deduplicating Training Data Makes
Language Models Better", Lee et al. 2022, re-expressed as k-token
window hashing), a boilerplate-gram report, a Deequ-style one-pass
constraint report, and a PSI drift report between two time halves of
the event stream.

Scale notes (100 TB lens):
- substring coverage hashes every k-token window to an int64
  (``xxhash64``) BEFORE the shuffle, so the wide exchange carries
  8-byte longs, never window strings; the per-doc ``array_distinct``
  happens map-side inside the projection.  The exploded (doc_id, h)
  index is persisted because both the window-frequency aggregate and
  the per-doc re-join consume it (the ``bm25_scores`` pattern).
- the constraint report is ONE global aggregate (map-side partial,
  single-row result) exploded driver-free into metric rows.
- PSI bins with a fixed-width rule derived from the reference half's
  min/max, broadcast as a one-row literal join — no quantile shuffle,
  no driver collect; the 10-bin frame aggregates with a trivial
  final window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources import load_table
from .registry import query

# --------------------------------------------------------------------------
# exact substring duplication (k-token windows)
# --------------------------------------------------------------------------

_WIN_K = 8  # tokens per window — Lee et al. use 50 chars; 8 tokens ~ same scale


def _substring_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + a drop-first-token copy of every 10th doc (id +1M):
    the copies share almost every k-token window with their original,
    so the planted duplication signal is near-1 coverage."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.lower(F.trim("text")).alias("text")
    )
    toks = F.split(F.col("text"), r"\s+")
    perturbed = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.array_join(
            F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))), " "
        ).alias("text"),
    )
    # the documents parquet is one small file (1-2 scan partitions) but
    # the window fan-out behind it is ~50 expression-heavy rows per doc:
    # spread the tiny doc rows across all cores before the fan-out (one
    # narrow shuffle of the raw docs, ~6x wall-clock on local[32]; at
    # real scale the scan already has enough partitions and AQE would
    # coalesce, so this is a no-op there)
    par = spark.sparkContext.defaultParallelism
    return docs.unionByName(perturbed).repartition(par)


_SUBSTRING_CORPUS_SQL = """
  src AS (
    SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS tokens
    FROM documents
    UNION ALL
    SELECT doc_id + 1000000, tokens[2:]
    FROM (SELECT doc_id,
                 regexp_split_to_array(lower(trim(text)), '\\s+') AS tokens
          FROM documents WHERE doc_id % 10 = 0)
  )
"""


def _window_index(corpus: DataFrame, distinct: bool) -> DataFrame:
    """(doc_id, h) rows: one int64 hash per k-token window.  The
    sequence/slice/hash chain is a single JVM projection (no Python);
    short docs (< k tokens) produce an empty array and vanish at the
    explode.  ``slice(sequence(1, max(n-k+1, 1)), 1, max(n-k+1, 0))``
    keeps the sequence ascending for every n (Spark's sequence runs
    DESCENDING when stop < start, which would fabricate windows)."""
    # bind the token array as a COLUMN before the lambda: an outer
    # non-attribute expression inside a higher-order-function body
    # re-evaluates per element (the char_ngram_lang_id note), so the
    # un-bound form re-split the whole document once per WINDOW —
    # O(len²) work per doc
    tokenized = corpus.select(
        "doc_id", F.split(F.col("text"), r"\s+").alias("_toks")
    )
    toks = F.col("_toks")
    n_win = F.greatest(F.size(toks) - (_WIN_K - 1), F.lit(0))
    idx = F.slice(F.sequence(F.lit(1), F.greatest(n_win, F.lit(1))), 1, n_win)
    wins = F.transform(
        idx, lambda i: F.xxhash64(F.array_join(F.slice(toks, i, _WIN_K), " "))
    )
    if distinct:
        wins = F.array_distinct(wins)
    return tokenized.select("doc_id", F.explode(wins).alias("h"))


@query(
    "substring_dup_coverage",
    f"""
    WITH {_SUBSTRING_CORPUS_SQL},
    wins AS (
      SELECT doc_id, list_distinct(list_transform(
          generate_series(1, greatest(len(tokens) - {_WIN_K - 1}, 0)),
          i -> array_to_string(tokens[i:i+{_WIN_K - 1}], ' '))) AS ws
      FROM src
    ),
    exploded AS (SELECT doc_id, unnest(ws) AS w FROM wins),
    counts AS (SELECT w, count(*) AS n_docs FROM exploded GROUP BY w)
    SELECT e.doc_id,
           count(*) AS n_windows,
           CAST(sum(CASE WHEN c.n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS dup_windows,
           round(sum(CASE WHEN c.n_docs >= 2 THEN 1 ELSE 0 END) * 1.0
                 / count(*), 4) AS dup_fraction
    FROM exploded e JOIN counts c ON e.w = c.w
    GROUP BY e.doc_id
    """,
)
def substring_dup_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring-duplication coverage per document: the fraction
    of a doc's distinct k-token windows that appear verbatim in at
    least one OTHER document (>= 2 docs share the window).  This is the
    window-hash re-expression of suffix-array substring dedup (Lee et
    al. 2022) — the per-doc score a curation pipeline thresholds to
    drop boilerplate-heavy documents.

    Plan: persist the (doc_id, int64-window-hash) inverted index, one
    exchange on h for the window-frequency aggregate, a co-partitioned
    join back, one exchange on doc_id for the per-doc rollup.  The
    shuffle payload is 16 bytes/row at any corpus size.
    """
    index = _window_index(_substring_corpus(spark, sf_dir), distinct=True)
    index = index.persist()
    counts = index.groupBy("h").agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        index.join(counts, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum(F.when(F.col("n_docs") >= 2, 1).otherwise(0))
            .cast("long")
            .alias("dup_windows"),
        )
        .withColumn(
            "dup_fraction",
            F.round(F.col("dup_windows") * 1.0 / F.col("n_windows"), 4),
        )
    )


@query(
    "substring_top_grams",
    f"""
    WITH {_SUBSTRING_CORPUS_SQL},
    wins AS (
      SELECT doc_id, list_transform(
          generate_series(1, greatest(len(tokens) - {_WIN_K - 1}, 0)),
          i -> array_to_string(tokens[i:i+{_WIN_K - 1}], ' ')) AS ws
      FROM src
    ),
    exploded AS (SELECT doc_id, unnest(ws) AS gram FROM wins)
    SELECT gram,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           count(*) AS n_occurrences
    FROM exploded
    GROUP BY gram
    HAVING count(DISTINCT doc_id) >= 2
    ORDER BY n_docs DESC, n_occurrences DESC, gram
    LIMIT 20
    """,
)
def substring_top_grams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top boilerplate grams: the k-token windows shared by the most
    documents — the evidence report a pipeline uses to decide WHAT to
    strip.  Carries gram strings (this is the bounded top-N report
    tier; the coverage query above never does), totally ordered
    (n_docs, n_occurrences, gram) so the LIMIT is deterministic."""
    # tokens bound as a COLUMN before the lambda (same per-element
    # re-evaluation trap as _window_index: the un-bound form re-split
    # the document once per window)
    toks = F.col("_toks")
    exploded = (
        _substring_corpus(spark, sf_dir)
        .select(
            "doc_id", F.split(F.col("text"), r"\s+").alias("_toks")
        )
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.slice(
                        F.sequence(
                            F.lit(1),
                            F.greatest(
                                F.size(toks) - (_WIN_K - 1),
                                F.lit(1),
                            ),
                        ),
                        1,
                        F.greatest(
                            F.size(toks) - (_WIN_K - 1),
                            F.lit(0),
                        ),
                    ),
                    lambda i: F.array_join(
                        F.slice(toks, i, _WIN_K), " "
                    ),
                )
            ).alias("gram"),
        )
    )
    return (
        exploded.groupBy("gram")
        .agg(
            F.count_distinct("doc_id").cast("long").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= 2)
        .orderBy(F.desc("n_docs"), F.desc("n_occurrences"), F.asc("gram"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# Deequ-style one-pass constraint report
# --------------------------------------------------------------------------
@query(
    "dq_constraint_report",
    """
    WITH m AS (
      SELECT count(*) AS n,
             count(l_quantity) AS n_qty,
             count(DISTINCT (l_orderkey, l_linenumber)) AS n_pk,
             min(l_quantity) AS min_qty,
             max(l_discount) AS max_disc,
             sum(CASE WHEN l_extendedprice >= 0 THEN 1 ELSE 0 END) AS n_nonneg,
             sum(CASE WHEN l_returnflag IN ('A','N','R') THEN 1 ELSE 0 END)
               AS n_domain
      FROM lineitem
    )
    SELECT 'completeness_l_quantity' AS metric,
           round(n_qty * 1.0 / nullif(n, 0), 4) AS value,
           n_qty = n AS passed FROM m
    UNION ALL
    SELECT 'uniqueness_order_line',
           round(n_pk * 1.0 / nullif(n, 0), 4), n_pk = n FROM m
    UNION ALL
    SELECT 'min_l_quantity', round(min_qty, 4),
           coalesce(min_qty >= 1.0, true) FROM m
    UNION ALL
    SELECT 'max_l_discount', round(max_disc, 4),
           coalesce(max_disc <= 0.1, true) FROM m
    UNION ALL
    SELECT 'compliance_nonneg_price',
           round(n_nonneg * 1.0 / nullif(n, 0), 4),
           coalesce(n_nonneg = n, true) FROM m
    UNION ALL
    SELECT 'domain_l_returnflag',
           round(n_domain * 1.0 / nullif(n, 0), 4),
           coalesce(n_domain = n, true) FROM m
    """,
)
def dq_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style data-quality constraint battery: completeness,
    key-uniqueness, bounds, and domain-compliance checks over lineitem,
    all computed in ONE map-side-combined aggregate pass (the whole
    point of Deequ's metric engine) and exploded into (metric, value,
    passed) rows with zero driver involvement.  The synthetic data has
    a genuinely non-unique (l_orderkey, l_linenumber) pair, so the
    uniqueness row reports passed=false — the report distinguishes
    failing constraints, not just echoes green."""
    li = load_table(spark, sf_dir, "lineitem")
    m = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("l_quantity").alias("n_qty"),
        F.count_distinct(F.col("l_orderkey"), F.col("l_linenumber")).alias(
            "n_pk"
        ),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_discount").alias("max_disc"),
        F.sum(
            F.when(F.col("l_extendedprice") >= 0, 1).otherwise(0)
        ).alias("n_nonneg"),
        F.sum(
            F.when(F.col("l_returnflag").isin("A", "N", "R"), 1).otherwise(0)
        ).alias("n_domain"),
    )

    def row(metric: str, value, passed):
        return F.struct(
            F.lit(metric).alias("metric"),
            F.round(value, 4).cast("double").alias("value"),
            passed.alias("passed"),
        )

    n = F.col("n")
    return m.select(
        F.explode(
            F.array(
                # nullif/coalesce: empty-table parity — NULL values,
                # vacuous-true bound/domain verdicts (round-12 sweep)
                row(
                    "completeness_l_quantity",
                    F.col("n_qty") * 1.0 / F.nullif(n, F.lit(0)),
                    F.col("n_qty") == n,
                ),
                row(
                    "uniqueness_order_line",
                    F.col("n_pk") * 1.0 / F.nullif(n, F.lit(0)),
                    F.col("n_pk") == n,
                ),
                row(
                    "min_l_quantity",
                    F.col("min_qty"),
                    F.coalesce(F.col("min_qty") >= 1.0, F.lit(True)),
                ),
                row(
                    "max_l_discount",
                    F.col("max_disc"),
                    F.coalesce(F.col("max_disc") <= 0.1, F.lit(True)),
                ),
                row(
                    "compliance_nonneg_price",
                    F.col("n_nonneg") * 1.0 / F.nullif(n, F.lit(0)),
                    F.coalesce(F.col("n_nonneg") == n, F.lit(True)),
                ),
                row(
                    "domain_l_returnflag",
                    F.col("n_domain") * 1.0 / F.nullif(n, F.lit(0)),
                    F.coalesce(F.col("n_domain") == n, F.lit(True)),
                ),
            )
        ).alias("r")
    ).select("r.metric", "r.value", "r.passed")


# --------------------------------------------------------------------------
# PSI drift report (population stability index between two time halves)
# --------------------------------------------------------------------------
@query(
    "psi_drift_report",
    """
    WITH ts_stats AS (
      SELECT (min(epoch_ms(ts)) + max(epoch_ms(ts))) // 2 AS mid FROM events
    ),
    tagged AS (
      SELECT value, epoch_ms(ts) <= mid AS is_ref FROM events, ts_stats
    ),
    vstats AS (
      SELECT min(value) AS vmin, max(value) AS vmax FROM tagged WHERE is_ref
    ),
    binned AS (
      SELECT CAST(least(greatest(floor((value - vmin) * 10.0
                                       / (vmax - vmin)), 0), 9) AS INTEGER)
               AS bin,
             is_ref
      FROM tagged, vstats
    ),
    counts AS (
      SELECT bin,
             sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS n_ref,
             sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS n_cur
      FROM binned GROUP BY bin
    ),
    fracs AS (
      SELECT bin,
             n_ref * 1.0 / sum(n_ref) OVER () AS p,
             n_cur * 1.0 / sum(n_cur) OVER () AS q
      FROM counts
    )
    SELECT bin,
           round(p, 4) AS ref_frac,
           round(q, 4) AS cur_frac,
           round((greatest(p, 1e-6) - greatest(q, 1e-6))
                 * ln(greatest(p, 1e-6) / greatest(q, 1e-6)), 4) AS psi_term
    FROM fracs
    """,
)
def psi_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift report: split the event stream
    at its time midpoint, bin `value` into 10 fixed-width bins derived
    from the REFERENCE half's min/max (clamped at the edges so current
    out-of-range values land in bins 0/9), and emit per-bin
    (ref_frac, cur_frac, psi_term) with 1e-6 smoothing.  Sum(psi_term)
    is the PSI a pipeline alerts on (>0.2 = action).

    Plan: two one-row scalar aggregates broadcast back as literal
    joins (time midpoint, then reference min/max), one exchange for
    the per-bin counts, and a trivial window total over the <=10-bin
    frame.  Nothing driver-side, nothing quantile-shaped.
    """
    # persist the 16-byte (ms, value) projection: the time-midpoint agg,
    # the reference min/max agg, and the binning pass all consume it —
    # without the persist each branch re-scans the events parquet.
    ev = (
        load_table(spark, sf_dir, "events")
        .select(F.unix_millis("ts").alias("ms"), "value")
        .persist()
    )
    mid = ev.agg(
        ((F.min("ms") + F.max("ms")) / F.lit(2)).cast("long").alias("mid")
    )
    tagged = ev.crossJoin(F.broadcast(mid)).select(
        "value", (F.col("ms") <= F.col("mid")).alias("is_ref")
    )
    vstats = (
        tagged.filter("is_ref")
        .agg(F.min("value").alias("vmin"), F.max("value").alias("vmax"))
    )
    binned = tagged.crossJoin(F.broadcast(vstats)).select(
        F.least(
            F.greatest(
                F.floor(
                    (F.col("value") - F.col("vmin"))
                    * 10.0
                    / (F.col("vmax") - F.col("vmin"))
                ),
                F.lit(0),
            ),
            F.lit(9),
        )
        .cast("int")
        .alias("bin"),
        "is_ref",
    )
    counts = binned.groupBy("bin").agg(
        F.sum(F.when(F.col("is_ref"), 1).otherwise(0)).alias("n_ref"),
        F.sum(F.when(F.col("is_ref"), 0).otherwise(1)).alias("n_cur"),
    )
    w = Window.partitionBy()
    p = F.col("n_ref") * 1.0 / F.sum("n_ref").over(w)
    q = F.col("n_cur") * 1.0 / F.sum("n_cur").over(w)
    ps, qs = F.greatest(p, F.lit(1e-6)), F.greatest(q, F.lit(1e-6))
    return counts.select(
        "bin",
        F.round(p, 4).alias("ref_frac"),
        F.round(q, 4).alias("cur_frac"),
        F.round((ps - qs) * F.log(ps / qs), 4).alias("psi_term"),
    )


# --------------------------------------------------------------------------
# SimHash band candidates (Hamming-ball near-dup, banded — no all-pairs)
# --------------------------------------------------------------------------
_SIMHASH_BITS_SQL = " || ".join(
    "(CASE WHEN list_sum(list_transform(tokens, t -> "
    f"CASE WHEN substr(md5(t), {i}, 1) >= '8' THEN 1 ELSE -1 END)) > 0 "
    "THEN '1' ELSE '0' END)"
    for i in range(1, 33)
)


@query(
    "simhash_band_candidates",
    f"""
    WITH src AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS tokens
      FROM documents
      UNION ALL
      SELECT doc_id + 1000000,
             regexp_split_to_array(lower(trim(text)), '\\s+')
      FROM documents WHERE doc_id % 10 = 0
    ),
    sims AS (SELECT doc_id, {_SIMHASH_BITS_SQL} AS sim FROM src),
    banded AS (
      SELECT doc_id, sim, b,
             sim[b * 16 + 1 : b * 16 + 16] AS bkey
      FROM sims CROSS JOIN (SELECT unnest([0, 1]) AS b) t
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(len(list_filter(generate_series(1, 32),
                                i -> a.sim[i:i] <> b.sim[i:i])) AS INTEGER)
             AS hd
    FROM banded a JOIN banded b
      ON a.b = b.b AND a.bkey = b.bkey AND a.doc_id < b.doc_id
    WHERE len(list_filter(generate_series(1, 32),
              i -> a.sim[i:i] <> b.sim[i:i])) <= 1
    """,
)
def simhash_band_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash Hamming-ball near-dup candidates over a corpus with
    planted exact copies (every 10th doc, id +1M → hd = 0 pairs).
    Band width follows the radius: hd <= 1 needs only 2 bands × 16
    bits (pigeonhole), and the 65k-key space keeps buckets small where
    8-bit bands collapse onto a few giant keys (the formulaic corpus
    puts 65% of docs in one 8-bit band value; 16-bit bands cut the
    self-join's sum-of-squares ~50x).  hd <= 3 on this corpus is a
    half-million-pair dense graph at sf0.1 — a report, not a candidate
    set, hence the tighter radius.  Cost is bucket-quadratic, never
    corpus-quadratic; Hamming distance is JVM ``bit_count(xor)``.
    Streaming twin: ``streaming.stateful.simhash_near_dup_stream``
    (equivalence in tests/test_streaming.py)."""
    from ..functions import dedup, text

    docs = load_table(spark, sf_dir, "documents")
    copies = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    corpus = (
        docs.select("doc_id", "text")
        .unionByName(copies)
        # same tiny-scan / heavy-projection spread as _substring_corpus:
        # the Arrow simhash hashes every token 32-vote-wise, so give it
        # all cores instead of the parquet file's 1-2 scan partitions
        .repartition(spark.sparkContext.defaultParallelism)
    )
    # persist: the band self-join consumes sims on BOTH sides — without
    # it each side re-runs the Arrow simhash over the whole corpus
    sims = corpus.select(
        "doc_id", text.simhash32_arrow("text").alias("simhash")
    ).persist()
    return dedup.simhash_band_pairs(
        sims, "doc_id", "simhash", bands=2, max_hd=1
    )


# 64 one-bit vote lanes from sha256's 64 hex digits — the widened form
# of _SIMHASH_BITS_SQL; `hs` pre-hashes each token ONCE (not once per
# digit) so the oracle does |tokens| hashes + 64 char-compare passes
_SIMHASH64_BITS_SQL = " || ".join(
    "(CASE WHEN list_sum(list_transform(hs, h -> "
    f"CASE WHEN substr(h, {i}, 1) >= '8' THEN 1 ELSE -1 END)) > 0 "
    "THEN '1' ELSE '0' END)"
    for i in range(1, 65)
)


@query(
    "simhash64_band_candidates",
    f"""
    WITH src AS (
      SELECT doc_id,
             list_transform(
               regexp_split_to_array(lower(trim(text)), '\\s+'),
               t -> sha256(t)) AS hs
      FROM documents
      UNION ALL
      SELECT doc_id + 1000000,
             list_transform(
               regexp_split_to_array(lower(trim(text)), '\\s+'),
               t -> sha256(t))
      FROM documents WHERE doc_id % 10 = 0
    ),
    sims AS (SELECT doc_id, {_SIMHASH64_BITS_SQL} AS sim FROM src),
    banded AS (
      SELECT doc_id, sim, b,
             sim[b * 16 + 1 : b * 16 + 16] AS bkey
      FROM sims CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS b) t
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(len(list_filter(generate_series(1, 64),
                                i -> a.sim[i:i] <> b.sim[i:i])) AS INTEGER)
             AS hd
    FROM banded a JOIN banded b
      ON a.b = b.b AND a.bkey = b.bkey AND a.doc_id < b.doc_id
    WHERE len(list_filter(generate_series(1, 64),
              i -> a.sim[i:i] <> b.sim[i:i])) <= 3
    """,
)
def simhash64_band_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash Hamming-ball candidates at the FULL hd <= 3
    radius — the production-width scale default (the 32-bit query above
    documents why its radius had to shrink to hd <= 1: narrow
    fingerprints make formulaic corpora collision-dense).  At 64 bits
    random docs land ~hd 32 apart, so hd <= 3 is a true near-dup
    signal and the planted exact copies (every 10th doc, id +1M) come
    back at hd = 0 without drowning in band noise.

    Scale shape: 4 x 16-bit bands = 65,536 values per band (~2^18
    distinct join keys observed even on this corpus vs the 32-bit
    form's 1,024 ceiling — cardinality asserted in
    tests/test_training_ops.py), so bucket sizes stay sub-quadratic at
    100 TB.  Fingerprints are signed int64 end-to-end: sha256-digit
    votes batch in Arrow (:func:`..functions.text.simhash64_arrow`),
    band keys and Hamming distance are pure JVM bit ops — and DuckDB's
    own ``sha256()`` replays the votes digit-for-digit, keeping the
    full hash-match oracle that a 64-bit xxhash would have forfeited."""
    from ..functions import dedup, text

    docs = load_table(spark, sf_dir, "documents")
    copies = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    corpus = (
        docs.select("doc_id", "text")
        .unionByName(copies)
        .repartition(spark.sparkContext.defaultParallelism)
    )
    sims = corpus.select(
        "doc_id", text.simhash64_arrow("text").alias("simhash64")
    ).persist()
    return dedup.simhash64_band_pairs(
        sims, "doc_id", "simhash64", bands=4, max_hd=3
    )


# --------------------------------------------------------------------------
# running z-score anomaly alerts (expanding-window baseline per key)
# --------------------------------------------------------------------------
@query(
    "running_zscore_alerts",
    """
    WITH ordered AS (
      SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, value,
             avg(value) OVER w AS mu,
             stddev_samp(value) OVER w AS sd,
             count(*) OVER w AS n_prev
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id, event_id, ts_ms, value,
           round((value - mu) / sd, 4) AS z
    FROM ordered
    WHERE n_prev >= 5 AND sd > 0 AND abs((value - mu) / sd) > 3.0
    """,
)
def running_zscore_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-style anomaly detection, batch form: each event is
    scored against the expanding mean/stddev of its key's STRICTLY
    PRIOR events (>= 5 of them) and alerts when |z| > 3 — the
    self-calibrating threshold a pipeline uses where fixed deltas
    (``temp_delta_alert``) don't fit heterogeneous keys.  One
    shuffle-sort per key; the expanding window is computed in a single
    pass over each partition.  Streaming twin:
    ``streaming.stateful.zscore_alerts`` (Welford-style running
    moments in ValueState; equivalence in tests/test_streaming.py).
    """
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    scored = events.select(
        "user_id",
        "event_id",
        F.unix_millis("ts").alias("ts_ms"),
        "value",
        F.avg("value").over(w).alias("mu"),
        F.stddev_samp("value").over(w).alias("sd"),
        F.count(F.lit(1)).over(w).alias("n_prev"),
    )
    z = (F.col("value") - F.col("mu")) / F.col("sd")
    return (
        scored.filter(
            (F.col("n_prev") >= 5) & (F.col("sd") > 0) & (F.abs(z) > 3.0)
        )
        .select(
            "user_id",
            "event_id",
            "ts_ms",
            "value",
            F.round(z, 4).alias("z"),
        )
    )


# --------------------------------------------------------------------------
# windowed PSI drift monitor (per-day distribution vs whole-corpus ref)
# --------------------------------------------------------------------------
_PSI_BINS = 10
_PSI_DAY_MS = 86_400_000


def _psi_bin_expr(vmin, vmax) -> "F.Column":
    return (
        F.least(
            F.greatest(
                F.floor((F.col("value") - vmin) * float(_PSI_BINS) / (vmax - vmin)),
                F.lit(0),
            ),
            F.lit(_PSI_BINS - 1),
        )
        .cast("int")
        .alias("bin")
    )


@query(
    "windowed_psi_drift",
    f"""
    WITH vstats AS (SELECT min(value) AS vmin, max(value) AS vmax FROM events),
    binned AS (
      SELECT (epoch_ms(ts) // {_PSI_DAY_MS}) * {_PSI_DAY_MS} AS w_start,
             CAST(least(greatest(floor((value - vmin) * {_PSI_BINS}.0
                                       / (vmax - vmin)), 0),
                        {_PSI_BINS - 1}) AS INTEGER) AS bin
      FROM events, vstats
    ),
    total AS (SELECT count(*) AS n_all FROM binned),
    ref AS (
      SELECT bin, count(*) * 1.0 / n_all AS p
      FROM binned, total GROUP BY bin, n_all
    ),
    wc AS (SELECT w_start, bin, count(*) AS c FROM binned GROUP BY 1, 2),
    wt AS (SELECT w_start, sum(c) AS n FROM wc GROUP BY 1),
    grid AS (
      SELECT wt.w_start, wt.n, ref.bin, ref.p,
             coalesce(wc.c, 0) AS c
      FROM wt CROSS JOIN ref
      LEFT JOIN wc ON wc.w_start = wt.w_start AND wc.bin = ref.bin
    )
    SELECT w_start, CAST(n AS BIGINT) AS n_events,
           round(sum((greatest(c * 1.0 / n, 1e-6) - greatest(p, 1e-6))
                     * ln(greatest(c * 1.0 / n, 1e-6)
                          / greatest(p, 1e-6))), 4) AS psi
    FROM grid
    GROUP BY w_start, n
    """,
)
def windowed_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day PSI drift monitor: each day's value distribution scored
    against the whole-corpus reference in fixed-width bins — the
    continuous version of :func:`psi_drift_report` a pipeline charts to
    catch feature drift as data lands.

    Plan shape is streaming-ready: ONE keyed aggregate per day carrying
    ``_PSI_BINS`` conditional counters (no per-(day, bin) second
    shuffle), the one-row min/max and the one-row reference-fraction
    vector broadcast in.  Streaming twin:
    ``streaming.pipelines.psi_drift_stream`` (same conditional-counter
    aggregate under a watermarked tumbling window; equivalence in
    tests/test_streaming.py).
    """
    ev = (
        load_table(spark, sf_dir, "events")
        .select(F.unix_millis("ts").alias("ms"), "value")
        .persist()
    )
    vstats = ev.agg(F.min("value").alias("vmin"), F.max("value").alias("vmax"))
    binned = ev.crossJoin(F.broadcast(vstats)).select(
        ((F.col("ms") / _PSI_DAY_MS).cast("long") * _PSI_DAY_MS).alias(
            "w_start"
        ),
        _psi_bin_expr(F.col("vmin"), F.col("vmax")),
    )
    # one-row reference vector p0..p9 (global bin fractions)
    ref = binned.agg(
        *[
            (
                F.sum(F.when(F.col("bin") == b, 1).otherwise(0))
                * 1.0
                / F.count(F.lit(1))
            ).alias(f"p{b}")
            for b in range(_PSI_BINS)
        ]
    )
    days = binned.groupBy("w_start").agg(
        F.count(F.lit(1)).alias("n_events"),
        *[
            F.sum(F.when(F.col("bin") == b, 1).otherwise(0)).alias(f"c{b}")
            for b in range(_PSI_BINS)
        ],
    )
    out = days.crossJoin(F.broadcast(ref))
    eps = F.lit(1e-6)
    terms = [
        (
            F.greatest(F.col(f"c{b}") * 1.0 / F.col("n_events"), eps)
            - F.greatest(F.col(f"p{b}"), eps)
        )
        * F.log(
            F.greatest(F.col(f"c{b}") * 1.0 / F.col("n_events"), eps)
            / F.greatest(F.col(f"p{b}"), eps)
        )
        for b in range(_PSI_BINS)
    ]
    psi = terms[0]
    for t in terms[1:]:
        psi = psi + t
    return out.select("w_start", "n_events", F.round(psi, 4).alias("psi"))


# --------------------------------------------------------------------------
# cross-table referential integrity sweep
# --------------------------------------------------------------------------
@query(
    "referential_integrity_audit",
    """
    SELECT * FROM (
      SELECT 'lineitem.l_orderkey->orders' AS fk,
             (SELECT count(*) FROM lineitem) AS n_child,
             (SELECT count(*) FROM lineitem l
              WHERE NOT EXISTS (SELECT 1 FROM orders o
                                WHERE o.o_orderkey = l.l_orderkey))
               AS n_orphans
      UNION ALL
      SELECT 'orders.o_custkey->customer',
             (SELECT count(*) FROM orders),
             (SELECT count(*) FROM orders o
              WHERE NOT EXISTS (SELECT 1 FROM customer c
                                WHERE c.c_custkey = o.o_custkey))
      UNION ALL
      SELECT 'lineitem.l_suppkey->supplier',
             (SELECT count(*) FROM lineitem),
             (SELECT count(*) FROM lineitem l
              WHERE NOT EXISTS (SELECT 1 FROM supplier s
                                WHERE s.s_suppkey = l.l_suppkey))
      UNION ALL
      SELECT 'lineitem.l_partkey->part',
             (SELECT count(*) FROM lineitem),
             (SELECT count(*) FROM lineitem l
              WHERE NOT EXISTS (SELECT 1 FROM part p
                                WHERE p.p_partkey = l.l_partkey))
      UNION ALL
      SELECT 'customer.c_nationkey->nation',
             (SELECT count(*) FROM customer),
             (SELECT count(*) FROM customer c
              WHERE NOT EXISTS (SELECT 1 FROM nation n
                                WHERE n.n_nationkey = c.c_nationkey))
      UNION ALL
      SELECT 'nation.n_regionkey->region',
             (SELECT count(*) FROM nation),
             (SELECT count(*) FROM nation n
              WHERE NOT EXISTS (SELECT 1 FROM region r
                                WHERE r.r_regionkey = n.n_regionkey))
    )
    """,
)
def referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warehouse-wide foreign-key audit: orphan counts for every FK
    edge of the star schema in one result — the integrity sweep that
    gates a 100 TB ingest before any join-bearing query trusts its
    keys (a broken FK silently DROPS rows from inner joins; this
    query is how that surfaces as a number instead of a wrong answer).

    Scale shape: each edge is a LEFT ANTI join counted — dimension
    sides (orders is the largest) hash- or broadcast-joined as size
    dictates by AQE; the fact table is scanned once per edge with only
    the key column read (pruned scan).  Rows: one per FK edge, so the
    result is schema-sized, never data-sized."""
    t = {
        n: load_table(spark, sf_dir, n)
        for n in (
            "lineitem", "orders", "customer", "supplier", "part",
            "nation", "region",
        )
    }

    def edge(fk: str, child: DataFrame, ck: str, parent: DataFrame, pk: str):
        n_child = child.count()
        orphans = (
            child.select(F.col(ck))
            .join(parent.select(F.col(pk).alias(ck)), ck, "left_anti")
            .count()
        )
        return (fk, n_child, orphans)

    rows = [
        edge("lineitem.l_orderkey->orders", t["lineitem"], "l_orderkey",
             t["orders"], "o_orderkey"),
        edge("orders.o_custkey->customer", t["orders"], "o_custkey",
             t["customer"], "c_custkey"),
        edge("lineitem.l_suppkey->supplier", t["lineitem"], "l_suppkey",
             t["supplier"], "s_suppkey"),
        edge("lineitem.l_partkey->part", t["lineitem"], "l_partkey",
             t["part"], "p_partkey"),
        edge("customer.c_nationkey->nation", t["customer"], "c_nationkey",
             t["nation"], "n_nationkey"),
        edge("nation.n_regionkey->region", t["nation"], "n_regionkey",
             t["region"], "r_regionkey"),
    ]
    return spark.createDataFrame(
        rows, "fk string, n_child long, n_orphans long"
    )


# --------------------------------------------------------------------------
# k-anonymity audit: quasi-identifier equivalence-class risk profile
# --------------------------------------------------------------------------
@query(
    "k_anonymity_audit",
    """
    WITH qi AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band
      FROM customer
    ),
    cls AS MATERIALIZED (
      SELECT c_nationkey, c_mktsegment, bal_band, count(*) AS k
      FROM qi GROUP BY 1, 2, 3
    )
    SELECT CAST(min(k) AS BIGINT) AS k_min,
           CAST(count(*) AS BIGINT) AS n_classes,
           CAST(sum(CASE WHEN k = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_singletons,
           CAST(sum(CASE WHEN k < 5 THEN k ELSE 0 END) AS BIGINT)
             AS n_rows_at_risk,
           round(sum(CASE WHEN k < 5 THEN k ELSE 0 END) * 1.0 / sum(k), 4)
             AS risk_share,
           round(avg(k * 1.0), 4) AS avg_class_size
    FROM cls
    """,
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the customer table: rows grouped by the
    quasi-identifier triple (nation, market segment, $1000 balance
    band) form equivalence classes; any class smaller than k = 5 means
    those rows are re-identifiable by an attacker who knows the QI
    values — the release-gating check privacy review runs before a
    dataset ships, and the companion to the redaction pass
    (``pii_redact_docs``): scrubbing direct identifiers is not enough
    if the quasi-identifiers single people out.

    Scale shape: one map-side-combined groupBy on the QI key, then a
    scalar rollup of the (class-count-sized) result — the audit of a
    100 TB table moves class counts, not rows.  ``risk_share`` is an
    exact integer ratio; ``floor`` on a double band edge is IEEE-
    identical in both engines."""
    cust = load_table(spark, sf_dir, "customer")
    cls = cust.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_band"),
    ).agg(F.count(F.lit(1)).alias("k"))
    at_risk = F.sum(F.when(F.col("k") < 5, F.col("k")).otherwise(0))
    return cls.agg(
        F.min("k").cast("long").alias("k_min"),
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.sum(F.when(F.col("k") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_singletons"),
        at_risk.cast("long").alias("n_rows_at_risk"),
        F.round(at_risk * 1.0 / F.sum("k"), 4).alias("risk_share"),
        F.round(F.avg(F.col("k") * 1.0), 4).alias("avg_class_size"),
    )


# --------------------------------------------------------------------------
# Benford's-law first-digit screen: the forensic data-quality test
# --------------------------------------------------------------------------
@query(
    "benford_digit_test",
    """
    WITH digits AS MATERIALIZED (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
                         1, 1) AS INT) AS d
      FROM orders WHERE o_totalprice >= 1
    ),
    obs AS (
      SELECT d, count(*) AS n,
             count(*) * 1.0 / (SELECT count(*) FROM digits) AS share
      FROM digits GROUP BY d
    )
    SELECT d AS digit,
           CAST(n AS BIGINT) AS n,
           round(share, 4) AS obs_share,
           round(log10(1 + 1.0 / d), 4) AS benford_share,
           round((share - log10(1 + 1.0 / d))
                 * (share - log10(1 + 1.0 / d))
                 / log10(1 + 1.0 / d), 6) AS chi2_term
    FROM obs
    """,
)
def benford_digit_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit test on order totals — the forensic
    data-quality screen (fabricated or capped monetary data bends the
    leading-digit curve away from log10(1 + 1/d); auditors and
    anomaly pipelines both run exactly this).  Per digit: observed
    share vs Benford expectation and the χ² contribution — TPC-H's
    uniform price generator visibly VIOLATES Benford, which is the
    point: the screen flags synthetic data as synthetic.

    Scale shape: leading digit extracted arithmetic-free via
    int→string truncation pushed into one map-side-combined 9-key
    aggregate; the share denominator reuses the same aggregate
    subtree.  All ratios are exact-integer divisions rounded once."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") >= 1
    )
    digits = orders.select(
        F.substring(
            F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
        )
        .cast("int")
        .alias("d")
    )
    obs = digits.groupBy("d").agg(F.count(F.lit(1)).alias("n"))
    tot = obs.agg(F.sum("n").alias("t"))
    exp_share = F.log10(1 + 1.0 / F.col("d"))
    share = F.col("n") / F.col("t")
    return obs.crossJoin(F.broadcast(tot)).select(
        F.col("d").alias("digit"),
        F.col("n").cast("long").alias("n"),
        F.round(share, 4).alias("obs_share"),
        F.round(exp_share, 4).alias("benford_share"),
        F.round(
            (share - exp_share) * (share - exp_share) / exp_share, 6
        ).alias("chi2_term"),
    )


# --------------------------------------------------------------------------
# two-sample Kolmogorov-Smirnov: doc-length drift between sources
# --------------------------------------------------------------------------
@query(
    "ks_test_doc_length",
    """
    WITH ranked_src AS (
      SELECT source, count(*) AS n, row_number() OVER (
        ORDER BY count(*) DESC, source) AS r
      FROM documents GROUP BY source
    ),
    ab AS MATERIALIZED (
      SELECT (SELECT source FROM ranked_src WHERE r = 1) AS sa,
             (SELECT source FROM ranked_src WHERE r = 2) AS sb,
             (SELECT n FROM ranked_src WHERE r = 1) AS na,
             (SELECT n FROM ranked_src WHERE r = 2) AS nb
    ),
    vals AS MATERIALIZED (
      SELECT d.n_chars AS v,
             sum(CASE WHEN d.source = ab.sa THEN 1 ELSE 0 END) AS ca,
             sum(CASE WHEN d.source = ab.sb THEN 1 ELSE 0 END) AS cb
      FROM documents d, ab
      WHERE d.source = ab.sa OR d.source = ab.sb
      GROUP BY d.n_chars
    ),
    ecdf AS (
      SELECT v,
             sum(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
               * 1.0 / (SELECT na FROM ab) AS fa,
             sum(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
               * 1.0 / (SELECT nb FROM ab) AS fb
      FROM vals
    ),
    d AS (
      SELECT v, abs(fa - fb) AS diff,
             row_number() OVER (ORDER BY abs(fa - fb) DESC, v) AS r
      FROM ecdf
    )
    SELECT ab.sa AS source_a, ab.sb AS source_b,
           CAST(ab.na AS BIGINT) AS n_a, CAST(ab.nb AS BIGINT) AS n_b,
           round(d.diff, 6) AS ks_stat,
           CAST(d.v AS BIGINT) AS ks_at_value,
           round(2 * exp(-2.0 * d.diff * d.diff * ab.na * ab.nb
                         / (ab.na + ab.nb)), 6) AS p_approx
    FROM d, ab WHERE d.r = 1
    """,
)
def ks_test_doc_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov test on document length between
    the two largest sources — the nonparametric drift test that needs
    no binning choices (unlike PSI, which this complements: PSI says
    how much the histograms moved, KS says whether the distributions
    differ at all, and where).

    Scale shape: the two empirical CDFs are cumulative sums over the
    DISTINCT-value frame (counts grouped per value first — the only
    fact-sized shuffle), so D = max|F₁−F₂| is a window pass over
    ~10³ rows.  ECDF steps are exact integer ratios, making the
    argmax engine-stable with a value tie-break; the asymptotic
    p-value (first Kolmogorov term) is one deterministic double
    expression."""
    docs = load_table(spark, sf_dir, "documents").select(
        "source", "n_chars"
    )
    top2 = (
        docs.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("source"))
        .limit(2)
        .collect()
    )
    if len(top2) < 2:
        # fewer than two sources: no pair to test, the oracle emits 0
        # rows — schema-preserving empty frame (round-12 sweep)
        return spark.createDataFrame(
            [],
            "source_a string, source_b string, n_a long, n_b long, "
            "ks_stat double, ks_at_value long, p_approx double",
        )
    (sa, na), (sb, nb) = (
        (top2[0]["source"], top2[0]["n"]),
        (top2[1]["source"], top2[1]["n"]),
    )
    vals = (
        docs.filter(F.col("source").isin(sa, sb))
        .groupBy(F.col("n_chars").alias("v"))
        .agg(
            F.sum(F.when(F.col("source") == sa, 1).otherwise(0)).alias(
                "ca"
            ),
            F.sum(F.when(F.col("source") == sb, 1).otherwise(0)).alias(
                "cb"
            ),
        )
    )
    wv = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    ecdf = vals.select(
        "v",
        (F.sum("ca").over(wv) * 1.0 / na).alias("fa"),
        (F.sum("cb").over(wv) * 1.0 / nb).alias("fb"),
    )
    wr = Window.orderBy(
        F.abs(F.col("fa") - F.col("fb")).desc(), F.asc("v")
    )
    best = (
        ecdf.withColumn("r", F.row_number().over(wr))
        .filter(F.col("r") == 1)
        .select("v", F.abs(F.col("fa") - F.col("fb")).alias("diff"))
    )
    return best.select(
        F.lit(sa).alias("source_a"),
        F.lit(sb).alias("source_b"),
        F.lit(na).cast("long").alias("n_a"),
        F.lit(nb).cast("long").alias("n_b"),
        F.round("diff", 6).alias("ks_stat"),
        F.col("v").cast("long").alias("ks_at_value"),
        F.round(
            2
            * F.exp(
                -2.0
                * F.col("diff")
                * F.col("diff")
                * na
                * nb
                / (na + nb)
            ),
            6,
        ).alias("p_approx"),
    )


@query(
    "crypto_shred_erasure",
    oracle="""
    WITH marked AS (
      SELECT c_mktsegment AS segment, c_name,
             CASE WHEN c_custkey % 7 = 0 THEN 1 ELSE 0 END AS erased
      FROM customer
    )
    SELECT segment,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(sum(erased) AS BIGINT) AS n_erased,
           CAST(sum(1 - erased) AS BIGINT) AS n_readable,
           min(CASE WHEN erased = 0 THEN c_name END) AS first_readable_name
    FROM marked
    GROUP BY segment
    ORDER BY segment
    """,
)
def crypto_shred_erasure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GDPR right-to-be-forgotten via CRYPTO-SHREDDING: PII columns are
    stored AES-encrypted under a per-user key; "erasure" deletes only
    the key row, after which the ciphertext is unreadable forever — the
    pattern that makes deletion O(|users|) instead of rewriting
    petabytes of immutable parquet.  This query runs the full loop in
    one plan: encrypt names under per-user AES-256 keys (ECB here so
    the driver oracle stays deterministic; production uses GCM),
    drop the keys of every 7th user, left-join the surviving keyring,
    decrypt what remains, and report per-segment erased/readable
    counts plus the first still-readable plaintext — which the oracle
    reproduces from the raw table, PROVING the encrypt→shred→decrypt
    loop is lossless for retained users and total for erased ones.

    Scale shape: the keyring is a per-user dimension (same key space
    as the data's user column — co-partitioned equi-join, or broadcast
    when it fits); encryption is a JVM codegen expression, no UDF."""
    cust = load_table(spark, sf_dir, "customer")
    key = F.substring(
        F.sha2(F.concat(F.lit("k"), F.col("c_custkey").cast("string")), 256),
        1,
        32,
    )
    enc = cust.select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        F.expr(
            "aes_encrypt(c_name, substring(sha2(concat('k', CAST(c_custkey"
            " AS STRING)), 256), 1, 32), 'ECB', 'PKCS') "
        ).alias("name_ct"),
    )
    keyring = (
        cust.select("c_custkey", key.alias("k"))
        .filter(F.col("c_custkey") % 7 != 0)  # the shred: keys deleted
    )
    joined = enc.join(keyring, "c_custkey", "left").select(
        "segment",
        F.when(
            F.col("k").isNotNull(),
            F.expr("CAST(aes_decrypt(name_ct, k, 'ECB', 'PKCS') AS STRING)"),
        ).alias("name_plain"),
    )
    return (
        joined.groupBy("segment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_total"),
            F.sum(F.when(F.col("name_plain").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_erased"),
            F.sum(F.when(F.col("name_plain").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_readable"),
            F.min("name_plain").alias("first_readable_name"),
        )
        .orderBy("segment")
    )


CRQ_CLASSES = 32


def _crq_text(j: int) -> str:
    """Template corpus for the compression-ratio query: class ``j`` is
    a repetition block (compressibility falls as the entropy tail
    grows) + a deterministic LCG character tail — a pure function of
    ``j``, identical on the driver (oracle baking) and the executors
    (the distributed synth UDF).  Spans ratios from boilerplate-spam
    territory (< 0.4) to near-incompressible."""
    rep = (f"lorem{j:02d} ipsum ") * (6 + 2 * ((CRQ_CLASSES - 1) - j))
    x, tail = (j * 2654435761) % (2**32), []
    for _ in range(30 + 25 * j):
        x = (1103515245 * x + 12345) % (2**31)
        tail.append(chr(33 + x % 94))
    return rep + "".join(tail)


def _crq_baked_values() -> str:
    """(class, raw_bytes, zlib_bytes) literals, zlib run ONCE
    driver-side at import — the PNG/IVF-codebook idiom: the oracle
    never touches bytes, so a drifted compressor level/strategy in the
    distributed path hash-mismatches instead of passing silently."""
    import zlib

    rows = []
    for j in range(CRQ_CLASSES):
        b = _crq_text(j).encode("utf-8")
        rows.append(f"({j}, {len(b)}, {len(zlib.compress(b, 6))})")
    return ", ".join(rows)


@query(
    "compression_ratio_quality",
    f"""
    WITH tmpl(cls, raw_b, zlib_b) AS (VALUES {_crq_baked_values()}),
    d AS (
      SELECT source, doc_id % {CRQ_CLASSES} AS cls FROM documents
    ),
    j AS (SELECT d.source, t.raw_b, t.zlib_b
          FROM d JOIN tmpl t ON t.cls = d.cls)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(raw_b) AS BIGINT) AS raw_bytes,
           CAST(sum(zlib_b) AS BIGINT) AS zlib_bytes,
           round(sum(zlib_b) * 1.0 / sum(raw_b) - 1e-9, 4) AS mean_ratio,
           round(sum(CASE WHEN zlib_b * 10 < raw_b * 4 THEN 1 ELSE 0 END)
                 * 1.0 / count(*) - 1e-9, 4) AS share_too_compressible,
           round(min(zlib_b * 1.0 / raw_b) - 1e-9, 4) AS min_ratio,
           round(max(zlib_b * 1.0 / raw_b) - 1e-9, 4) AS max_ratio
    FROM j GROUP BY source ORDER BY source
    """,
)
def compression_ratio_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compression-ratio quality signal (Gopher's repetition filter,
    Rae et al. 2021): zlib-compressed bytes / raw bytes per document —
    low ratios flag boilerplate/template spam, ratios near 1 flag
    high-entropy junk.  Rolled up per source: mean ratio (exact
    integer byte sums divided once), the share of documents under the
    0.4 "too compressible" red line, and min/max.

    Documents carry the deterministic 32-class template corpus
    (``doc_id % 32`` → :func:`_crq_text` — compressibility spread from
    spam to ciphertext) so the query is FULLY hash-checked: expected
    per-class sizes were zlib'd ONCE driver-side and baked as oracle
    literals (closing the round-9 rows-only gap — the oracle never
    compresses, so a wrong level/strategy in the distributed path
    mismatches).  The real-text behavior of the underlying
    :func:`..functions.text.zlib_size_arrow` stays pinned by the
    direction/determinism property tests (`tests/test_wave9.py`).

    Scale shape: synth + compress are two Arrow-batched pandas UDF
    passes; everything else — octet_length, the ratio, the rollup —
    stays JVM-side, and the rollup shuffles only (source, byte-count)
    pairs."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    from ..functions.text import zlib_size_arrow

    # no type hints: `from __future__ import annotations` stringifies
    # them and the eval-type inferencer rejects string signatures
    @pandas_udf(StringType(), "scalar")
    def tmpl_text(cls):
        return cls.map(lambda j: _crq_text(int(j)))

    docs = load_table(spark, sf_dir, "documents").select(
        "source", tmpl_text(F.col("doc_id") % CRQ_CLASSES).alias("text")
    )
    scored = docs.select(
        "source",
        F.octet_length("text").cast("long").alias("raw_bytes"),
        zlib_size_arrow("text").cast("long").alias("zlib_bytes"),
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("raw_bytes").cast("long").alias("raw_bytes"),
            F.sum("zlib_bytes").cast("long").alias("zlib_bytes"),
            F.round(
                F.sum("zlib_bytes") / F.sum("raw_bytes") - 1e-9, 4
            ).alias("mean_ratio"),
            F.round(
                F.sum(
                    (
                        F.col("zlib_bytes") * 10
                        < F.col("raw_bytes") * 4
                    ).cast("int")
                )
                * 1.0
                / F.count(F.lit(1))
                - 1e-9,
                4,
            ).alias("share_too_compressible"),
            F.round(
                F.min(F.col("zlib_bytes") * 1.0 / F.col("raw_bytes"))
                - 1e-9,
                4,
            ).alias("min_ratio"),
            F.round(
                F.max(F.col("zlib_bytes") * 1.0 / F.col("raw_bytes"))
                - 1e-9,
                4,
            ).alias("max_ratio"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Mondrian k-anonymity generalization
# --------------------------------------------------------------------------
MONDRIAN_K = 25
MONDRIAN_LEVELS = 3

_MONDRIAN_LEVEL = """
, stats{lvl} AS (
  SELECT *,
         count(*) OVER wn AS n,
         max(q1) OVER wn - min(q1) OVER wn AS r1,
         max(q2) OVER wn - min(q2) OVER wn AS r2,
         row_number() OVER (PARTITION BY node ORDER BY q1, uid) AS rk1,
         row_number() OVER (PARTITION BY node ORDER BY q2, uid) AS rk2
  FROM lvl{prev}
  WINDOW wn AS (PARTITION BY node)
),
med{lvl} AS (
  SELECT node,
         max(CASE WHEN rk1 = floor((n + 1) / 2.0) THEN q1 END) AS m1,
         max(CASE WHEN rk2 = floor((n + 1) / 2.0) THEN q2 END) AS m2,
         max(CASE WHEN r1 * {g2} >= r2 * {g1} THEN 1 ELSE 0 END) AS use_q1
  FROM stats{lvl} GROUP BY node
),
cand{lvl} AS (
  SELECT s.uid, s.q1, s.q2, s.node, s.n, m.use_q1,
         CASE WHEN m.use_q1 = 1 THEN s.q1 <= m.m1
              ELSE s.q2 <= m.m2 END AS go_left
  FROM stats{lvl} s JOIN med{lvl} m ON s.node = m.node
),
sizes{lvl} AS (
  SELECT node,
         CAST(sum(CASE WHEN go_left THEN 1 ELSE 0 END) AS BIGINT) AS nl,
         CAST(sum(CASE WHEN go_left THEN 0 ELSE 1 END) AS BIGINT) AS nr
  FROM cand{lvl} GROUP BY node
),
lvl{lvl} AS (
  SELECT c.uid, c.q1, c.q2,
         CASE WHEN z.nl >= {k} AND z.nr >= {k}
              THEN c.node || (CASE WHEN c.go_left THEN 'L' ELSE 'R' END)
              ELSE c.node END AS node
  FROM cand{lvl} c JOIN sizes{lvl} z ON c.node = z.node
)
"""


def _mondrian_sql(table: str) -> str:
    """Shared ANSI SQL for Mondrian (both engines run this text)."""
    body = f"""
WITH pts AS (
  SELECT c_custkey AS uid,
         CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS q1,
         CAST(c_custkey % 199 AS BIGINT) AS q2
  FROM {table}
),
g AS (
  SELECT max(q1) - min(q1) AS g1, max(q2) - min(q2) AS g2 FROM pts
),
lvl0 AS (
  SELECT uid, q1, q2, '*' AS node FROM pts
)"""
    for lvl in range(1, MONDRIAN_LEVELS + 1):
        body += _MONDRIAN_LEVEL.format(
            lvl=lvl,
            prev=lvl - 1,
            k=MONDRIAN_K,
            g1="(SELECT g1 FROM g)",
            g2="(SELECT g2 FROM g)",
        )
    body += f"""
SELECT node,
       CAST(count(*) AS BIGINT) AS n,
       CAST(min(q1) AS BIGINT) AS q1_min, CAST(max(q1) AS BIGINT) AS q1_max,
       CAST(min(q2) AS BIGINT) AS q2_min, CAST(max(q2) AS BIGINT) AS q2_max,
       count(*) >= {MONDRIAN_K} AS k_ok,
       CAST(count(*) * count(*) AS BIGINT) AS discernibility
FROM lvl{MONDRIAN_LEVELS}
GROUP BY node ORDER BY node
"""
    return body


@query("mondrian_k_anonymize", _mondrian_sql("customer"))
def mondrian_k_anonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mondrian multidimensional k-anonymity (LeFevre et al. ICDE'06)
    — the GENERALIZATION half that the ``k_anonymity_audit`` only
    measures: recursively split the quasi-identifier space (account
    balance × a synthetic second QI) on the in-node low median of the
    widest normalized dimension, refusing any split that would leave a
    child below k={MONDRIAN_K}; leaves become the published
    equivalence classes, reported with their bounds and the
    discernibility-metric Σn² cost.

    Every decision is exact-integer (cross-multiplied range
    comparison, rank-based low median, integer child counts), so both
    engines take IDENTICAL splits at every level — the whole
    depth-{MONDRIAN_LEVELS} partition tree is hash-checked, not just
    the leaf counts.  Scale shape: each level is one window pass over
    the points partitioned by node (node count ≤ 2^level); levels are
    staged CTEs, so the plan is {MONDRIAN_LEVELS} shuffles of the
    points frame — never a driver loop over nodes."""
    # Spark inlines chained CTEs (each level references its
    # predecessor three times -> 3^levels plan blowup, measured 16 s at
    # sf0.1), so the Spark path stages one level at a time over
    # localCheckpointed temp views; the DuckDB oracle keeps the single
    # recursive text.  Same math, same splits.
    pts = load_table(spark, sf_dir, "customer").selectExpr(
        "c_custkey AS uid",
        "CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS q1",
        "CAST(c_custkey % 199 AS BIGINT) AS q2",
    )
    g = pts.selectExpr(
        "max(q1) - min(q1) AS g1", "max(q2) - min(q2) AS g2"
    ).collect()[0]
    if g.g1 is None:
        # empty point set: no global ranges to normalize splits by and
        # the oracle emits 0 rows (round-12 degenerate sweep)
        return spark.createDataFrame(
            [],
            "node string, n long, q1_min long, q1_max long, "
            "q2_min long, q2_max long, k_ok boolean, discernibility long",
        )
    lvl = pts.selectExpr("uid", "q1", "q2", "'*' AS node").localCheckpoint()
    for _ in range(MONDRIAN_LEVELS):
        lvl.createOrReplaceTempView("mondrian_lvl_prev")
        lvl = spark.sql(
            _MONDRIAN_LEVEL.format(
                lvl=1, prev="_PREV", k=MONDRIAN_K,
                g1=int(g["g1"]), g2=int(g["g2"]),
            )
            .replace("lvl_PREV", "mondrian_lvl_prev")
            .replace("\n, stats1 AS", "WITH stats1 AS", 1)
            + " SELECT uid, q1, q2, node FROM lvl1"
        ).localCheckpoint()
    lvl.createOrReplaceTempView("mondrian_final")
    return spark.sql(f"""
SELECT node,
       CAST(count(*) AS BIGINT) AS n,
       CAST(min(q1) AS BIGINT) AS q1_min, CAST(max(q1) AS BIGINT) AS q1_max,
       CAST(min(q2) AS BIGINT) AS q2_min, CAST(max(q2) AS BIGINT) AS q2_max,
       count(*) >= {MONDRIAN_K} AS k_ok,
       CAST(count(*) * count(*) AS BIGINT) AS discernibility
FROM mondrian_final
GROUP BY node ORDER BY node
""")


# --------------------------------------------------------------------------
# l-diversity audit: sensitive-attribute diversity inside QI classes
# --------------------------------------------------------------------------
@query(
    "l_diversity_audit",
    """
    WITH cls AS MATERIALIZED (
      SELECT c_nationkey,
             CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
             c_mktsegment, CAST(count(*) AS BIGINT) AS n
      FROM customer GROUP BY 1, 2, 3
    ),
    per AS MATERIALIZED (
      SELECT c_nationkey, bal_band,
             CAST(sum(n) AS BIGINT) AS class_n,
             CAST(count(*) AS BIGINT) AS distinct_l,
             ln(CAST(sum(n) AS DOUBLE))
               - sum(n * ln(CAST(n AS DOUBLE))) / sum(n) AS h
      FROM cls GROUP BY 1, 2
    )
    SELECT CAST(count(*) AS BIGINT) AS n_classes,
           CAST(min(distinct_l) AS BIGINT) AS l_min,
           round(min(exp(h)) - 1e-9, 4) + 0.0 AS entropy_l_min,
           CAST(sum(CASE WHEN distinct_l < 3 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_classes_below_3,
           round(sum(CASE WHEN distinct_l < 3 THEN class_n ELSE 0 END)
                 * 1.0 / sum(class_n) - 1e-9, 4) + 0.0 AS rows_at_risk_share
    FROM per
    """,
)
def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit — the attack k-anonymity misses: a QI class
    of size 50 is useless if all 50 share one sensitive value
    (homogeneity attack).  Over QI = (nation, $1000 balance band) with
    the market segment as the sensitive attribute, reports distinct-l
    (min distinct sensitive values per class) and entropy-l
    (min exp(H) — Machanavajjhala et al.'s stricter form that a
    99:1 skewed class fails even with 2 distinct values), companion to
    ``k_anonymity_audit`` / ``mondrian_k_anonymity``.

    Scale shape: one (QI, sensitive) groupBy, then a class-sized
    rollup — the entropy needs no window because
    H = ln(Σn) − Σ n·ln n / Σn is one aggregate over exact integer
    counts."""
    cust = load_table(spark, sf_dir, "customer")
    cls = cust.groupBy(
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_band"),
        "c_mktsegment",
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    n = F.col("n")
    per = cls.groupBy("c_nationkey", "bal_band").agg(
        F.sum("n").cast("long").alias("class_n"),
        F.count(F.lit(1)).cast("long").alias("distinct_l"),
        (
            F.log(F.sum("n").cast("double"))
            - F.sum(n * F.log(n.cast("double"))) / F.sum("n")
        ).alias("h"),
    )
    return per.agg(
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.min("distinct_l").cast("long").alias("l_min"),
        (F.round(F.min(F.exp("h")) - 1e-9, 4) + 0.0).alias(
            "entropy_l_min"
        ),
        F.sum(F.when(F.col("distinct_l") < 3, 1).otherwise(0))
        .cast("long")
        .alias("n_classes_below_3"),
        (
            F.round(
                F.sum(
                    F.when(
                        F.col("distinct_l") < 3, F.col("class_n")
                    ).otherwise(0)
                )
                * 1.0
                / F.sum("class_n")
                - 1e-9,
                4,
            )
            + 0.0
        ).alias("rows_at_risk_share"),
    )


# --------------------------------------------------------------------------
# t-closeness audit: EMD between class and global sensitive distributions
# --------------------------------------------------------------------------
@query(
    "t_closeness_audit",
    """
    WITH s AS (
      SELECT c_nationkey, c_mktsegment,
             ntile(10) OVER (ORDER BY c_acctbal, c_custkey) - 1 AS dec
      FROM customer
    ),
    cell AS MATERIALIZED (
      SELECT c_nationkey, c_mktsegment, dec,
             CAST(count(*) AS BIGINT) AS n
      FROM s GROUP BY 1, 2, 3
    ),
    cls AS MATERIALIZED (
      SELECT c_nationkey, c_mktsegment, CAST(sum(n) AS BIGINT) AS cn
      FROM cell GROUP BY 1, 2
    ),
    gdist AS MATERIALIZED (
      SELECT dec, CAST(sum(n) AS BIGINT) AS gn FROM cell GROUP BY dec
    ),
    tot AS (SELECT CAST(sum(gn) AS BIGINT) AS t FROM gdist),
    gcum AS MATERIALIZED (
      -- global CDF on the 10-row decile frame, BEFORE the grid fanout
      SELECT dec, sum(gn) OVER (ORDER BY dec ROWS UNBOUNDED PRECEDING)
               * 1.0 AS cgn
      FROM gdist
    ),
    grid AS (
      SELECT cls.c_nationkey, cls.c_mktsegment, cls.cn, gcum.dec,
             gcum.cgn, coalesce(cell.n, 0) AS n
      FROM cls CROSS JOIN gcum
      LEFT JOIN cell ON cell.c_nationkey = cls.c_nationkey
                    AND cell.c_mktsegment = cls.c_mktsegment
                    AND cell.dec = gcum.dec
    ),
    cum AS (
      SELECT c_nationkey, c_mktsegment, cn, dec, cgn,
             sum(n * 1.0 / cn) OVER (
               PARTITION BY c_nationkey, c_mktsegment ORDER BY dec
               ROWS UNBOUNDED PRECEDING) AS cp,
             dec < 9 AS inner_edge
      FROM grid
    ),
    emd AS MATERIALIZED (
      SELECT c_nationkey, c_mktsegment, cn,
             round(sum(CASE WHEN inner_edge
                            THEN abs(cp - cgn / tot.t) ELSE 0 END)
                   / 9 - 1e-9, 6) + 0.0 AS emd
      FROM cum CROSS JOIN tot
      GROUP BY 1, 2, cn, tot.t
    ),
    worst AS (
      SELECT * FROM (
        SELECT c_nationkey, c_mktsegment, cn, emd,
               row_number() OVER (ORDER BY emd DESC, c_nationkey,
                                  c_mktsegment) AS rn
        FROM emd
      ) WHERE rn = 1
    )
    SELECT CAST((SELECT count(*) FROM emd) AS BIGINT) AS n_classes,
           worst.emd AS t_closeness,
           worst.c_nationkey AS worst_nationkey,
           worst.c_mktsegment AS worst_segment,
           worst.cn AS worst_class_n,
           round((SELECT avg(emd) FROM emd) - 1e-9, 6) + 0.0 AS mean_emd
    FROM worst
    """,
)
def t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit — the attack l-diversity misses: a class can
    be diverse yet still leak if its sensitive DISTRIBUTION differs
    from the table's (skewness attack: "everyone in this class is in
    the top balance decile").  Sensitive attribute = account-balance
    decile (ordered); per QI class (nation, segment) the distance to
    the global distribution is the 1-D Earth Mover's Distance on the
    ordered deciles — Σ|CDF_class − CDF_global| over the 9 inner
    edges / 9, the ordered-attribute EMD of Li et al.  t = max over
    classes.

    Scale shape: the deciles are one global sort (reused rank
    machinery); after the (QI, decile) rollup everything lives on a
    classes×10 grid built by CROSS JOIN so empty cells exist (the
    Wasserstein grid lesson).  CDFs are ORDERED window sums (engine-
    identical); the per-class EMD is rounded to 6 BEFORE the max-rank
    so the worst-class pick cannot flip on a last-ulp difference."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.orderBy("c_acctbal", "c_custkey")
    s = cust.select(
        "c_nationkey",
        "c_mktsegment",
        (F.ntile(10).over(w) - 1).alias("dec"),
    )
    cell = s.groupBy("c_nationkey", "c_mktsegment", "dec").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    ).persist()
    cls = cell.groupBy("c_nationkey", "c_mktsegment").agg(
        F.sum("n").cast("long").alias("cn")
    )
    glob = cell.groupBy("dec").agg(F.sum("n").cast("long").alias("gn"))
    tot = glob.agg(F.sum("gn").cast("long").alias("t"))
    wg = Window.orderBy("dec").rowsBetween(Window.unboundedPreceding, 0)
    # global CDF on the 10-row decile frame, BEFORE the grid fanout
    gcum = glob.select("dec", (F.sum("gn").over(wg) * 1.0).alias("cgn"))
    grid = (
        cls.crossJoin(F.broadcast(gcum))
        .join(cell, ["c_nationkey", "c_mktsegment", "dec"], "left")
        .select(
            "c_nationkey",
            "c_mktsegment",
            "cn",
            "dec",
            "cgn",
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
        )
    )
    wc = (
        Window.partitionBy("c_nationkey", "c_mktsegment")
        .orderBy("dec")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = grid.select(
        "c_nationkey",
        "c_mktsegment",
        "cn",
        "dec",
        "cgn",
        F.sum(F.col("n") * 1.0 / F.col("cn")).over(wc).alias("cp"),
        (F.col("dec") < 9).alias("inner_edge"),
    )
    emd = (
        cum.crossJoin(F.broadcast(tot))
        .groupBy("c_nationkey", "c_mktsegment", "cn", "t")
        .agg(
            (
                F.round(
                    F.sum(
                        F.when(
                            F.col("inner_edge"),
                            F.abs(F.col("cp") - F.col("cgn") / F.col("t")),
                        ).otherwise(0.0)
                    )
                    / 9
                    - 1e-9,
                    6,
                )
                + 0.0
            ).alias("emd")
        )
        .persist()
    )
    worst = (
        emd.withColumn(
            "rn",
            F.row_number().over(
                Window.orderBy(
                    F.col("emd").desc(), "c_nationkey", "c_mktsegment"
                )
            ),
        )
        .filter(F.col("rn") == 1)
    )
    stats = emd.agg(
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        (F.round(F.avg("emd") - 1e-9, 6) + 0.0).alias("mean_emd"),
    )
    return worst.crossJoin(F.broadcast(stats)).select(
        "n_classes",
        F.col("emd").alias("t_closeness"),
        F.col("c_nationkey").alias("worst_nationkey"),
        F.col("c_mktsegment").alias("worst_segment"),
        F.col("cn").alias("worst_class_n"),
        "mean_emd",
    )
