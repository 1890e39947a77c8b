"""Deduplication operators for training-data pipelines.

Four tiers, in increasing recall / cost:

- exact (fingerprint group-by) — one shuffle on a 32-byte key;
- MinHash + LSH banding — the 100 TB near-dup workhorse: signature cost
  is linear in shingles, candidate generation shuffles only
  (band, hash) keys, and verification touches candidate pairs only;
- SimHash — per-row fingerprint, Hamming-bucket join;
- n-gram Jaccard via inverted index — exact pairwise overlap without a
  cross join (explode shingles → self-join on shingle → count), for
  bounded corpora or as the verify stage behind LSH.

All hashing is md5 (engine-portable, so DuckDB oracles are exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import fingerprint, tokens, word_shingles

DEFAULT_NUM_PERM = 16
DEFAULT_BANDS = 4  # 4 rows per band with 16 perms
CHUNKS_PER_MD5 = 4  # one 128-bit md5 yields four 32-bit (8-hex) hashes


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup on the normalized-text fingerprint: keep the lowest
    id per fingerprint.  Output: (fingerprint, keep_id, n_dups)."""
    return (
        df.select(F.col(id_col), fingerprint(text_col).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def doc_shingles(
    df: DataFrame, text_col: str, id_col: str, n: int = 3, distinct: bool = True
) -> DataFrame:
    """(id, shingle) pairs — the inverted-index input; distinct by
    default (required for exact Jaccard counts).

    ``distinct=False`` skips the corpus-wide shuffle of shingle strings —
    correct whenever the consumer is duplicate-insensitive (MinHash
    ``min``), which at 100 TB turns the signature stage's only big
    exchange into a map-side-combined (doc, partial-mins) shuffle.

    Tokenizes in its own projection so the shingling lambda sees a bound
    array attribute (see the perf note on :func:`..functions.text.word_shingles`)."""
    toks = df.select(F.col(id_col), tokens(text_col).alias("_toks"))
    out = toks.select(
        F.col(id_col), F.explode(word_shingles(F.col("_toks"), n)).alias("shingle")
    )
    return out.distinct() if distinct else out


def minhash_signatures(
    df: DataFrame | None,
    text_col: str,
    id_col: str,
    num_perm: int = DEFAULT_NUM_PERM,
    shingle_n: int = 3,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """MinHash signature per document.

    Permutation ``s`` is simulated by ``min`` over the doc's distinct
    shingles of an 8-hex-char slice of a salted md5: slice ``s % 4`` of
    ``md5((s // 4) || '|' || shingle)`` — one 128-bit md5 funds four
    independent 32-bit permutations, so 16 perms cost 4 md5 calls per
    shingle, not 16.  The md5s are projected once BEFORE the groupBy
    (no per-aggregate rehash) and all mins compute in ONE pass (single
    shuffle).  Pass ``shingles`` to reuse an already-built
    (id, shingle) set instead of re-exploding the corpus.

    When building its own shingles it skips the distinct — ``min`` is
    duplicate-insensitive, and with no distinct the groupBy's map-side
    partial aggregation means the only exchange carries one partial
    signature per (doc, partition), not the shingle strings themselves.
    """
    sh = (
        shingles
        if shingles is not None
        else doc_shingles(df, text_col, id_col, shingle_n, distinct=False)
    )
    n_salts = (num_perm + CHUNKS_PER_MD5 - 1) // CHUNKS_PER_MD5
    hashed = sh.select(
        id_col,
        *[
            F.md5(F.concat(F.lit(f"{i}|"), F.col("shingle"))).alias(f"h{i}")
            for i in range(n_salts)
        ],
    )
    aggs = [
        F.min(
            F.substring(
                F.col(f"h{s // CHUNKS_PER_MD5}"), (s % CHUNKS_PER_MD5) * 8 + 1, 8
            )
        ).alias(f"mh{s}")
        for s in range(num_perm)
    ]
    return hashed.groupBy(id_col).agg(*aggs)


def lsh_band_buckets(
    signatures: DataFrame,
    id_col: str,
    num_perm: int = DEFAULT_NUM_PERM,
    bands: int = DEFAULT_BANDS,
) -> DataFrame:
    """Band-hash each signature: one row per (doc, band) with the band's
    combined hash — the LSH bucket assignment.  Output: (id, band_idx, h)."""
    rows = num_perm // bands
    band_cols = [
        F.md5(F.concat(*[F.col(f"mh{b * rows + r}") for r in range(rows)])).alias(
            f"band{b}"
        )
        for b in range(bands)
    ]
    banded = signatures.select(F.col(id_col), *band_cols)
    return banded.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band_idx"), F.col(f"band{b}").alias("h"))
                    for b in range(bands)
                ]
            )
        ).alias("bh"),
    ).select(id_col, "bh.band_idx", "bh.h")


def lsh_candidate_pairs(
    signatures: DataFrame | None = None,
    id_col: str = "doc_id",
    num_perm: int = DEFAULT_NUM_PERM,
    bands: int = DEFAULT_BANDS,
    buckets: DataFrame | None = None,
) -> DataFrame:
    """LSH banding: docs sharing any band hash become a candidate pair.
    The self-join key is (band_idx, band_hash) — cardinality ~docs×bands,
    never pairwise.  Pass ``buckets`` (from :func:`lsh_band_buckets`) to
    reuse an existing bucket assignment within one plan.
    Output: (id_a, id_b) distinct with id_a < id_b."""
    stacked = (
        buckets
        if buckets is not None
        else lsh_band_buckets(signatures, id_col, num_perm, bands)
    )
    a = stacked.alias("a")
    b = stacked.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.h") == F.col("b.h"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def lsh_candidate_docs(buckets: DataFrame, id_col: str) -> DataFrame:
    """Docs appearing in any bucket shared with another doc — exactly the
    docs that occur in some candidate pair, derived WITHOUT the pair
    join: count distinct docs per bucket, keep buckets with ≥2.  One agg
    over the bucket rows; used to pre-filter the verify stage."""
    hot = (
        buckets.groupBy("band_idx", "h")
        .agg(F.count_distinct(F.col(id_col)).alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
        .select("band_idx", "h")
    )
    return (
        buckets.join(F.broadcast(hot), ["band_idx", "h"], "left_semi")
        .select(id_col)
        .distinct()
    )


def jaccard_pairs(
    shingles: DataFrame,
    id_col: str = "doc_id",
    min_jaccard: float = 0.5,
    candidates: DataFrame | None = None,
    candidate_docs: DataFrame | None = None,
    prefiltered: bool = False,
) -> DataFrame:
    """Exact n-gram Jaccard via inverted index: self-join distinct
    (id, shingle) on shingle, count the intersection, derive the union
    from per-doc sizes.  With LSH outputs given, the shingle set is
    semi-joined down to ``candidate_docs`` BEFORE the pairwise join —
    the whole point of LSH is that the verify stage never touches
    non-candidate docs — and the resulting pairs are inner-filtered to
    exactly the ``candidates`` pairs.  Derive ``candidate_docs`` via
    :func:`lsh_candidate_docs` (an agg, not the pair join) so each LSH
    stage has a single consumer and the whole dedup is ONE Spark plan.
    ``prefiltered=True`` says the caller already restricted ``shingles``
    to candidate docs — skip the semi-join, keep the pair filter.
    Output: (id_a, id_b, n_common, n_a, n_b, jaccard)."""
    if prefiltered:
        pass
    elif candidate_docs is not None:
        shingles = shingles.join(F.broadcast(candidate_docs), id_col, "left_semi")
    elif candidates is not None:
        cand_ids = (
            candidates.select(F.col("id_a").alias(id_col))
            .unionByName(candidates.select(F.col("id_b").alias(id_col)))
            .distinct()
        )
        shingles = shingles.join(F.broadcast(cand_ids), id_col, "left_semi")
    sizes = shingles.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = shingles.alias("sa")
    b = shingles.alias("sb")
    common = (
        a.join(
            b,
            (F.col("sa.shingle") == F.col("sb.shingle"))
            & (F.col(f"sa.{id_col}") < F.col(f"sb.{id_col}")),
        )
        .groupBy(
            F.col(f"sa.{id_col}").alias("id_a"),
            F.col(f"sb.{id_col}").alias("id_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    if candidates is not None:
        common = common.join(F.broadcast(candidates), ["id_a", "id_b"], "left_semi")
    sz_a = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sz_b = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    # no broadcast hint: `common` (surviving pairs) is usually the small
    # side and AQE will broadcast it; `sizes` scales with the corpus
    out = (
        common.join(sz_a, "id_a")
        .join(sz_b, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                4,
            ),
        )
    )
    return out.filter(F.col("jaccard") >= min_jaccard).select(
        "id_a", "id_b", "n_common", "n_a", "n_b", "jaccard"
    )
