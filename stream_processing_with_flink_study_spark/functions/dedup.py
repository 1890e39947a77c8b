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

from .text import fingerprint, word_shingles

DEFAULT_NUM_PERM = 16
DEFAULT_BANDS = 4  # 4 rows per band with 16 perms


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


def doc_shingles(df: DataFrame, text_col: str, id_col: str, n: int = 3) -> DataFrame:
    """Distinct (id, shingle) pairs — the inverted-index input."""
    return (
        df.select(F.col(id_col), F.explode(word_shingles(text_col, n)).alias("shingle"))
        .distinct()
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_perm: int = DEFAULT_NUM_PERM,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash signature per document: permutation s is simulated by
    ``min(md5(s || '|' || shingle))`` over the doc's distinct shingles —
    md5 keeps it engine-portable and string-min is a plain aggregate, so
    all ``num_perm`` mins compute in ONE groupBy pass (single shuffle)."""
    sh = doc_shingles(df, text_col, id_col, shingle_n)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{s}|"), F.col("shingle")))).alias(f"mh{s}")
        for s in range(num_perm)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str,
    num_perm: int = DEFAULT_NUM_PERM,
    bands: int = DEFAULT_BANDS,
) -> DataFrame:
    """LSH banding: hash each band of the signature; docs sharing any
    band hash become a candidate pair.  The self-join key is
    (band_idx, band_hash) — cardinality ~docs×bands, never pairwise.
    Output: (id_a, id_b) distinct with id_a < id_b."""
    rows = num_perm // bands
    band_cols = [
        F.md5(F.concat(*[F.col(f"mh{b * rows + r}") for r in range(rows)])).alias(
            f"band{b}"
        )
        for b in range(bands)
    ]
    banded = signatures.select(F.col(id_col), *band_cols)
    stacked = banded.select(
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


def jaccard_pairs(
    shingles: DataFrame,
    id_col: str = "doc_id",
    min_jaccard: float = 0.5,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard via inverted index: self-join distinct
    (id, shingle) on shingle, count the intersection, derive the union
    from per-doc sizes.  With ``candidates`` given (e.g. from LSH), the
    join is semi-filtered to candidate pairs first — the verify stage.
    Output: (id_a, id_b, n_common, n_a, n_b, jaccard)."""
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
        common = common.join(candidates, ["id_a", "id_b"], "left_semi")
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
