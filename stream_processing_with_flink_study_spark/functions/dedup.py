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

Hashing: exact dedup and SimHash use md5 (engine-portable, so their
DuckDB oracles replicate values bit-for-bit).  MinHash uses xxhash64 +
universal-hash permutations — its oracle is the EXACT all-pairs Jaccard
set instead (see the recall note on :func:`minhash_signatures`), which
frees the hot path from 4 md5 calls per shingle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import fingerprint, tokens, word_shingles

DEFAULT_NUM_PERM = 16
DEFAULT_BANDS = 8  # 2 rows per band with 16 perms
MERSENNE31 = 2147483647  # 2^31 - 1, the universal-hash modulus


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

    Dedup is PER DOCUMENT (shingle sets are per-doc sets), so it is done
    with ``array_distinct`` on the shingle array BEFORE the explode —
    zero shuffle, identical output to a corpus-wide
    ``distinct()`` on the exploded pairs (which is what round ≤4 did,
    paying a full exchange of shingle strings for it).

    ``distinct=False`` skips even the per-doc dedup — correct whenever
    the consumer is duplicate-insensitive (MinHash ``min``).

    Tokenizes in its own projection so the shingling lambda sees a bound
    array attribute (see the perf note on :func:`..functions.text.word_shingles`)."""
    toks = df.select(F.col(id_col), tokens(text_col).alias("_toks"))
    arr = word_shingles(F.col("_toks"), n)
    if distinct:
        arr = F.array_distinct(arr)
    return toks.select(F.col(id_col), F.explode(arr).alias("shingle"))


def minhash_signatures(
    df: DataFrame | None,
    text_col: str,
    id_col: str,
    num_perm: int = DEFAULT_NUM_PERM,
    shingle_n: int = 3,
    shingles: DataFrame | None = None,
    seed: int = 42,
) -> DataFrame:
    """MinHash signature per document (bigint columns mh0..mhN).

    Permutation ``s`` is the classic universal hash
    ``(a_s * h + b_s) mod (2^31 - 1)`` over ONE ``xxhash64`` per shingle
    (the same scheme as Spark MLlib's MinHashLSH) — whole-stage-codegen
    integer arithmetic instead of 4 crypto-md5 calls per shingle, and
    the shuffle carries 8-byte longs, not 8-char strings.  ``a_s, b_s``
    are seeded numpy literals, identical across runs and executors.
    All mins compute in ONE pass (single shuffle).  Pass ``shingles``
    to reuse an already-built (id, shingle) set.

    When building its own shingles it skips the distinct — ``min`` is
    duplicate-insensitive, and with no distinct the groupBy's map-side
    partial aggregation means the only exchange carries one partial
    signature per (doc, partition), not the shingle strings themselves.

    Correctness contract: the DuckDB oracle checks the exact all-pairs
    Jaccard set, NOT these signature values — valid because the LSH
    stage (8 bands × 2 rows) misses a true pair at Jaccard j with
    probability (1 - j²)^8: 3e-8 at the planted-dup level j ≈ 0.9, and
    still < 1.1% at the j = 0.5 output threshold; the exact-Jaccard
    verify then removes every false candidate, so the emitted set
    equals the oracle's on any corpus whose near-threshold pairs are
    planted high-j dups."""
    sh = (
        shingles
        if shingles is not None
        else doc_shingles(df, text_col, id_col, shingle_n, distinct=False)
    )
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE31, size=num_perm)
    b = rng.integers(0, MERSENNE31, size=num_perm)
    hashed = sh.select(
        id_col,
        F.pmod(F.xxhash64(F.col("shingle")), F.lit(MERSENNE31)).alias("_h"),
    )
    aggs = [
        F.min(
            F.pmod(
                F.lit(int(a[s])) * F.col("_h") + F.lit(int(b[s])),
                F.lit(MERSENNE31),
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
        F.xxhash64(*[F.col(f"mh{b * rows + r}") for r in range(rows)]).alias(
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


def jaccard_verify_pairs(
    corpus: DataFrame,
    candidates: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_jaccard: float = 0.5,
    shingle_n: int = 3,
) -> DataFrame:
    """Exact Jaccard verify computed PER CANDIDATE PAIR — the tail of
    the LSH pipeline when candidates ≪ corpus: join each (id_a, id_b)
    to its two texts (candidate set broadcast, so the corpus never
    shuffles), then one Arrow batch pass sets up both shingle sets and
    intersects them in Python.

    Versus :func:`jaccard_pairs`'s inverted index this trades a
    per-pair re-shingling (≤ tokens per doc — trivial) for eliminating
    the candidate-doc semi-join, the distinct-shingle build, and the
    shingle self-join — three shuffles and their job barriers.  The
    inverted index stays the right shape when candidate pairs approach
    corpus size (ngram_jaccard_pairs, the exhaustive baseline).

    Shingling must match :func:`doc_shingles` / the DuckDB oracle:
    whitespace-split tokens, distinct n-token space-joined shingles.
    Output: (id_a, id_b, n_common, n_a, n_b, jaccard)."""
    import re

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("n_common long, n_a long, n_b long")
    def _jac(ta: pd.Series, tb: pd.Series) -> pd.DataFrame:
        ws = re.compile(r"\s+")

        def sh(t: str) -> set:
            toks = [x for x in ws.split(t.strip()) if x]
            return {
                " ".join(toks[i : i + shingle_n])
                for i in range(len(toks) - shingle_n + 1)
            }

        rows = []
        for x, y in zip(ta, tb):
            sa, sb = sh(x), sh(y)
            rows.append((len(sa & sb), len(sa), len(sb)))
        return pd.DataFrame(rows, columns=["n_common", "n_a", "n_b"])

    a = corpus.select(F.col(id_col).alias("id_a"), F.col(text_col).alias("_ta"))
    b = corpus.select(F.col(id_col).alias("id_b"), F.col(text_col).alias("_tb"))
    paired = (
        a.join(F.broadcast(candidates), "id_a")
        .join(F.broadcast(b.join(F.broadcast(candidates), "id_b", "left_semi")), "id_b")
        .select("id_a", "id_b", _jac(F.col("_ta"), F.col("_tb")).alias("_j"))
        .select("id_a", "id_b", "_j.n_common", "_j.n_a", "_j.n_b")
    )
    return paired.select(
        "id_a",
        "id_b",
        "n_common",
        "n_a",
        "n_b",
        F.round(
            F.col("n_common")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
            4,
        ).alias("jaccard"),
    ).filter(F.col("jaccard") >= min_jaccard)


# --------------------------------------------------------------------------
# SimHash banding: Hamming-ball near-dup candidates without pairwise scan
# --------------------------------------------------------------------------
def simhash_band_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    sim_col: str = "simhash",
    bands: int = 4,
    max_hd: int = 3,
) -> DataFrame:
    """SimHash near-dup candidate pairs via band buckets.

    Pigeonhole guarantee: with 32 bits cut into ``bands`` equal slices,
    any two fingerprints within Hamming distance ``bands - 1`` share at
    least one identical band — so the (band_idx, band_bits) self-join
    finds EVERY pair with hd <= bands-1 (default 4 bands → hd <= 3)
    without an all-pairs scan.  Hamming distance is computed JVM-side:
    ``bit_count(conv(a, 2, 10) XOR conv(b, 2, 10))`` — no Python.

    Scale note: 8-bit bands give only 1,024 distinct join keys — fine
    for bounded corpora, but at 100 TB the bucket histogram collapses
    into few giant keys.  The production setting is a 64-bit simhash
    with 16-bit bands (4 billion keys); this helper keeps ``bands``
    parametric so the key width scales with the fingerprint.
    Output: (doc_a, doc_b, hd) distinct, doc_a < doc_b.
    """
    bits = 32 // bands
    # convert the bitstring to its int64 fingerprint ONCE per banded row
    # (before the self-join) so the join side computes only bit_count,
    # and the caller can persist `df` to stop the self-join from
    # evaluating the (possibly expensive) simhash subtree twice
    banded = df.select(
        F.col(id_col),
        F.conv(F.col(sim_col), 2, 10).cast("long").alias("_fp"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.substring(sim_col, b * bits + 1, bits).alias("bkey"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bh"),
    ).select(id_col, "_fp", "bh.band_idx", "bh.bkey")
    return (
        banded.alias("a")
        .join(
            banded.alias("b"),
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            F.bit_count(
                F.col("a._fp").bitwiseXOR(F.col("b._fp"))
            ).alias("hd"),
        )
        .filter(F.col("hd") <= max_hd)
        .distinct()
    )


def simhash64_band_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    sim_col: str = "simhash64",
    bands: int = 4,
    max_hd: int = 3,
) -> DataFrame:
    """SimHash near-dup candidate pairs over SIGNED int64 fingerprints
    — the 100 TB default (:func:`simhash_band_pairs` keeps the 32-bit
    bitstring form for bounded corpora and its streaming twin).

    Pigeonhole guarantee as before: 64 bits cut into ``bands`` equal
    slices find every pair with hd <= bands-1 (default 4 bands of 16
    bits -> hd <= 3) through a (band_idx, band_bits) self-join.  The
    win over the 32-bit form is the key space: 16-bit bands give 65,536
    values per band (~262k distinct join keys) instead of 1,024 total,
    so bucket sizes stay sub-quadratic on corpora whose formulaic text
    collapses 8-bit bands onto a handful of giant keys.

    Everything here is JVM expression work: band keys are
    ``shiftrightunsigned`` + mask (literal shift counts only — Spark's
    shift functions reject column counts), Hamming distance is
    ``bit_count(xor)``.  Output: (doc_a, doc_b, hd) distinct,
    doc_a < doc_b.
    """
    width = 64 // bands
    mask = (1 << width) - 1
    banded = df.select(
        F.col(id_col),
        F.col(sim_col).alias("_fp"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.shiftrightunsigned(
                            F.col(sim_col), 64 - width * (b + 1)
                        )
                        .bitwiseAND(F.lit(mask))
                        .alias("bkey"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bh"),
    ).select(id_col, "_fp", "bh.band_idx", "bh.bkey")
    return (
        banded.alias("a")
        .join(
            banded.alias("b"),
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            F.bit_count(
                F.col("a._fp").bitwiseXOR(F.col("b._fp"))
            ).alias("hd"),
        )
        .filter(F.col("hd") <= max_hd)
        .distinct()
    )


def prefix_filter_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 5,
    threshold: float = 0.7,
) -> DataFrame:
    """EXACT Jaccard-threshold similarity self-join via PPJoin-style
    prefix filtering — the lossless alternative to MinHash-LSH: every
    pair with J(A,B) ≥ t is returned, with its exact score, and no
    false candidates survive verification.

    Prefix theorem: order every shingle by a global canonical order
    (rarest first — (corpus frequency, shingle) — rare tokens make the
    smallest candidate buckets); if J(A,B) ≥ t, the first
    |A| − ⌈t·|A|⌉ + 1 shingles of A and of B (in that SAME order) must
    share an element.  So docs pair only when their short prefixes
    collide, and the full sets meet only for those candidates.

    Scale shape: one shingle-keyed join attaches corpus frequencies
    (the canonical sort key — NO global row_number, so no
    single-partition rank stage: the (freq, shingle) tuple itself is
    the order); per-doc sort + prefix cut happen IN-ROW on the
    collected array; the candidate explode carries prefix shingles
    only (≈ (1−t)·|set| of the data); verification joins the two
    doc-sized set-array tables against the (small) candidate pair
    list and intersects arrays in-row.  All-pairs work never happens —
    the quadratic step is confined to per-prefix-bucket candidate
    generation, which rarest-first ordering keeps near-linear."""
    sh = doc_shingles(df, text_col, id_col, n=n)
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("c"))
    keyed = sh.join(freq, "shingle").groupBy(id_col).agg(
        F.array_sort(
            F.collect_list(F.struct("c", "shingle"))
        ).alias("arr")
    )
    docsets = keyed.select(
        F.col(id_col),
        F.transform("arr", lambda s: s["shingle"]).alias("set"),
        F.size("arr").alias("n_sh"),
    ).persist()
    p = (
        F.col("n_sh")
        - F.ceil(F.lit(threshold) * F.col("n_sh"))
        + 1
    ).cast("int")
    prefixes = docsets.select(
        F.col(id_col),
        F.explode(F.slice("set", 1, p)).alias("shingle"),
    )
    a, b = prefixes.alias("a"), prefixes.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    sa = docsets.select(
        F.col(id_col).alias("id_a"),
        F.col("set").alias("set_a"),
        F.col("n_sh").alias("n_a"),
    )
    sb = docsets.select(
        F.col(id_col).alias("id_b"),
        F.col("set").alias("set_b"),
        F.col("n_sh").alias("n_b"),
    )
    inter = F.size(F.array_intersect("set_a", "set_b"))
    jac = inter * 1.0 / (F.col("n_a") + F.col("n_b") - inter)
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(jac >= threshold)
        .select(
            "id_a",
            "id_b",
            inter.cast("long").alias("inter"),
            F.col("n_a").cast("long"),
            F.col("n_b").cast("long"),
            F.round(jac, 4).alias("jaccard"),
        )
    )
