"""Training-data pipeline operators (north-star extensions, SURVEY §7.2
step 9): dedup family, similarity search, text analysis, multimodal
plumbing — all over the driver's ``documents`` / ``embeddings`` tables.

Near-dup queries plant their own ground truth: the corpus is documents
UNION a perturbed copy (first token dropped, doc_id + 1_000_000) of
every 20th doc, so LSH/Jaccard must (and do) recover exactly those
pairs.  Exact-dedup plants verbatim copies at doc_id + 2_000_000.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import dedup, multimodal, packing, sampling, similarity, text
from ..sources import load_table
from .registry import query

NUM_PERM = dedup.DEFAULT_NUM_PERM
BANDS = dedup.DEFAULT_BANDS
ROWS_PER_BAND = NUM_PERM // BANDS


# --------------------------------------------------------------------------
# shared corpus builders (Spark + SQL twins)
# --------------------------------------------------------------------------
def _near_dup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + near-dup copies (drop first token) of every 20th doc."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.lower(F.trim("text")).alias("text")
    )
    toks = F.split(F.col("text"), r"\s+")
    perturbed = (
        docs.filter(F.col("doc_id") % 20 == 0)
        .select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            F.array_join(F.slice(toks, 2, F.size(toks) - 1), " ").alias("text"),
        )
    )
    return docs.unionByName(perturbed)


_NEAR_DUP_CORPUS_SQL = """
  corpus AS (
    SELECT doc_id, lower(trim(text)) AS text FROM documents
    UNION ALL
    SELECT doc_id + 1000000,
           array_to_string(tokens[2:], ' ')
    FROM (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS tokens
      FROM documents WHERE doc_id % 20 = 0
    )
  ),
  shingles AS (
    SELECT DISTINCT doc_id,
      unnest(list_transform(
        generate_series(1, greatest(len(tokens) - 2, 0)),
        i -> array_to_string(tokens[i:i+2], ' '))) AS shingle
    FROM (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS tokens
          FROM corpus)
  )
"""

_JACCARD_TAIL_SQL = """
  common AS (
    SELECT sa.doc_id AS id_a, sb.doc_id AS id_b, count(*) AS n_common
    FROM shingles sa
    JOIN shingles sb ON sa.shingle = sb.shingle AND sa.doc_id < sb.doc_id
    GROUP BY 1, 2
  ),
  sizes AS (SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY doc_id)
"""


@query(
    "exact_dedup_docs",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 2000000, text FROM documents WHERE doc_id % 10 = 0
    )
    SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint,
           min(doc_id) AS keep_id,
           count(*) AS n_dups
    FROM corpus
    GROUP BY 1
    """,
)
def exact_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup (hash-groupBy on the normalized-text fingerprint) over
    a corpus with planted verbatim duplicates — every 10th doc appears
    twice and must collapse to one keep_id with n_dups=2.  One shuffle on
    a 32-byte key regardless of document size."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    copies = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"), "text"
    )
    return dedup.exact_dedup(docs.unionByName(copies), "text", "doc_id")


@query(
    "minhash_lsh_near_dup",
    # oracle = the EXACT all-pairs Jaccard set: the LSH stage (8 bands ×
    # 2 rows) misses a true pair at jaccard j with prob (1-j²)^8 — 3e-8
    # at the planted-dup level — and the exact verify removes every
    # false candidate, so LSH output ≡ exact output on this corpus
    # (recall analysis on dedup.minhash_signatures)
    oracle=f"""
    WITH {_NEAR_DUP_CORPUS_SQL.strip().rstrip()},
    {_JACCARD_TAIL_SQL.strip()}
    SELECT c.id_a, c.id_b, c.n_common, a.n_sh AS n_a, b.n_sh AS n_b,
           round(c.n_common / (a.n_sh + b.n_sh - c.n_common), 4) AS jaccard
    FROM common c
    JOIN sizes a ON c.id_a = a.doc_id
    JOIN sizes b ON c.id_b = b.doc_id
    WHERE round(c.n_common / (a.n_sh + b.n_sh - c.n_common), 4) >= 0.5
    """,
)
def minhash_lsh_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup detection (shingle → 16 xxhash64-derived
    min-permutations → 8 LSH bands → band-bucket self-join →
    exact-Jaccard verify ≥ 0.5) over the planted near-dup corpus.

    Scale shape: the signature stage explodes shingles WITHOUT a
    distinct, so its groupBy's map-side partial aggregation makes the
    only corpus-wide exchange one partial signature per (doc, partition)
    — the shingle strings themselves never shuffle; candidate generation
    joins (band, hash) keys only — never pairwise; the verify stage
    computes exact Jaccard per candidate pair directly (candidates
    broadcast against the corpus, one Arrow pass), so the ~95% of the
    corpus LSH already cleared is never re-shingled, semi-joined, or
    self-joined."""
    corpus = _near_dup_corpus(spark, sf_dir)
    sig = dedup.minhash_signatures(corpus, "text", "doc_id")
    # the bucket rows feed both sides of the pair self-join; eager
    # persist pins the signature job so the two branches reuse it
    # instead of re-expanding lineage (8 rows/doc — tiny to cache)
    buckets = dedup.lsh_band_buckets(sig, "doc_id").persist()
    buckets.count()
    cands = dedup.lsh_candidate_pairs(buckets=buckets, id_col="doc_id")
    return dedup.jaccard_verify_pairs(corpus, cands, "text", "doc_id", 0.5)


@query(
    "ngram_jaccard_pairs",
    oracle=f"""
    WITH {_NEAR_DUP_CORPUS_SQL.strip()},
    {_JACCARD_TAIL_SQL.strip()}
    SELECT c.id_a, c.id_b, c.n_common, a.n_sh AS n_a, b.n_sh AS n_b,
           round(c.n_common / (a.n_sh + b.n_sh - c.n_common), 4) AS jaccard
    FROM common c
    JOIN sizes a ON c.id_a = a.doc_id
    JOIN sizes b ON c.id_b = b.doc_id
    WHERE round(c.n_common / (a.n_sh + b.n_sh - c.n_common), 4) >= 0.5
    """,
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard dedup via inverted index (explode shingles,
    self-join on shingle, count intersection) — no LSH pre-filter, the
    exhaustive baseline the LSH recall is judged against.  The (doc_id,
    shingle) inverted index feeds THREE consumers (both self-join sides
    + per-doc sizes), so it is persisted eagerly — without the persist
    each consumer re-derives it from the parquet scan (round 4's plan:
    8 scans / 10 exchanges; with it: 1 scan + cache reads, same
    pattern as bm25_scores).  Per-doc shingle dedup happens inside
    ``doc_shingles`` via ``array_distinct`` (zero shuffle — no
    corpus-wide distinct), and shingles are xxhash64-collapsed to int64
    so the self-join shuffles 8-byte longs instead of shingle strings —
    collision probability over s distinct shingles is ~s²/2⁶⁵,
    irrelevant next to the oracle gate."""
    corpus = _near_dup_corpus(spark, sf_dir)
    sh = (
        dedup.doc_shingles(corpus, "text", "doc_id")
        .select("doc_id", F.xxhash64("shingle").alias("shingle"))
        .persist()
    )
    sh.count()
    return dedup.jaccard_pairs(sh, "doc_id", 0.5)


_SIMHASH_BITS_SQL = " || ".join(
    "(CASE WHEN list_sum(list_transform(tokens, t -> "
    f"CASE WHEN substr(md5(t), {i}, 1) >= '8' THEN 1 ELSE -1 END)) > 0 "
    "THEN '1' ELSE '0' END)"
    for i in range(1, 33)
)


@query(
    "simhash_fingerprints",
    oracle=f"""
    SELECT doc_id, {_SIMHASH_BITS_SQL} AS simhash
    FROM (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS tokens
      FROM documents
    )
    """,
)
def simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash per document — per-row array aggregation over md5
    digit votes, zero shuffle (near-dup candidates then bucket on
    fingerprint prefixes / Hamming balls)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", text.simhash32_arrow("text").alias("simhash"))


@query(
    "token_stats",
    oracle=f"""
    SELECT doc_id,
      len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS n_tokens,
      len(regexp_extract_all(text, '{text.BPE_ISH_PATTERN}')) AS n_bpe_ish,
      length(text) AS n_chars_raw
    FROM documents
    """,
)
def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish regex pieces — the
    corpus token-budget pass; pure projection at scan speed."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        text.token_count("text").alias("n_tokens"),
        text.bpe_ish_count("text").cast("long").alias("n_bpe_ish"),
        F.length("text").cast("long").alias("n_chars_raw"),
    )


@query(
    "quality_scores",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, text,
        regexp_split_to_array(lower(trim(text)), '\\s+') AS tokens,
        greatest(length(text), 1) AS n_chars
      FROM documents
    )
    SELECT doc_id,
      round(len(list_filter(tokens,
        x -> x IN {text.STOPWORDS!r})) * 1.0
        / greatest(len(tokens), 1), 4) AS stop_ratio,
      round(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) * 1.0
        / n_chars, 4) AS punct_ratio,
      round(
        0.4 * least(len(tokens) / 100.0, 1.0)
      + 0.3 * least((len(list_filter(tokens, x -> x IN {text.STOPWORDS!r}))
                     * 1.0 / greatest(len(tokens), 1)) * 5.0, 1.0)
      + 0.3 * (1.0 - least((len(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))
                     * 1.0 / n_chars) * 10.0, 1.0)), 4) AS quality
    FROM t
    """,
)
def quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring (length / stopword / punctuation signals — the
    standard pre-training heuristics), one pass, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.round(text.stopword_ratio("text"), 4).alias("stop_ratio"),
        F.round(text.punct_ratio("text"), 4).alias("punct_ratio"),
        F.round(text.quality_score("text"), 4).alias("quality"),
    )


@query(
    "lang_id_pred",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang,
        regexp_split_to_array(lower(trim(text)), '\\s+') AS tokens
      FROM documents
    ), scores AS (
      SELECT doc_id, lang,
        len(list_filter(tokens, x -> x IN ('the','and','of','is'))) AS en,
        len(list_filter(tokens, x -> x IN ('der','und','das','ist'))) AS de,
        len(list_filter(tokens, x -> x IN ('el','los','de','es'))) AS es
      FROM t
    )
    SELECT doc_id,
      CASE WHEN en >= de AND en >= es THEN 'en'
           WHEN de >= es THEN 'de'
           ELSE 'es' END AS pred_lang,
      (CASE WHEN en >= de AND en >= es THEN 'en'
            WHEN de >= es THEN 'de'
            ELSE 'es' END) = lang AS label_match
    FROM scores
    """,
)
def lang_id_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID via marker-token scoring (the n-gram-profile shape
    distilled to its engine skeleton): argmax over per-language marker
    hits, deterministic tie order."""
    docs = load_table(spark, sf_dir, "documents")
    pred = text.lang_id("text")
    return docs.select(
        "doc_id",
        pred.alias("pred_lang"),
        (pred == F.col("lang")).alias("label_match"),
    )


@query(
    "media_frame_sample",
    oracle="""
    SELECT doc_id, CAST(i AS INT) AS frame_idx,
           length(substr(text, i*256 + 1, 64)) AS frame_len,
           md5(substr(text, i*256 + 1, 64)) AS frame_md5
    FROM documents, UNNEST(generate_series(0, 3)) t(i)
    WHERE i = 0 OR i*256 < length(text)
    """,
)
def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal frame sampling: payload → one row per sampled 64-byte
    'frame' at 256-byte stride (≤4 frames) via a 1→N mapInPandas —
    the keyframe-extraction plumbing shape.  The DuckDB oracle slices
    the text by CHARACTER offset, which equals the Spark side's BYTE
    offset because the corpus is pure ASCII (asserted over all SFs);
    cross-validates the Python batch loop against declarative SQL."""
    docs = load_table(spark, sf_dir, "documents")
    return multimodal.sample_frames(multimodal.with_binary_payload(docs))


@query(
    "media_resize_crop",
    oracle="""
    SELECT doc_id, length(substr(text, 1, 4096)) AS n_bytes_out,
           md5(substr(text, 1, 4096)) AS crop_md5
    FROM documents
    """,
)
def media_resize_crop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal resize plumbing (deterministic crop stand-in):
    binary-in/binary-out pandas batch transform, cropped payload leaving
    as (length, md5).  Same ASCII char==byte offset note as
    media_frame_sample."""
    docs = load_table(spark, sf_dir, "documents")
    return multimodal.crop_resize(multimodal.with_binary_payload(docs))


ROLL_B = 1_000_003
ROLL_M = 1_000_000_007


@query(
    "rolling_fingerprint",
    oracle=f"""
    SELECT doc_id,
      len(tokens) AS n_tokens,
      list_reduce(
        list_prepend(0, list_transform(tokens,
          t -> CAST(CAST(('0x' || substr(md5(t), 1, 8)) AS UBIGINT) AS BIGINT))),
        (acc, v) -> (acc * {ROLL_B} + v) % {ROLL_M}) AS rolling_hash
    FROM (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS tokens
      FROM documents
    )
    """,
)
def rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting via a polynomial rolling hash (Rabin-Karp
    recurrence ``h = (h·B + v) mod M`` over per-token 32-bit md5 values)
    — order-sensitive, incrementally updatable (append a token in O(1)),
    the streaming-friendly twin of the order-insensitive md5
    ``fingerprint``.  One projection, zero shuffle; the fold stays in
    64-bit range (M ≈ 2^30, B ≈ 2^20, v < 2^32 → acc·B + v < 2^63)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", text.tokens("text").alias("_toks"))
    vals = F.transform(
        F.col("_toks"),
        lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long"),
    )
    rh = F.aggregate(
        vals,
        F.lit(0).cast("long"),
        lambda acc, v: (acc * ROLL_B + v) % ROLL_M,
    )
    return toks.select(
        "doc_id",
        F.size("_toks").cast("long").alias("n_tokens"),
        rh.alias("rolling_hash"),
    )


@query(
    "embedding_cosine_topk",
    oracle="""
    WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings
               WHERE vec_id < 10),
    scored AS MATERIALIZED (
      SELECT q.q_id, e.vec_id AS n_id,
             list_cosine_similarity(q.q_vec::DOUBLE[], e.embedding::DOUBLE[]) AS sim
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id != q.q_id
    )
    SELECT q_id, n_id, round(sim, 4) AS cosine_sim, CAST(rank AS INT) AS rank
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
)
def embedding_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k (similarity-search baseline): 10 query
    vectors broadcast against the corpus; exact, deterministic tie-break
    by neighbor id.  The corpus side never shuffles — rank reduction
    partitions by query."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return similarity.brute_force_topk(emb, queries, k=5)


@query(
    "embedding_near_dup",
    oracle="""
    WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 = 0)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4)
             AS cosine_sim
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) >= 0.3
    """,
)
def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (threshold 0.3) over a vec_id%10
    sample — the verify-stage primitive behind LSH-bucketed dedup."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 10 == 0)
    return similarity.near_dup_pairs(emb, 0.3)


def _lsh_bucket_cte(planes_sql: str, corpus_cte: str) -> str:
    """Shared oracle fragment: fixed-point quantize the ``{corpus}``
    CTE's vectors and compute every (table, bucket) sign-key with the
    SAME int64 plane literals the Spark UDF closes over — the exact
    integer dots make bucket membership bit-identical across engines."""
    qv = similarity.QUANT_VEC_SQL.format(col="emb")
    return f"""
    ei AS MATERIALIZED (
      SELECT vec_id, {qv} AS v FROM {corpus_cte}
    ),
    planes(tbl, pw, w) AS (VALUES {planes_sql}),
    sb AS MATERIALIZED (
      SELECT ei.vec_id, p.tbl,
             CAST(sum(CASE WHEN list_dot_product(ei.v, p.w) >= 0
                           THEN p.pw ELSE 0 END) AS INT) AS bucket
      FROM ei CROSS JOIN planes p
      GROUP BY 1, 2
    )"""


# the planted corpus both near-dup queries share: base vectors plus
# every-10th re-appearing at +1M (tail ×2) [and +2M (tail ×4) for the
# cluster query] — ×2/×4 are exact in float32 AND double, so the DuckDB
# double path reproduces Spark's array<float> cast bit-for-bit
_NEAR_DUP_CORPUS = """
    corpus AS MATERIALIZED (
      SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000, emb[1:63] || [emb[64] * 2.0]
      FROM (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings)
      WHERE vec_id % 10 = 0
    )"""


def _near_dup_lsh_oracle() -> str:
    planes = similarity.lsh_planes_values_sql(64, 12, 16)
    return f"""
    WITH {_NEAR_DUP_CORPUS.strip()},
    {_lsh_bucket_cte(planes, "corpus").strip()},
    cand AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM sb a JOIN sb b
        ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id
    )
    SELECT c.id_a, c.id_b,
           round(list_cosine_similarity(a.emb, b.emb), 4) AS cosine_sim
    FROM cand c
    JOIN corpus a ON a.vec_id = c.id_a
    JOIN corpus b ON b.vec_id = c.id_b
    WHERE round(list_cosine_similarity(a.emb, b.emb), 4) >= 0.9
    """


@query("embedding_near_dup_lsh", oracle=_near_dup_lsh_oracle())
def embedding_near_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup at scale: LSH sign-bucket candidates → exact
    cosine ≥ 0.9, over a corpus with planted near-duplicates (every 10th
    vector re-appears at vec_id+1M with its tail element doubled —
    cosine ≈ 0.99+).  Candidate generation never goes pairwise; recall
    vs the planted truth is asserted in tests/test_similarity.py, and
    the fixed-point integer sign buckets (functions/similarity.QUANT)
    make the full candidate→verify pipeline value-checkable against the
    DuckDB oracle's literal plane bank."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planted = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.concat(
            F.slice("embedding", 1, 63),
            F.array(F.element_at("embedding", 64) * 2.0),
        )
        .cast("array<float>")
        .alias("embedding"),
    )
    corpus = emb.unionByName(planted)
    return similarity.near_dup_pairs_lsh(corpus, 0.9, dim=64)


def _ivf_oracle() -> str:
    cents = similarity.ivf_centroids_values_sql(16, 64)
    qv = similarity.QUANT_VEC_SQL.format(col="embedding")
    return f"""
    WITH ei AS MATERIALIZED (
      SELECT vec_id, {qv} AS v FROM embeddings
    ),
    cent(cell, w) AS (VALUES {cents}),
    ranked AS MATERIALIZED (
      SELECT vec_id, cell, row_number() OVER (
        PARTITION BY vec_id
        ORDER BY list_dot_product(ei.v, c.w) DESC, cell) AS r
      FROM ei CROSS JOIN cent c
    ),
    cand AS (
      SELECT q.vec_id AS q_id, n.vec_id AS n_id
      FROM (SELECT vec_id, cell FROM ranked WHERE vec_id < 10 AND r <= 4) q
      JOIN (SELECT vec_id, cell FROM ranked WHERE r = 1) n USING (cell)
      WHERE n.vec_id <> q.vec_id
    ),
    scored AS (
      SELECT c.q_id, c.n_id,
             list_cosine_similarity(a.embedding::DOUBLE[],
                                    b.embedding::DOUBLE[]) AS sim
      FROM cand c
      JOIN embeddings a ON a.vec_id = c.q_id
      JOIN embeddings b ON b.vec_id = c.n_id
    )
    SELECT q_id, n_id, round(sim, 4) AS cosine_sim, CAST(rank AS INT) AS rank
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank
      FROM scored
    ) WHERE rank <= 5
    """


@query("ivf_ann_topk", oracle=_ivf_oracle())
def ivf_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k via IVF (inverted-file index): spherical-kmeans cells
    (seeded synthetic training sample → data-independent integer
    centroid literals), probe the nprobe nearest cells, exact cosine
    rank within them.  nprobe == n_cells degrades to exact brute force
    — that equality plus partial-probe recall is asserted in
    tests/test_similarity.py; cell assignment is an exact int64 argmax,
    so the DuckDB oracle reproduces the candidate sets literally."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return similarity.ivf_topk(emb, queries, dim=64, k=5)


def _pq_oracle(m: int = 8, n_codes: int = 32, rerank_k: int = 40) -> str:
    books = similarity.pq_codebooks_values_sql(m, n_codes, 64)
    qv = similarity.QUANT_VEC_SQL.format(col="embedding")
    sub = 64 // m
    return f"""
    WITH ei AS MATERIALIZED (
      SELECT vec_id, {qv} AS v FROM embeddings
    ),
    cb(mi, code, c2, w) AS (VALUES {books}),
    assign AS MATERIALIZED (
      SELECT vec_id, mi, code FROM (
        SELECT ei.vec_id, cb.mi, cb.code,
               row_number() OVER (
                 PARTITION BY ei.vec_id, cb.mi
                 ORDER BY cb.c2 - 2 * list_dot_product(
                   ei.v[cb.mi * {sub} + 1 : cb.mi * {sub} + {sub}], cb.w),
                 cb.code) AS r
        FROM ei CROSS JOIN cb
      ) WHERE r = 1
    ),
    qe AS (SELECT vec_id AS q_id, v FROM ei WHERE vec_id < 10),
    adc AS (
      SELECT qe.q_id, a.vec_id AS n_id,
             CAST(sum(list_dot_product(
               qe.v[a.mi * {sub} + 1 : a.mi * {sub} + {sub}], cb.w))
               AS BIGINT) AS ip
      FROM assign a
      JOIN cb ON cb.mi = a.mi AND cb.code = a.code
      CROSS JOIN qe
      GROUP BY 1, 2
    ),
    cand AS (
      SELECT q_id, n_id FROM (
        SELECT *, row_number() OVER (
          PARTITION BY q_id ORDER BY ip DESC, n_id) AS r
        FROM adc
      ) WHERE r <= {rerank_k}
    ),
    scored AS (
      SELECT c.q_id, c.n_id AS vec_id,
             list_cosine_similarity(a.embedding::DOUBLE[],
                                    b.embedding::DOUBLE[]) AS sim
      FROM cand c
      JOIN embeddings a ON a.vec_id = c.q_id
      JOIN embeddings b ON b.vec_id = c.n_id
    )
    SELECT q_id, vec_id, round(sim, 4) AS cosine_sim, CAST(rank AS INT) AS rank
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rank
      FROM scored
    ) WHERE rank <= 5
    """


@query("pq_ann_topk", oracle=_pq_oracle())
def pq_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k via PRODUCT QUANTIZATION: per-subspace codebooks on a
    bounded sample compress each vector to 8 one-byte codes; the scan
    scores candidates with per-query lookup tables (asymmetric distance
    — m gathers instead of a dim-length dot product, the
    memory-bandwidth win behind billion-scale ANN), then re-ranks the
    top candidates exactly.  Recall vs brute force + code shape /
    determinism asserted in tests/test_similarity.py; codebooks are
    seeded-synthetic-trained integer literals and both assignment and
    ADC scores are exact int64, so the DuckDB oracle value-checks the
    full encode→LUT-scan→re-rank pipeline."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return similarity.pq_topk(emb, queries, k=5)


def _ann_lsh_oracle() -> str:
    planes = similarity.lsh_planes_values_sql(64, 4, 8)
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
    {_lsh_bucket_cte(planes, "e").strip()},
    cand AS (
      SELECT DISTINCT q.vec_id AS q_id, c.vec_id AS n_id
      FROM sb q JOIN sb c ON q.tbl = c.tbl AND q.bucket = c.bucket
      WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id
    ),
    scored AS (
      SELECT cd.q_id, cd.n_id,
             list_cosine_similarity(a.emb, b.emb) AS sim
      FROM cand cd
      JOIN e a ON a.vec_id = cd.q_id
      JOIN e b ON b.vec_id = cd.n_id
    )
    SELECT q_id, n_id, round(sim, 4) AS cosine_sim, CAST(rank AS INT) AS rank
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY q_id ORDER BY sim DESC, n_id) AS rank
      FROM scored
    ) WHERE rank <= 5
    """


@query("ann_lsh_topk", oracle=_ann_lsh_oracle())
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-k via random-hyperplane LSH buckets: candidates only from
    matching sign-buckets, then exact cosine rank.  Recall vs brute force
    is asserted in tests/test_similarity.py; the integer sign buckets
    make the candidate sets literal-reproducible in the DuckDB oracle."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return similarity.ann_topk_lsh(
        emb, queries, dim=64, k=5, query_filter=F.col("vec_id") < 10
    )


@query(
    "binary_meta",
    oracle="""
    SELECT doc_id,
      octet_length(encode(text)) AS n_bytes,
      ascii(substr(text, 1, 1)) AS first_byte,
      octet_length(encode(text)) % 640 AS fake_width,
      (ascii(substr(text, 1, 1)) * 4) % 480 AS fake_height
    FROM documents
    """,
)
def binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: text → binary payload column → Arrow-batched
    mapInPandas 'decode' (deterministic fake; see wav_pcm_stats /
    bmp_pixel_stats for the REAL container decoders, and
    functions/multimodal.decode_payload for the codec dispatch).
    Exercises the schema, batch iteration and partitioning of the media
    path end-to-end."""
    docs = load_table(spark, sf_dir, "documents")
    payload = multimodal.with_binary_payload(docs)
    out = multimodal.fake_decode_meta(payload)
    return out.select(
        "doc_id",
        "n_bytes",
        F.col("first_byte").cast("int").alias("first_byte"),
        F.col("fake_width").cast("int").alias("fake_width"),
        F.col("fake_height").cast("int").alias("fake_height"),
    )


@query(
    "wav_pcm_stats",
    oracle="""
    WITH g AS (SELECT doc_id, 50 + doc_id % 50 AS n FROM documents),
    s AS (
      SELECT g.doc_id, g.n,
             CAST(8000 + (g.doc_id % 8) * 1000 AS INT) AS sample_rate,
             (g.doc_id * 37 + t.i * 251) % 4001 - 2000 AS amp
      FROM g, unnest(range(0, g.n)) AS t(i)
    )
    SELECT doc_id,
           any_value(sample_rate) AS sample_rate,
           any_value(n) AS n_samples,
           CAST(sum(amp) AS BIGINT) AS sum_amp,
           CAST(sum(amp * amp) AS BIGINT) AS sum_sq,
           CAST(max(amp) AS INT) AS peak,
           CAST(min(amp) AS INT) AS trough
    FROM s GROUP BY doc_id
    """,
)
def wav_pcm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode end-to-end: a deterministic per-doc PCM16
    waveform is serialized to genuine RIFF/WAVE bytes
    (functions/multimodal.encode_wav_pcm16), then a SEPARATE
    Arrow-batched stage parses the container back — chunk walk, fmt
    validation, int16 frame view (decode_wav_pcm16; no codec library,
    pure numpy) — and reduces to exact-integer Σamp/Σamp²/extrema.
    The oracle states the same stats from the synthesis closed form
    WITHOUT touching bytes, so any header/stride/endianness bug in the
    decoder hash-mismatches.  Closes the round-8 verdict's multimodal
    decode stub (functions/multimodal.py): WAV decode is now real."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    wavs = multimodal.synth_wav_corpus(docs)
    return multimodal.decoded_wav_stats(wavs)


@query(
    "bmp_pixel_stats",
    oracle="""
    WITH g AS (
      SELECT doc_id, 3 + doc_id % 5 AS w, 2 + doc_id % 3 AS h
      FROM documents
    ),
    px AS (
      SELECT g.doc_id, g.w, g.h,
             (g.doc_id + 7 * r.r + 13 * c.c) % 256 AS vr,
             (g.doc_id + 7 * r.r + 13 * c.c + 29) % 256 AS vg,
             (g.doc_id + 7 * r.r + 13 * c.c + 58) % 256 AS vb
      FROM g,
           unnest(range(0, g.h)) AS r(r),
           unnest(range(0, g.w)) AS c(c)
    )
    SELECT doc_id,
           CAST(any_value(w) AS INT) AS width,
           CAST(any_value(h) AS INT) AS height,
           CAST(sum(vr) AS BIGINT) AS sum_r,
           CAST(sum(vg) AS BIGINT) AS sum_g,
           CAST(sum(vb) AS BIGINT) AS sum_b,
           CAST(greatest(max(vr), max(vg), max(vb)) AS INT) AS max_px,
           CAST(least(min(vr), min(vg), min(vb)) AS INT) AS min_px
    FROM px GROUP BY doc_id
    """,
)
def bmp_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode end-to-end: deterministic per-doc RGB grids
    are serialized to genuine 24-bit BMP bytes (BITMAPINFOHEADER,
    4-byte-padded bottom-up BGR rows — widths 3/5/6/7 force non-trivial
    padding), then a SEPARATE stage parses the container back
    (decode_bmp24: dimensions from the header, stride/flip/BGR undone)
    and reduces to exact-integer channel sums and extrema.  The oracle
    states the stats from the synthesis closed form without touching
    bytes — a wrong stride or channel order mismatches immediately.
    Together with wav_pcm_stats this replaces the former decode stub
    with real container codecs."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    bmps = multimodal.synth_bmp_corpus(docs)
    return multimodal.decoded_bmp_stats(bmps)


@query(
    "png_pixel_stats",
    oracle="""
    WITH g AS (
      SELECT doc_id, 2 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
      FROM documents
    ),
    px AS (
      SELECT g.doc_id, g.w, g.h,
             (g.doc_id + 11 * r.r + 17 * c.c) % 256 AS vr,
             (g.doc_id + 11 * r.r + 17 * c.c + 31) % 256 AS vg,
             (g.doc_id + 11 * r.r + 17 * c.c + 62) % 256 AS vb
      FROM g,
           unnest(range(0, g.h)) AS r(r),
           unnest(range(0, g.w)) AS c(c)
    )
    SELECT doc_id,
           CAST(any_value(w) AS INT) AS width,
           CAST(any_value(h) AS INT) AS height,
           CAST(sum(vr) AS BIGINT) AS sum_r,
           CAST(sum(vg) AS BIGINT) AS sum_g,
           CAST(sum(vb) AS BIGINT) AS sum_b,
           CAST(greatest(max(vr), max(vg), max(vb)) AS INT) AS max_px,
           CAST(least(min(vr), min(vg), min(vb)) AS INT) AS min_px
    FROM px GROUP BY doc_id
    """,
)
def png_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL COMPRESSED-image decode end-to-end: deterministic per-doc
    RGB grids are serialized to genuine PNGs — zlib-deflated IDAT,
    CRC'd chunks, scanline filters cycling row % 5 so every unfilter
    path (None/Sub/Up/Average/Paeth) runs on every image taller than 4
    rows (functions/multimodal.encode_png, stdlib zlib only) — then a
    SEPARATE Arrow-batched stage inflates and unfilters them back
    (decode_png) and reduces to exact-integer channel sums/extrema.
    The oracle states the stats from the synthesis closed form without
    touching bytes: a wrong Paeth predictor, filter offset, or inflate
    slice hash-mismatches.  Extends the WAV/BMP codec pair to an
    actually-compressed container."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    pngs = multimodal.synth_png_corpus(docs)
    return multimodal.decoded_png_stats(pngs)


@query(
    "audio_frame_features",
    oracle="""
    WITH g AS (SELECT doc_id, 50 + doc_id % 50 AS n FROM documents),
    s AS (
      SELECT g.doc_id, CAST(t.i // 16 AS INT) AS frame_id, t.i AS i,
             (g.doc_id * 37 + t.i * 251) % 4001 - 2000 AS amp
      FROM g, unnest(range(0, (g.n // 16) * 16)) AS t(i)
    ),
    x AS (
      SELECT doc_id, frame_id, amp,
             CASE WHEN i % 16 = 0 THEN NULL
                  ELSE lag(amp) OVER (PARTITION BY doc_id ORDER BY i)
             END AS prev
      FROM s
    )
    SELECT doc_id, frame_id, CAST(16 AS INT) AS n,
           CAST(sum(amp * amp) AS BIGINT) AS sum_sq,
           CAST(max(abs(amp)) AS INT) AS peak,
           CAST(sum(CASE WHEN prev IS NOT NULL
                         AND ((amp >= 0) != (prev >= 0))
                    THEN 1 ELSE 0 END) AS INT) AS n_zero_cross
    FROM x GROUP BY doc_id, frame_id
    """,
)
def audio_frame_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Framewise audio features over DECODED PCM — the step after
    decode in an audio-training pipeline (librosa's frame / energy /
    zero-crossing-rate trio, reduced to exact integers so it
    hash-checks): real RIFF/WAVE bytes are parsed back by the chunk
    walker, then non-overlapping 16-sample frames emit Σamp² (energy),
    |peak|, and the sign-flip count.  The oracle recomputes every frame
    from the synthesis closed form with a lag window that resets at
    frame boundaries — framing bugs (off-by-one, tail handling,
    cross-frame crossings) mismatch immediately."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    wavs = multimodal.synth_wav_corpus(docs)
    return multimodal.audio_frame_features(wavs)


@query(
    "sample_deterministic",
    oracle="""
    SELECT doc_id, lang
    FROM documents
    WHERE substr(md5('s0|' || CAST(doc_id AS VARCHAR)), 1, 8) < '19999999'
    """,
)
def sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 10% sample of documents: membership is a pure
    function of md5(salt|doc_id) — identical on every run, engine, and
    partition layout (the reproducibility contract a training pipeline
    needs for splits and backfills).  Pure per-row filter: no shuffle,
    no RNG state; the oracle computes the very same hashes."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return sampling.deterministic_sample(docs, "doc_id", 0.1, salt="s0")


@query(
    "sample_stratified_lang",
    oracle="""
    SELECT doc_id, lang
    FROM documents
    WHERE substr(md5('s0|' || CAST(doc_id AS VARCHAR)), 1, 8) <
      CASE lang WHEN 'en' THEN '40000000'
                WHEN 'zh' THEN 'gggggggg'
                ELSE '80000000' END
    """,
)
def sample_stratified_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling: per-language keep rates
    (downsample dominant en to 25%, keep all zh, 50% elsewhere) as a
    literal CASE over the same per-row hash — one scan, no join, no
    shuffle; rebalancing a multilingual corpus without losing
    reproducibility."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return sampling.stratified_sample(
        docs, "lang", {"en": 0.25, "zh": 1.0}, "doc_id",
        salt="s0", default_fraction=0.5,
    )


PACK_PARTS = 32  # fixed partitioner so the packing is engine-replayable


@query(
    "pack_token_budget",
    oracle=f"""
    WITH RECURSIVE docs AS MATERIALIZED (
      SELECT doc_id % {PACK_PARTS} AS part, doc_id,
             CAST(len(regexp_split_to_array(lower(trim(text)), '\\s+'))
                  AS BIGINT) AS n_tokens
      FROM documents
    ),
    ordered AS MATERIALIZED (
      SELECT part, doc_id, n_tokens,
             row_number() OVER (
               PARTITION BY part ORDER BY n_tokens DESC, doc_id
             ) AS rn
      FROM docs
    ),
    ffd AS (
      -- sequential first-fit-decreasing replay: one recursion row per
      -- (partition, step); `fills` carries the open-bin fill levels
      SELECT part, rn, doc_id, n_tokens,
             [n_tokens] AS fills, CAST(0 AS BIGINT) AS bin
      FROM ordered WHERE rn = 1
      UNION ALL
      SELECT d.part, d.rn, d.doc_id, d.n_tokens,
             CASE WHEN list_position(
                    list_transform(f.fills, x -> x + d.n_tokens <= 512),
                    true) > 0
                  THEN f.fills[
                         : list_position(list_transform(f.fills,
                             x -> x + d.n_tokens <= 512), true) - 1]
                       || [f.fills[list_position(list_transform(f.fills,
                             x -> x + d.n_tokens <= 512), true)]
                           + d.n_tokens]
                       || f.fills[list_position(list_transform(f.fills,
                             x -> x + d.n_tokens <= 512), true) + 1 :]
                  ELSE list_append(f.fills, d.n_tokens) END AS fills,
             CAST(coalesce(
               nullif(list_position(list_transform(f.fills,
                   x -> x + d.n_tokens <= 512), true), 0) - 1,
               len(f.fills)) AS BIGINT) AS bin
      FROM ffd f JOIN ordered d ON d.part = f.part AND d.rn = f.rn + 1
    )
    SELECT part * {1 << 40} + bin AS pack_id, doc_id, n_tokens
    FROM ffd
    """,
)
def pack_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for LLM training: documents greedily packed into
    512-token bins, first-fit-decreasing within {PACK_PARTS} fixed hash
    partitions (pack ids offset by partition — globally unique without
    coordination).  Row count == document count (each doc lands in
    exactly one pack); budget/coverage invariants asserted in
    tests/test_training_ops.py.

    The partitioner is ``doc_id % {PACK_PARTS}`` — engine-neutral, so
    the DuckDB oracle replays the EXACT same FFD greedy as a recursive
    CTE (one recursion row per (partition, step), open-bin fill levels
    carried as a list — the bounded-sequential-replay pattern shared
    with the token bucket and Mondrian oracles).  Integer token counts
    and <= comparisons only: no float divergence surface."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", text.token_count("text").alias("n_tokens")
    )
    return packing.pack_sequences(
        docs,
        "n_tokens",
        budget=512,
        num_partitions=PACK_PARTS,
        part_col=F.pmod(F.col("doc_id"), F.lit(PACK_PARTS)),
    )


@query(
    "chunk_documents",
    oracle="""
    SELECT doc_id,
           CAST((start - 1) / 96 AS BIGINT) AS chunk_idx,
           array_to_string(tokens[start:start+127], ' ') AS chunk_text,
           CAST(least(128, len(tokens) - start + 1) AS BIGINT) AS n_tokens
    FROM (
      SELECT doc_id, tokens, unnest(generate_series(1, len(tokens), 96)) AS start
      FROM (
        SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS tokens
        FROM documents
      )
    )
    """,
)
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: split each document into 128-token
    chunks with a 32-token overlap (stride 96) — the retrieval /
    training preprocessing twin of :func:`..functions.packing`.  Pure
    per-row explode (chunk starts from `sequence`, slices from the
    SAME projected token array — no re-tokenize per chunk), zero
    shuffle, linear in corpus size.
    Output: (doc_id, chunk_idx, chunk_text, n_tokens)."""
    chunk, stride = 128, 96
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", text.tokens("text").alias("_toks")
    )
    return (
        docs.select(
            "doc_id",
            "_toks",
            F.explode(
                F.sequence(F.lit(1), F.size("_toks"), F.lit(stride))
            ).alias("start"),
        )
        .select(
            "doc_id",
            ((F.col("start") - 1) / stride).cast("long").alias("chunk_idx"),
            F.array_join(F.slice("_toks", F.col("start"), chunk), " ").alias(
                "chunk_text"
            ),
            F.least(
                F.lit(chunk), F.size("_toks") - F.col("start") + 1
            ).cast("long").alias("n_tokens"),
        )
    )


@query(
    "embedding_lang_centroids",
    oracle="""
    SELECT d.lang, g.idx - 1 AS dim_idx,
           round(avg(CAST(e.embedding[g.idx] AS DOUBLE)), 4) + 0.0
           AS centroid_val
    FROM embeddings e
    JOIN documents d ON e.vec_id = d.doc_id
    CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS idx) g
    GROUP BY 1, 2
    """,
)
def embedding_lang_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language embedding centroids — the training step behind IVF
    cells and cluster-balanced sampling.  posexplode flattens (row, dim)
    pairs so the mean is ONE hash aggregate keyed (lang, dim): map-side
    partial sums reduce the shuffle to |langs|×|dims| rows per
    partition, the classic dense-vector-mean decomposition."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return (
        emb.join(F.broadcast(docs), emb.vec_id == docs.doc_id)
        .select("lang", F.posexplode("embedding").alias("dim_idx", "val"))
        .groupBy("lang", "dim_idx")
        .agg(
            (F.round(F.avg(F.col("val").cast("double")), 4) + 0.0).alias(
                "centroid_val"
            )
        )
    )


@query(
    "embedding_quantize_int8",
    oracle="""
    SELECT vec_id, g.idx - 1 AS dim_idx,
           CASE WHEN sc = 0 THEN -128
                ELSE CAST(floor((CAST(embedding[g.idx] AS DOUBLE) - mn) / sc
                                + 0.5) - 128 AS INTEGER) END AS q_val,
           floor(sc * 10000 + 0.5) / 10000 AS q_scale,
           floor(mn * 10000 + 0.5) / 10000 AS q_zero
    FROM (
      SELECT vec_id, embedding,
             CAST(list_min(embedding) AS DOUBLE) AS mn,
             (CAST(list_max(embedding) AS DOUBLE)
              - CAST(list_min(embedding) AS DOUBLE)) / 255.0 AS sc
      FROM embeddings
    )
    CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS idx) g
    """,
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector int8 min-max quantization (4× smaller ANN storage).
    All column expressions (array_min/max + one transform), zero
    shuffle; min/scale projected BEFORE the transform so the HOF lambda
    binds attributes, not re-evaluated aggregates.  Flattened to
    (vec_id, dim_idx, q_val) for the value-hash compare."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    q = similarity.quantize_embeddings_int8(emb)
    return q.select(
        "vec_id",
        F.posexplode("q8").alias("dim_idx", "q_val"),
        (F.floor(F.col("q8_scale") * 10000 + 0.5) / 10000).alias("q_scale"),
        (F.floor(F.col("q8_zero") * 10000 + 0.5) / 10000).alias("q_zero"),
    )


_EMAIL_PAT = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_PAT = r"\+1-555-[0-9]+"


@query(
    "pii_redact_docs",
    oracle=f"""
    WITH aug AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.org or +1-555-'
                  || CAST(doc_id % 10000 AS VARCHAR) AS t
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{_EMAIL_PAT}')) AS BIGINT)
             AS n_emails,
           CAST(len(regexp_extract_all(t, '{_PHONE_PAT}')) AS BIGINT)
             AS n_phones,
           md5('corpus_v1:' || CAST(doc_id AS VARCHAR)) AS pseudonym,
           regexp_replace(regexp_replace(t, '{_EMAIL_PAT}', '<EMAIL>', 'g'),
                          '{_PHONE_PAT}', '<PHONE>', 'g') AS redacted
    FROM aug
    """,
)
def pii_redact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub for a training corpus: redact emails/phones in place,
    count what was removed (audit trail), and emit a salted-hash
    pseudonym as the stable join key replacing the raw id.  The corpus
    is synthetic, so a deterministic contact line is planted per doc
    first — the redaction path then has real matches to remove.  Pure
    per-row regexp expressions: zero shuffle, scan speed; patterns are
    engine-portable (no lookaround), asserted byte-identical against
    the DuckDB oracle including the full redacted text."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.org or +1-555-"),
        (F.col("doc_id") % 10000).cast("string"),
    )
    aug = docs.select("doc_id", t.alias("t"))
    # SQL string literals process backslash escapes, so regexes passed
    # through F.expr need their backslashes doubled (the Column-API
    # regexp_replace below takes patterns verbatim)
    email_sql = _EMAIL_PAT.replace("\\", "\\\\")
    phone_sql = _PHONE_PAT.replace("\\", "\\\\")
    return aug.select(
        "doc_id",
        F.expr(f"regexp_count(t, '{email_sql}')").cast("bigint").alias("n_emails"),
        F.expr(f"regexp_count(t, '{phone_sql}')").cast("bigint").alias("n_phones"),
        F.md5(F.concat(F.lit("corpus_v1:"), F.col("doc_id").cast("string"))).alias(
            "pseudonym"
        ),
        F.regexp_replace(
            F.regexp_replace("t", _EMAIL_PAT, "<EMAIL>"),
            _PHONE_PAT,
            "<PHONE>",
        ).alias("redacted"),
    )


@query(
    "lang_confusion_matrix",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang,
        regexp_split_to_array(lower(trim(text)), '\\s+') AS tokens
      FROM documents
    ), scores AS (
      SELECT doc_id, lang,
        len(list_filter(tokens, x -> x IN ('the','and','of','is'))) AS en,
        len(list_filter(tokens, x -> x IN ('der','und','das','ist'))) AS de,
        len(list_filter(tokens, x -> x IN ('el','los','de','es'))) AS es
      FROM t
    ), pred AS (
      SELECT lang AS true_lang,
        CASE WHEN en >= de AND en >= es THEN 'en'
             WHEN de >= es THEN 'de'
             ELSE 'es' END AS pred_lang
      FROM scores
    )
    SELECT true_lang, pred_lang,
           CAST(count(*) AS BIGINT) AS n,
           round(count(*) * 1.0
                 / sum(count(*)) OVER (PARTITION BY true_lang), 4)
             AS row_frac
    FROM pred GROUP BY true_lang, pred_lang
    """,
)
def lang_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-eval confusion matrix for the language-ID heuristic:
    counts and row-normalized rates per (true, predicted) pair — the
    quality report a model-eval pipeline emits next to per-row
    predictions (:func:`lang_id_pred` gives those).  One scan, a keyed
    count over ≤|langs|² cells, and a window normalization over that
    tiny frame; rates divide exact counts — bit-identical across
    engines."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    pred = (
        docs.select(
            F.col("lang").alias("true_lang"),
            text.lang_id("text").alias("pred_lang"),
        )
        .groupBy("true_lang", "pred_lang")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    wrow = Window.partitionBy("true_lang")
    return pred.select(
        "true_lang",
        "pred_lang",
        "n",
        F.round(F.col("n") * 1.0 / F.sum("n").over(wrow), 4).alias(
            "row_frac"
        ),
    )


@query(
    "media_audio_chunks",
    oracle="""
    SELECT doc_id, CAST(i AS INT) AS chunk_idx,
           length(substr(text, i*96 + 1, 128)) AS n_samples,
           CASE WHEN length(substr(text, i*96 + 1, 128)) = 0 THEN 0.0
                ELSE floor(list_avg(list_transform(
                       range(1, length(substr(text, i*96 + 1, 128)) + 1),
                       k -> ascii(substr(substr(text, i*96 + 1, 128), k, 1))
                     )) * 10000 + 0.5) / 10000 END AS energy,
           CASE WHEN length(substr(text, i*96 + 1, 128)) = 0 THEN 0
                ELSE CAST(list_max(list_transform(
                       range(1, length(substr(text, i*96 + 1, 128)) + 1),
                       k -> ascii(substr(substr(text, i*96 + 1, 128), k, 1))
                     )) AS INT) END AS peak
    FROM documents, UNNEST(generate_series(0, 5)) t(i)
    WHERE i = 0 OR i*96 < length(text)
    """,
)
def media_audio_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal audio plumbing: overlapping 128-byte chunks at a
    96-byte hop (25% overlap — the librosa framing shape) with
    per-chunk energy/peak computed numpy-side on the raw bytes, a
    deterministic stand-in for decoded PCM.  Same ASCII char==byte
    equivalence as media_frame_sample lets the DuckDB oracle replay the
    chunking and byte statistics character-wise."""
    docs = load_table(spark, sf_dir, "documents")
    return multimodal.audio_chunks(multimodal.with_binary_payload(docs))


# --------------------------------------------------------------------------
# asymmetric containment: subset / quotation detection
# --------------------------------------------------------------------------
_CONTAIN_CORPUS_SQL = """
  corpus AS (
    SELECT doc_id, lower(trim(text)) AS text FROM documents
    UNION ALL
    SELECT doc_id + 1000000,
           array_to_string(tokens[1 : greatest(len(tokens) // 2, 3)], ' ')
    FROM (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS tokens
      FROM documents WHERE doc_id % 10 = 0
    )
  ),
  shingles AS (
    SELECT DISTINCT doc_id,
      unnest(list_transform(
        generate_series(1, greatest(len(tokens) - 2, 0)),
        i -> array_to_string(tokens[i:i+2], ' '))) AS shingle
    FROM (SELECT doc_id, regexp_split_to_array(text, '\\s+') AS tokens
          FROM corpus)
  )
"""


@query(
    "ngram_containment_pairs",
    oracle=f"""
    WITH {_CONTAIN_CORPUS_SQL.strip()},
    {_JACCARD_TAIL_SQL.strip()}
    SELECT c.id_a, c.id_b, c.n_common, a.n_sh AS n_a, b.n_sh AS n_b,
           round(c.n_common * 1.0 / least(a.n_sh, b.n_sh), 4)
             AS containment,
           CASE WHEN a.n_sh <= b.n_sh THEN 'a_in_b' ELSE 'b_in_a' END
             AS direction
    FROM common c
    JOIN sizes a ON c.id_a = a.doc_id
    JOIN sizes b ON c.id_b = b.doc_id
    WHERE round(c.n_common * 1.0 / least(a.n_sh, b.n_sh), 4) >= 0.8
    """,
)
def ngram_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASYMMETRIC near-dup: containment = |A∩B| / min(|A|, |B|) —
    catches a document wholly QUOTED inside a larger one, which
    symmetric Jaccard misses (a half-doc inside its original scores
    jaccard ≈ 0.5 but containment 1.0; the planted corpus is exactly
    that: every 10th doc's first half at id +1M).  The curation action
    differs from dedup too: the CONTAINED side is the drop candidate,
    so ``direction`` says which way the subset relation points.

    Plan shape identical to :func:`ngram_jaccard_pairs` (persisted
    int64-hashed inverted index, one self-join on shingle) — this is
    the exhaustive tier; the LSH bucketing path prefilters it at scale
    exactly as for Jaccard."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim("text")), r"\s+")
    halves = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.array_join(
            F.slice(
                toks, 1, F.greatest((F.size(toks) / 2).cast("int"), F.lit(3))
            ),
            " ",
        ).alias("text"),
    )
    corpus = docs.select(
        "doc_id", F.lower(F.trim("text")).alias("text")
    ).unionByName(halves)
    sh = (
        dedup.doc_shingles(corpus, "text", "doc_id")
        .select("doc_id", F.xxhash64("shingle").alias("shingle"))
        .persist()
    )
    sh.count()
    pairs = dedup.jaccard_pairs(sh, "doc_id", 0.0)
    contain = F.round(
        F.col("n_common") / F.least("n_a", "n_b"), 4
    )
    return (
        pairs.select(
            "id_a",
            "id_b",
            "n_common",
            "n_a",
            "n_b",
            contain.alias("containment"),
            F.when(F.col("n_a") <= F.col("n_b"), "a_in_b")
            .otherwise("b_in_a")
            .alias("direction"),
        )
        .filter(F.col("containment") >= 0.8)
    )


RAKE_STOPWORDS = (
    "the a an and of to in is on for with as by at be this that it from "
    "or are was were but not have has had they you we his her its their "
    "our your i he she them us"
).split()
RAKE_MAX_WORDS = 4
RAKE_TOP = 30
_RAKE_STOP_RE = r"\b(?:" + "|".join(RAKE_STOPWORDS) + r")\b"


@query(
    "rake_keywords",
    f"""
    WITH docs AS (
      SELECT regexp_replace(
               regexp_replace(lower(text), '[^a-z ]+', '|', 'g'),
               '{_RAKE_STOP_RE}', '|', 'g') AS s
      FROM documents WHERE lang = 'en'
    ),
    occ AS MATERIALIZED (
      SELECT p, len(string_split(p, ' ')) AS n_words
      FROM (
        SELECT trim(regexp_replace(x, ' +', ' ', 'g')) AS p
        FROM docs, unnest(string_split(s, '|')) AS t(x)
      ) WHERE p <> ''
    ),
    occ_ok AS MATERIALIZED (
      SELECT * FROM occ WHERE n_words <= {RAKE_MAX_WORDS}
    ),
    wstat AS (
      SELECT w, count(*) AS freq, CAST(sum(n_words) AS BIGINT) AS degree
      FROM occ_ok, unnest(string_split(p, ' ')) AS u(w)
      GROUP BY w
    ),
    pdist AS (
      SELECT p, n_words, count(*) AS cnt FROM occ_ok GROUP BY p, n_words
    ),
    pscore AS (
      SELECT d.p, d.n_words, d.cnt,
             round(sum(ws.degree * 1.0 / ws.freq), 4) AS score
      FROM pdist d, unnest(string_split(d.p, ' ')) AS u(w)
      JOIN wstat ws ON ws.w = u.w
      GROUP BY d.p, d.n_words, d.cnt
    )
    SELECT p AS phrase, CAST(n_words AS BIGINT) AS n_words,
           CAST(cnt AS BIGINT) AS cnt, score
    FROM (
      SELECT *, row_number() OVER (ORDER BY score DESC, p) AS rn FROM pscore
    ) WHERE rn <= {RAKE_TOP}
    """,
)
def rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010) over the English
    corpus slice: candidate phrases are maximal stopword/punctuation-
    free word runs; each word scores ``degree/frequency`` (degree =
    summed length of the phrases it appears in), and a phrase scores
    the sum of its member-word scores — the unsupervised keyphrase
    baseline used to tag corpora before any model-based labeling.

    Shape: documents are scanned ONCE; phrase splitting is two JVM
    regex passes + a split (no Python in the pipeline), and the
    word/phrase statistics are two groupBys over the exploded phrase
    frame, joined back by a broadcast of the vocabulary-bounded word-
    score table.  Degree/freq are exact integers, so word scores are
    bit-identical ratios; the phrase-score sum (a few doubles) is
    rounded at 4dp, orders beyond the ~1e-15 order jitter, and the
    top-{RAKE_TOP} cut orders by (rounded score, phrase)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    s = F.regexp_replace(
        F.regexp_replace(F.lower("text"), "[^a-z ]+", "|"),
        _RAKE_STOP_RE,
        "|",
    )
    occ = (
        docs.select(F.explode(F.split(s, r"\|")).alias("x"))
        .select(F.trim(F.regexp_replace("x", " +", " ")).alias("p"))
        .filter(F.col("p") != "")
        .select("p", F.size(F.split("p", " ")).alias("n_words"))
        .filter(F.col("n_words") <= RAKE_MAX_WORDS)
    )
    occ.persist()
    wstat = (
        occ.select(F.explode(F.split("p", " ")).alias("w"), "n_words")
        .groupBy("w")
        .agg(
            F.count("*").alias("freq"),
            F.sum("n_words").cast("long").alias("degree"),
        )
    )
    pdist = occ.groupBy("p", "n_words").agg(F.count("*").alias("cnt"))
    pscore = (
        pdist.select("p", "n_words", "cnt", F.explode(F.split("p", " ")).alias("w"))
        .join(F.broadcast(wstat), "w")
        .groupBy("p", "n_words", "cnt")
        .agg(
            F.round(
                F.sum(F.col("degree") * 1.0 / F.col("freq")), 4
            ).alias("score")
        )
    )
    out = (
        pscore.withColumn(
            "rn",
            F.row_number().over(
                Window.orderBy(F.col("score").desc(), F.col("p"))
            ),
        )
        .filter(F.col("rn") <= RAKE_TOP)
        .select(
            F.col("p").alias("phrase"),
            F.col("n_words").cast("long").alias("n_words"),
            F.col("cnt").cast("long").alias("cnt"),
            "score",
        )
    )
    return out


@query(
    "bitext_margin_mining",
    oracle="""
    WITH src AS (SELECT vec_id AS sid, embedding AS sv FROM embeddings
                 WHERE label = 0),
    tgt AS (SELECT vec_id AS tid, embedding AS tv FROM embeddings
            WHERE label = 1),
    scored AS MATERIALIZED (
      SELECT sid, tid,
             round(list_cosine_similarity(s.sv::DOUBLE[], t.tv::DOUBLE[]), 6)
               AS sim
      FROM src s CROSS JOIN tgt t
    ),
    fwd AS MATERIALIZED (
      SELECT sid, avg(sim) AS fk FROM (
        SELECT sid, sim, row_number() OVER (
          PARTITION BY sid ORDER BY sim DESC, tid) AS rn
        FROM scored
      ) WHERE rn <= 4 GROUP BY sid
    ),
    bwd AS MATERIALIZED (
      SELECT tid, avg(sim) AS bk FROM (
        SELECT tid, sim, row_number() OVER (
          PARTITION BY tid ORDER BY sim DESC, sid) AS rn
        FROM scored
      ) WHERE rn <= 4 GROUP BY tid
    ),
    margins AS (
      SELECT s.sid, s.tid, s.sim,
             round(s.sim / ((f.fk + b.bk) / 2) - 1e-9, 4) AS margin
      FROM scored s
      JOIN fwd f ON f.sid = s.sid
      JOIN bwd b ON b.tid = s.tid
    ),
    best AS (
      SELECT *, row_number() OVER (
        PARTITION BY sid ORDER BY margin DESC, tid) AS rn
      FROM margins
    )
    SELECT sid, tid, round(sim, 4) AS cosine_sim, margin
    FROM best WHERE rn = 1 AND margin >= 1.0
    ORDER BY margin DESC, sid, tid
    LIMIT 30
    """,
)
def bitext_margin_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitext mining with RATIO MARGIN scoring (Artetxe & Schwenk, the
    LASER/CCMatrix recipe): label-0 vectors play the source language,
    label-1 the target; each source's best target is scored by
    ``sim / mean(avg-top-4 forward, avg-top-4 backward)`` and kept only
    above margin 1.0 — raw cosine keeps hubs (vectors near everything),
    the margin criterion kills them; this is the parallel-corpus miner
    behind large-scale MT training data.

    Scale shape: the dense score block is |src|·|tgt| with the smaller
    side broadcast (the production path buckets through the ANN index
    first — `ann_lsh_topk` — and margins only the candidate lists; the
    exact block here doubles as that path's verify oracle).  The
    forward/backward top-k means reduce per source/target then
    broadcast back onto the scored block.

    Determinism: sims round to 6 BEFORE ranking and averaging, margins
    to 4 with the −1e-9 guard; every window carries an id tiebreak."""
    emb = load_table(spark, sf_dir, "embeddings")
    src = emb.filter(F.col("label") == 0).select(
        F.col("vec_id").alias("sid"), F.col("embedding").alias("sv")
    )
    tgt = emb.filter(F.col("label") == 1).select(
        F.col("vec_id").alias("tid"), F.col("embedding").alias("tv")
    )
    scored = (
        src.crossJoin(F.broadcast(tgt))
        .select(
            "sid",
            "tid",
            F.round(similarity.cosine(F.col("sv"), F.col("tv")), 6).alias(
                "sim"
            ),
        )
        .persist()
    )
    fw = Window.partitionBy("sid").orderBy(F.col("sim").desc(), "tid")
    fwd = (
        scored.withColumn("rn", F.row_number().over(fw))
        .filter(F.col("rn") <= 4)
        .groupBy("sid")
        .agg(F.avg("sim").alias("fk"))
    )
    bw = Window.partitionBy("tid").orderBy(F.col("sim").desc(), "sid")
    bwd = (
        scored.withColumn("rn", F.row_number().over(bw))
        .filter(F.col("rn") <= 4)
        .groupBy("tid")
        .agg(F.avg("sim").alias("bk"))
    )
    margins = (
        scored.join(F.broadcast(fwd), "sid")
        .join(F.broadcast(bwd), "tid")
        .select(
            "sid",
            "tid",
            "sim",
            F.round(
                F.col("sim") / ((F.col("fk") + F.col("bk")) / 2) - 1e-9, 4
            ).alias("margin"),
        )
    )
    mw = Window.partitionBy("sid").orderBy(F.col("margin").desc(), "tid")
    return (
        margins.withColumn("rn", F.row_number().over(mw))
        .filter((F.col("rn") == 1) & (F.col("margin") >= 1.0))
        .select(
            "sid", "tid", F.round("sim", 4).alias("cosine_sim"), "margin"
        )
        .orderBy(F.col("margin").desc(), "sid", "tid")
        .limit(30)
    )


@query(
    "avi_stream_stats",
    oracle="""
    WITH g AS (SELECT doc_id, 5 + doc_id % 6 AS nf FROM documents),
    fr AS (
      SELECT g.doc_id, g.nf,
             100 + (g.doc_id * 13 + t.i * 7) % 50 AS fsz
      FROM g, unnest(range(0, g.nf)) AS t(i)
    )
    SELECT doc_id,
           CAST(any_value(nf) AS INT) AS n_frames,
           CAST(33333 + (doc_id % 5) * 1000 AS INT) AS us_per_frame,
           CAST(64 AS INT) AS width,
           CAST(48 AS INT) AS height,
           CAST(sum(fsz) AS BIGINT) AS total_bytes,
           CAST(max(fsz) AS INT) AS max_frame,
           CAST(min(fsz) AS INT) AS min_frame
    FROM fr GROUP BY doc_id
    """,
)
def avi_stream_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video-container decode end-to-end: deterministic frame
    streams are serialized to genuine AVI bytes (RIFF hdrl with
    MainAVIHeader + 'vids'/'MJPG' stream headers, a movi LIST of 00dc
    chunks, and a classic idx1 index — functions/multimodal.
    encode_avi_mjpeg), then a SEPARATE Arrow-batched stage walks the
    container back (decode_avi_meta: cadence/dims from the header,
    frame sizes from the movi chunk walk, CROSS-CHECKED against idx1 —
    a disagreeing index raises) and reduces to the exact-integer
    bitrate/cadence profile a video-curation pipeline computes before
    any codec pass.  Frame PAYLOAD decode (the MJPG bytes) genuinely
    needs a codec library and stays behind the documented plug-in
    point; everything container-level is real.  Completes the
    audio (WAV) / image (BMP, PNG) / video (AVI) codec ladder."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    avis = multimodal.synth_avi_corpus(docs)
    return multimodal.decoded_avi_stats(avis)
