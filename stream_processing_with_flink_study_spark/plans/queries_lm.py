"""Language-model-flavored corpus queries (eighth wave, continued):
Flesch reading-ease profiling and a HELD-OUT trigram stupid-backoff
cross-entropy screen — the order-3 upgrade of the corpus xent family
(``queries_corpus.unigram_xent_filter`` / ``bigram_xent_filter``) where,
because the LM is counted on a train split and scored on the held-out
half, the backoff path actually fires on unseen n-grams (the in-corpus
order-2 filter never backs off by construction).

Oracle-determinism notes (see plans/registry.py conventions):
- syllable/word/sentence counts are regexp-match counts — identical
  integer inputs on both engines (`regexp_extract_all` semantics agree
  for the character classes used);
- backoff LEVEL decisions are NULL-presence checks on exact integer
  count joins — no float boundary anywhere; probabilities are rationals
  of identical integers, so per-position log₂ terms are bit-identical
  and only the per-group averages carry the −1e-9-guarded rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text
from ..sources import load_table
from .registry import query

BACKOFF = 0.4  # stupid-backoff discount (Brants et al. 2007)


@query(
    "flesch_reading_ease",
    """
    WITH c AS (
      SELECT source, lang,
             len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS words,
             len(regexp_extract_all(lower(text), '[aeiouy]+')) AS syl,
             greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
               AS sents
      FROM documents
    ),
    s AS (
      SELECT source, lang, words, syl, sents,
             206.835 - 1.015 * (CAST(words AS DOUBLE) / sents)
                     - 84.6 * (CAST(syl AS DOUBLE) / words) AS fre
      FROM c WHERE words > 0
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(fre) - 1e-9, 4) AS avg_reading_ease,
           round(min(fre) - 1e-9, 4) AS min_reading_ease,
           round(avg(CAST(words AS DOUBLE) / sents) - 1e-9, 4)
             AS avg_words_per_sentence,
           round(avg(CAST(syl AS DOUBLE) / words) - 1e-9, 4)
             AS avg_syllables_per_word,
           CAST(sum(CASE WHEN round(fre - 1e-9, 4) >= 60.0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_plain_english
    FROM s
    GROUP BY source
    ORDER BY source
    """,
)
def flesch_reading_ease(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease score per source — ``206.835 − 1.015·(words/
    sentences) − 84.6·(syllables/word)`` with the standard vowel-group
    syllable heuristic — the readability screen a curation pipeline
    runs to spot sources whose "text" is actually tables, code, or
    keyword stuffing (absurd words-per-sentence or syllable densities).
    The plain-English count thresholds the ROUNDED score (FRE ≥ 60) so
    both engines agree on boundary docs.  One scan, three regexp match
    counts per doc, one tiny groupBy — embarrassingly parallel at any
    corpus size."""
    d = load_table(spark, sf_dir, "documents")
    words = F.size(
        F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z0-9]+"), F.lit(0))
    )
    syl = F.size(
        F.regexp_extract_all(F.lower(F.col("text")), F.lit("[aeiouy]+"), F.lit(0))
    )
    sents = F.greatest(
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[.!?]+"), F.lit(0))),
        F.lit(1),
    )
    c = d.select(
        "source",
        words.alias("words"),
        syl.alias("syl"),
        sents.alias("sents"),
    ).filter(F.col("words") > 0)
    wps = F.col("words").cast("double") / F.col("sents")
    spw = F.col("syl").cast("double") / F.col("words")
    s = c.withColumn("fre", 206.835 - 1.015 * wps - 84.6 * spw)
    return (
        s.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(F.avg("fre") - 1e-9, 4).alias("avg_reading_ease"),
            F.round(F.min("fre") - 1e-9, 4).alias("min_reading_ease"),
            F.round(F.avg(wps) - 1e-9, 4).alias("avg_words_per_sentence"),
            F.round(F.avg(spw) - 1e-9, 4).alias("avg_syllables_per_word"),
            F.sum(
                F.when(F.round(F.col("fre") - 1e-9, 4) >= 60.0, 1).otherwise(
                    0
                )
            )
            .cast("long")
            .alias("n_plain_english"),
        )
        .orderBy("source")
    )


@query(
    "trigram_backoff_xent",
    f"""
    WITH toks AS MATERIALIZED (
      SELECT doc_id, source, doc_id % 2 = 0 AS is_train,
             regexp_split_to_array(lower(trim(text)), '\\s+') AS arr
      FROM documents
    ),
    tri AS MATERIALIZED (
      SELECT doc_id, source, is_train,
             arr[i] AS w1, arr[i + 1] AS w2, arr[i + 2] AS w3
      FROM toks, unnest(range(1, len(arr) - 1)) AS x(i)
    ),
    c3 AS MATERIALIZED (
      SELECT w1, w2, w3, CAST(count(*) AS BIGINT) AS c
      FROM tri WHERE is_train GROUP BY w1, w2, w3
    ),
    c2 AS MATERIALIZED (
      SELECT w1, w2, CAST(sum(c) AS BIGINT) AS c
      FROM c3 GROUP BY w1, w2
    ),
    c1 AS MATERIALIZED (
      SELECT w1, CAST(sum(c) AS BIGINT) AS c
      FROM c2 GROUP BY w1
    ),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM c1),
    scored AS MATERIALIZED (
      SELECT q.source,
             CASE WHEN t3.c IS NOT NULL THEN 3
                  WHEN b23.c IS NOT NULL THEN 2
                  WHEN u3.c IS NOT NULL THEN 1
                  ELSE 0 END AS lvl,
             CASE WHEN t3.c IS NOT NULL
                    THEN log2(CAST(t3.c AS DOUBLE) / b12.c)
                  WHEN b23.c IS NOT NULL
                    THEN log2({BACKOFF!r} * CAST(b23.c AS DOUBLE) / u2.c)
                  WHEN u3.c IS NOT NULL
                    THEN log2({BACKOFF!r} * {BACKOFF!r}
                              * CAST(u3.c AS DOUBLE) / tot.t)
                  ELSE log2({BACKOFF!r} * {BACKOFF!r} * 1.0 / tot.t)
             END AS logp
      FROM tri q
      LEFT JOIN c3 t3 ON t3.w1 = q.w1 AND t3.w2 = q.w2 AND t3.w3 = q.w3
      LEFT JOIN c2 b12 ON b12.w1 = q.w1 AND b12.w2 = q.w2
      LEFT JOIN c2 b23 ON b23.w1 = q.w2 AND b23.w2 = q.w3
      LEFT JOIN c1 u2 ON u2.w1 = q.w2
      LEFT JOIN c1 u3 ON u3.w1 = q.w3
      CROSS JOIN tot
      WHERE NOT q.is_train
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_trigrams,
           round(avg(-logp) - 1e-9, 4) AS xent_bits,
           CAST(sum(CASE WHEN lvl = 3 THEN 1 ELSE 0 END) AS BIGINT)
             AS hits_trigram,
           CAST(sum(CASE WHEN lvl = 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS hits_bigram,
           CAST(sum(CASE WHEN lvl = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS hits_unigram,
           CAST(sum(CASE WHEN lvl = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS oov,
           round(sum(CASE WHEN lvl = 3 THEN 1.0 ELSE 0 END) / count(*)
                 - 1e-9, 4) AS trigram_hit_rate
    FROM scored
    GROUP BY source
    ORDER BY source
    """,
)
def trigram_backoff_xent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out trigram cross-entropy with STUPID BACKOFF (Brants et
    al., "Large Language Models in Machine Translation", 2007): count
    the n-gram tables on the even-doc_id train split, score the odd
    half — S(w₃|w₁w₂) falls back 0.4·S(w₃|w₂), then 0.4²·c(w₃)/T, then
    an 0.4²/T OOV floor.  Because scoring is held-out, every backoff
    level genuinely fires (the in-corpus bigram filter never backs
    off), making this the honest perplexity screen for spotting
    machine-generated or off-domain text.

    Scale shape: one trigram explode feeds all three count tables
    (map-side combinable groupBys) AND the scoring stream; the count
    tables are vocab-sized, so the five lookups attach by BROADCAST
    hash joins — the held-out stream itself shuffles only for the
    final per-source rollup.  Level decisions are NULL-checks on
    integer joins; each log₂ term is a rational of identical integers,
    bit-identical across engines before the rounded average."""
    docs = load_table(spark, sf_dir, "documents")
    arr = text.tokens("text")
    toks = docs.select(
        "doc_id",
        "source",
        (F.col("doc_id") % 2 == 0).alias("is_train"),
        arr.alias("arr"),
    )
    n = F.size("arr")
    tri = (
        toks.select(
            "doc_id",
            "source",
            "is_train",
            F.explode(
                F.filter(
                    F.zip_with(
                        F.zip_with(
                            F.col("arr"),
                            F.slice(F.col("arr"), 2, F.greatest(n - 1, F.lit(0))),
                            lambda a, b: F.struct(
                                a.alias("w1"), b.alias("w2")
                            ),
                        ),
                        F.slice(F.col("arr"), 3, F.greatest(n - 2, F.lit(0))),
                        lambda ab, c: F.struct(
                            ab.w1.alias("w1"),
                            ab.w2.alias("w2"),
                            c.alias("w3"),
                        ),
                    ),
                    lambda s: s.w1.isNotNull()
                    & s.w2.isNotNull()
                    & s.w3.isNotNull(),
                )
            ).alias("g"),
        )
        .select(
            "source",
            "is_train",
            F.col("g.w1").alias("w1"),
            F.col("g.w2").alias("w2"),
            F.col("g.w3").alias("w3"),
        )
    )
    # c2/c1 are PREFIX SUMS of c3 (every trigram row contributes its
    # (w1,w2) / w1 position exactly once), so one eager vocab-sized
    # trigram count table feeds every LM level — the corpus is scanned
    # twice total (count build + held-out scoring), never once per
    # n-gram order, and nothing fact-sized stays cached.
    c3 = (
        tri.filter("is_train")
        .groupBy("w1", "w2", "w3")
        .agg(F.count(F.lit(1)).cast("long").alias("c3"))
        .localCheckpoint()
    )
    c2 = c3.groupBy("w1", "w2").agg(F.sum("c3").cast("long").alias("c2"))
    c1 = c2.groupBy("w1").agg(F.sum("c2").cast("long").alias("c1"))
    t_total = c1.agg(F.sum("c1")).first()[0]
    if t_total is None:
        # empty corpus: no unigram mass to back off to, the oracle
        # emits 0 rows (round-12 degenerate sweep)
        return spark.createDataFrame(
            [],
            "source string, n_trigrams long, xent_bits double, "
            "hits_trigram long, hits_bigram long, hits_unigram long, "
            "oov long, trigram_hit_rate double",
        )
    q = tri.filter(~F.col("is_train"))
    b23 = c2.select(
        F.col("w1").alias("w2"),
        F.col("w2").alias("w3"),
        F.col("c2").alias("c23"),
    )
    u2 = c1.select(F.col("w1").alias("w2"), F.col("c1").alias("cu2"))
    u3 = c1.select(F.col("w1").alias("w3"), F.col("c1").alias("cu3"))
    j = (
        q.join(F.broadcast(c3), ["w1", "w2", "w3"], "left")
        .join(F.broadcast(c2), ["w1", "w2"], "left")
        .join(F.broadcast(b23), ["w2", "w3"], "left")
        .join(F.broadcast(u2), ["w2"], "left")
        .join(F.broadcast(u3), ["w3"], "left")
    )
    lvl = (
        F.when(F.col("c3").isNotNull(), 3)
        .when(F.col("c23").isNotNull(), 2)
        .when(F.col("cu3").isNotNull(), 1)
        .otherwise(0)
    )
    logp = (
        F.when(
            F.col("c3").isNotNull(),
            F.log2(F.col("c3").cast("double") / F.col("c2")),
        )
        .when(
            F.col("c23").isNotNull(),
            F.log2(
                F.lit(BACKOFF) * F.col("c23").cast("double") / F.col("cu2")
            ),
        )
        .when(
            F.col("cu3").isNotNull(),
            F.log2(
                F.lit(BACKOFF * BACKOFF)
                * F.col("cu3").cast("double")
                / F.lit(float(t_total))
            ),
        )
        .otherwise(
            F.log2(F.lit(BACKOFF * BACKOFF) * 1.0 / F.lit(float(t_total)))
        )
    )
    scored = j.select("source", lvl.alias("lvl"), logp.alias("logp"))
    out = (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_trigrams"),
            F.round(F.avg(-F.col("logp")) - 1e-9, 4).alias("xent_bits"),
            F.sum(F.when(F.col("lvl") == 3, 1).otherwise(0))
            .cast("long")
            .alias("hits_trigram"),
            F.sum(F.when(F.col("lvl") == 2, 1).otherwise(0))
            .cast("long")
            .alias("hits_bigram"),
            F.sum(F.when(F.col("lvl") == 1, 1).otherwise(0))
            .cast("long")
            .alias("hits_unigram"),
            F.sum(F.when(F.col("lvl") == 0, 1).otherwise(0))
            .cast("long")
            .alias("oov"),
            F.round(
                F.sum(F.when(F.col("lvl") == 3, 1.0).otherwise(0.0))
                / F.count(F.lit(1))
                - 1e-9,
                4,
            ).alias("trigram_hit_rate"),
        )
        .orderBy("source")
    )
    return out


# --------------------------------------------------------------------------
# unigram-LM (SentencePiece-style) tokenization
# --------------------------------------------------------------------------
ULM_MAX_PIECE = 4  # max piece length (chars)
ULM_MAX_WORD = 12  # words longer than this are dropped (data max: 8)
ULM_TOP_GRAMS = 300  # multi-char vocabulary budget (all 1-grams kept)
ULM_TOP_OUT = 20  # emitted leaderboard size

_ULM_SQL = f"""
WITH RECURSIVE words AS MATERIALIZED (
  SELECT w AS word, CAST(count(*) AS BIGINT) AS wcount,
         CAST(length(w) AS BIGINT) AS wlen
  FROM (
    SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents
  )
  WHERE w <> '' AND regexp_matches(w, '^[a-z]+$')
    AND length(w) <= {ULM_MAX_WORD}
  GROUP BY w
),
grams AS MATERIALIZED (
  SELECT substr(w.word, CAST(i.range AS INTEGER), CAST(n.range AS INTEGER))
           AS piece,
         CAST(n.range AS BIGINT) AS plen,
         CAST(sum(w.wcount) AS BIGINT) AS cnt
  FROM words w, range(1, {ULM_MAX_WORD} + 1) i, range(1, {ULM_MAX_PIECE} + 1) n
  WHERE CAST(i.range AS BIGINT) + CAST(n.range AS BIGINT) - 1 <= w.wlen
  GROUP BY 1, 2
),
vocab AS MATERIALIZED (
  SELECT piece, plen, cnt,
         CAST(floor(-ln(CAST(cnt AS DOUBLE)
                        / sum(cnt) OVER ()) * 1e6 + 0.5) AS BIGINT)
           AS cost
  FROM (
    SELECT piece, plen, cnt FROM grams WHERE plen = 1
    UNION ALL
    SELECT piece, plen, cnt FROM (
      SELECT piece, plen, cnt,
             row_number() OVER (ORDER BY cnt DESC, piece) AS rk
      FROM grams WHERE plen > 1
    ) WHERE rk <= {ULM_TOP_GRAMS}
  )
),
paths (word, wcount, wlen, pos, cost, np, path) AS (
  SELECT word, wcount, wlen, CAST(0 AS BIGINT), CAST(0 AS BIGINT),
         CAST(0 AS BIGINT), ''
  FROM words
  UNION
  SELECT p.word, p.wcount, p.wlen, p.pos + v.plen, p.cost + v.cost,
         p.np + 1,
         CASE WHEN p.path = '' THEN v.piece
              ELSE p.path || '|' || v.piece END
  FROM paths p JOIN vocab v
    ON p.pos + v.plen <= p.wlen
   AND substr(p.word, CAST(p.pos AS INTEGER) + 1,
              CAST(v.plen AS INTEGER)) = v.piece
),
best AS MATERIALIZED (
  SELECT word, wcount, cost, np, path
  FROM (
    SELECT word, wcount, cost, np, path,
           row_number() OVER (PARTITION BY word
                              ORDER BY cost, np, path) AS rk
    FROM paths WHERE pos = wlen
  ) WHERE rk = 1
),
usage AS (
  SELECT u.piece, CAST(sum(b.wcount) AS BIGINT) AS n_uses
  FROM best b, unnest(string_split(b.path, '|')) AS u(piece)
  GROUP BY u.piece
),
summary AS (
  SELECT round(CAST(sum(np * wcount) AS DOUBLE) / sum(wcount) - 1e-9, 4)
           AS pieces_per_token
  FROM best
)
SELECT u.piece, v.cost AS cost_micro_nll, u.n_uses,
       round(CAST(u.n_uses AS DOUBLE)
             / sum(u.n_uses) OVER () - 1e-9, 4) AS usage_share,
       s.pieces_per_token
FROM usage u JOIN vocab v ON v.piece = u.piece CROSS JOIN summary s
ORDER BY u.n_uses DESC, u.piece LIMIT {ULM_TOP_OUT}
"""


@query("unigram_lm_tokenize", _ULM_SQL)
def unigram_lm_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM tokenization (the SentencePiece/Kudo-2018 inference
    step): segment every corpus token into the MIN-COST sequence of
    vocabulary pieces, where a piece's cost is its fixed-point negative
    log-probability under the corpus character-n-gram unigram model
    (all 1-grams — the lossless fallback — plus the top
    {ULM_TOP_GRAMS} multi-char grams).  Emitted: the piece-usage
    leaderboard and the corpus pieces-per-token rate — the
    "how well does this vocabulary compress the corpus" number
    tokenizer training sweeps optimize.

    Exactness: piece costs are INTEGER micro-nats (floor(−ln p·1e6)),
    so segmentation totals are exact BIGINTs and the
    (cost, n_pieces, path) tiebreak is deterministic — the Spark side
    enumerates segmentations per DISTINCT word (bounded: ≤ 2^11 for
    {ULM_MAX_WORD}-char words) inside one Arrow batch, while the
    DuckDB oracle enumerates the same lattice as a recursive CTE and
    must pick the identical winner, hash-checked end to end.

    Scale shape: like BPE training (`functions/bpe.py`), the corpus
    collapses to DISTINCT words first — segmentation cost is
    vocabulary-bounded, not corpus-bounded; the vocab (≤ {ULM_TOP_GRAMS}
    + alphabet rows) is the one bounded driver collect, shipped into
    the Arrow UDF like IVF centroids."""
    from collections.abc import Iterator

    import pandas as pd

    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(
            F.explode(F.split(F.lower("text"), " ")).alias("word")
        )
        .filter(
            (F.col("word") != "")
            & F.col("word").rlike("^[a-z]+$")
            & (F.length("word") <= ULM_MAX_WORD)
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("wcount"))
        .withColumn("wlen", F.length("word").cast("long"))
    )
    words.persist()
    grams = (
        words.select(
            "word",
            "wcount",
            "wlen",
            F.explode(
                F.sequence(F.lit(1), F.lit(ULM_MAX_WORD))
            ).alias("i"),
        )
        .select(
            "word",
            "wcount",
            "wlen",
            "i",
            F.explode(
                F.sequence(F.lit(1), F.lit(ULM_MAX_PIECE))
            ).alias("n"),
        )
        .filter(F.col("i") + F.col("n") - 1 <= F.col("wlen"))
        .select(
            F.expr("substr(word, i, n)").alias("piece"),
            F.col("n").cast("long").alias("plen"),
            "wcount",
        )
        .groupBy("piece", "plen")
        .agg(F.sum("wcount").cast("long").alias("cnt"))
    )
    from pyspark.sql.window import Window

    multi = (
        grams.filter(F.col("plen") > 1)
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy().orderBy(F.desc("cnt"), "piece")
            ),
        )
        .filter(F.col("rk") <= ULM_TOP_GRAMS)
        .drop("rk")
    )
    vocab = grams.filter(F.col("plen") == 1).unionByName(multi)
    vocab = vocab.withColumn(
        "cost",
        F.floor(
            -F.log(
                F.col("cnt")
                / F.sum("cnt").over(Window.partitionBy())
            )
            * 1e6
            + 0.5
        ).cast("long"),
    )
    vocab.persist()
    # the one bounded driver collect (<= alphabet + ULM_TOP_GRAMS rows)
    vtable = {
        r["piece"]: int(r["cost"]) for r in vocab.select("piece", "cost").collect()
    }

    def segment(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            out = []
            for word, wcount in zip(pdf["word"], pdf["wcount"]):
                n = len(word)
                # enumerate all vocab segmentations, pick the exact
                # (cost, n_pieces, path) minimum — same rule as the
                # oracle's recursive lattice
                best = None
                stack = [(0, 0, 0, [])]
                while stack:
                    pos, cost, np_, path = stack.pop()
                    if pos == n:
                        cand = (cost, np_, "|".join(path))
                        if best is None or cand < best:
                            best = cand
                        continue
                    for ln in range(1, min(ULM_MAX_PIECE, n - pos) + 1):
                        piece = word[pos : pos + ln]
                        c = vtable.get(piece)
                        if c is not None:
                            stack.append(
                                (pos + ln, cost + c, np_ + 1, path + [piece])
                            )
                out.append(
                    (word, int(wcount), best[0], best[1], best[2])
                )
            yield pd.DataFrame(
                out, columns=["word", "wcount", "cost", "np", "path"]
            )

    best = words.select("word", "wcount").mapInPandas(
        segment, "word string, wcount long, cost long, np long, path string"
    )
    best.persist()
    usage = (
        best.select(
            F.explode(F.split("path", r"\|")).alias("piece"), "wcount"
        )
        .groupBy("piece")
        .agg(F.sum("wcount").cast("long").alias("n_uses"))
    )
    summary = best.agg(
        F.round(
            F.sum(F.col("np") * F.col("wcount"))
            / F.sum("wcount")
            - 1e-9,
            4,
        ).alias("pieces_per_token")
    )
    out = (
        usage.join(
            F.broadcast(vocab.select("piece", F.col("cost").alias("cost_micro_nll"))),
            "piece",
        )
        .withColumn(
            "usage_share",
            F.round(
                F.col("n_uses")
                / F.sum("n_uses").over(Window.partitionBy())
                - 1e-9,
                4,
            ),
        )
        .crossJoin(F.broadcast(summary))
        .select(
            "piece", "cost_micro_nll", "n_uses", "usage_share",
            "pieces_per_token",
        )
        .orderBy(F.desc("n_uses"), "piece")
        .limit(ULM_TOP_OUT)
    )
    result = out.localCheckpoint()
    words.unpersist()
    vocab.unpersist()
    best.unpersist()
    return result


# --------------------------------------------------------------------------
# multinomial Naive Bayes language classifier, trained and evaluated in SQL
# --------------------------------------------------------------------------
NB_TEST_MOD = 5  # doc_id % 5 == 0 is the held-out fifth


@query(
    "naive_bayes_lang_eval",
    f"""
    WITH tok AS (
      SELECT doc_id, lang, doc_id % {NB_TEST_MOD} = 0 AS is_test, t
      FROM documents,
           unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS u(t)
    ),
    tc AS MATERIALIZED (
      SELECT lang, t, CAST(count(*) AS BIGINT) AS c
      FROM tok WHERE NOT is_test GROUP BY lang, t
    ),
    lt AS MATERIALIZED (
      SELECT lang, CAST(sum(c) AS BIGINT) AS tot FROM tc GROUP BY lang
    ),
    voc AS (SELECT CAST(count(DISTINCT t) AS BIGINT) AS v FROM tc),
    pd AS (
      SELECT lang, CAST(count(DISTINCT doc_id) AS BIGINT) AS nd
      FROM tok WHERE NOT is_test GROUP BY lang
    ),
    langs AS MATERIALIZED (
      -- per-lang constants, all in exact integer micro-nats
      SELECT lt.lang, lt.tot, voc.v,
             CAST(floor(ln(CAST(1 AS DOUBLE) / (lt.tot + voc.v)) * 1000000
                        + 0.5) AS BIGINT) AS lp0,
             CAST(floor(ln(pd.nd * CAST(1 AS DOUBLE)
                           / (SELECT sum(nd) FROM pd)) * 1000000 + 0.5)
                  AS BIGINT) AS prior6
      FROM lt JOIN pd ON pd.lang = lt.lang CROSS JOIN voc
    ),
    probs AS MATERIALIZED (
      SELECT tc.lang, tc.t,
             CAST(floor(ln((tc.c + CAST(1 AS DOUBLE)) / (lg.tot + lg.v))
                        * 1000000 + 0.5) AS BIGINT) AS lp6
      FROM tc JOIN langs lg ON lg.lang = tc.lang
    ),
    dt AS MATERIALIZED (
      SELECT doc_id, lang AS true_lang, t, CAST(count(*) AS BIGINT) AS cnt
      FROM tok WHERE is_test GROUP BY doc_id, lang, t
    ),
    scored AS MATERIALIZED (
      SELECT dt.doc_id, dt.true_lang, lg.lang AS c_lang,
             CAST(sum(dt.cnt * coalesce(p.lp6, lg.lp0)) AS BIGINT)
               + max(lg.prior6) AS s
      FROM dt CROSS JOIN langs lg
      LEFT JOIN probs p ON p.lang = lg.lang AND p.t = dt.t
      GROUP BY dt.doc_id, dt.true_lang, lg.lang
    ),
    pred AS MATERIALIZED (
      SELECT doc_id, true_lang, c_lang AS pred_lang FROM (
        SELECT *, row_number() OVER (
          PARTITION BY doc_id ORDER BY s DESC, c_lang) AS rn
        FROM scored
      ) WHERE rn = 1
    ),
    acc AS (
      SELECT round(sum(CASE WHEN true_lang = pred_lang THEN 1.0
                            ELSE 0 END) / count(*) - 1e-9, 4) + 0.0 AS a
      FROM pred
    ),
    per AS (
      SELECT l.lang,
             (SELECT CAST(count(*) AS BIGINT) FROM pred
              WHERE true_lang = l.lang) AS n_true,
             (SELECT CAST(count(*) AS BIGINT) FROM pred
              WHERE pred_lang = l.lang) AS n_pred,
             (SELECT CAST(count(*) AS BIGINT) FROM pred
              WHERE true_lang = l.lang AND pred_lang = l.lang) AS tp
      FROM (SELECT DISTINCT lang FROM langs) l
    )
    SELECT lang, n_true, n_pred, tp,
           round(tp / nullif(CAST(n_pred AS DOUBLE), 0) - 1e-9, 4) + 0.0
             AS precision,
           round(tp / nullif(CAST(n_true AS DOUBLE), 0) - 1e-9, 4) + 0.0
             AS recall,
           round(2.0 * tp / nullif(n_pred + CAST(n_true AS DOUBLE), 0)
                 - 1e-9, 4) + 0.0 AS f1,
           acc.a AS accuracy
    FROM per CROSS JOIN acc
    ORDER BY lang
    """,
)
def naive_bayes_lang_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes language classifier — TRAINED AND
    EVALUATED entirely in the engine: Laplace-smoothed token
    likelihoods and class priors fit on 4/5 of the corpus (doc_id mod
    {NB_TEST_MOD} split), argmax posterior on the held-out fifth,
    per-language precision/recall/F1 plus overall accuracy.  The
    generative-model companion to the discriminative heuristics
    (``char_ngram_lang_id``, ``stopword_lang_id``) — and the shape of
    every fastText-style quality/domain classifier a training-data
    pipeline runs at corpus scale.

    Cross-engine exactness (the unigram-LM micro-nat pattern): every
    log-probability is quantized to an exact integer micro-nat BEFORE
    the per-document sum, so document scores are exact BIGINTs —
    argmax can never flip on summation order — and ties break on
    language code.

    Scale shape: training is two token-keyed aggregates (the model is
    |vocab|×|langs| rows — broadcastable here, a token-keyed shuffle
    join at 100 TB); scoring joins test doc-token counts against the
    model and reduces per (doc, lang).  No Python anywhere.

    The driver corpus shares one token pool across languages, so
    measured accuracy (~0.42) reflects data separability, not the
    model; tests/test_stattests.py runs the SAME pipeline
    (:func:`nb_lang_eval_frame`) on a planted separable corpus and
    requires accuracy 1.0."""
    return nb_lang_eval_frame(load_table(spark, sf_dir, "documents"))


def nb_lang_eval_frame(docs: DataFrame) -> DataFrame:
    """The Naive Bayes train+eval pipeline over any (doc_id, lang,
    text) frame — factored out so tests can run it on planted
    corpora; see :func:`naive_bayes_lang_eval`."""
    tok = docs.select(
        "doc_id",
        "lang",
        (F.col("doc_id") % NB_TEST_MOD == 0).alias("is_test"),
        F.explode(text.tokens("text")).alias("t"),
    ).persist()
    tc = (
        tok.filter(~F.col("is_test"))
        .groupBy("lang", "t")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .persist()
    )
    lt = tc.groupBy("lang").agg(F.sum("c").cast("long").alias("tot"))
    voc = tc.agg(F.countDistinct("t").cast("long").alias("v"))
    pd_ = (
        tok.filter(~F.col("is_test"))
        .groupBy("lang")
        .agg(F.countDistinct("doc_id").cast("long").alias("nd"))
    )
    ntd = pd_.agg(F.sum("nd").cast("long").alias("ntd"))
    micronat = lambda x: F.floor(F.log(x) * 1000000 + 0.5).cast(  # noqa: E731
        "long"
    )
    langs = (
        lt.join(pd_, "lang")
        .crossJoin(F.broadcast(voc))
        .crossJoin(F.broadcast(ntd))
        .select(
            "lang",
            "tot",
            "v",
            micronat(
                F.lit(1.0) / (F.col("tot") + F.col("v"))
            ).alias("lp0"),
            micronat(
                F.col("nd") * F.lit(1.0) / F.col("ntd")
            ).alias("prior6"),
        )
        .persist()
    )
    probs = tc.join(langs.select("lang", "tot", "v"), "lang").select(
        "lang",
        "t",
        micronat(
            (F.col("c") + F.lit(1.0)) / (F.col("tot") + F.col("v"))
        ).alias("lp6"),
    )
    dt = (
        tok.filter(F.col("is_test"))
        .groupBy("doc_id", F.col("lang").alias("true_lang"), "t")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    lg = langs.select("lang", "lp0", "prior6").withColumnRenamed(
        "lang", "c_lang"
    )
    scored = (
        dt.crossJoin(F.broadcast(lg))
        .join(
            F.broadcast(probs.withColumnRenamed("lang", "c_lang")),
            ["c_lang", "t"],
            "left",
        )
        .groupBy("doc_id", "true_lang", "c_lang")
        .agg(
            (
                F.sum(
                    F.col("cnt") * F.coalesce(F.col("lp6"), F.col("lp0"))
                ).cast("long")
                + F.max("prior6")
            ).alias("s")
        )
    )
    from pyspark.sql.window import Window

    wv = Window.partitionBy("doc_id").orderBy(
        F.col("s").desc(), F.asc("c_lang")
    )
    pred = (
        scored.withColumn("rn", F.row_number().over(wv))
        .filter(F.col("rn") == 1)
        .select("true_lang", F.col("c_lang").alias("pred_lang"))
        .persist()
    )
    acc = pred.agg(
        (
            F.round(
                F.sum(
                    F.when(
                        F.col("true_lang") == F.col("pred_lang"), 1.0
                    ).otherwise(0.0)
                )
                / F.count(F.lit(1))
                - 1e-9,
                4,
            )
            + 0.0
        ).alias("accuracy")
    )
    t_cnt = pred.groupBy(
        F.col("true_lang").alias("lang_t")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_true"))
    p_cnt = pred.groupBy(
        F.col("pred_lang").alias("lang_p")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_pred"))
    tp_cnt = (
        pred.filter(F.col("true_lang") == F.col("pred_lang"))
        .groupBy(F.col("true_lang").alias("lang_tp"))
        .agg(F.count(F.lit(1)).cast("long").alias("tp"))
    )
    base = langs.select(F.col("lang")).distinct()
    per = (
        base.join(t_cnt, base.lang == t_cnt.lang_t, "left")
        .join(p_cnt, base.lang == p_cnt.lang_p, "left")
        .join(tp_cnt, base.lang == tp_cnt.lang_tp, "left")
        .select(
            "lang",
            F.coalesce("n_true", F.lit(0)).alias("n_true"),
            F.coalesce("n_pred", F.lit(0)).alias("n_pred"),
            F.coalesce("tp", F.lit(0)).alias("tp"),
        )
    )
    pr = F.col("tp") / F.nullif(F.col("n_pred").cast("double"), F.lit(0))
    rc = F.col("tp") / F.nullif(F.col("n_true").cast("double"), F.lit(0))
    f1 = (
        2.0
        * F.col("tp")
        / F.nullif(
            (F.col("n_pred") + F.col("n_true")).cast("double"), F.lit(0)
        )
    )
    return (
        per.crossJoin(F.broadcast(acc))
        .select(
            "lang",
            "n_true",
            "n_pred",
            "tp",
            (F.round(pr - 1e-9, 4) + 0.0).alias("precision"),
            (F.round(rc - 1e-9, 4) + 0.0).alias("recall"),
            (F.round(f1 - 1e-9, 4) + 0.0).alias("f1"),
            "accuracy",
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# scaling-law fit: held-out xent vs nested train-subset size
# --------------------------------------------------------------------------
SL_EVAL_MOD = 17  # held-out eval split
SL_LEVELS = 6  # nested subsets: 1/32, 1/16, 1/8, 1/4, 1/2, 1 of train

# md5-prefix thresholds for the nested subset levels (hex-string
# compares: '07' = 8/256 = 1/32 of the hash space, '0' = 1/16, ...)
_SL_LEVEL_CASE = (
    "CASE WHEN substr(md5('sl_' || CAST(doc_id AS {V})), 1, 2) <= '07'"
    " THEN 1"
    " WHEN substr(md5('sl_' || CAST(doc_id AS {V})), 1, 1) = '0' THEN 2"
    " WHEN substr(md5('sl_' || CAST(doc_id AS {V})), 1, 1) <= '1' THEN 3"
    " WHEN substr(md5('sl_' || CAST(doc_id AS {V})), 1, 1) <= '3' THEN 4"
    " WHEN substr(md5('sl_' || CAST(doc_id AS {V})), 1, 1) <= '7' THEN 5"
    " ELSE 6 END"
)


def _sl_oracle() -> str:
    lvl = _SL_LEVEL_CASE.format(V="VARCHAR")
    # nullif guards: a degenerate corpus where every level has the
    # same token count (or xent) zeroes an OLS denominator — ANSI
    # Spark errors on x/0.0 where DuckDB silently NULLs; nullif makes
    # both engines propagate NULL fit columns identically
    slope = (
        "(n * sxy - sx * sy)"
        " / nullif(n * sxx - sx * sx, CAST(0.0 AS DOUBLE))"
    )
    return f"""
    WITH docs_t AS MATERIALIZED (
      SELECT doc_id,
             CASE WHEN doc_id % {SL_EVAL_MOD} = 0 THEN 0
                  ELSE {lvl} END AS lvl,
             text
      FROM documents
    ),
    toks AS MATERIALIZED (
      SELECT lvl,
             unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS t
      FROM docs_t
    ),
    tc AS MATERIALIZED (
      SELECT t, lvl, CAST(count(*) AS BIGINT) AS c
      FROM toks WHERE lvl > 0 AND t <> '' GROUP BY t, lvl
    ),
    ec AS MATERIALIZED (
      SELECT t, CAST(count(*) AS BIGINT) AS w
      FROM toks WHERE lvl = 0 AND t <> '' GROUP BY t
    ),
    lvls AS (SELECT unnest(range(1, {SL_LEVELS} + 1)) AS k),
    nk AS MATERIALIZED (
      SELECT k.k, CAST(coalesce(sum(d.c), 0) AS BIGINT) AS n_tokens
      FROM lvls k LEFT JOIN tc d ON d.lvl <= k.k GROUP BY k.k
    ),
    docs_k AS (
      SELECT k.k, CAST(count(*) AS BIGINT) AS n_docs
      FROM lvls k JOIN docs_t d ON d.lvl > 0 AND d.lvl <= k.k
      GROUP BY k.k
    ),
    vk AS MATERIALIZED (
      SELECT k.k, CAST(count(*) AS BIGINT) AS vocab
      FROM lvls k
      JOIN (SELECT t, min(lvl) AS f FROM tc GROUP BY t) f ON f.f <= k.k
      GROUP BY k.k
    ),
    cek AS (
      SELECT e.t, k.k, e.w, CAST(coalesce(sum(d.c), 0) AS BIGINT) AS c
      FROM ec e CROSS JOIN lvls k
      LEFT JOIN tc d ON d.t = e.t AND d.lvl <= k.k
      GROUP BY e.t, k.k, e.w
    ),
    lp AS (
      SELECT c.k, c.t, c.w,
             c.w * ln((c.c + 1) * 1.0
                      / (n.n_tokens + v.vocab + 1)) AS term
      FROM cek c JOIN nk n ON n.k = c.k JOIN vk v ON v.k = c.k
    ),
    acc AS (
      SELECT k, sum(term) OVER w AS s, sum(w) OVER w AS wsum,
             row_number() OVER (PARTITION BY k ORDER BY t DESC) AS rd
      FROM lp
      WINDOW w AS (PARTITION BY k ORDER BY t ROWS UNBOUNDED PRECEDING)
    ),
    xent AS MATERIALIZED (
      SELECT k, -s / wsum AS xent FROM acc WHERE rd = 1
    ),
    pts AS MATERIALIZED (
      -- nullif: a level with n_docs > 0 but n_tokens = 0 (every doc at
      -- levels <= k tokenizes to nothing) would hit ln(0) — DuckDB
      -- ERRORS where Spark's log returns NULL (divergent failure
      -- modes); nullif makes both engines carry NULL lx/ly instead
      SELECT x.k,
             ln(nullif(n.n_tokens * 1.0, CAST(0.0 AS DOUBLE))) AS lx,
             ln(nullif(x.xent, CAST(0.0 AS DOUBLE))) AS ly,
             n.n_tokens, v.vocab, d.n_docs, x.xent
      FROM xent x JOIN nk n ON n.k = x.k JOIN vk v ON v.k = x.k
      JOIN docs_k d ON d.k = x.k
    ),
    facc AS (
      SELECT sum(lx) OVER w AS sx, sum(ly) OVER w AS sy,
             sum(lx * ly) OVER w AS sxy, sum(lx * lx) OVER w AS sxx,
             sum(ly * ly) OVER w AS syy,
             CAST(count(*) OVER w AS DOUBLE) AS n,
             row_number() OVER (ORDER BY k DESC) AS rd
      FROM pts
      WINDOW w AS (ORDER BY k ROWS UNBOUNDED PRECEDING)
    ),
    fit AS (
      SELECT {slope} AS slope,
             (sy - ({slope}) * sx) / n AS icept,
             (n * sxy - sx * sy) * (n * sxy - sx * sy)
               / nullif((n * sxx - sx * sx) * (n * syy - sy * sy),
                        CAST(0.0 AS DOUBLE)) AS r2
      FROM facc WHERE rd = 1
    )
    SELECT CAST(p.k AS BIGINT) AS level, p.n_docs, p.n_tokens, p.vocab,
           round(p.xent - 1e-9, 4) + 0.0 AS heldout_xent,
           round(f.slope - 1e-9, 4) + 0.0 AS fit_exponent,
           round(exp(f.icept) - 1e-9, 4) + 0.0 AS fit_coef,
           round(f.r2 - 1e-9, 4) + 0.0 AS fit_r2
    FROM pts p CROSS JOIN fit f
    ORDER BY level
    """


@query("scaling_law_fit", _sl_oracle())
def scaling_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data scaling-law measurement — the curve a pretraining team
    draws before buying more data: add-one-smoothed unigram LM
    cross-entropy on a HELD-OUT split (doc_id % {SL_EVAL_MOD}),
    measured at 6 NESTED train subsets (1/32 … 1/1 of the corpus,
    md5-prefix membership so the subsets are deterministic and truly
    nested), then the power-law fit ``xent ≈ coef · N^exponent`` via
    OLS on (ln N, ln xent) — emitting the per-level curve AND the
    fitted exponent/coefficient/R² (Kaplan/Chinchilla-style, the
    2-parameter form without the irreducible-loss term).

    The nesting is the scale trick: level(doc) = the SMALLEST subset
    containing it, so ONE token rollup keyed by (token, level) yields
    every subset's counts as a ≤6-row suffix sum — 6 curve points, one
    corpus scan, constant fan-out.  Determinism: all counts exact
    int64; each log-prob is one ln of a ratio of exact ints; per-level
    xent accumulates through a token-ORDERED window (the mRMR idiom)
    and the 6-point OLS through a level-ORDERED window, so both
    engines sum identical doubles in identical order.  Scale shape:
    eval×level join fans out ≤6 per eval-vocab row; everything else is
    map-side-combinable rollups and ≤6-row frames."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents").selectExpr(
        "doc_id",
        f"CASE WHEN doc_id % {SL_EVAL_MOD} = 0 THEN 0 ELSE "
        + _SL_LEVEL_CASE.format(V="STRING")
        + " END AS lvl",
        "text",
    )
    toks = docs.select(
        "lvl", F.explode(text.tokens("text")).alias("t")
    ).filter(F.col("t") != "")
    tc = (
        toks.filter(F.col("lvl") > 0)
        .groupBy("t", "lvl")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint()
    )
    ec = (
        toks.filter(F.col("lvl") == 0)
        .groupBy("t")
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )
    lvls = spark.range(1, SL_LEVELS + 1).select(
        F.col("id").cast("int").alias("k")
    )
    nk = (
        lvls.join(F.broadcast(tc), tc["lvl"] <= lvls["k"], "left")
        .groupBy("k")
        .agg(
            F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n_tokens")
        )
    )
    docs_k = (
        lvls.join(
            docs.select("lvl"),
            (docs["lvl"] > 0) & (docs["lvl"] <= lvls["k"]),
        )
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
    first_lvl = tc.groupBy("t").agg(F.min("lvl").alias("f"))
    vk = (
        lvls.join(F.broadcast(first_lvl), first_lvl["f"] <= lvls["k"])
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("long").alias("vocab"))
    )
    cek = (
        ec.crossJoin(F.broadcast(lvls))
        .join(
            tc.select(
                F.col("t").alias("tt"), F.col("lvl").alias("tl"), "c"
            ),
            (F.col("tt") == F.col("t")) & (F.col("tl") <= F.col("k")),
            "left",
        )
        .groupBy("t", "k", "w")
        .agg(F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("c"))
    )
    lp = cek.join(F.broadcast(nk), "k").join(F.broadcast(vk), "k").select(
        "k",
        "t",
        "w",
        (
            F.col("w")
            * F.log(
                (F.col("c") + 1)
                * 1.0
                / (F.col("n_tokens") + F.col("vocab") + 1)
            )
        ).alias("term"),
    )
    wacc = (
        Window.partitionBy("k")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    acc = lp.select(
        "k",
        F.sum("term").over(wacc).alias("s"),
        F.sum("w").over(wacc).alias("wsum"),
        F.row_number()
        .over(Window.partitionBy("k").orderBy(F.desc("t")))
        .alias("rd"),
    )
    xent = acc.filter(F.col("rd") == 1).select(
        "k", (-F.col("s") / F.col("wsum")).alias("xent")
    )
    pts = (
        xent.join(F.broadcast(nk), "k")
        .join(F.broadcast(vk), "k")
        .join(F.broadcast(docs_k), "k")
        .select(
            "k",
            # nullif mirrors the oracle: ln(0) on a zero-token level
            # NULLs identically in both engines (DuckDB would error)
            F.log(F.nullif(F.col("n_tokens") * 1.0, F.lit(0.0))).alias(
                "lx"
            ),
            F.log(F.nullif(F.col("xent"), F.lit(0.0))).alias("ly"),
            "n_tokens",
            "vocab",
            "n_docs",
            "xent",
        )
        .localCheckpoint()
    )
    wfit = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    facc = pts.select(
        F.sum("lx").over(wfit).alias("sx"),
        F.sum("ly").over(wfit).alias("sy"),
        F.sum(F.col("lx") * F.col("ly")).over(wfit).alias("sxy"),
        F.sum(F.col("lx") * F.col("lx")).over(wfit).alias("sxx"),
        F.sum(F.col("ly") * F.col("ly")).over(wfit).alias("syy"),
        F.count(F.lit(1)).over(wfit).cast("double").alias("n"),
        F.row_number().over(Window.orderBy(F.desc("k"))).alias("rd"),
    )
    # nullif guards mirror the oracle: degenerate all-equal levels
    # zero an OLS denominator — NULL fit, never an ANSI divide error
    sxx_den = F.nullif(
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"),
        F.lit(0.0),
    )
    slope = (
        F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    ) / sxx_den
    fit = facc.filter(F.col("rd") == 1).select(
        slope.alias("slope"),
        ((F.col("sy") - slope * F.col("sx")) / F.col("n")).alias("icept"),
        (
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            * (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / F.nullif(
                (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
                * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")),
                F.lit(0.0),
            )
        ).alias("r2"),
    )
    return (
        pts.crossJoin(F.broadcast(fit))
        .select(
            F.col("k").cast("long").alias("level"),
            "n_docs",
            "n_tokens",
            "vocab",
            (F.round(F.col("xent") - 1e-9, 4) + 0.0).alias("heldout_xent"),
            (F.round(F.col("slope") - 1e-9, 4) + 0.0).alias("fit_exponent"),
            (F.round(F.exp("icept") - 1e-9, 4) + 0.0).alias("fit_coef"),
            (F.round(F.col("r2") - 1e-9, 4) + 0.0).alias("fit_r2"),
        )
        .orderBy("level")
    )
