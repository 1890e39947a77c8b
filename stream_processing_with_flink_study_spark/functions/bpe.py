"""Distributed BPE merge training — learn the top-K byte-pair-encoding
merges over a corpus, the iterative vocabulary-learning pass of a
tokenizer pipeline (companion to the BPE-ish token counter in
``functions/text.py`` and the FFD packer in ``functions/packing.py``).

Shape per round (classic BPE, Sennrich et al. 2016, public algorithm):
1. explode adjacent symbol pairs of every distinct word, weighted by
   word frequency — one scan of the (small) distinct-word table, one
   keyed sum;
2. pick the single most frequent pair — a bounded driver action
   (``limit(1).collect()``, ties broken (count desc, pair asc) so the
   learned merge list is deterministic);
3. apply the merge to every word's symbol array — greedy left-to-right
   adjacent replacement inside an Arrow-batched pandas UDF (per-word
   loops over SHORT symbol arrays; never row-at-a-time Python over the
   corpus).

The corpus collapses to DISTINCT words + counts first, so round cost is
bounded by vocabulary size, not corpus size — the standard trick that
makes BPE training feasible at 100 TB (the corpus is touched once).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

END = "</w>"


def word_counts(tokens: DataFrame, token_col: str = "t") -> DataFrame:
    """(word, cnt, syms) over distinct words: symbol arrays start as
    characters plus an end-of-word marker."""
    wc = tokens.groupBy(F.col(token_col).alias("word")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    syms = F.concat(
        F.split(F.col("word"), ""), F.array(F.lit(END))
    )
    return wc.select("word", "cnt", syms.alias("syms"))


def _pair_counts(words: DataFrame) -> DataFrame:
    """Adjacent-pair counts weighted by word frequency: explode
    ``zip(syms, syms[1:])`` — a JVM-side higher-order expression."""
    pairs = F.zip_with(
        F.slice(F.col("syms"), 1, F.size("syms") - 1),
        F.slice(F.col("syms"), 2, F.size("syms") - 1),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )
    return (
        words.select("cnt", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("cnt").alias("c"))
    )


def _merge_udf(a: str, b: str):
    merged = a + b

    @pandas_udf("array<string>")
    def apply_merge(syms: pd.Series) -> pd.Series:
        def one(s):
            out = []
            i, n = 0, len(s)
            while i < n:
                if i + 1 < n and s[i] == a and s[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            return out

        return syms.map(one)

    return apply_merge


def train_bpe_merges(
    tokens: DataFrame, n_merges: int = 8, token_col: str = "t"
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges; returns [(left, right, count)]
    in merge order.  Deterministic: the argmax pair is tie-broken
    (count desc, a asc, b asc)."""
    words = word_counts(tokens, token_col).persist()
    words.count()
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        top = (
            _pair_counts(words)
            .orderBy(F.desc("c"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, c = top[0].a, top[0].b, int(top[0].c)
        merges.append((a, b, c))
        prev = words
        words = words.withColumn(
            "syms", _merge_udf(a, b)(F.col("syms"))
        ).persist()
        words.count()
        prev.unpersist()
    return merges


def train_bpe_merges_driver(
    tokens: DataFrame,
    n_merges: int = 8,
    token_col: str = "t",
    vocab_cap: int = 65_536,
) -> list[tuple[str, str, int]]:
    """BPE training with the corpus-scale half in Spark and the
    vocabulary-scale half on the driver: the corpus collapses to the
    top ``vocab_cap`` distinct words by frequency (one shuffle,
    deterministic (count desc, word) cut — the bounded collect is the
    same class as IVF centroid training), then the merge loop runs in
    plain Python over ≤ vocab_cap short symbol lists.  This is how BPE
    tokenizers are actually trained at corpus scale: word counting is
    the data-parallel part; the merge loop is vocabulary-sized by
    construction.  Produces IDENTICAL merges to
    :func:`train_bpe_merges` (asserted in tests) at a fraction of the
    per-round job overhead."""
    wc = (
        tokens.groupBy(F.col(token_col).alias("word"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("word"))
        .limit(vocab_cap)
        .collect()
    )
    vocab: list[tuple[list[str], int]] = [
        (list(r.word) + [END], int(r.cnt)) for r in wc
    ]
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, cnt in vocab:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + cnt
        if not counts:
            break
        (a, b), c = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((a, b, c))
        merged = a + b
        for j, (syms, cnt) in enumerate(vocab):
            out, i, n = [], 0, len(syms)
            while i < n:
                if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[j] = (out, cnt)
    return merges


def encode_with_merges(
    tokens: DataFrame,
    merges: list[tuple[str, str, int]],
    token_col: str = "t",
) -> DataFrame:
    """Apply a trained merge list to a token stream — the ENCODE half
    of BPE (training learns merges; serving replays them in order on
    every word).  Returns (word, pieces array<string>, n_pieces).

    Scale shape: encoding is vocabulary-bounded like training — the
    corpus collapses to DISTINCT words first, every merge applies to
    the word table (one Arrow batch pass per merge, same `_merge_udf`
    the trainer used, so train/encode share one merge semantics by
    construction), and callers re-attach pieces to the full stream by
    broadcast-joining the encoded vocabulary.  The merge list itself is
    a few dozen closure constants — never data-sized."""
    words = (
        tokens.select(F.col(token_col).alias("word"))
        .distinct()
        .select(
            "word",
            F.concat(
                F.split(F.col("word"), ""), F.array(F.lit(END))
            ).alias("syms"),
        )
    )
    for a, b, _ in merges:
        words = words.withColumn("syms", _merge_udf(a, b)(F.col("syms")))
    return words.select(
        "word",
        F.col("syms").alias("pieces"),
        F.size("syms").alias("n_pieces"),
    )


def encode_word_reference(
    word: str, merges: list[tuple[str, str, int]]
) -> list[str]:
    """Pure-Python single-word reference encoder (the textbook loop) —
    the independent implementation the distributed encoder is tested
    against."""
    syms = list(word) + [END]
    for a, b, _ in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def train_wordpiece_merges_driver(
    tokens: DataFrame,
    n_merges: int = 8,
    token_col: str = "t",
    vocab_cap: int = 65_536,
) -> list[tuple[str, str, int, float]]:
    """WordPiece-style training: identical corpus/vocabulary split to
    :func:`train_bpe_merges_driver`, but each round's merge is the
    pair maximizing the LIKELIHOOD score ``count(ab) / (count(a) ·
    count(b))`` (Schuster & Nakajima / the BERT tokenizer objective)
    instead of raw pair frequency — frequency favors pairs of already
    common symbols, likelihood favors pairs that co-occur more than
    their parts predict.  Returns [(left, right, pair_count, score)].

    Cross-engine determinism: pair and symbol counts are exact int64;
    the score is ONE double division of exact ints, so the argmax
    ordering (score desc, a, b) is bit-identical to the SQL oracle's
    ORDER BY — PROVIDED every count product stays under 2^53.  Above
    that, DuckDB rounds the BIGINT product to double BEFORE dividing
    while Python's int/int true division is correctly rounded over the
    exact integers, so the two score doubles can differ by 1 ulp and
    flip the argmax.  The bound is ENFORCED each round (max symbol
    count squared < 2^53, i.e. every symbol count < ~9.5e7 — far above
    any vocab_cap'd corpus): a violation raises instead of silently
    diverging.  Corpora past it rescale both counts by a common power
    of two (score order is scale-invariant) or move the score to exact
    rational compare."""
    wc = (
        tokens.groupBy(F.col(token_col).alias("word"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("word"))
        .limit(vocab_cap)
        .collect()
    )
    vocab: list[tuple[list[str], int]] = [
        (list(r.word) + [END], int(r.cnt)) for r in wc
    ]
    merges: list[tuple[str, str, int, float]] = []
    for _ in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        sym_counts: dict[str, int] = {}
        for syms, cnt in vocab:
            for s in syms:
                sym_counts[s] = sym_counts.get(s, 0) + cnt
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + cnt
        if not pair_counts:
            break
        mx = max(sym_counts.values())
        if mx * mx >= 2 ** 53:
            raise ValueError(
                "train_wordpiece_merges_driver: symbol count product "
                f"{mx}^2 >= 2^53 — the likelihood-score doubles are no "
                "longer bit-identical across engines (see docstring); "
                "rescale counts or lower vocab_cap"
            )
        (a, b), c = min(
            pair_counts.items(),
            key=lambda kv: (
                -(kv[1] / (sym_counts[kv[0][0]] * sym_counts[kv[0][1]])),
                kv[0][0],
                kv[0][1],
            ),
        )
        score = c / (sym_counts[a] * sym_counts[b])
        merges.append((a, b, c, score))
        merged = a + b
        for j, (syms, cnt) in enumerate(vocab):
            out, i, n = [], 0, len(syms)
            while i < n:
                if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[j] = (out, cnt)
    return merges
