"""Text-analysis operators for large-scale training-data pipelines.

All functions here are pure column expressions (JVM-side, whole-stage
codegen, zero Python in the row path) — at 100 TB these run at scan
speed with no shuffle.  Hashing uses md5 (bit-identical in every engine,
which keeps the DuckDB oracles exact); the per-document work is
embarrassingly parallel.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# Tokenization: lowercase, whitespace split.  The BPE-ish regex mirrors
# the classic pre-tokenizer: letter runs | digit runs | single symbol.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of the lowercased text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.lower(F.trim(c)), r"\s+")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def bpe_ish_count(col: Column | str) -> Column:
    """Sub-word-ish token count via regexp — a cheap proxy for BPE token
    budgeting at corpus scale."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(BPE_ISH_PATTERN))


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles as an array<string> — the unit of MinHash /
    Jaccard dedup.

    PERFORMANCE: pass a column that is ALREADY a materialized token
    array (project :func:`tokens` first).  A raw-text column works but
    re-tokenizes per shingle position — lambda bodies in Catalyst
    higher-order functions re-evaluate outer non-attribute expressions
    on every element, turning O(tokens) into O(tokens·|text|).
    :func:`..functions.dedup.doc_shingles` does the two-step projection.
    """
    t = col if isinstance(col, Column) else F.col(col)
    seq = F.sequence(F.lit(1), F.size(t) - (n - 1))
    shingled = F.transform(seq, lambda i: F.concat_ws(" ", F.slice(t, i, n)))
    # guard: sequence(1, x) with x < 1 DESCENDS ([1,0,...]) instead of
    # being empty, and slice(_, 0, _) throws — short texts get no shingles
    return F.when(F.size(t) >= n, shingled).otherwise(
        F.array().cast("array<string>")
    )


def stopword_ratio(col: Column | str) -> Column:
    t = tokens(col)
    in_list = F.filter(t, lambda x: x.isin(*STOPWORDS))
    return F.size(in_list) / F.greatest(F.size(t), F.lit(1))


def punct_ratio(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(r"[^A-Za-z0-9\s]")) / F.greatest(
        F.length(c), F.lit(1)
    )


def mean_token_len(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    no_space = F.length(F.regexp_replace(c, r"\s+", ""))
    return no_space / F.greatest(token_count(col), F.lit(1))


def quality_score(col: Column | str) -> Column:
    """Composite quality heuristic (length / punctuation / stopword
    signals, the standard pre-training filters).  Higher is better;
    range roughly [0, 1]."""
    n_tok = token_count(col).cast("double")
    length_term = F.least(n_tok / 100.0, F.lit(1.0))
    stop_term = F.least(stopword_ratio(col) * 5.0, F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(col) * 10.0, F.lit(1.0))
    return (0.4 * length_term + 0.3 * stop_term + 0.3 * punct_term)


def lang_id(col: Column | str) -> Column:
    """Marker-token language-ID heuristic: score a handful of
    high-frequency function words per language and pick the argmax
    (deterministic tie order en > de > es).  An n-gram profile model
    distills to exactly this shape — marker lookups + argmax — which is
    what matters for the engine plumbing."""
    t = tokens(col)
    en = F.size(F.filter(t, lambda x: x.isin("the", "and", "of", "is")))
    de = F.size(F.filter(t, lambda x: x.isin("der", "und", "das", "ist")))
    es = F.size(F.filter(t, lambda x: x.isin("el", "los", "de", "es")))
    return (
        F.when((en >= de) & (en >= es), "en")
        .when(de >= es, "de")
        .otherwise("es")
    )


def fingerprint(col: Column | str) -> Column:
    """Document fingerprint: md5 of the whitespace-normalized lowercase
    text — the exact-dedup key (content-defined, order-sensitive)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.regexp_replace(F.lower(F.trim(c)), r"\s+", " "))


def simhash32(col: Column | str) -> Column:
    """32-bit SimHash as a '0'/'1' string.

    Bit i is the sign of sum over tokens of ±1, where a token votes +1
    iff hex digit i of md5(token) has its top nibble bit set (digit >=
    '8').  Single pass: md5 once per token (via transform), then ONE
    array-accumulator aggregate carries all 32 vote counters — not 32
    separate aggregates each re-hashing every token.  Pure per-row
    expression — no explode, no shuffle; the oracle reproduces it
    bit-for-bit via the same md5 digits.
    """
    hashes = F.transform(tokens(col), lambda x: F.md5(x))
    token_votes = lambda h: F.transform(
        F.sequence(F.lit(1), F.lit(32)),
        lambda i: F.when(F.substring(h, i, F.lit(1)) >= "8", 1).otherwise(-1),
    )
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), 32),
        lambda acc, h: F.zip_with(acc, token_votes(h), lambda a, v: a + v),
    )
    return F.array_join(
        F.transform(votes, lambda v: F.when(v > 0, "1").otherwise("0")), ""
    )


def simhash32_arrow(col: Column | str) -> Column:
    """Arrow-batched :func:`simhash32` — identical md5-digit votes (the
    oracle stays bit-for-bit), computed in numpy instead of Catalyst's
    interpreted nested HOFs (aggregate∘zip_with∘transform evaluates
    ~tokens×32 expression nodes per row with no codegen; this batch
    path measured ~30% faster on the documents corpus — Python hashing
    costs eat most of the interpreter win, so keep both forms).

    Tokenization mirrors ``tokens()`` exactly, including the empty-string
    corner: Spark's split and Python's re.split both yield one empty
    token for an all-whitespace document, so its md5 votes identically.
    """
    import hashlib
    import re

    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    # token -> ±1 vote vector, memoized across rows AND Arrow batches
    # (the closure outlives each batch call): the corpus token stream is
    # ~vocab × avg-frequency, so hashing each distinct token once cuts
    # the md5 work by the repetition factor
    memo: dict[str, np.ndarray] = {}

    @pandas_udf(StringType())
    def sh(texts: pd.Series) -> pd.Series:
        ws = re.compile(r"\s+")
        out = []
        for t in texts:
            toks = ws.split(t.strip().lower())
            votes = np.zeros(32, dtype=np.int64)
            for tok in toks:
                v = memo.get(tok)
                if v is None:
                    h = hashlib.md5(tok.encode()).hexdigest()
                    v = (
                        np.frombuffer(h.encode(), dtype=np.uint8) >= 0x38
                    ).astype(np.int64) * 2 - 1
                    memo[tok] = v
                votes += v
            out.append("".join("1" if v > 0 else "0" for v in votes))
        return pd.Series(out)

    c = F.col(col) if isinstance(col, str) else col
    return sh(c)


def simhash64_arrow(col: Column | str) -> Column:
    """64-bit SimHash as a SIGNED int64 fingerprint — the production
    width (reference scope: near-dup fingerprinting per SURVEY §2;
    scale note at functions/dedup.py:simhash_band_pairs).

    Bit (64 - p) is the sign of the per-token vote sum for hex digit p
    (1-based) of sha256(token): a token votes +1 iff the digit >= '8'
    (its top nibble bit set).  sha256's 64 hex digits supply one vote
    lane per bit, so the construction is the md5/32-bit scheme widened
    — and DuckDB's ``sha256()`` reproduces it digit-for-digit, which
    keeps the full hash-match oracle a 64-bit xxhash could not offer.

    Arrow-batched with the same memoized token→votes cache and the
    same tokenization (including the all-whitespace → one empty token
    corner) as :func:`simhash32_arrow`.  Returns LongType: band keys
    and Hamming distance stay JVM-side (``shiftrightunsigned`` /
    ``bit_count(xor)``) — no bitstring conversion, no 2^63 overflow.
    """
    import hashlib
    import re

    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    memo: dict[str, np.ndarray] = {}
    # MSB-first place values: digit p (1-based) -> bit (64 - p)
    place = (np.uint64(1) << np.arange(63, -1, -1, dtype=np.uint64))

    @pandas_udf(LongType())
    def sh(texts: pd.Series) -> pd.Series:
        ws = re.compile(r"\s+")
        out = []
        for t in texts:
            toks = ws.split(t.strip().lower())
            votes = np.zeros(64, dtype=np.int64)
            for tok in toks:
                v = memo.get(tok)
                if v is None:
                    h = hashlib.sha256(tok.encode()).hexdigest()
                    v = (
                        np.frombuffer(h.encode(), dtype=np.uint8) >= 0x38
                    ).astype(np.int64) * 2 - 1
                    memo[tok] = v
                votes += v
            fp = np.uint64(place[votes > 0].sum())
            out.append(int(fp.view(np.int64)))
        return pd.Series(out, dtype="int64")

    c = F.col(col) if isinstance(col, str) else col
    return sh(c)


def zlib_size_arrow(col: Column | str, level: int = 6) -> Column:
    """Compressed byte size of a text column under zlib (DEFLATE) at
    the given level, Arrow-batched — the raw ingredient of the
    compression-ratio quality signal (Rae et al. 2021 "Gopher" §A.1.1
    use it to drop machine-generated / highly repetitive documents:
    text that compresses too well is boilerplate or spam, text that
    barely compresses is often binary junk or ciphertext).

    zlib is deterministic for a fixed level and library build, and the
    signal consumer only thresholds RATIOS, so cross-build drift is a
    non-issue; cross-ENGINE oracles are impossible (no SQL zlib), so
    queries built on this are rows-only checked plus property-tested
    (`tests/test_wave9.py`: repetition compresses strictly better than
    high-entropy text; ratio bounded by (0, 1.1]).

    Returns IntegerType byte count; the ratio is left to the caller so
    the division happens once, JVM-side, against ``octet_length``."""
    import zlib

    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import IntegerType

    @pandas_udf(IntegerType())
    def zs(texts: pd.Series) -> pd.Series:
        return pd.Series(
            [len(zlib.compress(t.encode("utf-8"), level)) for t in texts],
            dtype="int32",
        )

    return zs(col if isinstance(col, Column) else F.col(col))
