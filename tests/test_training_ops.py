"""Deterministic sampling, sequence packing, and file-format sources."""

from __future__ import annotations

from pyspark.sql import functions as F

from stream_processing_with_flink_study_spark.functions import packing, sampling
from stream_processing_with_flink_study_spark.sources import load_table, read_file

from .conftest import SF_SMALL

SF_MID = "/root/testdata/sf0.01"


def test_deterministic_sample_is_reproducible_and_sized(spark):
    docs = load_table(spark, SF_MID, "documents").select("doc_id")
    s1 = {r.doc_id for r in sampling.deterministic_sample(docs, "doc_id", 0.3).collect()}
    s2 = {r.doc_id for r in sampling.deterministic_sample(docs, "doc_id", 0.3).collect()}
    assert s1 == s2, "same key+salt must give the identical sample"
    n = docs.count()
    assert 0.2 <= len(s1) / n <= 0.4, f"rate {len(s1)/n} far from 0.3"
    # a different salt draws an independent sample, not the same rows
    s3 = {
        r.doc_id
        for r in sampling.deterministic_sample(docs, "doc_id", 0.3, salt="other").collect()
    }
    assert s3 != s1


def test_stratified_sample_respects_per_stratum_rates(spark):
    docs = load_table(spark, SF_MID, "documents").select("doc_id", "lang")
    out = sampling.stratified_sample(
        docs, "lang", {"en": 0.25, "zh": 1.0}, "doc_id", default_fraction=0.5
    )
    base = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    got = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert got["zh"] == base["zh"], "fraction 1.0 must keep every row"
    assert 0.1 <= got["en"] / base["en"] <= 0.4
    assert 0.3 <= got["fr"] / base["fr"] <= 0.7


def test_packing_covers_every_doc_within_budget(spark):
    budget = 512
    docs = load_table(spark, SF_MID, "documents").select(
        "doc_id", F.size(F.split(F.lower(F.trim("text")), r"\s+")).alias("n_tokens")
    )
    packs = packing.pack_sequences(docs, "n_tokens", budget, num_partitions=4)
    rows = packs.collect()
    # every doc exactly once
    assert sorted(r.doc_id for r in rows) == sorted(r.doc_id for r in docs.collect())
    # no multi-doc pack exceeds the budget; oversized docs ride alone
    fills: dict[int, list[int]] = {}
    for r in rows:
        fills.setdefault(r.pack_id, []).append(r.n_tokens)
    for toks in fills.values():
        assert sum(toks) <= budget or len(toks) == 1
    # FFD on short docs should fill packs well
    multi = [sum(t) for t in fills.values() if sum(t) <= budget]
    assert sum(multi) / (len(multi) * budget) >= 0.5
    stats = packing.pack_stats(packs, budget).collect()[0]
    assert stats.n_docs == len(rows)
    assert stats.n_packs == len(fills)


def test_read_file_csv_json_round_trip(spark, tmp_path):
    df = spark.range(0, 100).select(
        F.col("id"), (F.col("id") * 2).cast("long").alias("dbl")
    )
    csv_dir, json_dir = str(tmp_path / "c"), str(tmp_path / "j")
    df.write.option("header", True).csv(csv_dir)
    df.write.json(json_dir)
    back_csv = read_file(
        spark, csv_dir, "csv", schema="id long, dbl long", header=True
    )
    back_json = read_file(spark, json_dir, "json", schema="id long, dbl long")
    expect = {(r.id, r.dbl) for r in df.collect()}
    assert {(r.id, r.dbl) for r in back_csv.collect()} == expect
    assert {(r.id, r.dbl) for r in back_json.collect()} == expect


def test_read_file_orc_parquet_round_trip(spark, tmp_path):
    """Columnar-format coverage: ORC and parquet round-trips through the
    same bounded ``read_file`` surface (both are built into Spark; ORC
    carries its own schema so no schema arg is needed)."""
    df = spark.range(0, 100).select(
        F.col("id"), (F.col("id") % 7).cast("double").alias("v")
    )
    orc_dir, pq_dir = str(tmp_path / "o"), str(tmp_path / "p")
    df.write.orc(orc_dir)
    df.write.parquet(pq_dir)
    expect = {(r.id, r.v) for r in df.collect()}
    back_orc = read_file(spark, orc_dir, "orc")
    back_pq = read_file(spark, pq_dir, "parquet")
    assert {(r.id, r.v) for r in back_orc.collect()} == expect
    assert {(r.id, r.v) for r in back_pq.collect()} == expect


def test_simhash_arrow_equals_column_expression(spark):
    """The Arrow-batched simhash must reproduce the Catalyst
    column-expression form bit-for-bit (same md5 digits, same
    empty-token corner)."""
    from stream_processing_with_flink_study_spark.functions import text as T

    docs = load_table(spark, SF_MID, "documents").limit(200)
    both = docs.select(
        T.simhash32("text").alias("a"), T.simhash32_arrow("text").alias("b")
    ).collect()
    assert all(r.a == r.b for r in both)


def test_sketch_battery_error_bounds(spark):
    from stream_processing_with_flink_study_spark.plans import QUERIES

    rows = {r.lang: r for r in QUERIES["sketch_battery"](spark, SF_MID).collect()}
    assert set(rows) == {"en", "de", "fr", "es", "zh", "__all__"}
    for lang, r in rows.items():
        assert (
            abs(r.approx_distinct - r.exact_distinct) / r.exact_distinct < 0.05
        ), f"{lang}: HLL estimate off by >5%"
        if lang != "__all__":
            assert (
                abs(r.approx_p50_chars - r.exact_p50_chars)
                / max(r.exact_p50_chars, 1.0)
                < 0.1
            ), f"{lang}: approx p50 off by >10%"


def test_weighted_sample_biases_toward_heavy_rows(spark):
    docs = load_table(spark, SF_MID, "documents").select("doc_id", "n_chars")
    picked = sampling.weighted_sample(docs, "doc_id", "n_chars", 100)
    # identical on re-run (pure function of the key)
    a = [r.doc_id for r in picked.collect()]
    b = [r.doc_id for r in sampling.weighted_sample(docs, "doc_id", "n_chars", 100).collect()]
    assert a == b
    # mean length of the weighted sample must exceed the corpus mean
    corpus_mean = docs.agg(F.avg("n_chars")).first()[0]
    sample_mean = picked.agg(F.avg("n_chars")).first()[0]
    assert sample_mean > corpus_mean


def test_count_min_sketch_laws(spark):
    """CMS invariants: (a) estimates NEVER undercount, (b) the average
    overestimate respects the eps*N bound, (c) merge(build(A), build(B))
    equals build(A++B) EXACTLY — the mergeable-partial law."""
    from pyspark.sql import functions as F

    from stream_processing_with_flink_study_spark.functions.sketch import (
        cms_build,
        cms_estimate,
        cms_merge,
    )

    ev = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .select(F.col("user_id").alias("k"))
    )
    exact = ev.groupBy("k").agg(F.count(F.lit(1)).alias("cnt"))
    cms = cms_build(ev, "k").persist()
    est = cms_estimate(cms, exact.select("k"), "k")
    joined = exact.join(est, "k").select("k", "cnt", "est").toPandas()
    assert (joined["est"] >= joined["cnt"]).all()  # never undercounts
    n_total = int(joined["cnt"].sum())
    # w=1024 → eps = e/1024 ≈ 0.00265; mean overshoot ≤ eps*N comfortably
    assert (joined["est"] - joined["cnt"]).mean() <= 0.00265 * n_total

    # mergeability: split on parity, merge, must equal the whole sketch
    a = cms_build(ev.filter(F.col("k") % 2 == 0), "k")
    b = cms_build(ev.filter(F.col("k") % 2 == 1), "k")
    merged = cms_merge(a, b)
    diff = (
        merged.join(cms, ["row", "bucket"], "full_outer")
        .filter(
            F.coalesce(merged["c"], F.lit(0)) != F.coalesce(cms["c"], F.lit(0))
        )
        .count()
    )
    assert diff == 0


def test_bpe_merge_training_classic_corpus(spark):
    """The Sennrich toy corpus must yield the textbook merge sequence:
    es, est, est</w>, lo, low, then the (e,w) tie-break."""
    from stream_processing_with_flink_study_spark.functions.bpe import (
        END,
        train_bpe_merges,
        train_bpe_merges_driver,
    )

    corpus = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    rows = [(w,) for w, c in corpus.items() for _ in range(c)]
    tokens = spark.createDataFrame(rows, "t string")
    merges = train_bpe_merges(tokens, n_merges=6)
    # the driver-side fast path must learn the IDENTICAL sequence
    assert train_bpe_merges_driver(tokens, n_merges=6) == merges
    assert [(a, b) for a, b, _ in merges] == [
        ("e", "s"),
        ("es", "t"),
        ("est", END),
        ("l", "o"),
        ("lo", "w"),
        ("e", "w"),
    ]
    assert [c for _, _, c in merges] == [9, 9, 9, 7, 7, 6]


def test_bpe_sql_oracle_replays_textbook_sequence():
    """The unrolled-CTE DuckDB replay (`queries_mining._bpe_oracle_ctes`)
    must learn the same textbook merge sequence from the Sennrich toy
    corpus as the Python trainer — a planted-truth check that the SQL
    twin implements the ALGORITHM, not just happens to agree with Spark
    on one fixture.  Also pins the |sym| encoding precondition: the
    real test corpora contain no '|' (the boundary marker), so the
    single-replace merge is exact."""
    import duckdb

    from stream_processing_with_flink_study_spark.plans.queries_mining import (
        _bpe_oracle_ctes,
    )

    corpus = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"(repeat('{w} ', {c}))" for w, c in corpus.items())
        + ") t(text)"
    )
    sql = (
        "WITH "
        + _bpe_oracle_ctes(n_merges=6)
        + ", out AS ("
        + " UNION ALL ".join(
            f"SELECT {r} AS rank, a, b, c FROM m{r}" for r in range(1, 7)
        )
        + ") SELECT a, b, c FROM out ORDER BY rank"
    )
    got = con.execute(sql).fetchall()
    assert got == [
        ("e", "s", 9),
        ("es", "t", 9),
        ("est", "</w>", 9),
        ("l", "o", 7),
        ("lo", "w", 7),
        ("e", "w", 6),
    ]
    # encoding precondition on the real fixtures: no token contains '|'
    for sf in ("sf0.001", "sf0.01"):
        (n,) = con.execute(
            "SELECT count(*) FROM read_parquet("
            f"'/root/testdata/{sf}/documents.parquet') "
            "WHERE text LIKE '%|%'"
        ).fetchone()
        assert n == 0, f"{sf}: corpus contains '|' — oracle encoding unsafe"


def test_map_in_arrow_histogram_matches_pandas_udf(spark):
    """The rawest vectorized-Python tier (mapInArrow: RecordBatch in,
    RecordBatch out — no pandas conversion at all) must reproduce the
    pandas-UDF byte-histogram features bit-for-bit, proving the two
    Arrow tiers are interchangeable where the pandas layer's overhead
    matters."""
    import pyarrow as pa
    import numpy as np
    from pyspark.sql import functions as F

    from stream_processing_with_flink_study_spark.functions import multimodal

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .limit(200)
    )
    payloads = multimodal.with_binary_payload(docs)
    want = {
        r.doc_id: r.features
        for r in multimodal.byte_histogram_features(payloads).collect()
    }

    def arrow_hist(batches):
        for batch in batches:
            ids = batch.column("doc_id")
            out = []
            for buf in batch.column("payload"):
                b = np.frombuffer(buf.as_py(), dtype=np.uint8)
                hist = np.bincount(b >> 4, minlength=16).astype("float64")
                s = hist.sum()
                out.append((hist / s if s else hist).tolist())
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(out, type=pa.list_(pa.float64()))],
                names=["doc_id", "features"],
            )

    got = {
        r.doc_id: r.features
        for r in payloads.select("doc_id", "payload")
        .mapInArrow(arrow_hist, "doc_id long, features array<double>")
        .collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k] == want[k]


def test_simhash64_banding_complete_and_wide_keyspace(spark):
    """64-bit banding: (a) candidate set is COMPLETE for hd <= 3 vs a
    brute-force all-pairs scan (pigeonhole: 4 bands x 16 bits), (b) hd
    values agree with a Python popcount replay, (c) the band key space
    is wider than the 32-bit form's 1,024-key ceiling on the same
    corpus -- the whole point of the 64-bit variant."""
    from stream_processing_with_flink_study_spark.functions import (
        dedup as D,
        text as T,
    )

    docs = load_table(spark, SF_MID, "documents").limit(300)
    # planted exact copies guarantee hd=0 pairs exist
    corpus = docs.select("doc_id", "text").unionByName(
        docs.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
        )
    )
    sims = corpus.select(
        "doc_id", T.simhash64_arrow("text").alias("simhash64")
    ).persist()
    got = {
        (r.doc_a, r.doc_b): r.hd
        for r in D.simhash64_band_pairs(sims).collect()
    }
    fps = {r.doc_id: r.simhash64 for r in sims.collect()}
    ids = sorted(fps)
    brute = {
        (a, b): ((fps[a] ^ fps[b]) & ((1 << 64) - 1)).bit_count()
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if ((fps[a] ^ fps[b]) & ((1 << 64) - 1)).bit_count() <= 3
    }
    assert got == brute  # complete AND exact hd values
    assert any(hd == 0 for hd in got.values())  # planted copies found
    # key-space width: the bucket-join cost is sum over band keys of
    # |bucket|^2 -- on the SAME fingerprints, 16-bit bands must beat
    # 8-bit bands by a wide margin (measured ~12x on this corpus; the
    # 32-bit form's 1,024-key ceiling is what collapses at 100 TB)
    from collections import Counter

    def band_stats(width: int, nb: int):
        mask = (1 << width) - 1
        keys = Counter(
            (b, (fp >> (64 - width * (b + 1))) & mask)
            for fp in fps.values()
            for b in range(nb)
        )
        return sum(c * c for c in keys.values()), max(keys.values())

    sumsq16, max16 = band_stats(16, 4)
    sumsq8, max8 = band_stats(8, 8)
    assert sumsq16 * 5 < sumsq8, (sumsq16, sumsq8)
    assert max16 < max8, (max16, max8)
    sims.unpersist()


def test_misra_gries_candidates_cover_heavy_keys(spark):
    """MG guarantee: every key with global count > N/(capacity+1) must
    appear in the union of per-partition candidate sets, and the
    two-pass top-k equals the exact top-k on a skewed stream."""
    from stream_processing_with_flink_study_spark.functions import sketch as SK

    # Zipf-ish: key_i appears ~1000/i times, spread over 8 partitions
    rows = [(f"k{i:03d}",) for i in range(1, 120) for _ in range(1000 // i)]
    df = spark.createDataFrame(rows, "item string").repartition(8)
    n = len(rows)
    cap = 32
    cand = {
        r.item
        for r in SK.misra_gries_partials(df, "item", capacity=cap)
        .select("item").distinct().collect()
    }
    from collections import Counter

    true = Counter(r[0] for r in rows)
    heavy = {k for k, c in true.items() if c > n / (cap + 1)}
    assert heavy <= cand, heavy - cand
    got = [
        (r.item, r.n)
        for r in SK.heavy_hitters_two_pass(df, "item", k=10, capacity=cap)
        .orderBy("rank").collect()
    ]
    want = sorted(true.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert got == want


def test_bpe_encode_matches_reference(spark):
    """Distributed encode_with_merges must reproduce the pure-Python
    textbook encoder word-for-word, merges applied in training order."""
    from stream_processing_with_flink_study_spark.functions import bpe as B

    rows = [("low",)] * 5 + [("lower",)] * 2 + [("newest",)] * 6 + [("widest",)] * 3
    tok = spark.createDataFrame(rows, "t string")
    merges = B.train_bpe_merges_driver(tok, n_merges=6)
    got = {
        r.word: (list(r.pieces), r.n_pieces)
        for r in B.encode_with_merges(tok, merges).collect()
    }
    for w in ("low", "lower", "newest", "widest"):
        ref = B.encode_word_reference(w, merges)
        assert got[w] == (ref, len(ref)), w
    # unseen word still encodes (falls back to chars + whatever applies)
    unseen = spark.createDataFrame([("lowest",)], "t string")
    enc = B.encode_with_merges(unseen, merges).collect()[0]
    assert list(enc.pieces) == B.encode_word_reference("lowest", merges)


def test_wordpiece_diverges_from_bpe_on_planted_corpus(spark, tmp_path):
    """The likelihood objective must pick a DIFFERENT first merge than
    raw frequency on a corpus built for it: 'b</w>' dominates by count
    (100 = 80 singles + 20 from 'ab'), but the rare-and-exclusive
    (q, z) pair maximizes count(ab)/(count(a)·count(b)) at 5/25 = 0.2.
    Pins both trainers' round-1 argmax and the score value."""
    from stream_processing_with_flink_study_spark.plans import QUERIES

    docs = ["ab"] * 20 + ["qz"] * 5 + ["a"] * 80 + ["b"] * 80
    spark.createDataFrame(
        [(i, " ".join([w]), "s") for i, w in enumerate(docs)],
        "doc_id long, text string, source string",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    wp = sorted(
        QUERIES["wordpiece_merges_top"](spark, str(tmp_path)).collect(),
        key=lambda r: r.merge_rank,
    )
    bpe = sorted(
        QUERIES["bpe_merges_top"](spark, str(tmp_path)).collect(),
        key=lambda r: r.merge_rank,
    )
    assert (wp[0].left, wp[0].right) == ("q", "z")
    assert wp[0].pair_count == 5
    assert wp[0].score_ppm == round(0.2 * 1_000_000.0 - 1e-9, 6)
    assert (bpe[0].left, bpe[0].right) == ("b", "</w>")
    assert bpe[0].pair_count == 100
    assert (wp[0].left, wp[0].right) != (bpe[0].left, bpe[0].right)


def test_seq3_pattern_support_planted(spark, tmp_path):
    """Hand-checkable 3-step subsequence supports: three users with
    known histories; containment is subsequence (unbounded gap), not
    substring, and repeated types count once per user."""
    import datetime

    from stream_processing_with_flink_study_spark.plans import QUERIES

    base = datetime.datetime(2024, 2, 1)
    hist = {
        1: ["click", "view", "purchase"],
        2: ["click", "click", "view"],
        3: ["purchase", "view", "click", "purchase"],
    }
    rows, eid = [], 0
    for u, seq in hist.items():
        for t in seq:
            rows.append((eid, u, t, base + datetime.timedelta(minutes=eid), 1.0))
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string, ts timestamp,"
        " value double",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    got = {
        r.pattern: r
        for r in QUERIES["seq3_pattern_support"](spark, str(tmp_path)).collect()
    }
    # u1 and u3 both contain view ... then purchase? u1: c v p yes;
    # u3: p v c p -> view before the last purchase yes, click between
    want = {
        "click>view>purchase": 1,   # u1 only (u2 lacks purchase)
        "click>click>view": 1,      # u2 only
        "purchase>view>click": 1,   # u3 only
        "view>click>purchase": 1,   # u3 (v at 1, c at 2, p at 3)
    }
    for pat, sup in want.items():
        if pat in got:
            assert got[pat].support == sup, pat
    assert all(r.support <= 3 for r in got.values())
    assert all(
        abs(r.user_share - round(r.support / 3 - 1e-9, 4)) < 1e-12
        for r in got.values()
    )
    # ranks are 1..15 with (support desc, pattern asc)
    rks = sorted(r.rk for r in got.values())
    assert rks == list(range(1, 16))
