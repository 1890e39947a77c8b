"""ANN (LSH) quality vs the brute-force baseline, and dedup internals."""

from __future__ import annotations

from pyspark.sql import functions as F

from stream_processing_with_flink_study_spark.functions import dedup, similarity
from stream_processing_with_flink_study_spark.sources import load_table

from .conftest import SF_SMALL


def test_ann_lsh_recall_vs_brute_force(spark):
    emb = load_table(spark, SF_SMALL, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r.q_id, r.n_id)
        for r in similarity.brute_force_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r.q_id, r.n_id)
        for r in similarity.ann_topk_lsh(emb, queries, dim=64, k=5).collect()
    }
    # 8 tables x 4 planes: collision prob for the ~0.3-cosine top
    # neighbors is ~0.6^4 per table, OR-amplified to ~0.67 overall
    assert approx, "LSH returned no candidates at all"
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.4, f"LSH recall below OR-amplified expectation: {recall}"


def test_lsh_near_dup_recovers_planted_pairs(spark):
    """The LSH-bucketed near-dup path must recover ≥90% of planted
    high-cosine duplicates (4 planes × 8 tables OR-amplifies collision
    probability to ~0.998 at cosine ≥ 0.9) and report only pairs the
    exact verify confirms."""
    from stream_processing_with_flink_study_spark.plans.queries_text import (
        embedding_near_dup_lsh,
    )

    got = {
        (r.id_a, r.id_b): r.cosine_sim
        for r in embedding_near_dup_lsh(spark, SF_SMALL).collect()
    }
    emb = load_table(spark, SF_SMALL, "embeddings")
    planted = {
        (r.vec_id, r.vec_id + 1_000_000)
        for r in emb.filter(F.col("vec_id") % 10 == 0).collect()
    }
    # every planted pair really is a near-dup (cosine >= 0.9 by design)
    found = planted & got.keys()
    assert len(found) / len(planted) >= 0.9, (len(found), len(planted))
    assert all(got[p] >= 0.9 for p in found)


def test_ivf_full_probe_equals_brute_force(spark):
    """IVF with nprobe == n_cells scores every (query, corpus) pair with
    the same cosine expression and tie-break as brute force, so the
    result must be IDENTICAL — the exactness anchor for the IVF path."""
    emb = load_table(spark, SF_SMALL, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r.q_id, r.n_id, r.rank)
        for r in similarity.brute_force_topk(emb, queries, k=5).collect()
    }
    full = {
        (r.q_id, r.n_id, r.rank)
        for r in similarity.ivf_topk(
            emb, queries, dim=64, k=5, n_cells=8, nprobe=8
        ).collect()
    }
    assert full == exact


def test_ivf_partial_probe_recall(spark):
    emb = load_table(spark, SF_SMALL, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r.q_id, r.n_id)
        for r in similarity.brute_force_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r.q_id, r.n_id)
        for r in similarity.ivf_topk(
            emb, queries, dim=64, k=5, n_cells=8, nprobe=4
        ).collect()
    }
    assert approx, "IVF returned no candidates"
    recall = len(exact & approx) / len(exact)
    # probing half the cells must beat the random-candidate floor
    assert recall >= 0.5, f"IVF recall too low: {recall}"


def test_byte_histogram_features_match_numpy_and_feed_topk(spark):
    """Multimodal feature extraction: the Arrow-batched histogram UDF
    matches a pure-numpy reference, and its array<double> output plugs
    directly into the similarity stack (brute-force top-k runs on it)."""
    import numpy as np

    from stream_processing_with_flink_study_spark.functions import multimodal

    docs = load_table(spark, SF_SMALL, "documents").limit(50)
    feat = multimodal.byte_histogram_features(
        multimodal.with_binary_payload(docs)
    ).select("doc_id", "features")
    rows = {r.doc_id: r.features for r in feat.collect()}
    raw = {r.doc_id: r.text for r in docs.collect()}
    assert rows.keys() == raw.keys()
    for doc_id, text in raw.items():
        arr = np.frombuffer(text.encode(), dtype=np.uint8)
        hist = np.bincount(arr >> 4, minlength=16).astype(float)
        want = hist / hist.sum() if arr.size else hist
        assert np.allclose(rows[doc_id], want), doc_id

    queries = feat.filter(F.col("doc_id") < 5)
    topk = similarity.brute_force_topk(
        feat, queries, k=3, id_col="doc_id", vec_col="features"
    ).collect()
    assert len(topk) == 5 * 3
    assert all(-1.0001 <= r.cosine_sim <= 1.0001 for r in topk)


def test_lsh_candidates_superset_of_high_jaccard(spark):
    # LSH with 4 bands x 4 rows at jaccard>=0.8 collides with prob
    # 1-(1-0.8^4)^4 ≈ 0.87; planted near-dups here have jaccard ≈ 0.95+
    # and in practice all collide — assert none are missed.
    from stream_processing_with_flink_study_spark.plans.queries_text import (
        _near_dup_corpus,
    )

    corpus = _near_dup_corpus(spark, SF_SMALL)
    sh = dedup.doc_shingles(corpus, "text", "doc_id")
    sig = dedup.minhash_signatures(corpus, "text", "doc_id")
    cands = {
        (r.id_a, r.id_b)
        for r in dedup.lsh_candidate_pairs(sig, "doc_id").collect()
    }
    exact = {
        (r.id_a, r.id_b)
        for r in dedup.jaccard_pairs(sh, "doc_id", 0.8).collect()
    }
    assert exact, "no planted near-dups found — corpus construction broke"
    missed = exact - cands
    assert not missed, f"LSH missed high-jaccard pairs: {sorted(missed)[:5]}"


def test_embedding_dedup_clusters_collapse_planted_chains(spark):
    from stream_processing_with_flink_study_spark.plans.queries_corpus import (
        embedding_dedup_clusters,
    )

    rows = embedding_dedup_clusters(spark, SF_SMALL).collect()
    comp = {r["vec_id"]: r["cluster_id"] for r in rows}
    keep = {r["vec_id"] for r in rows if r["keep"]}
    emb = load_table(spark, SF_SMALL, "embeddings")
    bases = [r["vec_id"] for r in emb.filter("vec_id % 10 = 0").collect()]
    assert bases
    for b in bases:
        # chain b ~ b+1M ~ b+2M must collapse to one cluster rooted at b
        assert comp[b] == comp[b + 1_000_000] == comp[b + 2_000_000] == b
        assert b in keep
        assert b + 1_000_000 not in keep and b + 2_000_000 not in keep


def test_pq_adc_recall_and_codes(spark):
    """Product quantization: 8x16 codebooks -> 8-byte codes; ADC scan +
    exact re-rank must recover a solid fraction of the brute-force
    top-5, and codes must be well-formed and deterministic."""
    import numpy as np

    emb = load_table(spark, SF_SMALL, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r.q_id, r.n_id)
        for r in similarity.brute_force_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r.q_id, r.vec_id)
        for r in similarity.pq_topk(emb, queries, k=5).collect()
    }
    assert approx
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.4, f"PQ recall too low: {recall}"

    sample = np.array(
        emb.limit(512).toPandas()["embedding"].tolist(), dtype=np.float64
    )
    books = similarity.pq_codebooks(sample)
    assert books.shape == (8, 16, 8)
    coded = similarity.pq_encode(emb.limit(100), books).select("code")
    rows = [r.code for r in coded.collect()]
    assert all(len(c) == 8 for c in rows)
    assert all(0 <= v < 16 for c in rows for v in c)
    rows2 = [r.code for r in coded.collect()]
    assert rows == rows2  # deterministic encoding


class TestWhitening:
    def test_zca_whitened_covariance_is_identity(self, spark):
        import numpy as np

        from stream_processing_with_flink_study_spark.functions.similarity import (
            embedding_moments,
            whiten,
            zca_whitening_matrix,
        )

        emb = load_table(spark, SF_SMALL, "embeddings")
        n, s, ss = embedding_moments(emb)
        mu, w = zca_whitening_matrix(n, s, ss)
        assert np.allclose(w, w.T)  # ZCA transform is symmetric
        z = whiten(emb, mu, w, id_cols=["vec_id"])
        zm = np.array(
            [r["whitened"] for r in z.select("whitened").collect()]
        )
        # whitened sample covariance ~ identity (eps floor softens
        # exact-1 diagonals for near-zero eigenvalues)
        cov = np.cov(zm, rowvar=False)
        assert np.allclose(np.diag(cov), 1.0, atol=0.05)
        off = cov - np.diag(np.diag(cov))
        assert np.abs(off).max() < 0.05
        assert np.abs(zm.mean(axis=0)).max() < 1e-8

    def test_moments_match_direct_computation(self, spark):
        import numpy as np

        from stream_processing_with_flink_study_spark.functions.similarity import (
            embedding_moments,
        )

        emb = load_table(spark, SF_SMALL, "embeddings")
        x = np.array(
            [r["embedding"] for r in emb.select("embedding").collect()],
            dtype=np.float64,
        )
        n, s, ss = embedding_moments(emb)
        assert n == len(x)
        assert np.allclose(s, x.sum(axis=0))
        assert np.allclose(ss, x.T @ x)


class TestPrefixJaccard:
    def test_hand_case_exact_pairs(self, spark):
        rows = [
            (1, "a b c d e f g h"),
            (2, "a b c d e f g x"),   # 7/9 5-gram overlap? verified below
            (3, "z y x w v u t s"),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in dedup.prefix_filter_jaccard_pairs(
                df, "text", "doc_id", n=5, threshold=0.3
            ).collect()
        }
        # doc1 5-gram set: {abcde,bcdef,cdefg,defgh}; doc2 swaps h->x:
        # {abcde,bcdef,cdefg,defgx}; inter=3, union=5 -> J=0.6
        assert out == {(1, 2): 0.6}

    def test_prefix_filter_prunes_but_loses_nothing(self, spark):
        docs = load_table(spark, SF_SMALL, "documents")
        got = {
            (r["id_a"], r["id_b"])
            for r in dedup.prefix_filter_jaccard_pairs(
                docs, "text", "doc_id", n=5, threshold=0.7
            ).collect()
        }
        # brute-force ground truth via the exact shingle join
        sh = dedup.doc_shingles(docs, "text", "doc_id", n=5)
        sizes = sh.groupBy("doc_id").count()
        a, b = sh.alias("a"), sh.alias("b")
        inter = (
            a.join(
                b,
                (F.col("a.shingle") == F.col("b.shingle"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .groupBy(
                F.col("a.doc_id").alias("id_a"),
                F.col("b.doc_id").alias("id_b"),
            )
            .agg(F.count(F.lit(1)).alias("i"))
        )
        sa = sizes.select(
            F.col("doc_id").alias("id_a"), F.col("count").alias("na")
        )
        sb = sizes.select(
            F.col("doc_id").alias("id_b"), F.col("count").alias("nb")
        )
        truth = {
            (r["id_a"], r["id_b"])
            for r in inter.join(sa, "id_a")
            .join(sb, "id_b")
            .filter(
                F.col("i") * 1.0 / (F.col("na") + F.col("nb") - F.col("i"))
                >= 0.7
            )
            .collect()
        }
        assert got == truth and len(truth) > 0


class TestMMR:
    def test_mmr_is_deterministic_and_diverse(self, spark):
        import numpy as np

        from stream_processing_with_flink_study_spark.functions.similarity import (
            brute_force_topk,
            mmr_rerank,
        )

        emb = load_table(spark, SF_SMALL, "embeddings")
        queries = emb.filter(F.col("vec_id") % 167 == 1)
        a = mmr_rerank(emb, queries, k=8, pool=25).collect()
        b = mmr_rerank(emb, queries, k=8, pool=25).collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b]
        # rank 1 must be the plain top-1 (no redundancy term yet)
        top1 = {
            r["q_id"]: r["n_id"]
            for r in brute_force_topk(emb, queries, k=1).collect()
        }
        for r in a:
            if r["rank"] == 1:
                assert top1[r["q_id"]] == r["n_id"]

        def mean_pairwise(ids):
            vecs = {
                v["vec_id"]: np.array(v["embedding"])
                for v in emb.filter(
                    F.col("vec_id").isin([int(i) for i in ids])
                ).collect()
            }
            m = np.array([vecs[i] for i in ids], dtype=np.float64)
            m = m / np.linalg.norm(m, axis=1, keepdims=True)
            s = m @ m.T
            n = len(ids)
            return (s.sum() - n) / (n * (n - 1))

        plain = brute_force_topk(emb, queries, k=8).collect()
        for q in {r["q_id"] for r in a}:
            mmr_ids = [r["n_id"] for r in a if r["q_id"] == q]
            plain_ids = [r["n_id"] for r in plain if r["q_id"] == q]
            # diversity: MMR set is no more self-similar than top-k
            assert (
                mean_pairwise(mmr_ids) <= mean_pairwise(plain_ids) + 1e-9
            )


class TestZCAFrozen:
    def test_frozen_w_whitens_its_training_sample(self):
        # the baked (W, b) must be a REAL whitener: applied back to the
        # seeded training sample, covariance ~ I (so the registered
        # serving query ships a genuine trained matrix, not noise)
        import numpy as np

        from stream_processing_with_flink_study_spark.functions.similarity import (
            seeded_unit_sample,
        )
        from stream_processing_with_flink_study_spark.plans.queries_mlprep import (
            _zca_frozen_constants,
        )

        w, b = _zca_frozen_constants()
        x = seeded_unit_sample(512, 64, seed=11)
        z = x @ w.T - b
        cov = np.cov(z, rowvar=False)
        off = cov - np.eye(64)
        assert np.abs(off).max() < 0.05
        # and b really is W @ mu of that sample
        assert np.allclose(w @ x.mean(axis=0), b)

    def test_frozen_query_matches_numpy_projection(self, spark):
        # the JVM sequential-fold projection == the numpy matmul path
        # within fp tolerance (the fold exists for oracle hash-parity,
        # not different math)
        import numpy as np

        from stream_processing_with_flink_study_spark.plans import QUERIES
        from stream_processing_with_flink_study_spark.plans.queries_mlprep import (
            _zca_frozen_constants,
        )

        w, b = _zca_frozen_constants()
        got = {
            r.vec_id: r
            for r in QUERIES["zca_whiten_frozen"](spark, SF_SMALL).collect()
        }
        emb = {
            r.vec_id: np.array(r.embedding, dtype=np.float64)
            for r in load_table(spark, SF_SMALL, "embeddings").collect()
        }
        assert set(got) == set(emb)
        for vid in list(got)[:25]:
            z = w @ emb[vid] - b
            r = got[vid]
            for i, c in enumerate(("w0", "w1", "w2", "w3")):
                assert abs(getattr(r, c) - z[i]) < 1e-3
            assert abs(r.wnorm - float(np.linalg.norm(z))) < 1e-3
