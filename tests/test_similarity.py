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
