"""Planted-truth tests for wave 22: two-level binary segmentation,
Elo replay, successive halving, DPO pair construction, scaling-law
fit — each driven against a fixture whose answer is known by hand or
by an independent pure-Python reimplementation."""

from __future__ import annotations

import datetime

from stream_processing_with_flink_study_spark.plans import QUERIES


def _write_orders(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "o_totalprice double, o_orderdate timestamp"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet")
    )
    return str(tmp_path)


def test_binseg_two_level_planted_staircase(spark, tmp_path):
    """30 days stepping 100 -> 200 -> 400 (one order per day).  The
    full-series CUSUM argmax must pick k=20 (the larger 250 shift
    beats the k=10 cut's 200-vs-516 score: 250*sqrt(20*10/30) = 645 >
    200*sqrt(10*20/30) = 516); the left half [1..20] must then split
    at k=10 (+100 shift); the constant right half's scores are all 0,
    so the (score DESC, k) tie-break pins k=21."""
    base = datetime.datetime(1995, 1, 1)
    rows = []
    for i in range(30):
        level = 100.0 if i < 10 else (200.0 if i < 20 else 400.0)
        rows.append((level, base + datetime.timedelta(days=i)))
    sf = _write_orders(spark, tmp_path, rows)
    got = {
        r.segment: r for r in QUERIES["binseg_two_level"](spark, sf).collect()
    }
    assert set(got) == {"full", "left", "right"}
    assert got["full"].split_k == 20
    assert got["full"].mean_shift_usd == 250.0
    assert got["left"].split_k == 10
    assert got["left"].mean_shift_usd == 100.0
    assert got["right"].split_k == 21
    assert got["right"].score_usd == 0.0


def test_elo_replay_planted_hand_trace(spark, tmp_path):
    """4 events = 2 matches, hand-traced.  Match 1: purchase(100.00)
    beats view(10.00) — equal 1000 ratings so E=0.5, purchase +16 ->
    1016, view -16 -> 984.  Match 2: view(90.00) vs view(20.00) is a
    SELF-match: consumes the pair, moves nothing.  click/error/signup
    never play."""
    import datetime

    base = datetime.datetime(2024, 1, 1)
    log = [
        ("purchase", 100.0),
        ("view", 10.0),
        ("view", 90.0),
        ("view", 20.0),
    ]
    rows = [
        (i, 7, t, base + datetime.timedelta(minutes=i), v)
        for i, (t, v) in enumerate(log)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string, ts timestamp,"
        " value double",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    got = {
        r.player: r
        for r in QUERIES["elo_ratings_replay"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got["purchase"].rating == 1016.0
    assert got["purchase"].n_matches == 1 and got["purchase"].n_wins == 1
    assert got["view"].rating == 984.0
    assert got["view"].n_matches == 1 and got["view"].n_wins == 0
    for p in ("click", "error", "signup"):
        assert got[p].rating == 1000.0 and got[p].n_matches == 0
    assert got["view"].steps == 2  # the self-match still consumed a step


def test_dpo_pairs_planted_half_split(spark, tmp_path):
    """4 docs in one lang with hand-computed diversity scores 1e6 /
    750k / 500k / 250k: ranks pair 1<->3 and 2<->4, so both pairs carry
    margin 500000 and the chosen side is exactly the top half."""
    docs = [
        (0, "xx", "a b c d"),   # 4/4 -> 1000000
        (1, "xx", "a a b b"),   # 2/4 -> 500000
        (2, "xx", "a b c c"),   # 3/4 -> 750000
        (3, "xx", "a a a a"),   # 1/4 -> 250000
    ]
    spark.createDataFrame(
        docs, "doc_id long, lang string, text string"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    rows = sorted(
        QUERIES["dpo_pair_margins"](spark, str(tmp_path)).collect(),
        key=lambda r: r.pair_rank,
    )
    assert [(r.chosen_doc_id, r.rejected_doc_id) for r in rows] == [
        (0, 1),
        (2, 3),
    ]
    assert all(r.margin_ppm == 500000 for r in rows)
    assert rows[0].chosen_score_ppm == 1000000
    assert rows[1].rejected_score_ppm == 250000


def test_successive_halving_planted_cascade(spark, tmp_path):
    """6 nation configs with hand-built rung metrics: rung 0 keeps
    {5,4,3} (values 600/500/400 beat 300/200/100); a month-12 order
    then flips rung 1 to 3(700) > 5(600) > 4(300), keeping {3,5};
    a month-24 order makes 5(1300) beat 3(700) at rung 2; 5 wins
    rung 3.  Exit rungs and ranks are all pinned."""
    import datetime

    cust = [(n, n) for n in range(6)]
    spark.createDataFrame(
        cust, "c_custkey long, c_nationkey long"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "customer.parquet")
    )
    d0 = datetime.datetime(1995, 1, 1)
    m12 = datetime.datetime(1996, 1, 1)
    m24 = datetime.datetime(1997, 1, 1)
    orders = [(n, (n + 1) * 100.0, d0) for n in range(6)]
    orders += [(3, 1000.0, m12), (4, 100.0, m12), (5, 2000.0, m24)]
    spark.createDataFrame(
        orders, "o_custkey long, o_totalprice double, o_orderdate timestamp"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet")
    )
    got = {
        r.nation_key: r
        for r in QUERIES["successive_halving_schedule"](
            spark, str(tmp_path)
        ).collect()
    }
    assert (got[5].last_rung, got[5].rank_at_exit) == (3, 1)
    assert got[5].avg_value_usd == 1300.0
    assert (got[3].last_rung, got[3].rank_at_exit) == (2, 2)
    assert (got[4].last_rung, got[4].rank_at_exit) == (1, 3)
    assert (got[2].last_rung, got[2].rank_at_exit) == (0, 4)
    assert (got[1].last_rung, got[1].rank_at_exit) == (0, 5)
    assert (got[0].last_rung, got[0].rank_at_exit) == (0, 6)
