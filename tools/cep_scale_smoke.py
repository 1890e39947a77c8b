"""CEP scale smoke: run the generic match_pattern over a corpus whose
KEY SPACE is N× the sf events table and check (a) match counts scale
exactly N× (each copy is an independent key universe — any deviation
means state leaked across keys) and (b) wall clock stays linear-ish
(the chained-window plan is one exchange + one per-key sort; nothing
may go pairwise in pattern length or key count).

    python tools/cep_scale_smoke.py [--sf /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from stream_processing_with_flink_study_spark.operators.cep import match_pattern  # noqa: E402
from stream_processing_with_flink_study_spark.session import get_spark  # noqa: E402
from stream_processing_with_flink_study_spark.sources import load_table  # noqa: E402

STEPS = ("signup", "view", "click", "purchase")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--mults", default="1,4,16")
    args = ap.parse_args()

    spark = get_spark("cep-scale-smoke")
    base = load_table(spark, args.sf, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )

    out = {}
    base_n = None
    for mult in [int(m) for m in args.mults.split(",")]:
        df = base
        if mult > 1:
            # one copy per multiplier index, keys shifted into a
            # disjoint range (event_ids too, to keep tiebreaks unique)
            df = base.crossJoin(
                spark.range(mult).select(F.col("id").alias("_copy"))
            ).select(
                (F.col("user_id") + F.col("_copy") * 10_000_000).alias("user_id"),
                (F.col("event_id") + F.col("_copy") * 1_000_000_000).alias("event_id"),
                "ts",
                "event_type",
            )
        t0 = time.perf_counter()
        n = match_pattern(
            df, "user_id", "ts", STEPS, within="48 hours"
        ).count()
        sec = round(time.perf_counter() - t0, 2)
        if base_n is None:
            base_n = n
        out[mult] = {"matches": n, "sec": sec, "linear": n == base_n * mult}
        print(json.dumps({"mult": mult, **out[mult]}))

    assert all(v["linear"] for v in out.values()), out
    print(json.dumps({"cep_scale_smoke": "ok", "results": out}))
    spark.stop()


if __name__ == "__main__":
    main()
