"""Sequence packing: group documents into fixed token-budget packs —
the step that turns a deduped corpus into dense LLM training examples
(minimizing pad tokens).

Optimal bin packing is NP-hard and inherently sequential; the scale
decomposition is the standard one: hash-partition the corpus, run
first-fit-decreasing WITHIN each partition (an Arrow batch in
``applyInPandas``), and make pack ids globally unique by offsetting
with the partition id.  Packing quality is a local property (FFD wastes
< ~22% in the worst case, far less on natural length distributions), so
partition-local packing loses almost nothing versus a global pass while
scaling linearly — no stage ever sees more than one partition's docs.

Documents longer than the budget come out as single-doc packs (truncate
or split upstream if that is not wanted).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PACK_STRIDE = 1 << 40  # partition id × stride + local pack index


def pack_sequences(
    df: DataFrame,
    token_col: str,
    budget: int,
    id_col: str = "doc_id",
    num_partitions: int | None = None,
    part_col=None,
) -> DataFrame:
    """First-fit-decreasing packing of ``df`` rows into token-budget
    bins.  Output: (pack_id, doc_id, n_tokens) — one row per input row,
    every input appears in exactly one pack, and no multi-doc pack
    exceeds ``budget`` (asserted in tests/test_training_ops.py).

    The partition key defaults to ``pmod(xxhash64(id), P)`` —
    deterministic for a fixed partition count, so re-runs reproduce
    identical packs.  Pass ``part_col`` (any integer Column) to supply
    the partitioner explicitly — e.g. ``pmod(id, P)`` when the packing
    must be replayable by an engine without xxhash64."""
    p = num_partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    p = int(p)
    if part_col is None:
        part_col = F.pmod(F.xxhash64(F.col(id_col)), F.lit(p))
    keyed = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(token_col).cast("long").alias("n_tokens"),
        part_col.cast("long").alias("_part"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        part = int(pdf["_part"].iloc[0])
        # FFD: longest first, deterministic tie-break on id
        pdf = pdf.sort_values(
            ["n_tokens", "doc_id"], ascending=[False, True]
        ).reset_index(drop=True)
        fills: list[int] = []
        assign: list[int] = []
        for tok in pdf["n_tokens"]:
            tok = int(tok)
            for i, fill in enumerate(fills):
                if fill + tok <= budget:
                    fills[i] = fill + tok
                    assign.append(i)
                    break
            else:
                assign.append(len(fills))
                fills.append(tok)
        pdf["pack_id"] = [part * PACK_STRIDE + a for a in assign]
        return pdf[["pack_id", "doc_id", "n_tokens"]]

    return keyed.groupBy("_part").applyInPandas(
        pack, "pack_id long, doc_id long, n_tokens long"
    )


def pack_stats(packs: DataFrame, budget: int) -> DataFrame:
    """Utilization summary over :func:`pack_sequences` output: pack
    count, mean fill ratio, and padding share — the numbers that decide
    whether the packing step is paying for itself."""
    per_pack = packs.groupBy("pack_id").agg(
        F.sum("n_tokens").alias("fill"), F.count(F.lit(1)).alias("n_docs")
    )
    return per_pack.agg(
        F.count(F.lit(1)).alias("n_packs"),
        F.sum("n_docs").alias("n_docs"),
        F.round(F.avg(F.col("fill") / budget), 4).alias("mean_fill_ratio"),
        F.round(
            1 - F.sum("fill") / (F.count(F.lit(1)) * budget), 4
        ).alias("padding_share"),
    )
