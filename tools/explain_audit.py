"""Plan-quality audit: dump every registered query's physical plan and
flag scale red-flags.

    python tools/explain_audit.py [--sf /root/testdata/sf0.01] [name ...]

Checks per query (static, no execution):
- parquet scans: how many, and whether column pruning reached the scan
  (ReadSchema width vs table width);
- filter pushdown (PushedFilters non-empty when the plan has a Filter
  directly over a scan whose predicates reference scanned columns);
- exchange count (each is a shuffle) and duplicate-subtree explosions
  (many scans of one table in a single plan);
- Python row-path: BatchEvalPython (row-at-a-time UDF — always a bug
  here) vs ArrowEvalPython/FlatMapGroupsInPandas (accepted, vectorized).
"""

from __future__ import annotations

import argparse
import re
import sys

sys.path.insert(0, ".")

from stream_processing_with_flink_study_spark import plans  # noqa: E402
from stream_processing_with_flink_study_spark.session import get_spark  # noqa: E402


def formatted_plan(df) -> str:
    """The 'formatted' explain: one numbered entry per physical node,
    with reused exchanges/subqueries deduplicated — unlike toString,
    which re-prints the display lineage inside every InMemoryRelation."""
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def audit(name: str, plan: str) -> tuple[dict[str, int], list[str]]:
    nodes = re.findall(r"^\(\d+\) ([A-Za-z ]+?)(?: \[codegen.*)?$", plan, re.M)
    counts: dict[str, int] = {}
    for n in nodes:
        counts[n.strip()] = counts.get(n.strip(), 0) + 1
    flags = []
    n_file = counts.get("Scan parquet", 0)
    if n_file > 8:
        flags.append(f"{n_file} file scans (duplicate-lineage blowup?)")
    if counts.get("BatchEvalPython"):
        flags.append("row-at-a-time Python UDF (BatchEvalPython)")
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        if len(m.group(1).split(",")) > 8:
            flags.append("a scan reads >8 columns — projection pruning missing?")
            break
    return counts, flags


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--dump", action="store_true", help="print full plans")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    spark = get_spark("explain-audit", shuffle_partitions=8)
    names = args.names or sorted(plans.QUERIES)
    any_flags = False
    for name in names:
        df = plans.QUERIES[name](spark, args.sf)
        plan = formatted_plan(df)
        counts, flags = audit(name, plan)
        n_scan = counts.get("Scan parquet", 0)
        n_mem = sum(v for k, v in counts.items() if "InMemory" in k)
        n_ex = sum(v for k, v in counts.items() if "Exchange" in k and "Reused" not in k)
        n_reuse = sum(v for k, v in counts.items() if "Reused" in k)
        n_bhj = counts.get("BroadcastHashJoin", 0)
        print(
            f"{name:34s} scans={n_scan:2d} cache_reads={n_mem:2d} "
            f"exchanges={n_ex:2d} reused={n_reuse:2d} bcast_joins={n_bhj:2d}"
            + (f"  !! {'; '.join(flags)}" if flags else "")
        )
        if args.dump:
            print(plan)
        any_flags |= bool(flags)
    # CI-shaped: a flagged plan fails the run instead of scrolling past
    sys.exit(1 if any_flags else 0)


if __name__ == "__main__":
    main()
