"""Full-registry empty-universe parity sweep (round-11 verdict item 3).

The curated 29-query degenerate suite (tests/test_degenerate_universes.py)
found seven real empty/singleton-universe divergences in round 11 — but
several of them (bradley_terry, holt_winters, ipf, kcenter, mrmr) sat
OUTSIDE the curated family and were only caught by hand-probing beyond
it.  An empty universe costs almost nothing to evaluate, so this tool
removes the curation: it materializes one schema-preserved fully-empty
universe (every table pyarrow-sliced to 0 rows) and runs ALL registered
queries AND their DuckDB oracles against it with exactly the
row-count/schema/value compare the driver's gate uses.  Any divergence —
a driver-side crash where the oracle emits 0 rows, an ANSI divide where
DuckDB NULLs, an init-state row the oracle doesn't emit — is a red run.

    python tools/degenerate_sweep.py [name ...]

Opt-in CI stage: ``DEGENERATE_SWEEP=0 tools/ci.sh`` skips it (on by
default — the whole sweep is a few minutes because every frame is
empty).  Exit status non-zero on any failure.
"""

from __future__ import annotations

import argparse
import atexit
import os
import shutil
import sys
import tempfile
import time
import traceback

import pyarrow.parquet as pq

sys.path.insert(0, ".")

from stream_processing_with_flink_study_spark import plans  # noqa: E402
from stream_processing_with_flink_study_spark.schemas import TABLES  # noqa: E402
from stream_processing_with_flink_study_spark.session import get_spark  # noqa: E402
from tools.check_oracle import compare, duck_connection  # noqa: E402


def build_empty_universe(out: str, template_sf: str) -> None:
    for t in TABLES:
        tbl = pq.read_table(f"{template_sf}/{t}.parquet").slice(0, 0)
        pq.write_table(tbl, os.path.join(out, f"{t}.parquet"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--template-sf", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    scratch = tempfile.mkdtemp(prefix="spfs_degenerate_")
    atexit.register(shutil.rmtree, scratch, ignore_errors=True)
    build_empty_universe(scratch, args.template_sf)

    spark = get_spark("degenerate-sweep")
    con = duck_connection(scratch)
    names = args.names or sorted(plans.QUERIES)
    failures = []
    t_start = time.time()
    for i, name in enumerate(names):
        sql = plans.ORACLES.get(name)
        t0 = time.time()
        try:
            ok, msg = compare(
                name, plans.QUERIES[name](spark, scratch), con, sql
            )
        except Exception:
            ok, msg = False, traceback.format_exc(limit=8)
        finally:
            spark.catalog.clearCache()
        dt = time.time() - t0
        if not ok:
            failures.append(name)
        print(
            f"{'PASS' if ok else 'FAIL'} [{i + 1}/{len(names)}] "
            f"{name:40s} {dt:6.2f}s  {msg if not ok else msg}"
        )
    con.close()
    print(
        f"\n{len(names) - len(failures)}/{len(names)} empty-universe "
        f"parity in {time.time() - t_start:.0f}s"
        + (f"; FAILURES: {failures}" if failures else "")
    )
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
