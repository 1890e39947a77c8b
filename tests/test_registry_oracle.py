"""Every registered query must run and (when it declares an oracle)
match DuckDB at sf0.001 — the fast local version of the driver's gate."""

from __future__ import annotations

import pytest

from stream_processing_with_flink_study_spark import plans

from .conftest import SF_SMALL
from .util import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(plans.QUERIES))
def test_query_matches_oracle(spark, duck, name):
    df = plans.QUERIES[name](spark, SF_SMALL)
    sql = plans.ORACLES.get(name)
    if sql is None:
        assert df.count() >= 0  # rows-only check
        assert df.schema.fields
    else:
        assert_matches_oracle(df, duck, sql)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
