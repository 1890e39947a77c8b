"""Shared oracle-comparison helpers (mirrors the driver's check)."""

from __future__ import annotations

import pandas as pd


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].astype("float64")
        elif str(df[c].dtype) in ("bool", "boolean"):
            df[c] = df[c].astype("bool")
    return df.sort_values(list(df.columns), ignore_index=True)


def assert_matches_oracle(spark_df, duck_con, sql: str) -> None:
    s = normalize(spark_df.toPandas())
    o = normalize(duck_con.execute(sql).fetch_df())
    assert len(s) == len(o), f"row count {len(s)} != {len(o)}"
    assert list(s.columns) == list(o.columns)
    for c in s.columns:
        sv, ov = s[c], o[c]
        assert str(sv.dtype) == str(ov.dtype), f"{c}: {sv.dtype} != {ov.dtype}"
        if str(sv.dtype).startswith("float"):
            # bitwise: as strict as the driver's value hash (-0.0 != +0.0,
            # no epsilon).  NaNs are pandas-canonical → NaN == NaN bitwise.
            import numpy as np

            sa = sv.to_numpy(dtype="float64", na_value=np.nan)
            oa = ov.to_numpy(dtype="float64", na_value=np.nan)
            bad = sa.view("int64") != oa.view("int64")
            assert not bad.any(), (
                f"float mismatch in column {c} at sorted row "
                f"{int(bad.argmax())}: spark={sa[bad.argmax()]!r} "
                f"oracle={oa[bad.argmax()]!r}"
            )
        else:
            assert sv.equals(ov), f"value mismatch in column {c}"
