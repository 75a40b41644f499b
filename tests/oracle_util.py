"""Spark-vs-DuckDB comparison mirroring the driver's correctness gate:
row count + column names + order-insensitive values (floats rounded
in the queries themselves; compare with a small tolerance on top)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from kudu_spark.queries import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.copy()
    for c in list(pdf.columns):
        s = pdf[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            if (s.dropna().dt.normalize() == s.dropna()).all():
                pdf[c] = s.dt.strftime("%Y-%m-%d")
            else:
                pdf[c] = s.dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        elif pd.api.types.is_float_dtype(s):
            pdf[c] = s.astype("float64").round(6)
        elif pd.api.types.is_integer_dtype(s):
            pdf[c] = s.astype("float64") if s.isna().any() else s.astype("int64")
        elif pd.api.types.is_bool_dtype(s):
            pdf[c] = s.astype("object")
        elif s.dtype == object:
            if s.map(lambda v: isinstance(v, (list, tuple, np.ndarray))).any():
                pdf[c] = s.map(lambda v: None if v is None else str(list(v)))
            else:
                import datetime as _dt

                def _coerce(v):
                    if isinstance(v, _dt.datetime):
                        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
                    if isinstance(v, _dt.date):
                        return v.strftime("%Y-%m-%d")
                    return v

                pdf[c] = s.map(_coerce)
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    return pdf.sort_values(by=list(pdf.columns), na_position="last").reset_index(drop=True)


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str = "?") -> None:
    got = normalize(spark_df.toPandas())
    want = normalize(con.sql(sql).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: column mismatch {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count {len(got)} != {len(want)}"
    for c in got.columns:
        g, w = got[c], want[c]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(w):
            ok = np.isclose(
                g.astype("float64").to_numpy(),
                w.astype("float64").to_numpy(),
                rtol=1e-9,
                atol=1e-6,
                equal_nan=True,
            )
            assert ok.all(), f"{name}: col {c} differs at rows {np.nonzero(~ok)[0][:5]}"
        else:
            same = (g.fillna("<null>") == w.fillna("<null>")) | (g.isna() & w.isna())
            assert same.all(), (
                f"{name}: col {c} differs, e.g. {g[~same].head(3).tolist()} != {w[~same].head(3).tolist()}"
            )
