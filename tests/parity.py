"""DuckDB-oracle parity harness mirroring the driver's correctness gate:
row count, column names, and order-insensitive value comparison."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from sentiment_analysis_vector_search_spark.catalog import TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) else v
            )
    return df.sort_values(by=list(df.columns), ignore_index=True)


def assert_parity(spark, name: str, sf_dir: str) -> None:
    import __spark_entry__ as entrymod

    q = entrymod.queries()[name]
    oracle = entrymod.oracle_sql()[name]
    got = _normalize(q(spark, sf_dir).toPandas())
    con = duckdb_conn(sf_dir)
    want = _normalize(con.sql(oracle).df())
    con.close()

    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: {len(got)} rows != {len(want)}"
    for c in got.columns:
        g, w = got[c], want[c]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(w):
            for i, (a, b) in enumerate(zip(g, w)):
                an, bn = pd.isna(a), pd.isna(b)
                assert an == bn and (an or math.isclose(float(a), float(b), rel_tol=1e-9, abs_tol=1e-6)), (
                    f"{name}.{c}[{i}]: {a} != {b}"
                )
        else:
            mism = (g.astype(str) != w.astype(str))
            assert not mism.any(), (
                f"{name}.{c}: first mismatch at {mism.idxmax()}: "
                f"{g[mism.idxmax()]} != {w[mism.idxmax()]}"
            )
