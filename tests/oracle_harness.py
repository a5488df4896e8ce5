"""Local replica of the driver's DuckDB-oracle comparison.

Runs a registered query on Spark AND its oracle SQL on DuckDB over the
same parquet dir, then compares: column-name sets, row counts, and values
(columns sorted by name, rows sorted by all columns — an order-insensitive
exact comparison, stricter than a hash so mismatches are debuggable).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from project2_bigdata_spark.catalog import TABLES


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name and rows by all values; normalize dtypes."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype(str)
        elif s.dtype == object:
            df[c] = s.map(lambda v: str(v) if v is not None else None)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
        elif pd.api.types.is_bool_dtype(s):
            df[c] = s.astype("boolean")
    return df.sort_values(by=list(df.columns), na_position="last").reset_index(drop=True)


def compare(spark, query, sf_dir: str, float_ulps: int = 0) -> None:
    """Assert the Spark result of ``query`` matches its DuckDB oracle."""
    sdf = query.fn(spark, sf_dir)
    # The driver's canonicalizer does pandas.sort_values over RAW cell
    # values, which throws `unhashable type` on array/map/struct cells
    # (this is exactly what turned ml_train_per_product red in round 2 —
    # CORRECTNESS_r02.json). Our local canon() stringifies objects and
    # would hide that, so enforce atomic-only schemas for every
    # oracle-bearing query here, where the full parity sweep runs.
    from pyspark.sql.types import ArrayType, MapType, StructType

    complex_cols = [
        f.name for f in sdf.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert not complex_cols, (
        f"{query.name}: oracle-checked output has complex-typed columns "
        f"{complex_cols} — the driver canonicalizer cannot sort these; "
        f"serialize to JSON strings (see ml/forecast.py coef fix)"
    )
    actual = canon(sdf.toPandas())
    con = duck_con(sf_dir)
    expected = canon(con.execute(query.oracle).fetchdf())
    con.close()

    assert list(actual.columns) == list(expected.columns), (
        f"{query.name}: columns differ: spark={list(actual.columns)} "
        f"oracle={list(expected.columns)}"
    )
    assert len(actual) == len(expected), (
        f"{query.name}: row count differs: spark={len(actual)} oracle={len(expected)}"
    )
    for c in actual.columns:
        a, e = actual[c], expected[c]
        if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(e):
            af = a.astype(float).to_numpy()
            ef = e.astype(float).to_numpy()
            for i, (x, y) in enumerate(zip(af, ef)):
                if math.isnan(x) and math.isnan(y):
                    continue
                assert x == y, (
                    f"{query.name}: float mismatch col={c} row={i}: "
                    f"spark={x!r} oracle={y!r} (diff={x - y!r})"
                )
        else:
            mism = (a != e) & ~(a.isna() & e.isna())
            assert not mism.any(), (
                f"{query.name}: mismatch col={c}:\n"
                f"spark:\n{a[mism].head()}\noracle:\n{e[mism].head()}"
            )
