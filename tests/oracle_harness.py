"""Shared Spark-vs-DuckDB comparison harness, mirroring the driver's check:
row count + column names + order-insensitive value comparison (columns
sorted by name, rows sorted by all columns, values normalized)."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from mongoshake_spark.sources.tables import TABLES


def run_oracle(sf_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con.execute(sql).fetchdf()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None).astype("datetime64[us]")
            df[c] = df[c].astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].map(
                lambda v: "nan" if v is None or (isinstance(v, float) and math.isnan(v)) else f"{v:.6f}"
            )
        else:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(spark_df, oracle_df: pd.DataFrame) -> tuple[bool, str]:
    sp = spark_df.toPandas()
    if sorted(sp.columns) != sorted(oracle_df.columns):
        return False, f"columns differ: spark={sorted(sp.columns)} oracle={sorted(oracle_df.columns)}"
    if len(sp) != len(oracle_df):
        return False, f"row count differs: spark={len(sp)} oracle={len(oracle_df)}"
    a, b = _normalize(sp), _normalize(oracle_df)
    if a.equals(b):
        return True, "ok"
    diff = (a != b).any(axis=1)
    bad = diff[diff].index[:5].tolist()
    detail = "\n".join(
        f"  row {i}: spark={a.iloc[i].to_dict()} oracle={b.iloc[i].to_dict()}" for i in bad
    )
    return False, f"{diff.sum()} differing rows, first:\n{detail}"
