"""Local re-implementation of the driver's DuckDB-oracle comparison
(row-count + sorted-column schema + order-insensitive value comparison), so
every `queries()` / `oracle_sql()` pair is validated in-repo before the
driver ever sees it.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from prefect_flow_arc_alto_to_json_spark.schemas import TESTDATA_TABLES


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize cell values so dtype differences (int32 vs int64,
    # float32 vs float64, decimal vs int) don't mask value equality
    def canon(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return None
        if pd.isna(v):
            return None
        if isinstance(v, bool):
            return v
        if isinstance(v, (int,)):
            return ("num", float(v)) if abs(v) < 2**52 else ("big", int(v))
        if isinstance(v, float):
            return ("num", round(v, 9))
        try:
            import decimal

            if isinstance(v, decimal.Decimal):
                iv = int(v)
                return ("big", iv) if abs(iv) >= 2**52 else ("num", float(v))
        except Exception:
            pass
        return str(v)

    # astype(object) first: .map keeps the ORIGINAL dtype on an empty
    # column, so two empty frames with float64-vs-object columns would
    # fail .equals() even though they agree on every (zero) value
    out = df.astype(object).map(canon)
    out = out.sort_values(by=list(out.columns), key=lambda s: s.map(repr)).reset_index(
        drop=True
    )
    return out


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str) -> None:
    actual = spark_df.toPandas()
    expected = con.execute(sql).fetch_df()
    assert len(actual) == len(expected), (
        f"{name}: row count {len(actual)} != oracle {len(expected)}"
    )
    a_cols, e_cols = sorted(actual.columns), sorted(expected.columns)
    assert a_cols == e_cols, f"{name}: columns {a_cols} != oracle {e_cols}"
    a, e = _normalize(actual), _normalize(expected)
    if not a.equals(e):
        diff_rows = (a != e).any(axis=1)
        raise AssertionError(
            f"{name}: value mismatch; first diffs:\n"
            f"spark:\n{a[diff_rows].head(5)}\noracle:\n{e[diff_rows].head(5)}"
        )
