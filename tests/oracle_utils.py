"""Local replica of the driver's oracle comparison (SURVEY.md §5 item 1).

Runs a registered PySpark query and its DuckDB oracle SQL on the same
parquet fixtures and compares row-count, schema-compatible values, and
an order-insensitive value hash with columns sorted by name — the
driver's contract.  Canonicalization (floats → repr rounding,
timestamps → µs, arrays → tuples) is centralized here per the
SURVEY.md §7 watch list.
"""

from __future__ import annotations

import math
from datetime import datetime, timezone

import duckdb
import numpy as np
import pandas as pd

from processor_spark.sources import TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).fetchdf()


def _canon_value(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return "0.0"  # merge -0.0 / +0.0
        return repr(round(v, 9))
    if isinstance(v, (np.floating,)):
        return _canon_value(float(v))
    if isinstance(v, (np.integer,)):
        return repr(int(v))
    if isinstance(v, pd.Timestamp):
        ts = v.tz_convert("UTC").tz_localize(None) if v.tzinfo else v
        return ts.floor("us").isoformat()
    if isinstance(v, datetime):
        if v.tzinfo is not None:
            v = v.astimezone(timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, bool) or isinstance(v, np.bool_):
        return str(bool(v))
    return str(v)


def canonical_rows(pdf: pd.DataFrame) -> list[tuple]:
    cols = sorted(pdf.columns)
    out = []
    for _, row in pdf[cols].iterrows():
        out.append(tuple(_canon_value(row[c]) for c in cols))
    return sorted(out)


def compare(spark_df, oracle_pdf: pd.DataFrame) -> dict:
    spdf = spark_df.toPandas()
    result = {
        "rows_spark": len(spdf),
        "rows_oracle": len(oracle_pdf),
        "cols_spark": sorted(spdf.columns),
        "cols_oracle": sorted(oracle_pdf.columns),
    }
    result["rows_match"] = result["rows_spark"] == result["rows_oracle"]
    result["cols_match"] = result["cols_spark"] == result["cols_oracle"]
    if not (result["rows_match"] and result["cols_match"]):
        result["values_match"] = False
        return result
    a = canonical_rows(spdf)
    b = canonical_rows(oracle_pdf)
    result["values_match"] = a == b
    if not result["values_match"]:
        diffs = [(x, y) for x, y in zip(a, b) if x != y]
        result["first_diffs"] = diffs[:5]
    return result
