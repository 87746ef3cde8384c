"""Canonical Spark-vs-DuckDB result comparison.

Replicates (strictly) what the driver's t2 gate does: row-count + column
names + order-insensitive value comparison, with columns sorted by name.
Floats are compared EXACTLY — the engine is responsible for making every
aggregate bit-deterministic (see tables.dsum); any mismatch here would also
fail the driver's value-hash.
"""

from __future__ import annotations

import math
from datetime import date, datetime

import numpy as np
import pandas as pd


def _canon_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float) and math.isnan(v):
        return "NULL"
    if isinstance(v, (np.floating,)):
        v = float(v)
    if isinstance(v, (np.integer,)):
        v = int(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return repr(v)  # full 17-digit round-trip precision
    if isinstance(v, (pd.Timestamp, datetime)):
        if isinstance(v, pd.Timestamp) and v is pd.NaT:
            return "NULL"
        return pd.Timestamp(v).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_canon_cell(x)}" for k, x in sorted(v.items())) + "}"
    if isinstance(v, bytes):
        return v.hex()
    if v is pd.NaT:
        return "NULL"
    return str(v)


def reject_nonscalar(df: pd.DataFrame, key: str, side: str) -> None:
    """The driver's canonicalizer (pandas sort_values/factorize) crashes on
    list/dict/ndarray cells — round 1's agg_collect_sorted failure. Fail
    loudly here so no registered query ships a non-scalar output column."""
    for col in df.columns:
        for v in df[col].head(50):
            if isinstance(v, (list, tuple, dict, np.ndarray)):
                raise AssertionError(
                    f"{key}: {side} column {col!r} has non-scalar cells "
                    f"({type(v).__name__}) — the driver canonicalizer cannot "
                    "hash these; project to a joined string instead"
                )


def canonical_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        out.append(tuple(_canon_cell(v) for v in row))
    out.sort()
    return out


def compare(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, key: str) -> None:
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{key}: column mismatch spark={sorted(spark_pdf.columns)} "
        f"oracle={sorted(oracle_pdf.columns)}"
    )
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{key}: row count spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    )
    reject_nonscalar(spark_pdf, key, "spark")
    reject_nonscalar(oracle_pdf, key, "oracle")
    s_rows = canonical_rows(spark_pdf)
    o_rows = canonical_rows(oracle_pdf)
    if s_rows != o_rows:
        diffs = [(a, b) for a, b in zip(s_rows, o_rows) if a != b][:5]
        raise AssertionError(f"{key}: value mismatch; first diffs: {diffs}")
