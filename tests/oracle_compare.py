"""Local replica of the driver's DuckDB-oracle comparison: row count,
column names, and order-insensitive value equality with columns sorted
by name.  Stricter than needed is fine — exact cell equality after light
normalization (queries round their own doubles)."""

from __future__ import annotations

import datetime
import math


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        # queries round explicitly; this only absorbs representation noise
        return round(v, 9)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    return v


def _sortkey(row):
    return tuple((x is None, str(x)) for x in row)


def compare(spark_df, duck_rel) -> list[str]:
    """Return a list of mismatch descriptions (empty == pass)."""
    problems: list[str] = []
    s_cols = list(spark_df.columns)
    d_cols = [d[0] for d in duck_rel.description]
    if sorted(c.lower() for c in s_cols) != sorted(c.lower() for c in d_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} duck={sorted(d_cols)}")
        return problems

    s_order = sorted(range(len(s_cols)), key=lambda i: s_cols[i].lower())
    d_order = sorted(range(len(d_cols)), key=lambda i: d_cols[i].lower())

    s_rows = [
        tuple(_norm_cell(r[i]) for i in s_order) for r in spark_df.collect()
    ]
    d_rows = [
        tuple(_norm_cell(r[i]) for i in d_order) for r in duck_rel.fetchall()
    ]
    if len(s_rows) != len(d_rows):
        problems.append(f"row count: spark={len(s_rows)} duck={len(d_rows)}")
        return problems
    s_rows.sort(key=_sortkey)
    d_rows.sort(key=_sortkey)
    n_bad = 0
    for i, (a, b) in enumerate(zip(s_rows, d_rows)):
        if a != b:
            n_bad += 1
            if n_bad <= 3:
                problems.append(f"row {i}: spark={a!r} != duck={b!r}")
    if n_bad > 3:
        problems.append(f"... {n_bad} mismatched rows total")
    return problems
