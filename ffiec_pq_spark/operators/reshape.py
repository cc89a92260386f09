"""Wide<->long reshaping — the core query semantics of the reference.

- ``unpivot_typed``: UNPIVOT wide->long with NULL-drop (sparse long
  encoding: missing fact = absent row), reference ``get_long``
  (R/ffiec_make_long_pqs.R:39-73).
- ``make_long_by_type``: the type-partitioned variant — one long
  DataFrame per Spark data type, mirroring the reference's five
  ``ffiec_{float,int,str,date,bool}`` tables
  (R/ffiec_make_long_pqs.R:93-99).
- ``pivot_long_df``: PIVOT long->wide with explicit item list + values_fn,
  reference ``ffiec_pivot`` (R/ffiec_pivot.R:61-116).

Scale notes
-----------
``unpivot`` is a narrow generator (no shuffle, no state): row-parallel at
any scale.  ``pivot`` with an *explicit* values list avoids Spark's extra
distinct-scan job and fixes the output schema; the groupBy shuffles once
on the id columns.  For repeated pivots over the same long table,
pre-``repartition(id_cols)`` lets AQE reuse the exchange.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# values_fn surface of the reference pivot (R/ffiec_pivot.R:66)
_PIVOT_FNS = {
    "first": lambda c: F.first(c, ignorenulls=True),
    "any_value": lambda c: F.any_value(c, True),
    "sum": F.sum,
    "max": F.max,
    "min": F.min,
}


def unpivot_typed(
    df: DataFrame,
    ids: Sequence[str],
    values: Sequence[str],
    name_col: str = "item",
    value_col: str = "value",
    drop_null: bool = True,
) -> DataFrame:
    """UNPIVOT ``values`` columns into (``name_col``, ``value_col``) rows.

    All ``values`` columns must share one Spark type (the caller
    type-partitions, as the reference does per Arrow type).
    """
    out = df.unpivot(
        ids=list(ids),
        values=list(values),
        variableColumnName=name_col,
        valueColumnName=value_col,
    )
    if drop_null:
        out = out.filter(F.col(value_col).isNotNull())
    return out


def make_long_by_type(
    df: DataFrame, ids: Sequence[str], name_col: str = "item", value_col: str = "value"
) -> dict[str, DataFrame]:
    """Split non-id columns by data type and unpivot each group.

    Returns {simple_type_name: long DataFrame}; mirrors the reference's
    per-Arrow-type loop (R/ffiec_process.R:418-425).  Uses schema
    metadata only — no data pass — to pick the column groups.
    """
    ids = list(ids)
    by_type: dict[str, list[str]] = {}
    for f_ in df.schema.fields:
        if f_.name in ids:
            continue
        by_type.setdefault(f_.dataType.simpleString(), []).append(f_.name)
    return {
        t: unpivot_typed(df.select(*ids, *cols), ids, cols, name_col, value_col)
        for t, cols in sorted(by_type.items())
    }


def pivot_long_df(
    df: DataFrame,
    id_cols: Sequence[str],
    names_from: str = "item",
    values_from: str = "value",
    items: Sequence[str] | None = None,
    values_fn: str = "first",
) -> DataFrame:
    """PIVOT long->wide.

    ``items`` fixes the output columns (recommended: skips the extra
    distinct pass and stabilizes the schema, like the reference's
    ``PIVOT ... ON item IN (...)``).  ``values_fn`` resolves duplicate
    cells: first | any_value | sum | max | min.
    """
    if values_fn not in _PIVOT_FNS:
        raise ValueError(f"values_fn must be one of {sorted(_PIVOT_FNS)}")
    fn = _PIVOT_FNS[values_fn]
    base = df.select(*id_cols, names_from, values_from)
    if items is not None:
        # Conditional aggregation instead of DataFrame.pivot: one
        # shuffle on id_cols with map-side partial agg, vs pivot's two
        # ((ids, item) then (ids)).  Shuffle volume halves and the
        # output schema is fixed up front — the winning plan at scale.
        items = list(items)
        base = base.filter(F.col(names_from).isin(items))
        cond = F.col(names_from)
        aggs = [
            fn(F.when(cond == item, F.col(values_from))).alias(str(item))
            for item in items
        ]
        return base.groupBy(*id_cols).agg(*aggs)
    return base.groupBy(*id_cols).pivot(names_from).agg(fn(values_from))
