"""Skew-safe aggregation: two-stage salted groupBy.

A plain ``groupBy(k)`` sends every row of a hot key to one reducer; at
100 TB a handful of hot keys (think ``event_type`` with 6 values) stalls
the stage on one task.  Salting splits each key into ``n_salts``
sub-groups for the first (heavy) aggregation, then combines the
per-salt partials with a second tiny aggregation — both stages shuffle,
but the first spreads evenly across the cluster and the second moves
only ``n_keys x n_salts`` rows.

AQE's skew-join handling covers *joins*; salting is the aggregation
analogue, for algebraic aggregates (count/sum/min/max — anything with a
combine step).  Median/exact-distinct are not algebraic: use approx
variants or a different layout.

The salt must be deterministic (a hash of a high-cardinality column),
never ``rand()`` — retries of a failed task would otherwise re-salt
rows differently and double-count.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# stage-2 combiner per stage-1 aggregate kind
_COMBINERS = {
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
}


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    salt_from: Column | str,
    metrics: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage aggregation: ``metrics`` maps output name ->
    (stage-1 SQL aggregate over rows, stage-2 combiner in
    {'sum','min','max'}).  ``count`` partials combine with 'sum'.

    ``salt_from``: high-cardinality column (or expression) hashed into
    the salt — deterministic across task retries.
    """
    for name, (_, comb) in metrics.items():
        if comb not in _COMBINERS:
            raise ValueError(
                f"{name}: combiner {comb!r} not algebraic (use {sorted(_COMBINERS)})"
            )
    salt = F.pmod(F.xxhash64(salt_from), F.lit(n_salts))
    stage1 = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(*[F.expr(expr).alias(name) for name, (expr, _) in metrics.items()])
    )
    return stage1.groupBy(*keys).agg(
        *[
            _COMBINERS[comb](name).alias(name)
            for name, (_, comb) in metrics.items()
        ]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_from: Column | str,
    n_salts: int = 16,
) -> DataFrame:
    """Skew-safe equi-join: the manual salting analogue for joins, for
    when the small side is too big to broadcast but the big side's join
    key is hot (a handful of values holding most rows — ``event_type``,
    ``lang``, a null-heavy foreign key).

    The big side gains a deterministic salt in ``[0, n_salts)`` hashed
    from a high-cardinality column (never ``rand()`` — task retries
    would re-salt and duplicate rows); the small side is replicated
    ``n_salts`` times via an explode, and the join runs on
    ``(key, salt)`` — so one hot key spreads over ``n_salts`` reducers
    instead of stalling one.  Replication costs ``n_salts x |small|``
    rows of shuffle, the price of the even spread; AQE's skew-join
    split is the automatic alternative when it fires, this is the
    explicit one that always does.

    Result == ``big.join(small, key)`` exactly (inner), with the salt
    column dropped.  Precondition: ``key`` must be the only column name
    the two inputs share (a standard equi-join precondition — any other
    shared name would be ambiguous in the joined output regardless of
    salting); the salt column itself is auto-suffixed until it collides
    with neither input, so a user column literally named ``_salt``
    cannot be silently clobbered.
    """
    salt_col = "_salt"
    taken = set(big.columns) | set(small.columns)
    i = 0
    while salt_col in taken:
        salt_col = f"_salt_{i}"
        i += 1
    salt = F.pmod(F.xxhash64(salt_from), F.lit(n_salts)).cast("int")
    b = big.withColumn(salt_col, salt)
    s = small.withColumn(
        salt_col,
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>")),
    )
    return b.join(s, [key, salt_col], "inner").drop(salt_col)
