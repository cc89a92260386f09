"""Property-based tests (hypothesis): algebraic invariants that must
hold for arbitrary inputs, not just the fixtures.

Examples are kept small and few (each one runs real Spark jobs); the
properties are the point — wide->long->wide is lossless for keyed rows
with at least one non-null measure, combine_parts reconstructs the
original wide row from any column split, and salting never changes an
aggregation's answer.
"""

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from ffiec_pq_spark.operators.combine import combine_parts
from ffiec_pq_spark.operators.reshape import pivot_long_df, unpivot_typed
from ffiec_pq_spark.operators.skew import salted_agg

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# small float grid: exact in float64, so equality is exact
_vals = st.one_of(st.none(), st.integers(-4, 4).map(lambda i: i * 0.25))

_rows = st.lists(
    st.tuples(_vals, _vals, _vals),
    min_size=1,
    max_size=12,
)


def _wide(spark, rows):
    data = [(i, a, b, c) for i, (a, b, c) in enumerate(rows)]
    return spark.createDataFrame(
        data, "id int, m1 double, m2 double, m3 double"
    )


@settings(**_SETTINGS)
@given(rows=_rows)
def test_unpivot_pivot_roundtrip(spark, rows):
    wide = _wide(spark, rows)
    long = unpivot_typed(wide, ids=["id"], values=["m1", "m2", "m3"])
    back = pivot_long_df(
        long, id_cols=["id"], items=["m1", "m2", "m3"], values_fn="first"
    )
    got = {r["id"]: (r["m1"], r["m2"], r["m3"]) for r in back.collect()}
    for i, (a, b, c) in enumerate(rows):
        if a is None and b is None and c is None:
            # sparse-long semantics: all-null rows vanish (row absence)
            assert i not in got
        else:
            assert got[i] == (a, b, c)


@settings(**_SETTINGS)
@given(
    rows=_rows,
    split=st.integers(1, 2),
)
def test_combine_parts_reconstructs(spark, rows, split):
    """Any column split (with the overlap carrying equal values) folds
    back to the original row set."""
    wide = _wide(spark, rows)
    cols = ["m1", "m2", "m3"]
    left = wide.select("id", *cols[: split + 1])       # overlap col included
    right = wide.select("id", *cols[split:])
    combined = combine_parts([left, right], keys=["id"])
    got = {r["id"]: tuple(r[c] for c in cols) for r in combined.collect()}
    want = {i: t for i, t in enumerate(rows)}
    assert got == want


@settings(**_SETTINGS)
@given(rows=_rows, n_salts=st.sampled_from([2, 7, 16]))
def test_salted_agg_equals_plain(spark, rows, n_salts):
    df = _wide(spark, rows).withColumn("k", (F.col("id") % 2).cast("string"))
    salted = salted_agg(
        df,
        keys=["k"],
        salt_from="id",
        metrics={
            "n": ("count(1)", "sum"),
            "s1": ("sum(m1)", "sum"),
            "mx": ("max(m2)", "max"),
        },
        n_salts=n_salts,
    )
    plain = df.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("m1").alias("s1"),
        F.max("m2").alias("mx"),
    )

    def norm(df_):
        out = {}
        for r in df_.collect():
            out[r["k"]] = (
                r["n"],
                None if r["s1"] is None else round(r["s1"], 9),
                r["mx"],
            )
        return out

    assert norm(salted) == norm(plain)
