"""Bucketed-layout tests: a co-located fact-fact join must plan with
zero shuffle exchanges, and must return the same rows as the plain
shuffled join."""

import pytest
from pyspark.sql import functions as F

from ffiec_pq_spark.plans.audit import count_exchanges, physical_plan
from ffiec_pq_spark.session import load_table
from ffiec_pq_spark.sources.bucketed import bucketed_join, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    wh = tmp_path_factory.mktemp("bucketed_wh")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderdate", "o_custkey"
    )
    write_bucketed(
        li, "li_b", ["l_orderkey"], 8, sort_cols=["l_orderkey"],
        path=str(wh / "li_b"),
    )
    write_bucketed(
        o, "o_b", ["l_orderkey"], 8, sort_cols=["l_orderkey"],
        path=str(wh / "o_b"),
    )
    return "li_b", "o_b"


def test_bucketed_join_no_shuffle(spark, bucketed_tables):
    lt, rt = bucketed_tables
    # disable broadcast so the join must co-locate (at real scale both
    # sides are far beyond any broadcast threshold anyway)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(spark, lt, rt, ["l_orderkey"])
        j.write.format("noop").mode("overwrite").save()
        assert count_exchanges(j) == 0, physical_plan(j)
        assert "SortMergeJoin" in physical_plan(j)
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )


def test_bucketed_join_matches_shuffled(spark, sf_dir, bucketed_tables):
    lt, rt = bucketed_tables
    j = bucketed_join(spark, lt, rt, ["l_orderkey"])
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    plain = li.join(o, li.l_orderkey == o.o_orderkey)
    assert j.count() == plain.count()


def test_bucketed_long_table_pivot_no_shuffle(spark, sf_dir, tmp_path_factory):
    """The repeated-pivot scale story: a long EAV table written bucketed
    by its id columns pivots with ZERO exchanges — the layout pays the
    shuffle once at write time for every later reshape."""
    from ffiec_pq_spark.operators.reshape import pivot_long_df, unpivot_typed

    wh = tmp_path_factory.mktemp("bucketed_long")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_tax"
    )
    long = unpivot_typed(
        li, ids=["l_orderkey", "l_linenumber"], values=["l_quantity", "l_tax"]
    )
    write_bucketed(
        long, "long_b", ["l_orderkey", "l_linenumber"], 8,
        path=str(wh / "long_b"),
    )
    wide = pivot_long_df(
        spark.table("long_b"),
        id_cols=["l_orderkey", "l_linenumber"],
        items=["l_quantity", "l_tax"],
        values_fn="first",
    )
    wide.write.format("noop").mode("overwrite").save()
    assert count_exchanges(wide) == 0, physical_plan(wide)


def test_bucketed_groupby_no_shuffle(spark, bucketed_tables):
    lt, _ = bucketed_tables
    agg = spark.table(lt).groupBy("l_orderkey").agg(
        F.sum("l_quantity").alias("q")
    )
    agg.write.format("noop").mode("overwrite").save()
    assert count_exchanges(agg) == 0, physical_plan(agg)
