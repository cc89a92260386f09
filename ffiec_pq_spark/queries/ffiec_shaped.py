"""FFIEC domain semantics expressed over the driver test tables so the
oracle gate covers them: type-partitioned unpivot, pivot values_fn
variants, NULL-token identifier parsing, percent->proportion, YYYYMMDD
date parsing, ET->UTC conversion.  (The zip/TSV/XBRL readers themselves
are exercised end-to-end on synthetic fixtures in
tests/test_ffiec_pipeline.py — file ingest can't run against the
pre-registered oracle views.)"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from ffiec_pq_spark.catalog import register
from ffiec_pq_spark.functions.scalars import (
    et_to_utc,
    id_zero_to_null,
    null_mdrm_sentinel,
    parse_mdy,
    parse_yyyymmdd,
    pct_to_prop,
)
from ffiec_pq_spark.operators.reshape import make_long_by_type, pivot_long_df
from ffiec_pq_spark.session import load_table


@register(
    "long_by_type_counts",
    """
    WITH wide AS (
      SELECT l_orderkey, l_linenumber,
             round(l_quantity, 4) AS l_quantity,
             round(l_tax, 4)      AS l_tax,
             l_returnflag, l_linestatus,
             CAST(l_shipdate AS DATE) AS ship_date
      FROM lineitem
    )
    SELECT item, value_type, count(*) AS n FROM (
      SELECT 'l_quantity' AS item, 'double' AS value_type FROM wide WHERE l_quantity IS NOT NULL
      UNION ALL SELECT 'l_tax', 'double' FROM wide WHERE l_tax IS NOT NULL
      UNION ALL SELECT 'l_returnflag', 'string' FROM wide WHERE l_returnflag IS NOT NULL
      UNION ALL SELECT 'l_linestatus', 'string' FROM wide WHERE l_linestatus IS NOT NULL
      UNION ALL SELECT 'ship_date', 'date' FROM wide WHERE ship_date IS NOT NULL
    ) GROUP BY item, value_type
    """,
    tags=["ffiec", "reshape"],
)
def long_by_type_counts(spark, sf_dir):
    """Type-partitioned unpivot (the reference's five ffiec_{type} long
    tables, R/ffiec_make_long_pqs.R:93-99): build a mixed-type wide
    table, split into one long table per value type, count rows per
    item+type.  Column groups come from schema metadata only."""
    li = load_table(spark, sf_dir, "lineitem")
    wide = li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_quantity", 4).alias("l_quantity"),
        F.round("l_tax", 4).alias("l_tax"),
        "l_returnflag",
        "l_linestatus",
        F.col("l_shipdate").cast("date").alias("ship_date"),
    )
    longs = make_long_by_type(wide, ids=["l_orderkey", "l_linenumber"])
    from functools import reduce

    counted = [
        df.groupBy("item")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("item", F.lit(t).alias("value_type"), "n")
        for t, df in sorted(longs.items())
    ]
    return reduce(lambda a, b: a.unionByName(b), counted).select(
        "item", "value_type", "n"
    )


@register(
    "pivot_values_fn_max",
    """
    SELECT l_returnflag,
           round(max(CASE WHEN l_linestatus = 'O' THEN l_extendedprice END), 2) AS max_o,
           round(max(CASE WHEN l_linestatus = 'F' THEN l_extendedprice END), 2) AS max_f,
           round(min(CASE WHEN l_linestatus = 'O' THEN l_extendedprice END), 2) AS min_o,
           round(min(CASE WHEN l_linestatus = 'F' THEN l_extendedprice END), 2) AS min_f
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=["ffiec", "reshape"],
)
def pivot_values_fn_max(spark, sf_dir):
    """Pivot values_fn surface (first|any_value|sum|max|min — reference
    R/ffiec_pivot.R:66): max and min variants over the same long input."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_extendedprice"
    )
    long = li.withColumnRenamed("l_linestatus", "item").withColumnRenamed(
        "l_extendedprice", "value"
    )
    mx = pivot_long_df(
        long, id_cols=["l_returnflag"], names_from="item",
        values_from="value", items=["O", "F"], values_fn="max",
    ).select(
        "l_returnflag",
        F.round("O", 2).alias("max_o"),
        F.round("F", 2).alias("max_f"),
    )
    mn = pivot_long_df(
        long, id_cols=["l_returnflag"], names_from="item",
        values_from="value", items=["O", "F"], values_fn="min",
    ).select(
        "l_returnflag",
        F.round("O", 2).alias("min_o"),
        F.round("F", 2).alias("min_f"),
    )
    return mx.join(mn, "l_returnflag")


@register(
    "ffiec_scalar_semantics",
    """
    SELECT c_custkey,
           NULLIF(trim(CAST(c_nationkey AS VARCHAR)), '0')          AS nation_id,
           CASE WHEN regexp_matches(CAST(c_custkey % 200 AS VARCHAR) || '.5%',
                                    '^\\s*-?[0-9.]+\\s*%\\s*$')
                THEN CAST(regexp_replace(CAST(c_custkey % 200 AS VARCHAR) || '.5%',
                                         '[%\\s]', '', 'g') AS DOUBLE) / 100.0
           END                                                      AS prop,
           CASE WHEN strftime(DATE '2024-03-31', '%Y%m%d') IN ('', '0', '00000000')
                THEN NULL
                ELSE try_strptime(strftime(DATE '2024-03-31', '%Y%m%d'), '%Y%m%d')::DATE
           END                                                      AS parsed_date,
           CASE WHEN c_custkey % 11 = 0 THEN NULL
                ELSE try_strptime('20240331', '%Y%m%d')::DATE END   AS parsed_or_na,
           try_strptime(lpad(CAST(c_custkey % 12 + 1 AS VARCHAR), 2, '0')
                        || '152024', '%m%d%Y')::DATE                AS mdy_date,
           CASE WHEN c_custkey % 7 = 0 THEN NULL
                ELSE DATE '2024-03-31' END                          AS end_date
    FROM customer
    """,
    tags=["ffiec", "scalar"],
)
def ffiec_scalar_semantics(spark, sf_dir):
    """The reference's domain scalar semantics: id-zero->NULL
    (R/ffeic_read.R:329-333), percent->proportion (:535-558), YYYYMMDD
    parse with NA tokens (:344-366), MMDDYYYY manifest-field parse
    (R/ffiec_manifest.R zip filename dates), and the MDRM 9999-12-31
    end-of-time sentinel -> NULL — as pure column expressions."""
    c = load_table(spark, sf_dir, "customer")
    pct_str = F.concat((F.col("c_custkey") % 200).cast("string"), F.lit(".5%"))
    ymd = F.date_format(F.lit("2024-03-31").cast("date"), "yyyyMMdd")
    mdy_str = F.concat(
        F.lpad((F.col("c_custkey") % 12 + 1).cast("string"), 2, "0"),
        F.lit("152024"),
    )
    sentinel_or_date = (
        F.when(F.col("c_custkey") % 7 == 0, F.lit("9999-12-31"))
        .otherwise(F.lit("2024-03-31"))
        .cast("date")
    )
    return c.select(
        "c_custkey",
        id_zero_to_null(F.col("c_nationkey").cast("string")).alias("nation_id"),
        pct_to_prop(pct_str).alias("prop"),
        parse_yyyymmdd(ymd).alias("parsed_date"),
        F.when(F.col("c_custkey") % 11 == 0, F.lit(None).cast("date"))
        .otherwise(parse_yyyymmdd(F.lit("20240331")))
        .alias("parsed_or_na"),
        parse_mdy(mdy_str).alias("mdy_date"),
        null_mdrm_sentinel(sentinel_or_date).alias("end_date"),
    )


@register(
    "tz_et_to_utc",
    """
    SELECT o_orderkey,
           CAST(timezone('America/New_York',
                         CAST(o_orderdate AS TIMESTAMP)) AS TIMESTAMP) AS utc_ts
    FROM orders
    WHERE o_orderkey % 13 = 0
    """,
    tags=["ffiec", "scalar"],
)
def tz_et_to_utc(spark, sf_dir):
    """ET wall time -> UTC (reference POR submission timestamps,
    R/ffeic_read.R:484-490), DST-aware on both engines."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderkey") % 13 == 0).select(
        "o_orderkey",
        F.to_utc_timestamp(F.col("o_orderdate").cast("timestamp"), "America/New_York")
        .alias("utc_ts"),
    )


_ETL_DEMO_DIR: list[str] = []


def _etl_demo_workdir() -> str:
    if not _ETL_DEMO_DIR:
        import atexit
        import shutil
        import tempfile

        d = tempfile.mkdtemp(prefix="ffiec_etl_demo_")
        atexit.register(shutil.rmtree, d, ignore_errors=True)
        _ETL_DEMO_DIR.append(d)
    return _ETL_DEMO_DIR[0]


@register(
    "ffiec_etl_end_to_end",
    # The pipeline ingests zips the oracle's pre-registered views can't
    # see, so the strict check pins INVARIANTS of the (deterministic)
    # fixture run instead: exact per-type long-table row counts, the
    # PK-uniqueness boolean, and a wide->long reconciliation boolean —
    # all computed from the parquet files the pipeline actually wrote
    # (value-level coverage additionally lives in
    # tests/test_ffiec_pipeline.py).
    """
    SELECT CAST(2 AS BIGINT)  AS n_schedules,
           CAST(94 AS BIGINT) AS n_long_float,
           CAST(20 AS BIGINT) AS n_long_int,
           CAST(20 AS BIGINT) AS n_long_str,
           CAST(14 AS BIGINT) AS n_long_date,
           CAST(20 AS BIGINT) AS n_long_bool,
           CAST(20 AS BIGINT) AS n_por,
           CAST(3 AS BIGINT)  AS n_log,
           TRUE AS all_log_ok,
           TRUE AS no_pk_dups,
           TRUE AS wide_long_consistent
    """,
    tags=["ffiec", "etl"],
)
def ffiec_etl_end_to_end(spark, sf_dir):
    """The flagship custom path end to end: build the deterministic
    FFIEC-shaped bulk zip (multipart TSV schedules incl. malformed
    rows, POR member), run ffiec_process (manifest -> dictionary-typed
    parse with two-phase repair -> full-outer+coalesce combine -> wide
    parquet -> type-partitioned long tables with PK assert), then emit
    one row of run invariants read back from the written artifacts:

    - ``n_long_*``: row count of each type-partitioned long table;
    - ``no_pk_dups``: zero (IDRSSD, date, item) duplicate groups across
      every long table (reference assert_no_dups,
      R/ffiec_make_long_pqs.R:131-154);
    - ``wide_long_consistent``: each long table's row count equals the
      distinct non-null (IDRSSD, date, item) cell count recomputed
      independently from the wide parquet files (reference manifest
      reconciliation, R/ffiec_manifest.R:352-374);
    - ``n_por`` / ``n_log`` / ``all_log_ok``: POR rows and process-log
      health.
    """
    from functools import reduce

    from ffiec_pq_spark.operators.process import (
        LONG_TYPE_NAMES,
        ffiec_process,
    )
    from ffiec_pq_spark.operators.reshape import make_long_by_type
    from ffiec_pq_spark.testing.fixtures import (
        PURE_COLS,
        TYPE_DICT,
        make_call_zip,
    )

    # ONE work dir per process, removed at interpreter exit: repeated
    # calls in a session reuse it (no per-run mkdtemp leak), while
    # concurrent processes / other users never share a path (a fixed
    # /tmp name would race on the zip and collide across users)
    work = _etl_demo_workdir()
    zp = make_call_zip(work)
    res = ffiec_process(
        spark, [zp], TYPE_DICT, os.path.join(work, "out"), PURE_COLS
    )

    long_counts: dict[str, int] = {}
    no_pk_dups = True
    for name, path in sorted(res["long"].items()):
        t = spark.read.parquet(path)
        long_counts[name] = t.count()
        dups = (
            t.groupBy("IDRSSD", "date", "item")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > 1)
            .limit(1)
            .count()
        )
        no_pk_dups = no_pk_dups and dups == 0

    # independent wide->long reconciliation: re-derive each type's
    # distinct key-triple count straight from the wide files
    by_type: dict[str, list] = {}
    for out in res["wide"]:
        wide = spark.read.parquet(out["path"])
        for t, df in make_long_by_type(wide, ids=["IDRSSD", "date"]).items():
            by_type.setdefault(t, []).append(df)
    recount: dict[str, int] = {}
    for t, dfs in by_type.items():
        merged = reduce(lambda a, b: a.unionByName(b), dfs)
        recount[LONG_TYPE_NAMES.get(t, t)] = (
            merged.select("IDRSSD", "date", "item").distinct().count()
        )
    wide_long_consistent = recount == long_counts

    n_por = sum(spark.read.parquet(p).count() for p in res["por"])
    log_rows = res["log"].select("ok").collect()

    row = (
        len(res["wide"]),
        long_counts.get("float", 0),
        long_counts.get("int", 0),
        long_counts.get("str", 0),
        long_counts.get("date", 0),
        long_counts.get("bool", 0),
        n_por,
        len(log_rows),
        all(r["ok"] for r in log_rows),
        no_pk_dups,
        wide_long_consistent,
    )
    return spark.createDataFrame(
        [row],
        "n_schedules long, n_long_float long, n_long_int long, "
        "n_long_str long, n_long_date long, n_long_bool long, "
        "n_por long, n_log long, all_log_ok boolean, "
        "no_pk_dups boolean, wide_long_consistent boolean",
    )
