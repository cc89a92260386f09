"""Dictionary-build sources (S12 MDRM csv-in-zip, S13 concepts.xsd) and
the ffiec_items / ffiec_item_details metadata builds."""

import datetime

import pytest
from pyspark.sql import functions as F

from ffiec_pq_spark.operators.process import ffiec_process
from ffiec_pq_spark.sources.dictionary import (
    build_ffiec_items,
    build_item_details,
    fix_item_name_case,
    read_concepts_xsd,
    read_mdrm_from_zip,
)
from tests.ffiec_fixtures import (
    PURE_COLS,
    TYPE_DICT,
    make_call_zip,
    make_mdrm_zip,
    make_taxonomy_zip,
)


@pytest.fixture(scope="module")
def dict_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("ffiec_dict")
    make_mdrm_zip(str(d))
    make_taxonomy_zip(str(d))
    make_call_zip(str(d))
    return str(d)


@pytest.fixture(scope="module")
def mdrm(spark, dict_dir):
    return read_mdrm_from_zip(spark, dict_dir + "/MDRM.zip")


@pytest.fixture(scope="module")
def long_tables(spark, dict_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("dict_out")
    res = ffiec_process(
        spark,
        [dict_dir + "/FFIEC CDR Call Bulk All Schedules 03312024.zip"],
        TYPE_DICT,
        str(out),
        PURE_COLS,
    )
    return {t: spark.read.parquet(p) for t, p in res["long"].items()}


def test_mdrm_read(mdrm):
    rows = {r["item"]: r for r in mdrm.collect()}
    assert len(rows) == 8
    # snake_case headers incl. item key = mnemonic || item_code
    assert rows["RCFD0010"]["mnemonic"] == "RCFD"
    assert rows["RCFD0010"]["item_code"] == "0010"
    # M/d/yyyy h:mm:ss a parse; 12/31/9999 sentinel -> NULL
    assert rows["RCFD0010"]["start_date"] == datetime.date(1976, 3, 31)
    assert rows["RCFD0010"]["end_date"] is None
    assert rows["RIAD4340"]["end_date"] == datetime.date(2001, 12, 31)


def test_concepts_xsd(spark, dict_dir):
    schema = read_concepts_xsd(spark, dict_dir + "/_taxonomy_2024.zip")
    assert set(schema.columns) == {"name", "type"}
    types = {r["name"]: r["type"] for r in schema.collect()}
    assert types["RCFD0010"] == "xbrli:monetaryItemType"
    assert types["RCFDB528"] == "xbrli:booleanItemType"
    assert len(types) == 6


def test_fix_item_name_case():
    assert (
        fix_item_name_case("TOTAL DEPOSITS IN U.S. OFFICES")
        == "Total deposits in U.S. offices"
    )
    assert (
        fix_item_name_case("cash and balances due from fdic institutions")
        == "Cash and balances due from FDIC institutions"
    )
    assert fix_item_name_case("net income for tier 1 capital") == (
        "Net income for Tier 1 capital"
    )
    assert fix_item_name_case(None) is None
    # token boundaries: no substitution inside larger words
    assert fix_item_name_case("confederation of banks") == "Confederation of banks"


def test_ffiec_items_build(spark, long_tables, mdrm):
    items = build_ffiec_items(long_tables, mdrm)
    rows = {r["item"]: r for r in items.collect()}
    # every observed long item present exactly once, typed
    assert rows["RCFD0010"]["data_type"] == "Float64"
    assert rows["RCON6724"]["data_type"] == "Int32"
    assert rows["RCFDB528"]["data_type"] == "Boolean"
    assert rows["RCON9999"]["data_type"] == "Date32"
    # MDRM enrich + case fix
    assert rows["RCFD0010"]["item_name"] == (
        "Cash and balances due from FDIC institutions"
    )
    # observed-but-not-in-MDRM items survive the left join with NULL name
    assert rows["RCON9999"]["item_name"] is None
    # PK on item
    assert items.groupBy("item").count().filter("count > 1").count() == 0


def test_item_details_build(spark, long_tables, mdrm):
    details = build_item_details(long_tables, mdrm)
    rows = {r["item"]: r for r in details.collect()}
    assert rows["RCFD0010"]["reporting_form"] == "FFIEC 031"
    assert rows["RCFD0010"]["start_date"] == datetime.date(1976, 3, 31)
    assert rows["RCFD0010"]["end_date"] is None
    # broadcast join plan: dimension side must be broadcast
    plan = details._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan
