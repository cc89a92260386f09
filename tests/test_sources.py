"""Parquet scan surface (S7-S10): schema-union scan with provenance,
fail-fast glob, footer-only reads, single-file sink contract."""

import os

import pytest
from pyspark.sql import functions as F

from ffiec_pq_spark.sources.parquet import (
    list_pqs,
    pq_cols,
    pq_cols_by_type,
    scan_pqs,
    write_single_parquet,
)


@pytest.fixture(scope="module")
def pq_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("pq_union")
    # two "quarters" with different column sets (schema evolution)
    q1 = spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "IDRSSD int, RCFD0010 double"
    )
    q2 = spark.createDataFrame(
        [(1, 200.0, "x"), (3, 300.0, "y")],
        "IDRSSD int, RCON2200 double, TEXT4545 string",
    )
    write_single_parquet(q1, str(d / "ri_20240331.parquet"))
    write_single_parquet(q2, str(d / "ri_20240630.parquet"))
    return str(d)


def test_scan_union_by_name(spark, pq_dir):
    df = scan_pqs(spark, os.path.join(pq_dir, "ri_*.parquet"))
    assert set(df.columns) == {"IDRSSD", "RCFD0010", "RCON2200", "TEXT4545"}
    rows = {(r["IDRSSD"], r["RCFD0010"], r["RCON2200"]) for r in df.collect()}
    # columns absent in a file come back NULL (union-by-name semantics)
    assert (2, 20.0, None) in rows
    assert (3, None, 300.0) in rows


def test_scan_filename_provenance(spark, pq_dir):
    df = scan_pqs(
        spark, os.path.join(pq_dir, "ri_*.parquet"), filename=True
    )
    names = {
        os.path.basename(r["filename"]).split("?")[0]
        for r in df.select("filename").distinct().collect()
    }
    assert names == {"ri_20240331.parquet", "ri_20240630.parquet"}


def test_scan_fail_fast_on_empty_glob(spark, pq_dir):
    with pytest.raises(FileNotFoundError):
        scan_pqs(spark, os.path.join(pq_dir, "nope_*.parquet"))


def test_footer_only_reads(pq_dir):
    p = os.path.join(pq_dir, "ri_20240630.parquet")
    assert pq_cols(p) == ["IDRSSD", "RCON2200", "TEXT4545"]
    by_type = pq_cols_by_type(p)
    assert by_type["double"] == ["RCON2200"]
    assert by_type["string"] == ["TEXT4545"]


def test_list_pqs_contract(pq_dir):
    got = list_pqs(pq_dir)
    assert [(r["schedule"], r["date_raw"]) for r in got] == [
        ("ri", "20240331"),
        ("ri", "20240630"),
    ]


def test_scan_schedule_by_name(spark, pq_dir):
    from ffiec_pq_spark.sources.parquet import scan_schedule

    df = scan_schedule(spark, pq_dir, "ri")
    assert df.count() == 4
    with pytest.raises(FileNotFoundError):
        scan_schedule(spark, pq_dir, "rc")


def test_single_file_sink_is_one_file(spark, pq_dir):
    # the write_single_parquet outputs above must each be a plain file,
    # not a directory (the reference's one-file-per-dataset contract)
    for f in ("ri_20240331.parquet", "ri_20240630.parquet"):
        assert os.path.isfile(os.path.join(pq_dir, f))


def test_zip_stats_batch_matches_member_stats(spark, tmp_path):
    """The whole-zip one-job audit batch must reproduce member_stats'
    (bad, problems) counters member-for-member — including the broken
    zip's short row and malformed numeric."""
    from ffiec_fixtures import TYPE_DICT, make_broken_zip, make_call_zip
    from ffiec_pq_spark.sources.tsv import (
        make_colspec,
        member_stats,
        read_zip_member_header,
        zip_member_lines,
        zip_stats_batch,
    )

    for builder in (make_call_zip, make_broken_zip):
        d = tmp_path / builder.__name__
        d.mkdir()
        zp = builder(str(d))
        import zipfile as _zf

        with _zf.ZipFile(zp) as z:
            members = [m for m in z.namelist() if "POR" not in m]
        colspecs = {
            m: make_colspec(read_zip_member_header(zp, m), TYPE_DICT)
            for m in members
        }
        batch = zip_stats_batch(spark, zp, colspecs)
        for m in members:
            lines = zip_member_lines(spark, zp, m, skip=2)
            expect = member_stats(lines, colspecs[m])
            assert batch[m] == expect, (builder.__name__, m, batch[m], expect)


def test_zip_lines_python_datasource(spark, tmp_path):
    """Spark 4 Python Data Source over the bulk zip: one input
    partition PER MEMBER (executor-parallel, no driver extraction),
    line-exact parity with a direct zipfile read, and fnmatch member
    filtering."""
    import io
    import zipfile

    from ffiec_pq_spark.sources.zip_datasource import ZipLinesDataSource
    from ffiec_pq_spark.testing.fixtures import make_call_zip

    spark.dataSource.register(ZipLinesDataSource)
    zp = make_call_zip(str(tmp_path))
    df = spark.read.format("ffiec_zip_lines").option("path", zp).load()
    assert df.rdd.getNumPartitions() == 4  # one task per member
    got = sorted(
        (r["member"], r["line_no"], r["line"]) for r in df.collect()
    )
    direct = []
    with zipfile.ZipFile(zp) as zf:
        for n in sorted(x for x in zf.namelist() if not x.endswith("/")):
            with zf.open(n) as raw:
                text = io.TextIOWrapper(raw, encoding="utf-8", errors="replace")
                for i, line in enumerate(text):
                    direct.append((n, i, line.rstrip("\r\n")))
    assert got == sorted(direct) and len(got) > 0
    ri = (
        spark.read.format("ffiec_zip_lines")
        .option("path", zp)
        .option("pattern", "*Schedule RI*")
        .load()
    )
    assert ri.select("member").distinct().count() == 2


def test_zip_datasource_pipeline_equivalence(spark, tmp_path):
    """The Python Data Source route must feed the typed TSV parser
    with EXACTLY the rows the default mapInPandas route produces: same
    member, same skip semantics, same typed values — so either scan
    can back the ETL without a semantic fork."""
    import zipfile as _zf

    from ffiec_fixtures import TYPE_DICT, make_call_zip

    from ffiec_pq_spark.sources.tsv import (
        make_colspec,
        parse_schedule_lines,
        read_zip_member_header,
        zip_member_lines,
    )
    from ffiec_pq_spark.sources.zip_datasource import ZipLinesDataSource

    spark.dataSource.register(ZipLinesDataSource)
    zp = make_call_zip(str(tmp_path))
    with _zf.ZipFile(zp) as z:
        member = next(m for m in z.namelist() if "POR" not in m)
    colspec = make_colspec(read_zip_member_header(zp, member), TYPE_DICT)

    via_mip = parse_schedule_lines(
        zip_member_lines(spark, zp, member, skip=2), colspec
    )
    ds_lines = (
        spark.read.format("ffiec_zip_lines")
        .option("path", zp)
        .load()
        .filter(F.col("member") == member)
        .filter(F.col("line_no") >= 2)  # 0-based: drops header+dict rows
        .select(F.col("line").alias("value"))
    )
    via_ds = parse_schedule_lines(ds_lines, colspec)
    assert via_ds.schema == via_mip.schema
    key = lambda r: tuple(str(v) for v in r)  # noqa: E731
    assert sorted(map(key, via_ds.collect())) == sorted(
        map(key, via_mip.collect())
    )
