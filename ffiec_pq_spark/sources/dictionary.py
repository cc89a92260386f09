"""Dictionary-build sources (SURVEY.md §2.1 S12-S13) and the
``ffiec_items`` / ``ffiec_item_details`` metadata builds
(reference data-raw/ffiec_dict.R, data-raw/ffiec_schema.R).

- ``read_mdrm_from_zip``: the MDRM CSV (Fed master dictionary of item
  codes) read out of its zip — title row skipped, header row normalized
  to snake_case, all-string columns, ``M/d/yyyy h:mm:ss a`` datetime
  parse with the 12/31/9999 sentinel as NULL, and the item key
  ``mnemonic || item_code`` (reference data-raw/ffiec_dict.R:19-53).
- ``read_concepts_xsd``: <element> attributes from a taxonomy
  ``concepts.xsd`` inside a zip -> (name, type) rows (reference
  data-raw/ffiec_schema.R:21-45).
- ``fix_item_name_case``: sentence-case with protected acronyms /
  canonical phrases (reference data-raw/ffiec_dict.R:56-140).
- ``build_ffiec_items`` / ``build_item_details``: observed items from
  the type-partitioned long tables, PK-asserted, enriched from MDRM via
  broadcast left join (reference data-raw/ffiec_dict.R:142-197).

Scale: the MDRM csv and taxonomy xsd are single small reference files
(tens of MB at most), so member extraction is deliberately driver-side
— a distributed scan of one file buys nothing (SURVEY.md §4 makes the
same call for footer-only reads).  Everything after createDataFrame is
Spark-side, and the resulting dimensions are broadcast-join inputs.
"""

from __future__ import annotations

import csv
import io
import re
import zipfile
from functools import reduce
from xml.etree import ElementTree

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ffiec_pq_spark.functions.scalars import snake_case
from ffiec_pq_spark.operators.checks import assert_no_dups

MDRM_SENTINEL = "12/31/9999 12:00:00 AM"
MDRM_TS_FMT = "M/d/yyyy h:mm:ss a"

# Arrow-type labels used by the reference's items table per long table
# (reference data-raw/ffiec_dict.R:142-167)
LONG_DATA_TYPES = {
    "float": "Float64",
    "int": "Int32",
    "str": "String",
    "bool": "Boolean",
    "date": "Date32",
}

# Protected acronyms / canonical phrases for the item-name case fixer
# (representative subset of the reference's canonical_initialisms list,
# data-raw/ffiec_dict.R:80-113; extend via the ``extra`` parameter)
CANONICAL_TERMS = (
    "FDIC", "FFIEC", "FNMA", "FHLMC", "GNMA", "FHLB", "MBS", "CMO",
    "CMOs", "REMICs", "ACH", "CECL", "PPP", "LEI", "GAAP", "IRS",
    "IRAs", "MMDA", "MMDAs", "ASU", "SSFA", "HCs", "DTAs", "DTLs",
    "Tier 1", "Tier 2", "MSAs", "Puerto Rico", "Federal Reserve",
    "Schedule RC", "Schedule RC-E", "Schedule RC-Q", "Schedule RC-C",
    "Schedule RI", "Schedule HC", "Schedule HC-L", "RC-Q", "RC-C",
    "Keogh", "Federal",
)


def read_mdrm_from_zip(
    spark: SparkSession, zip_path: str, member: str = "MDRM_CSV.csv"
) -> DataFrame:
    """MDRM csv-in-zip -> all-string DataFrame + typed date columns +
    ``item`` key column (S12)."""
    with zipfile.ZipFile(zip_path) as zf:
        raw = zf.read(member).decode("utf-8", errors="replace")
    rows = list(csv.reader(io.StringIO(raw)))
    # row 0 is a title line; row 1 is the header (reference skip=1 for
    # the header probe, skip=2 for the data)
    header = [snake_case(c) for c in rows[1]]
    data = [
        [(v.strip() if v is not None and v.strip() != "" else None) for v in r]
        for r in rows[2:]
        if len(r) == len(header)
    ]
    schema = ", ".join(f"{c} string" for c in header)
    df = spark.createDataFrame(data, schema)
    for dc in ("start_date", "end_date"):
        if dc in header:
            df = df.withColumn(
                dc,
                F.try_to_timestamp(
                    F.when(F.col(dc) == MDRM_SENTINEL, None).otherwise(F.col(dc)),
                    F.lit(MDRM_TS_FMT),
                ).cast("date"),
            )
    return df.withColumn(
        "item", F.concat(F.col("mnemonic"), F.col("item_code"))
    ).select("item", *header)


def read_concepts_xsd(spark: SparkSession, zip_path: str) -> DataFrame:
    """Taxonomy concepts.xsd-in-zip -> distinct (name, type) rows (S13)."""
    with zipfile.ZipFile(zip_path) as zf:
        members = [m for m in zf.namelist() if m.endswith("concepts.xsd")]
        if len(members) != 1:
            raise ValueError(
                f"expected exactly one concepts.xsd in {zip_path}, got {members}"
            )
        tree = ElementTree.fromstring(zf.read(members[0]))
    attrs = [
        dict(el.attrib)
        for el in tree.iter()
        if el.tag.rsplit("}", 1)[-1] == "element"
    ]
    if not attrs:
        raise ValueError(f"no <element> nodes found in concepts.xsd in {zip_path}")
    keys = sorted({k for a in attrs for k in a})
    schema = ", ".join(f"`{k}` string" for k in keys)
    rows = [[a.get(k) for k in keys] for a in attrs]
    df = spark.createDataFrame(rows, schema).distinct()
    want = [c for c in ("name", "type") if c in keys]
    return df.select(*want) if want else df


def fix_item_name_case(
    name: str | None, extra: tuple[str, ...] = ()
) -> str | None:
    """Sentence-case an item name, then restore protected acronyms,
    U.S./non-U.S., and forced-lowercase words."""
    if name is None:
        return None
    s = name.strip()
    if not s:
        return s
    s = s[0].upper() + s[1:].lower()
    for term in (*CANONICAL_TERMS, *extra):
        pat = r"(?<![0-9A-Za-z_])" + re.escape(term.lower()) + r"(?![0-9A-Za-z_])"
        s = re.sub(pat, term, s, flags=re.IGNORECASE)
    s = re.sub(
        r"(?<![0-9A-Za-z_])((?:non-)?)u\.s\.(?![0-9A-Za-z_])",
        lambda m: m.group(1) + "U.S.",
        s,
        flags=re.IGNORECASE,
    )
    for w in ("addressees",):
        s = re.sub(rf"\b{w}\b", w, s, flags=re.IGNORECASE)
    return s


def fix_item_name_case_col(col, extra: tuple[str, ...] = ()):
    """Column-expression form of ``fix_item_name_case`` — the same
    sentence-case + protected-term restore as chained JVM
    ``regexp_replace`` calls, so the dictionary build carries no Python
    UDF at all (the terms are plan literals; Catalyst folds the chain
    into one generated-code projection)."""
    # (?U)\s matches Unicode whitespace, mirroring Python str.strip()
    # (F.trim strips ASCII spaces only — a tab/NBSP-padded name would
    # dodge the sentence-casing entirely)
    c = F.regexp_replace(col, r"(?U)^\s+|\s+$", "")
    c = F.concat(
        F.upper(c.substr(F.lit(1), F.lit(1))),
        F.lower(c.substr(F.lit(2), F.length(c))),
    )
    for term in (*CANONICAL_TERMS, *extra):
        pat = (
            "(?i)(?<![0-9A-Za-z_])"
            + re.escape(term.lower())
            + "(?![0-9A-Za-z_])"
        )
        c = F.regexp_replace(c, pat, term)
    c = F.regexp_replace(
        c,
        r"(?i)(?<![0-9A-Za-z_])((?:non-)?)u\.s\.(?![0-9A-Za-z_])",
        "$1U.S.",
    )
    for w in ("addressees",):
        c = F.regexp_replace(c, rf"(?i)\b{w}\b", w)
    return c


def observed_items(long_tables: dict[str, DataFrame]) -> DataFrame:
    """Distinct items per long table labeled with the Arrow type name;
    PK-asserted on ``item`` (reference data-raw/ffiec_dict.R:142-177)."""
    parts = [
        df.select("item").distinct().withColumn(
            "data_type", F.lit(LONG_DATA_TYPES.get(t, t))
        )
        for t, df in sorted(long_tables.items())
    ]
    allitems = reduce(lambda a, b: a.unionByName(b), parts)
    assert_no_dups(allitems, ["item"])
    return allitems


def build_ffiec_items(
    long_tables: dict[str, DataFrame], mdrm: DataFrame
) -> DataFrame:
    """The ``ffiec_items`` dimension: item, mnemonic, item_code,
    item_name (case-fixed), data_type."""
    items = observed_items(long_tables)
    return (
        items.join(F.broadcast(mdrm), "item", "left")
        .select("item", "mnemonic", "item_code", "item_name", "data_type")
        .withColumn("item_name", fix_item_name_case_col(F.col("item_name")))
        .distinct()
        .orderBy("item")
    )


def build_item_details(
    long_tables: dict[str, DataFrame], mdrm: DataFrame
) -> DataFrame:
    """The ``ffiec_item_details`` table: one row per item x reporting
    form x validity period (reference data-raw/ffiec_dict.R:186-197)."""
    items = observed_items(long_tables)
    cols = [
        c
        for c in (
            "reporting_form", "start_date", "end_date", "confidentiality",
            "description", "seriesglossary", "itemtype",
        )
        if c in mdrm.columns
    ]
    return (
        items.join(F.broadcast(mdrm), "item", "left")
        .select("item", *cols)
        .distinct()
        .orderBy("item", *[c for c in ("reporting_form", "start_date") if c in cols])
    )
