"""POR (institution) reader (SURVEY.md §2.1 S5; reference
read_por_from_zip, R/ffeic_read.R:434-493).

Semantics reproduced:
- header sniff: if row 2's IDRSSD field isn't an integer it's a
  description row -> skip 2, else skip 1 (reference :449-456);
- all columns string except ``IDRSSD`` int (:460-462);
- snake_case header normalization (clean_por_cols, :502-514);
- identifier columns where "0" means missing -> NULL (applied by the
  process layer, R/ffiec_process.R:294-303);
- ``last_date_time_submission_updated_on`` parsed as America/New_York
  wall time and converted to UTC (:484-490).
"""

from __future__ import annotations

import io
import zipfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ffiec_pq_spark.functions.scalars import et_to_utc, id_zero_to_null, snake_case
from ffiec_pq_spark.sources.tsv import zip_member_lines

ID_ZERO_NA_COLS = (
    "financial_institution_zip_code",
    "fdic_certificate_number",
    "occ_charter_number",
    "ots_docket_number",
    "primary_aba_routing_number",
)
SUBMISSION_TS_COL = "last_date_time_submission_updated_on"


def _sniff_skip(zip_path: str, member: str) -> tuple[list[str], int]:
    """Read first two lines driver-side: header names + skip count."""
    with zipfile.ZipFile(zip_path) as zf:
        with zf.open(member) as fh:
            txt = io.TextIOWrapper(fh, encoding="utf-8", errors="replace")
            header = txt.readline().rstrip("\r\n")
            second = txt.readline().rstrip("\r\n")
    names = [c.strip().strip('"') for c in header.split("\t")]
    if names and names[-1] == "":
        names.pop()
    try:
        idx = [n.upper() for n in names].index("IDRSSD")
    except ValueError:
        idx = 0
    second_fields = second.split("\t")
    probe = second_fields[idx].strip() if idx < len(second_fields) else ""
    skip = 1 if probe.isdigit() else 2
    return names, skip


def read_por(
    spark: SparkSession, zip_path: str, member: str
) -> tuple[DataFrame, dict]:
    """Read the POR member -> (typed DataFrame, audit)."""
    names, skip = _sniff_skip(zip_path, member)
    clean = [snake_case(n) for n in names]
    lines = zip_member_lines(spark, zip_path, member, skip=skip)
    fields = F.split(F.regexp_replace(F.col("value"), "\t$", ""), "\t", -1)
    cols = []
    for i, name in enumerate(clean):
        # F.get + try_cast: short/malformed rows yield NULLs, never the
        # ANSI out-of-bounds / bad-cast error (Spark 4 defaults ANSI on)
        raw = F.when(F.trim(F.get(fields, i)) == "", F.lit(None)).otherwise(
            F.trim(F.get(fields, i))
        )
        if name == "idrssd":
            cols.append(raw.try_cast("int").alias("IDRSSD"))
        elif name in ID_ZERO_NA_COLS:
            cols.append(id_zero_to_null(raw).alias(name))
        elif name == SUBMISSION_TS_COL:
            cols.append(et_to_utc(raw).alias(name))
        else:
            cols.append(raw.alias(name))
    audit = {"zipfile": zip_path, "file": member, "skip": skip, "repairs": [], "ok": True}
    return lines.select(*cols), audit
