"""Domain scalar semantics of the reference, as built-in column
expressions (no Python UDFs — every one of these stays inside
whole-stage codegen).

Reference behaviors reproduced:
- ``id_zero_to_null``: identifier fields where "0" means missing
  (reference parse_id_zero_na, R/ffeic_read.R:329-333).
- ``pct_to_prop``: "12.5%" -> 0.125; numeric-without-% is a violation
  the caller must count (reference pct_to_prop, R/ffeic_read.R:535-558).
- ``parse_yyyymmdd``: date from YYYYMMDD text with NA tokens ""/"0"/
  "00000000" and invalid->NULL (reference R/ffeic_read.R:344-366).
- ``et_to_utc``: America/New_York wall time -> UTC timestamp
  (reference POR submission timestamps, R/ffeic_read.R:484-490).
- ``snake_case``: header normalization (reference clean_por_cols,
  R/ffeic_read.R:502-514).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

NA_DATE_TOKENS = ("", "0", "00000000")
# MDRM sentinel "end of time" date treated as NULL
# (reference data-raw/ffiec_dict.R:35,46-49)
MDRM_SENTINEL_DATE = "9999-12-31"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def id_zero_to_null(col: Column | str) -> Column:
    """NULL out identifier strings that are empty or literal zero."""
    c = _c(col)
    return F.when(F.trim(c).isin("", "0"), F.lit(None)).otherwise(c)


def pct_to_prop(col: Column | str) -> Column:
    """Percent string -> proportion double ("12.5%" -> 0.125).

    Non-percent numerics yield NULL here; use :func:`pct_violations`
    to enforce the reference's hard error (count must be 0)."""
    c = _c(col)
    return F.when(
        c.rlike(r"^\s*-?[0-9.]+\s*%\s*$"),
        F.regexp_replace(c, r"[%\s]", "").cast("double") / 100.0,
    ).otherwise(F.lit(None).cast("double"))


def pct_violation(col: Column | str) -> Column:
    """True where the value is numeric but lacks the % sign — the
    condition the reference raises on (R/ffeic_read.R:548-554)."""
    c = _c(col)
    return c.isNotNull() & c.rlike(r"^\s*-?[0-9.]+\s*$")


def parse_yyyymmdd(col: Column | str) -> Column:
    """YYYYMMDD text -> date; NA tokens and unparseable values -> NULL."""
    c = _c(col)
    cleaned = F.when(F.trim(c).isin(*NA_DATE_TOKENS), F.lit(None)).otherwise(F.trim(c))
    return F.try_to_timestamp(cleaned, F.lit("yyyyMMdd")).cast("date")


def parse_mdy(col: Column | str) -> Column:
    """MMDDYYYY text -> date (zip filename dates, manifest fields)."""
    return F.try_to_timestamp(_c(col), F.lit("MMddyyyy")).cast("date")


def null_mdrm_sentinel(col: Column | str) -> Column:
    """Treat the 9999-12-31 'end of time' sentinel as NULL."""
    c = _c(col)
    return F.when(c == F.lit(MDRM_SENTINEL_DATE).cast("date"), F.lit(None)).otherwise(c)


def et_to_utc(col: Column | str, fmt: str = "yyyy-MM-dd'T'HH:mm:ss") -> Column:
    """Eastern-time wall-clock string -> UTC timestamp (DST-aware)."""
    return F.to_utc_timestamp(F.to_timestamp(_c(col), fmt), "America/New_York")


def snake_case(name: str) -> str:
    """Driver-side header normalizer (matches the reference's cleaner)."""
    import re

    s = re.sub(r"[^A-Za-z0-9]+", "_", name.strip())
    s = re.sub(r"_+", "_", s).strip("_")
    return s.lower()
