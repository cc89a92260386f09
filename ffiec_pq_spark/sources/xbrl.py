"""XBRL XML fact extractor (SURVEY.md §2.1 S6; reference
process_xbrl_inner_file, R/ffiec_process_xbrls.R:158-206).

Per inner ``*.xbrl.xml`` member: every element in a call-report concept
namespace becomes a fact row (item local-name, contextRef, unitRef,
decimals, value text, n_attrs).  The contextRef encodes
``{schedule}_{IDRSSD}_{yyyy-mm-dd}`` and is regex-split into typed
columns (reference :190-197), all with built-in expressions.

Spark mapping: ``binaryFile`` scan over zips -> ``mapInPandas`` with
stdlib ``xml.etree`` per member (the one genuinely Python step in the
engine: XML parsing; Arrow-batched, executor-side, no driver
round-trip).  Each zip is one task; scale comes from many zips.
"""

from __future__ import annotations

import io
import zipfile
from typing import Iterator
from xml.etree import ElementTree

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CONTEXT_RE = r"^([^_]+)_([0-9]+)_(\d{4}-\d{2}-\d{2})$"


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _ns(tag: str) -> str:
    return tag[1:].split("}", 1)[0] if tag.startswith("{") else ""


def extract_xbrl_facts(
    spark: SparkSession,
    zip_glob: str,
    member_suffix: str = ".xbrl.xml",
    concept_ns_marker: str = "call",
) -> DataFrame:
    """Fact rows from every ``*.xbrl.xml`` member of every matching zip.

    ``concept_ns_marker``: substring identifying the concept namespace
    (the reference XPaths ``.//cc:*`` — call-report concepts).
    """
    bin_df = spark.read.format("binaryFile").load(zip_glob)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                out = {
                    "zipfile": [], "file": [], "item": [], "contextRef": [],
                    "unitRef": [], "decimals": [], "value": [], "n_attrs": [],
                }
                with zipfile.ZipFile(io.BytesIO(row["content"])) as zf:
                    members = [
                        n for n in zf.namelist() if n.endswith(member_suffix)
                    ]
                    for m in members:
                        try:
                            root = ElementTree.fromstring(zf.read(m))
                        except ElementTree.ParseError:
                            continue
                        for el in root.iter():
                            if concept_ns_marker not in _ns(el.tag).lower():
                                continue
                            attrs = dict(el.attrib)
                            out["zipfile"].append(row["path"])
                            out["file"].append(m)
                            out["item"].append(_local(el.tag))
                            out["contextRef"].append(attrs.get("contextRef"))
                            out["unitRef"].append(attrs.get("unitRef"))
                            out["decimals"].append(attrs.get("decimals"))
                            out["value"].append(
                                el.text.strip() if el.text else None
                            )
                            out["n_attrs"].append(len(attrs))
                yield pd.DataFrame(out)

    facts = bin_df.select("path", "content").mapInPandas(
        parse,
        schema=(
            "zipfile string, file string, item string, contextRef string, "
            "unitRef string, decimals string, value string, n_attrs int"
        ),
    )
    return facts


def split_context(facts: DataFrame) -> DataFrame:
    """contextRef -> (schedule, IDRSSD int, date) typed columns."""
    return facts.select(
        "*",
        F.regexp_extract("contextRef", CONTEXT_RE, 1).alias("schedule"),
        F.regexp_extract("contextRef", CONTEXT_RE, 2).cast("int").alias("IDRSSD"),
        F.regexp_extract("contextRef", CONTEXT_RE, 3).cast("date").alias("date"),
    )
