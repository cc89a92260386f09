"""Synthetic FFIEC-shaped fixtures (FIXTURES.md §B): bulk zips with
multipart TSV schedules (incl. malformed rows), a POR member, and XBRL
zips.  Deterministic, seed-free (fully enumerated)."""

from __future__ import annotations

import os
import zipfile

# {item -> type char}: the dictionary the reader's colspec consults
TYPE_DICT = {
    "RCFD0010": "d",
    "RCFD2170": "d",
    "RCON2200": "d",
    "RIAD4340": "d",
    "RCON6724": "i",
    "RCFDA224": "c",  # pure item: percent text -> proportion post-read
    "RCFDB528": "l",
    "TEXT4545": "c",
}
PURE_COLS = ["RCFDA224"]

N_BANKS = 20
DATE_TOKEN = "03312024"  # MMDDYYYY in filenames
REPORT_DATE = "2024-03-31"


def _row(vals) -> str:
    # FFIEC rows carry a trailing tab (legitimate newlines tab-adjacent)
    return "\t".join(str(v) for v in vals) + "\t"


def _schedule_part1_lines() -> list[str]:
    header = ["IDRSSD", "RCFD0010", "RCFD2170", "RIAD4340", "RCON9999", "TEXT4545"]
    desc = ["ID", "Cash", "Assets", "Net income", "Report date", "Comment"]
    lines = [_row(header), _row(desc)]
    for i in range(1, N_BANKS + 1):
        idrssd = 1000 + i
        cash = "" if i % 7 == 0 else f"{i * 1000}.5"
        assets = "CONF" if i % 5 == 0 else f"{i * 20000}"
        net = f"{i * 11}" if i % 2 == 0 else ""  # complementary with part 2
        rcon9999 = "20240331" if i % 3 else "00000000"
        comment = f"note {i}"
        if i == 4:
            # embedded newline inside the comment field (slow-path repair)
            comment = f"note {i} broken\ncontinued"
        if i == 9:
            # stray extra tab inside the comment field
            comment = f"note\t{i} extra"
        lines.append(_row([idrssd, cash, assets, net, rcon9999, comment]))
    return lines


def _schedule_part2_lines() -> list[str]:
    header = ["IDRSSD", "RCON2200", "RIAD4340", "RCON6724", "RCFDA224", "RCFDB528"]
    desc = ["ID", "Deposits", "Net income", "Offices", "Ratio", "Flag"]
    lines = [_row(header), _row(desc)]
    for i in range(1, N_BANKS + 1):
        idrssd = 1000 + i
        deposits = f"{i * 15000}"
        net = "" if i % 2 == 0 else f"{i * 11}"  # complementary with part 1
        offices = f"{i % 9}"
        ratio = f"{i * 2.5:.1f}%"
        flag = "true" if i % 2 else "false"
        lines.append(_row([idrssd, deposits, net, offices, ratio, flag]))
    return lines


def _schedule_rc_lines() -> list[str]:
    # RCON2200 also appears in schedule RI: the FFIEC data contract is
    # that an item shared across schedules carries the SAME value per
    # (IDRSSD, date) — the long build relies on DISTINCT collapsing it
    # (reference R/ffiec_make_long_pqs.R:109-111)
    header = ["IDRSSD", "RCON2200"]
    desc = ["ID", "Deposits"]
    lines = [_row(header), _row(desc)]
    for i in range(1, N_BANKS + 1):
        lines.append(_row([1000 + i, f"{i * 15000}"]))
    return lines


def _por_lines(
    renames: dict[int, str] | None = None,
    restates: dict[int, str] | None = None,
) -> list[str]:
    """POR member lines; ``renames``/``restates`` override bank i's
    name/state (the quarter-over-quarter attribute drift the SCD2
    history fixture needs)."""
    renames = renames or {}
    restates = restates or {}
    header = [
        "IDRSSD",
        "Financial Institution Name",
        "Financial Institution State",
        "FDIC Certificate Number",
        "OCC Charter Number",
        "Primary ABA Routing Number",
        "Last Date/Time Submission Updated On",
    ]
    desc = ["ID", "Name", "State", "FDIC", "OCC", "ABA", "Updated"]
    lines = [_row(header), _row(desc)]
    for i in range(1, N_BANKS + 1):
        fdic = "0" if i % 4 == 0 else f"{5000 + i}"
        occ = "0" if i % 6 == 0 else f"{700 + i}"
        # 2024-03-10 02:30 doesn't exist in America/New_York (DST gap);
        # use values either side of the spring-forward boundary
        ts = "2024-03-10T01:59:00" if i % 2 else "2024-07-01T12:00:00"
        name = renames.get(i, f"Bank {i}")
        state = restates.get(i, "IA")
        lines.append(
            _row([1000 + i, name, state, fdic, occ, f"{100000 + i}", ts])
        )
    return lines


def make_call_zip(dir_: str) -> str:
    """Bulk 'All Schedules' zip: RI in two parts + RC single + POR."""
    path = os.path.join(dir_, f"FFIEC CDR Call Bulk All Schedules {DATE_TOKEN}.zip")
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr(
            f"FFIEC CDR Call Schedule RI {DATE_TOKEN}(1 of 2).txt",
            "\n".join(_schedule_part1_lines()) + "\n",
        )
        zf.writestr(
            f"FFIEC CDR Call Schedule RI {DATE_TOKEN}(2 of 2).txt",
            "\n".join(_schedule_part2_lines()) + "\n",
        )
        zf.writestr(
            f"FFIEC CDR Call Schedule RC {DATE_TOKEN}.txt",
            "\n".join(_schedule_rc_lines()) + "\n",
        )
        zf.writestr(
            f"FFIEC CDR Call Bulk POR {DATE_TOKEN}.txt",
            "\n".join(_por_lines()) + "\n",
        )
    return path


def make_call_zip_q2(dir_: str) -> str:
    """Second-quarter bulk zip: RC schedule only, with one NEW item
    (RCFD3210) absent in Q1 — exercises cross-date schema evolution in
    the long build and the per-item dates list."""
    date_token = "06302024"
    header = ["IDRSSD", "RCON2200", "RCFD3210"]
    desc = ["ID", "Deposits", "Equity"]
    lines = [_row(header), _row(desc)]
    for i in range(1, N_BANKS + 1):
        lines.append(_row([1000 + i, f"{i * 16000}", f"{i * 777}"]))
    path = os.path.join(
        dir_, f"FFIEC CDR Call Bulk All Schedules {date_token}.zip"
    )
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr(
            f"FFIEC CDR Call Schedule RC {date_token}.txt",
            "\n".join(lines) + "\n",
        )
    return path


def make_por_zip_q2(dir_: str) -> str:
    """Q2 bulk zip carrying ONLY the POR member, with bank 1's name
    and bank 2's state changed vs Q1 and every other attribute
    restated identically — the quarterly-restatement shape the SCD2
    institution history collapses (only the two changed banks may
    open new intervals)."""
    date_token = "06302024"
    path = os.path.join(
        dir_, f"FFIEC CDR Call Bulk All Schedules {date_token}.zip"
    )
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr(
            f"FFIEC CDR Call Bulk POR {date_token}.txt",
            "\n".join(
                _por_lines(
                    renames={1: "First Bank of Ames"},
                    restates={2: "NE"},
                )
            )
            + "\n",
        )
    return path


def make_por_zip_q3(dir_: str) -> str:
    """Q3 bulk zip carrying ONLY the POR member, with bank 3 ABSENT —
    the quarterly full restatement's departure case (merged/closed
    institutions just stop appearing; ``close_on_absence`` must close
    their interval at this quarter)."""
    date_token = "09302024"
    lines = _por_lines(
        renames={1: "First Bank of Ames"}, restates={2: "NE"}
    )
    # drop bank 3's data row (header + description rows are 0 and 1,
    # bank i sits at index 2 + (i - 1))
    lines = [ln for i, ln in enumerate(lines) if i != 2 + 2]
    path = os.path.join(
        dir_, f"FFIEC CDR Call Bulk All Schedules {date_token}.zip"
    )
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr(
            f"FFIEC CDR Call Bulk POR {date_token}.txt",
            "\n".join(lines) + "\n",
        )
    return path


def make_broken_zip(dir_: str) -> str:
    """Bulk zip whose single schedule has an unrepairable row (too FEW
    fields — the repairs only fix embedded newlines and extra tabs), for
    the strict clean-read gate."""
    header = ["IDRSSD", "RCFD0010", "RCFD2170"]
    lines = [_row(header), _row(["ID", "Cash", "Assets"])]
    lines.append(_row([1001, "10.5", "20000"]))
    lines.append("1002\t\t")  # 2 fields + trailing tab: one short, unrepairable
    lines.append(_row([1003, "oops", "60000"]))  # malformed numeric -> NULL + problem
    path = os.path.join(dir_, f"FFIEC CDR Call Bulk All Schedules 06302024.zip")
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr(
            "FFIEC CDR Call Schedule RX 06302024.txt", "\n".join(lines) + "\n"
        )
    return path


def make_mdrm_zip(dir_: str) -> str:
    """MDRM dictionary zip: title row, header row, then item metadata
    (reference data-raw/ffiec_dict.R:19-53 reads the real one)."""
    import csv
    import io

    buf = io.StringIO()
    w = csv.writer(buf)
    w.writerow(["MDRM Data Dictionary - extracted 2024-06-30"])
    w.writerow(
        ["Mnemonic", "Item Code", "Item Name", "Start Date", "End Date",
         "Confidentiality", "ItemType", "Reporting Form", "Description",
         "SeriesGlossary"]
    )
    items = [
        ("RCFD", "0010", "cash and balances due from FDIC institutions",
         "3/31/1976 12:00:00 AM", "12/31/9999 12:00:00 AM"),
        ("RCFD", "2170", "total assets per gaap", "3/31/1976 12:00:00 AM",
         "12/31/9999 12:00:00 AM"),
        ("RCON", "2200", "total deposits in u.s. offices",
         "6/30/1980 12:00:00 AM", "12/31/9999 12:00:00 AM"),
        ("RIAD", "4340", "net income attributable to tier 1 holders",
         "3/31/1976 12:00:00 AM", "12/31/2001 12:00:00 AM"),
        ("RCON", "6724", "number of offices", "3/31/1990 12:00:00 AM",
         "12/31/9999 12:00:00 AM"),
        ("RCFD", "A224", "risk-based capital ratio per ffiec rules",
         "3/31/1996 12:00:00 AM", "12/31/9999 12:00:00 AM"),
        ("RCFD", "B528", "schedule rc-q fair value flag",
         "3/31/2001 12:00:00 AM", "12/31/9999 12:00:00 AM"),
        ("TEXT", "4545", "free-form comment for addressees",
         "3/31/1976 12:00:00 AM", "12/31/9999 12:00:00 AM"),
    ]
    for mnem, code, name, start, end in items:
        w.writerow(
            [mnem, code, name, start, end, "N", "Financial", "FFIEC 031",
             f"Description of {mnem}{code}", "Call Report"]
        )
    path = os.path.join(dir_, "MDRM.zip")
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("MDRM_CSV.csv", buf.getvalue())
    return path


_CONCEPTS_XSD = """<?xml version="1.0" encoding="utf-8"?>
<xsd:schema xmlns:xsd="http://www.w3.org/2001/XMLSchema"
            xmlns:xbrli="http://www.xbrl.org/2003/instance">
  <xsd:element name="RCFD0010" type="xbrli:monetaryItemType"/>
  <xsd:element name="RCON2200" type="xbrli:monetaryItemType"/>
  <xsd:element name="RCON6724" type="xbrli:integerItemType"/>
  <xsd:element name="RCFDA224" type="xbrli:pureItemType"/>
  <xsd:element name="RCFDB528" type="xbrli:booleanItemType"/>
  <xsd:element name="TEXT4545" type="xbrli:stringItemType"/>
</xsd:schema>
"""


def make_taxonomy_zip(dir_: str) -> str:
    """Taxonomy zip containing a concepts.xsd (reference
    data-raw/ffiec_schema.R:21-45 reads the real ones)."""
    path = os.path.join(dir_, "_taxonomy_2024.zip")
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("taxonomy/concepts.xsd", _CONCEPTS_XSD)
    return path


_XBRL_TEMPLATE = """<?xml version="1.0" encoding="utf-8"?>
<xbrl xmlns="http://www.xbrl.org/2003/instance"
      xmlns:cc="http://www.ffiec.gov/call/concepts">
{facts}
</xbrl>
"""


def make_xbrl_zip(dir_: str) -> str:
    path = os.path.join(dir_, f"FFIEC CDR Call Bulk XBRL {DATE_TOKEN}.zip")
    with zipfile.ZipFile(path, "w") as zf:
        for i in (1, 2):
            facts = "\n".join(
                f'  <cc:{item} contextRef="RI_{1000 + i}_{REPORT_DATE}" '
                f'unitRef="USD" decimals="0">{(1000 + i) * m}</cc:{item}>'
                for m, item in enumerate(["RCFD0010", "RCON2200", "RIAD4340"], 1)
            )
            zf.writestr(
                f"{1000 + i}_{DATE_TOKEN}.xbrl.xml",
                _XBRL_TEMPLATE.format(facts=facts),
            )
    return path
