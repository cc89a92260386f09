#!/usr/bin/env python
"""Quarterly FFIEC CDR bulk-zip downloader (SURVEY.md §2.1 S14; the
reference's data-raw/get_xbrl_zips.py fills the same role).

Driver-side plain Python by design: downloading a few hundred quarterly
zips is not distributed work.  The engine (ffiec_pq_spark.operators.
process.ffiec_process) picks the files up from --out afterwards.

Usage:
    python scripts/get_ffiec_zips.py --out "$RAW_DATA_DIR/ffiec" \
        --start 2001 --end 2024 [--kind "All Schedules"|XBRL]

Stdlib-only; 1 s politeness delay between requests to the government
server; skips files that already exist (idempotent re-runs).
"""

from __future__ import annotations

import argparse
import os
import sys
import time
import urllib.request

# FFIEC CDR bulk download endpoint; the site serves one zip per quarter
# named "FFIEC CDR Call Bulk {kind} {MMDDYYYY}.zip"
BASE_URL = "https://cdr.ffiec.gov/public/PWS/DownloadBulkData.aspx"
QUARTER_ENDS = [(3, 31), (6, 30), (9, 30), (12, 31)]


def quarter_tokens(start_year: int, end_year: int) -> list[str]:
    return [
        f"{m:02d}{d:02d}{y}"
        for y in range(start_year, end_year + 1)
        for m, d in QUARTER_ENDS
    ]


def download_one(url: str, dest: str, timeout: float = 120.0) -> int:
    req = urllib.request.Request(url, headers={"User-Agent": "ffiec-pq-spark"})
    with urllib.request.urlopen(req, timeout=timeout) as resp, open(
        dest, "wb"
    ) as fh:
        data = resp.read()
        fh.write(data)
    return len(data)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default=os.environ.get("RAW_DATA_DIR", "."))
    ap.add_argument("--start", type=int, default=2001)
    ap.add_argument("--end", type=int, default=2024)
    ap.add_argument("--kind", default="All Schedules", choices=["All Schedules", "XBRL"])
    ap.add_argument("--delay", type=float, default=1.0)
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    ok = fail = skipped = 0
    for tok in quarter_tokens(args.start, args.end):
        name = f"FFIEC CDR Call Bulk {args.kind} {tok}.zip"
        dest = os.path.join(args.out, name)
        if os.path.exists(dest):
            skipped += 1
            continue
        url = f"{BASE_URL}?file={urllib.request.quote(name)}"
        try:
            n = download_one(url, dest)
            print(f"{name}: ok ({n:,} bytes)")
            ok += 1
        except Exception as ex:  # noqa: BLE001 — report and continue
            print(f"{name}: FAILED ({ex})", file=sys.stderr)
            if os.path.exists(dest):
                os.remove(dest)
            fail += 1
        # politeness to the government server, like the reference
        time.sleep(args.delay)
    print(f"done: {ok} downloaded, {skipped} already present, {fail} failed")
    return 0 if fail == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
