"""Minimal xlsx→CSV converter (no openpyxl dependency).

xlsx is a zip of XML: shared strings in xl/sharedStrings.xml, the first
worksheet in xl/worksheets/sheet1.xml. Good enough for the reference's
plain tabular sheets (no formulas/dates-as-serials needed — those sheets
store text + numbers only).

Usage: python tools/xlsx_to_csv.py input.xlsx output.csv
"""

from __future__ import annotations

import csv
import re
import sys
import xml.etree.ElementTree as ET
import zipfile

NS = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}


def _col_index(cell_ref: str) -> int:
    letters = re.match(r"[A-Z]+", cell_ref).group(0)
    idx = 0
    for ch in letters:
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def read_xlsx_rows(path: str) -> list[list[str]]:
    z = zipfile.ZipFile(path)
    shared: list[str] = []
    if "xl/sharedStrings.xml" in z.namelist():
        root = ET.fromstring(z.read("xl/sharedStrings.xml"))
        for si in root.findall("m:si", NS):
            shared.append("".join(t.text or "" for t in si.iter(f"{{{NS['m']}}}t")))

    sheet = ET.fromstring(z.read("xl/worksheets/sheet1.xml"))
    rows: list[list[str]] = []
    for row in sheet.iter(f"{{{NS['m']}}}row"):
        cells: dict[int, str] = {}
        for c in row.findall("m:c", NS):
            ref = c.get("r", "A1")
            ctype = c.get("t", "n")
            if ctype == "inlineStr":
                is_el = c.find("m:is", NS)
                val = "".join(t.text or "" for t in is_el.iter(f"{{{NS['m']}}}t")) if is_el is not None else ""
            else:
                v = c.find("m:v", NS)
                val = v.text if v is not None and v.text is not None else ""
                if ctype == "s":
                    val = shared[int(val)] if val != "" else ""
            cells[_col_index(ref)] = val
        width = max(cells) + 1 if cells else 0
        rows.append([cells.get(i, "") for i in range(width)])
    width = max((len(r) for r in rows), default=0)
    return [r + [""] * (width - len(r)) for r in rows]


def convert(src: str, dst: str) -> int:
    rows = read_xlsx_rows(src)
    with open(dst, "w", newline="") as f:
        csv.writer(f).writerows(rows)
    return len(rows)


if __name__ == "__main__":
    n = convert(sys.argv[1], sys.argv[2])
    print(f"wrote {n} rows to {sys.argv[2]}")
