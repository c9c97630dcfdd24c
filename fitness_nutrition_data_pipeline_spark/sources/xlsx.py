"""Native xlsx source — stdlib-only (zipfile + ElementTree), no openpyxl.

Closes the reference's S3 surface (main_etl_pipeline.py:104-122 reads
gym_recommendation.xlsx / nutrition.xlsx via pandas+openpyxl) without
the openpyxl dependency: xlsx is a zip of XML — shared strings in
xl/sharedStrings.xml, the first worksheet in xl/worksheets/sheet1.xml.
Sufficient for the reference's plain tabular sheets (text + numbers;
no formulas or date serials).

Scale posture: xlsx is not a splittable format and only ever carries
dimension-sized inputs (the reference's sheets are <100k rows), so the
parse is DRIVER-SIDE into ``spark.createDataFrame`` — the same posture
as every small-dim source here. Bulk data never arrives as xlsx; if it
did, the answer is a one-time convert to parquet, not a distributed
xlsx reader.

All values surface as strings (blank → NULL) for parity with the CSV
path — every cast stays explicit downstream (the coerce semantics the
transform layer owns).
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
import zipfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

NS = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}


def _col_index(cell_ref: str) -> int:
    letters = re.match(r"[A-Z]+", cell_ref).group(0)
    idx = 0
    for ch in letters:
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def read_xlsx_rows(path: str) -> list[list[str]]:
    """First worksheet of an xlsx as a dense list of string rows
    (shared-string and inline-string cells resolved, gaps padded)."""
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
                val = (
                    "".join(t.text or "" for t in is_el.iter(f"{{{NS['m']}}}t"))
                    if is_el is not None
                    else ""
                )
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


def read_xlsx(spark: SparkSession, path: str) -> DataFrame:
    """xlsx → DataFrame: first row is the header, every column string,
    blank cells NULL (CSV-path parity)."""
    rows = read_xlsx_rows(path)
    if not rows:
        return spark.createDataFrame([], T.StructType([]))
    header = [str(h) if h != "" else f"_c{i}" for i, h in enumerate(rows[0])]
    schema = T.StructType([T.StructField(h, T.StringType()) for h in header])
    data = [[v if v != "" else None for v in r] for r in rows[1:]]
    return spark.createDataFrame(data, schema)
