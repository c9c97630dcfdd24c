"""Minimal xlsx→CSV converter (no openpyxl dependency).

Thin CLI wrapper over the engine's native stdlib xlsx parser
(fitness_nutrition_data_pipeline_spark/sources/xlsx.py) — kept for pre-converting
sheets outside a Spark session.

Usage: python tools/xlsx_to_csv.py input.xlsx output.csv
"""

from __future__ import annotations

import csv
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fitness_nutrition_data_pipeline_spark.sources.xlsx import read_xlsx_rows  # noqa: E402


def convert(src: str, dst: str) -> int:
    rows = read_xlsx_rows(src)
    with open(dst, "w", newline="") as f:
        csv.writer(f).writerows(rows)
    return len(rows)


if __name__ == "__main__":
    n = convert(sys.argv[1], sys.argv[2])
    print(f"wrote {n} rows to {sys.argv[2]}")
