"""Run-summary JSON report (S6, main_etl_pipeline.py:922-945) —
structure-compatible with the reference's ``output/etl_report_*.json``."""

from __future__ import annotations

import json
import os
from datetime import datetime

from fitness_nutrition_data_pipeline_spark.validation import ValidationResults


def build_report(
    results: ValidationResults, sources: list[str], total_users_mapped: int
) -> dict:
    return {
        "etl_timestamp": datetime.now().isoformat(),
        "data_sources_processed": sources,
        "total_users_mapped": total_users_mapped,
        "total_records": sum(results.table_counts.values()),
        "table_counts": results.table_counts,
        "validation": {
            "quality_score": results.quality_score,
            "issues": results.issues,
            "warnings": results.warnings,
        },
    }


def write_report(report: dict, output_dir: str) -> str:
    os.makedirs(output_dir, exist_ok=True)
    path = os.path.join(
        output_dir, f"etl_report_{datetime.now().strftime('%Y%m%d_%H%M%S')}.json"
    )
    with open(path, "w") as f:
        json.dump(report, f, indent=2)
    return path
