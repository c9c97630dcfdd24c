"""bench.py list contracts (no Spark, no execution): the headline and
extended sets must stay registered (a renamed query would silently
null the bench value via the per-query error path) and disjoint (an
overlap would double-count and skew the separate totals)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import EXTENDED, HEADLINE
from fitness_nutrition_data_pipeline_spark.queries import all_specs


def test_bench_lists_are_registered_and_disjoint():
    specs = all_specs()
    missing = [n for n in [*HEADLINE, *EXTENDED] if n not in specs]
    assert not missing, f"bench lists reference unregistered queries: {missing}"
    overlap = set(HEADLINE) & set(EXTENDED)
    assert not overlap, f"headline/extended overlap: {overlap}"
    assert len(HEADLINE) == 18 and len(EXTENDED) == 10
