"""Bridge tables: user ↔ multi-valued attributes
(main_etl_pipeline.py:484-511).

The reference's per-row loop ("for user, for item, lookup key, append,
drop_duplicates") becomes explode → broadcast join → distinct: one
shuffle, map-side dedup, no Python in the loop. Items whose value misses
the dimension are dropped, matching the ``lookup_map.get(item)`` guard
(:505-506).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fitness_nutrition_data_pipeline_spark.functions.cleaning import clean_text_list


def build_bridge(
    staging: DataFrame,
    blob_col: str,
    dim: DataFrame,
    dim_name_col: str,
    dim_key_col: str,
) -> DataFrame:
    """(UserKey, <dim_key>) rows from a staging blob column."""
    items = (
        staging.where(F.col(blob_col).isNotNull())
        .select("UserKey", F.explode(clean_text_list(blob_col)).alias(dim_name_col))
    )
    return (
        items.join(F.broadcast(dim), dim_name_col)
        .select("UserKey", dim_key_col)
        .distinct()
    )


def build_bridges(staging: DataFrame, dims: dict[str, DataFrame]) -> dict[str, DataFrame]:
    return {
        "Bridge_User_HealthCondition": build_bridge(
            staging, "HealthConditions", dims["Dim_HealthCondition"], "ConditionName", "ConditionKey"
        ),
        "Bridge_User_WorkoutPreference": build_bridge(
            staging, "WorkoutPreference", dims["Dim_Exercise"], "ExerciseName", "ExerciseKey"
        ),
        "Bridge_User_DietPreference": build_bridge(
            staging, "DietPreference", dims["Dim_Diet"], "DietName", "DietKey"
        ),
    }
