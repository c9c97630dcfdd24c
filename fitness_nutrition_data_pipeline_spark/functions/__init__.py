from fitness_nutrition_data_pipeline_spark.functions.cleaning import (
    clean_text_list,
    normalize_columns,
    null_out_of_range,
    standardize_fitness_goal,
    strip_units,
)

__all__ = [
    "clean_text_list",
    "normalize_columns",
    "null_out_of_range",
    "standardize_fitness_goal",
    "strip_units",
]
