from fitness_nutrition_data_pipeline_spark.sources.testdata import TABLES, load_tables, register_views

__all__ = ["TABLES", "load_tables", "register_views"]
