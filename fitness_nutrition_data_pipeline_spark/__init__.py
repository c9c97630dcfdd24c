"""fitness_nutrition_data_pipeline_spark — a PySpark-native analytics engine.

A ground-up, Spark-first re-expression of the query and data-processing
capabilities of the reference ETL pipeline (beauuks/fitness-nutrition-data-pipeline,
surveyed in SURVEY.md): heterogeneous-source ingestion, entity resolution,
snowflake-warehouse derivation, a SQL data-quality corpus — plus the
large-scale training-data operators (dedup, similarity search, text
analysis, multimodal plumbing) that a 100 TB pipeline needs.

Everything is declarative DataFrame / Spark SQL so Catalyst + Tungsten pick
the physical strategy; Python UDFs only where built-ins genuinely cannot
express the semantics (and then Arrow-batched pandas UDFs).
"""

from fitness_nutrition_data_pipeline_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
