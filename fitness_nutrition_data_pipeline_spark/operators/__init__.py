from fitness_nutrition_data_pipeline_spark.operators.keys import assign_sequential_ids, with_order_index

__all__ = ["assign_sequential_ids", "with_order_index"]
