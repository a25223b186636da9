from relational_data_loader_spark.streaming.runner import StreamingIngest

__all__ = ["StreamingIngest"]
