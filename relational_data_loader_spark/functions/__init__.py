from relational_data_loader_spark.functions.registry import get_transform, register_transform

__all__ = ["get_transform", "register_transform"]
