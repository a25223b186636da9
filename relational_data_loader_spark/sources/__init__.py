from relational_data_loader_spark.sources.readers import (
    ChangeTrackingInfo,
    change_tracking_info,
    read_source,
)

__all__ = ["read_source", "change_tracking_info", "ChangeTrackingInfo"]
