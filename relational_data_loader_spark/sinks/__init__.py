from relational_data_loader_spark.sinks.snapshot import SnapshotTable

__all__ = ["SnapshotTable"]
