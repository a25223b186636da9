from relational_data_loader_spark.operators.lww import net_changes
from relational_data_loader_spark.operators.project import project_cast
from relational_data_loader_spark.operators.watermark import partition_watermarks

__all__ = ["net_changes", "project_cast", "partition_watermarks"]
