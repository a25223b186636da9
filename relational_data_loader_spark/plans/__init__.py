from relational_data_loader_spark.plans.manager import DataLoadManager, RunResult
from relational_data_loader_spark.plans.decision import LoadDecision, decide

__all__ = ["DataLoadManager", "RunResult", "LoadDecision", "decide"]
