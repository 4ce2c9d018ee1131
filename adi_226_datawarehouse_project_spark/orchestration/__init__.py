from .dag import DagTask, SensorTimeout, TaskResult, run_dag, wait_for

__all__ = ["DagTask", "SensorTimeout", "TaskResult", "run_dag", "wait_for"]
