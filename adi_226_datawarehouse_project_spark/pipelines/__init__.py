from .warehouse_pipeline import run_warehouse_pipeline

__all__ = ["run_warehouse_pipeline"]
