from .golden import GOLDEN_QUERIES, golden_query_sql

__all__ = ["GOLDEN_QUERIES", "golden_query_sql"]
