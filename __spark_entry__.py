"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` maps
every implemented operator/query to a (spark, sf_dir) -> DataFrame
callable; ``oracle_sql()`` gives the equivalent DuckDB SQL (the full
star-schema derivation is inlined as a WITH chain so the oracle derives
everything from the raw parquet fixtures independently).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from adi_226_datawarehouse_project_spark.model.star import (  # noqa: E402
    oracle_with_chain,
    register_star_views,
)
from adi_226_datawarehouse_project_spark.plans.golden import GOLDEN_QUERIES  # noqa: E402
from adi_226_datawarehouse_project_spark.plans.operators_suite import (  # noqa: E402
    operator_queries,
)


def _golden(name: str) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_star_views(spark, sf_dir)
        return spark.sql(GOLDEN_QUERIES[name])

    return run


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: star-join %-of-total-by-borough (reference analysis
    query #1) over the full derived warehouse at sf0.001."""
    return _golden("g01_complaints_by_borough_pct")(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name in GOLDEN_QUERIES:
        out[name] = _golden(name)
    for name, opq in operator_queries().items():
        out[name] = opq.spark
    return out


def oracle_sql() -> dict[str, str]:
    out = {name: oracle_with_chain(sql) for name, sql in GOLDEN_QUERIES.items()}
    for name, opq in operator_queries().items():
        if opq.oracle is not None:
            out[name] = opq.oracle
    return out
