"""DataFrame-vs-SQL agreement for the golden suite (SURVEY §7.2(5)):
every golden query's DataFrame form must produce exactly the rows of
its SQL form (which carries the DuckDB oracle). Schema column names
must match too, so either surface satisfies the driver contract."""

import pytest
from conftest import SF_DIR

from adi_226_datawarehouse_project_spark.model.star import register_star_views
from adi_226_datawarehouse_project_spark.plans.golden import GOLDEN_QUERIES
from adi_226_datawarehouse_project_spark.plans.golden_df import golden_df


@pytest.mark.parametrize("name", sorted(GOLDEN_QUERIES))
def test_df_form_matches_sql_form(spark, name):
    register_star_views(spark, SF_DIR)
    sql_df = spark.sql(GOLDEN_QUERIES[name])
    api_df = golden_df(spark, SF_DIR, name)
    assert api_df.columns == sql_df.columns
    sql_rows = sorted(map(tuple, sql_df.collect()))
    api_rows = sorted(map(tuple, api_df.collect()))
    assert api_rows == sql_rows
