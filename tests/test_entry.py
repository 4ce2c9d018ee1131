"""Driver-contract smoke tests for __spark_entry__."""

import __spark_entry__ as entrymod

# Operators whose semantics depend on seeded xxhash64/SRP planes or an
# engine-specific sketch — genuinely not DuckDB-expressible; driver
# records rows-only and their correctness authority is tests/
# test_dedup.py + test_similarity.py + test_plans.py (HLL bound).
ROWS_ONLY_ALLOWED = {
    "dedup_lsh_pairs",
    "sim_ann_topk",
}


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["borough", "total_complaints", "percentage"]


def test_every_query_has_oracle_or_is_allowlisted(spark):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    # exactly the driver's 50-query CORRECTNESS budget
    assert len(qs) == 50
    missing = {n for n in qs if n not in oracles}
    assert missing == ROWS_ONLY_ALLOWED


def test_oracle_keys_subset_of_queries(spark):
    assert set(entrymod.oracle_sql()) <= set(entrymod.queries())
