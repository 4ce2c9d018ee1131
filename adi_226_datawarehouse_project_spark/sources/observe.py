"""Write-time telemetry via ``DataFrame.observe`` — the reference's
per-stage record-count logging (`airbnb_clean_data.py:28-38,206-218`,
`lambda_transform_airbnb.py:262-276` log counts before/after every
cleaning step and per written table) done Spark-first.

The naive translation is ``df.count()`` next to every write — a FULL
SECOND SCAN of each stage's data (the warehouse pipeline originally
re-read every zone it had just written to report rows-written). An
``Observation`` instead accumulates metrics on the executors WHILE the
write job runs: zero extra jobs, zero extra scans, exact values. At
100 TB that halves the pipeline's I/O for free.

Semantics worth knowing (and pinned in tests/test_observe.py):

- metrics are computed over the rows that actually flow through the
  observed node during the SAME action — so an observation placed
  before a filter and one placed after measure the funnel in ONE pass;
- only deterministic aggregate expressions are legal (no distinct);
  count/sum/min/max cover the reference's logging surface;
- ``Observation.get`` blocks until the action finishes; each
  Observation instance is single-use (one plan, one action).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from .writers import write_parquet


def observed_write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    single_file: bool = False,
) -> int:
    """Write parquet and return the exact number of rows written,
    observed during the write job itself — no read-back, no second
    scan. Drop-in for ``write_parquet(...) ; read.count()``."""
    obs = Observation("rows_written")
    observed = df.observe(obs, F.count(F.lit(1)).alias("n"))
    write_parquet(
        observed, path, mode=mode, partition_by=partition_by, single_file=single_file
    )
    return int(obs.get["n"])


def instrument_funnel(
    df: DataFrame,
    filters: list[tuple[str, object]],
) -> tuple[DataFrame, dict[str, Observation]]:
    """Chain ``filters = [(stage_name, Column-predicate), ...]`` onto
    ``df`` with a row-count observation after each stage (plus an
    ``input`` observation before the first). One action on the result
    yields the whole per-stage survivor funnel — counts the reference
    logged with one pandas pass per stage, here at zero extra cost."""
    observations: dict[str, Observation] = {}
    o_in = Observation("input")
    cur = df.observe(o_in, F.count(F.lit(1)).alias("n"))
    observations["input"] = o_in
    for name, pred in filters:
        o = Observation(name)
        cur = cur.filter(pred).observe(o, F.count(F.lit(1)).alias("n"))
        observations[name] = o
    return cur, observations


def funnel_counts(observations: dict[str, Observation]) -> dict[str, int]:
    """Collect every observation's count (blocks until the action that
    consumed the instrumented frame has run)."""
    return {name: int(o.get["n"]) for name, o in observations.items()}
