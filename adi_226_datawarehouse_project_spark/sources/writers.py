"""Sink writers (SURVEY §2.1 K1-K7) — the reference's S3-zone sinks
re-expressed Spark-first.

The reference coalesces every output to a single file for Redshift
COPY friendliness (`glue_job_clean_311.py:151-157` `.coalesce(1)`),
which serializes the whole write through one task — an anti-pattern at
scale. Here the default keeps the plan's parallelism; `single_file`
is an explicit opt-in knob, and the gold-zone writer partitions by a
column (e.g. created_year) so downstream reads get partition pruning
for free (`WHERE created_year = …` never touches other years' files).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    single_file: bool = False,
) -> None:
    """Parquet sink (K1/K2). `partition_by` lays out hive-style
    directories (partition pruning); `single_file` reproduces the
    reference's coalesce(1) for tools that need one object."""
    out = df.coalesce(1) if single_file else df
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    name: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table — the engine's answer to Redshift
    DISTKEY/SORTKEY (`README.md:182` in the reference): co-locate rows
    by join/agg key at WRITE time so every later equi-join or groupBy
    on `bucket_cols` between same-bucketed tables runs shuffle-free
    (SortMergeJoin with zero Exchange; asserted in
    tests/test_bucketing.py).

    Scale: at 100 TB, bucketing the fact tables on the conformance key
    (geohash) turns the nightly fact⋈fact drill-across from a full
    2-sided shuffle into a local per-bucket merge; num_buckets should
    be sized to ~executor-count × small-integer."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(name)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True) -> None:
    """CSV sink (K4)."""
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-records sink (K3/K5)."""
    df.write.mode(mode).json(path)


def write_run_manifest(
    spark: SparkSession,
    path: str,
    job_name: str,
    run_utc: str,
    inputs: dict[str, str],
    outputs: dict[str, str],
    stats: dict[str, int] | None = None,
) -> None:
    """Nested-struct run manifest (K5 + SURVEY §1.2 nested struct row):
    the reference writes a one-row JSON manifest whose ``inputs`` /
    ``outputs`` are nested objects (`Glue job to merge 311
    Airbnb.py:154-162`). Typed as STRUCTs (not maps) with sorted field
    names so readers get named-field access and a deterministic
    schema; ``stats`` carries numeric run metrics (row counts etc.).
    An omitted/empty ``stats`` dict omits the field ENTIRELY — an
    empty struct serializes as ``"stats":{}``, which JSON schema
    inference on read-back drops or mistypes, breaking consumers that
    probe ``stats.*``; absent-field semantics are well-defined instead.
    One row → single_file semantics are inherent (coalesce(1))."""
    from pyspark.sql import types as T

    stats = stats or {}

    def _str_struct(d: dict[str, str]) -> T.StructType:
        return T.StructType([T.StructField(k, T.StringType()) for k in sorted(d)])

    fields = [
        T.StructField("job_name", T.StringType()),
        T.StructField("run_utc", T.StringType()),
        T.StructField("inputs", _str_struct(inputs)),
        T.StructField("outputs", _str_struct(outputs)),
    ]
    row = [
        job_name,
        run_utc,
        tuple(inputs[k] for k in sorted(inputs)),
        tuple(outputs[k] for k in sorted(outputs)),
    ]
    if stats:
        fields.append(
            T.StructField(
                "stats",
                T.StructType([T.StructField(k, T.LongType()) for k in sorted(stats)]),
            )
        )
        row.append(tuple(int(stats[k]) for k in sorted(stats)))
    schema = T.StructType(fields)
    spark.createDataFrame([tuple(row)], schema).coalesce(1).write.mode("overwrite").json(path)


def read_run_manifest(spark: SparkSession, path: str) -> DataFrame:
    """Read a run manifest back; nested structs must survive the JSON
    roundtrip (schema inference rebuilds them as structs, which the
    io-suite oracle verifies value-by-value)."""
    return spark.read.json(path)


def overwrite_table(spark: SparkSession, df: DataFrame, name: str) -> None:
    """Truncate-and-reload staging semantics (K6/K7: TRUNCATE + COPY →
    overwrite). With a real catalog this is saveAsTable(overwrite); in
    the session-local engine it replaces the temp view."""
    df.createOrReplaceTempView(name)
