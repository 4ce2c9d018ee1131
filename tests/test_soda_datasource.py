"""SODA Python DataSource: executor-parallel page reads against
recorded file:// pages — values identical to the driver-side pager,
one Spark partition per page, empty past-the-end probes, option
validation."""

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from adi_226_datawarehouse_project_spark.sources.soda_datasource import (
    SodaDataSource,
)

BASE = "/tmp/spark_graft_io/test_soda_ds"
PAGE = 40
N_ROWS = 130  # 3 full pages + one short page


def _record(i):
    return {
        "unique_key": str(1000 + i),
        "borough": ["QUEENS", "BRONX", "BROOKLYN"][i % 3],
        "latitude": str(40.5 + (i % 50) / 1000.0),
    }


@pytest.fixture()
def pages():
    shutil.rmtree(BASE, ignore_errors=True)
    os.makedirs(BASE)
    rows = [_record(i) for i in range(N_ROWS)]
    for off in range(0, N_ROWS + PAGE, PAGE):  # incl. one empty page
        with open(f"{BASE}/page_{off}_{PAGE}.json", "w") as f:
            json.dump(rows[off : off + PAGE], f)
    return rows


def _load(spark, n_pages=8):
    spark.dataSource.register(SodaDataSource)
    return (
        spark.read.format("soda")
        .schema("unique_key string, borough string, latitude string")
        .option("url_template", f"file://{BASE}/page_{{offset}}_{{limit}}.json")
        .option("page_size", str(PAGE))
        .option("n_pages", str(n_pages))
        .load()
    )


def test_values_match_source_records(spark, pages):
    df = _load(spark)
    got = sorted(
        (r["unique_key"], r["borough"], r["latitude"]) for r in df.collect()
    )
    want = sorted(
        (r["unique_key"], r["borough"], r["latitude"]) for r in pages
    )
    assert got == want and len(got) == N_ROWS


def test_one_partition_per_page(spark, pages):
    df = _load(spark, n_pages=8)
    per_part = (
        df.withColumn("p", F.spark_partition_id())
        .groupBy("p")
        .count()
        .collect()
    )
    sizes = sorted(r["count"] for r in per_part)
    # 3 full pages + the short tail; empty probe partitions emit no rows
    assert sizes == [10, 40, 40, 40]
    assert df.rdd.getNumPartitions() == 8


def test_option_validation(spark, pages):
    spark.dataSource.register(SodaDataSource)
    with pytest.raises(Exception, match="url_template"):
        spark.read.format("soda").schema("a string").load().collect()
    with pytest.raises(Exception, match="limit.*offset|offset.*limit"):
        (
            spark.read.format("soda")
            .schema("a string")
            .option("url_template", "file:///tmp/nope.json")
            .load()
            .collect()
        )


def test_streaming_reader_incremental_micro_batches(spark, pages):
    """The streaming form consumes the endpoint page-by-page as
    micro-batches; after draining, the sink holds every source row
    exactly once."""
    spark.dataSource.register(SodaDataSource)
    stream = (
        spark.readStream.format("soda")
        .schema("unique_key string, borough string, latitude string")
        .option("url_template", f"file://{BASE}/page_{{offset}}_{{limit}}.json")
        .option("page_size", str(PAGE))
        .load()
    )
    name = "soda_stream_out"
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(processingTime="50 milliseconds")
        .start()
    )
    import time

    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.sql(f"SELECT count(*) c FROM {name}").collect()[0]["c"] >= N_ROWS:
                break
            time.sleep(0.3)
    finally:
        q.stop()
    got = sorted(
        (r["unique_key"], r["borough"]) for r in spark.sql(f"SELECT * FROM {name}").collect()
    )
    want = sorted((r["unique_key"], r["borough"]) for r in pages)
    assert got == want


def test_stream_reader_replay_slice(spark, pages):
    """readBetweenOffsets refetches an exact [start, end) slice — the
    recovery path after a checkpoint restore."""
    import json as _json

    from pyspark.sql.types import StructType

    from adi_226_datawarehouse_project_spark.sources.soda_datasource import (
        SodaStreamReader,
    )

    # a slice file matching the replay's limit/offset shape
    rows = [_record(i) for i in range(N_ROWS)]
    with open(f"{BASE}/page_80_25.json", "w") as f:
        _json.dump(rows[80:105], f)
    schema = (
        spark.read.format("soda")
        .schema("unique_key string, borough string, latitude string")
        .option("url_template", f"file://{BASE}/page_{{offset}}_{{limit}}.json")
        .load()
        .schema
    )
    r = SodaStreamReader(
        schema,
        {
            "url_template": f"file://{BASE}/page_{{offset}}_{{limit}}.json",
            "page_size": str(PAGE),
        },
    )
    assert r.initialOffset() == {"offset": 0}
    got = list(r.readBetweenOffsets({"offset": 80}, {"offset": 105}))
    assert [g[0] for g in got] == [r_["unique_key"] for r_ in rows[80:105]]
    assert list(r.readBetweenOffsets({"offset": 9}, {"offset": 9})) == []


def test_transport_errors_propagate_for_non_file_urls(spark, pages):
    """Only past-the-end file:// probes map to an empty page; an HTTP
    transport failure must raise so the Spark task retries instead of
    silently dropping the page."""
    import urllib.error

    from adi_226_datawarehouse_project_spark.sources.soda_datasource import (
        _fetch_page,
    )

    # missing file:// page → empty (the offline past-the-end probe)
    assert _fetch_page(f"file://{BASE}/page_999999_40.json", 5.0) == []
    # refused http connection → URLError propagates (no listener there)
    with pytest.raises(urllib.error.URLError):
        _fetch_page("http://127.0.0.1:9/resource?$limit=1&$offset=0", 2.0)


def test_stream_replay_short_slice_raises(spark, pages):
    """readBetweenOffsets replays a COMMITTED [start, end) slice; if
    the upstream returns fewer rows than committed the reader must
    fail rather than silently shrink the batch."""
    from pyspark.sql.types import StructType

    from adi_226_datawarehouse_project_spark.sources.soda_datasource import (
        SodaStreamReader,
    )

    schema = (
        spark.read.format("soda")
        .schema("unique_key string, borough string, latitude string")
        .option("url_template", f"file://{BASE}/page_{{offset}}_{{limit}}.json")
        .load()
        .schema
    )
    r = SodaStreamReader(
        schema,
        {
            "url_template": f"file://{BASE}/page_{{offset}}_{{limit}}.json",
            "page_size": str(PAGE),
        },
    )
    # page_80_60.json does not exist → 0 rows for a 60-row commit
    with pytest.raises(RuntimeError, match="committed slice"):
        list(r.readBetweenOffsets({"offset": 80}, {"offset": 140}))


def test_typoed_fixture_path_fails_loudly_on_first_page(spark, pages):
    """A typo'd file:// url_template must NOT read as an empty dataset:
    only offset>0 missing-file probes are past-the-end; the FIRST page
    (offset 0) missing means the fixture path is wrong and the task
    must fail (r12 nit)."""
    import urllib.error

    from adi_226_datawarehouse_project_spark.sources.soda_datasource import (
        _fetch_page,
    )

    missing_first = f"file://{BASE}/no_such_page_0_{PAGE}.json"
    with pytest.raises(urllib.error.URLError):
        _fetch_page(missing_first, 5.0, past_end_ok=False)
    # offset>0 probes keep the offline past-the-end semantics
    assert _fetch_page(f"file://{BASE}/page_999999_{PAGE}.json", 5.0) == []

    # end-to-end through the DataSource: a typo'd template yields a
    # task failure, not a silent 0-row frame
    spark.dataSource.register(SodaDataSource)
    bad = (
        spark.read.format("soda")
        .schema("unique_key string, borough string, latitude string")
        .option("url_template", f"file://{BASE}/typo_{{offset}}_{{limit}}.json")
        .option("page_size", str(PAGE))
        .option("n_pages", "2")
        .load()
    )
    with pytest.raises(Exception):
        bad.collect()
