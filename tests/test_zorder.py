"""Z-order clustering + compaction: value-preserving rewrite, and the
actual pruning evidence — parquet footer min/max envelopes must let a
predicate on EITHER z-order column skip most row groups, which a
single-column sort cannot do for the trailing column."""

from __future__ import annotations

import glob
import math

import pyarrow.parquet as pq
import pytest

from adi_226_datawarehouse_project_spark.sources.catalog import load_table
from adi_226_datawarehouse_project_spark.sources.writers import (
    compact_table,
    write_zordered,
    zorder_by,
    zorder_key,
)

_SF = "/root/testdata/sf0.001"
_N_FILES = 8


@pytest.fixture(scope="module")
def events(spark):
    return load_table(spark, _SF, "events").select("event_id", "user_id", "value")


def _row_group_stats(path_glob: str, col: str):
    """[(min, max)] for every row group across the files."""
    out = []
    for f in sorted(glob.glob(path_glob)):
        meta = pq.ParquetFile(f).metadata
        for rg in range(meta.num_row_groups):
            for ci in range(meta.num_columns):
                c = meta.row_group(rg).column(ci)
                if c.path_in_schema == col:
                    out.append((c.statistics.min, c.statistics.max))
    return out


def _touched(stats, lo, hi):
    return sum(1 for mn, mx in stats if not (mx < lo or mn > hi))


def test_zorder_write_preserves_rows(spark, events, tmp_path):
    out = str(tmp_path / "z")
    write_zordered(events, out, ["user_id", "value"], num_files=_N_FILES, bits=12)
    back = spark.read.parquet(out)
    assert back.count() == events.count()
    assert sorted(back.columns) == sorted(events.columns)  # __zkey dropped
    assert back.select("event_id").exceptAll(events.select("event_id")).count() == 0


def test_zorder_prunes_on_both_dims(spark, events, tmp_path):
    zdir = str(tmp_path / "z")
    plaindir = str(tmp_path / "plain")
    write_zordered(events, zdir, ["user_id", "value"], num_files=_N_FILES, bits=12)
    # baseline: same file count, no clustering
    events.repartition(_N_FILES).write.mode("overwrite").parquet(plaindir)

    bounds = events.agg(
        {"user_id": "max", "value": "max"}
    ).collect()[0]
    u_hi, v_hi = bounds["max(user_id)"], bounds["max(value)"]

    for col, hi in (("user_id", u_hi), ("value", v_hi)):
        z = _row_group_stats(f"{zdir}/part-*.parquet", col)
        p = _row_group_stats(f"{plaindir}/part-*.parquet", col)
        assert len(z) >= _N_FILES // 2  # enough granularity to measure
        # probe a ~1/8th slice in the middle of the domain
        lo = hi * 0.5
        hi_probe = hi * 0.625 if isinstance(hi, float) else math.ceil(hi * 0.625)
        z_hit, p_hit = _touched(z, lo, hi_probe), _touched(p, lo, hi_probe)
        # unordered layout: essentially every row group intersects
        assert p_hit >= len(p) - 1, (col, p_hit, len(p))
        # z-ordered: a strict majority of row groups is skippable
        assert z_hit <= len(z) // 2, (col, z_hit, len(z))


def test_single_sort_does_not_prune_trailing_dim(spark, events, tmp_path):
    """The motivating contrast: sorting by user_id alone gives value-
    predicates no locality, while the z-layout above serves both."""
    sdir = str(tmp_path / "s")
    (
        events.repartitionByRange(_N_FILES, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(sdir)
    )
    v_hi = events.agg({"value": "max"}).collect()[0]["max(value)"]
    stats = _row_group_stats(f"{sdir}/part-*.parquet", "value")
    assert _touched(stats, v_hi * 0.5, v_hi * 0.625) >= len(stats) - 1


def test_zorder_key_bit_layout(spark):
    from pyspark.sql import functions as F

    # q0=0b11 (cols idx 0), q1=0b01 → key bits: b0: 1,1 → 0b11; b1: 1,0 → 0b01<<2
    row = (
        spark.range(1)
        .select(
            zorder_key([F.lit(3).cast("bigint"), F.lit(1).cast("bigint")], bits=2).alias("k")
        )
        .collect()[0]
    )
    assert row["k"] == 0b0111
    with pytest.raises(ValueError):
        zorder_key([F.lit(0)] * 4, bits=16)


def test_zorder_handles_nulls_and_constant_columns(spark):
    df = spark.createDataFrame(
        [(1, None, 5.0), (2, 3.0, 5.0), (3, 9.0, 5.0)], "id BIGINT, a DOUBLE, c DOUBLE"
    )
    keyed = zorder_by(df, ["a", "c"], bits=8).collect()
    assert len(keyed) == 3
    assert all(r["__zkey"] is not None for r in keyed)


def test_compact_table_right_sizes_and_refuses_in_place(spark, events, tmp_path):
    src = str(tmp_path / "src")
    events.repartition(20).write.parquet(src)  # 20 small files
    out = str(tmp_path / "compacted")
    n = compact_table(spark, src, out, target_file_mb=512, zorder_cols=["user_id", "value"])
    assert n >= 1
    files = glob.glob(f"{out}/part-*.parquet")
    assert len(files) == n < 20
    assert spark.read.parquet(out).count() == events.count()
    with pytest.raises(ValueError):
        compact_table(spark, src, src)
