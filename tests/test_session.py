"""Session-factory contracts: get_spark must never rewrite a live
session's runtime confs, and boolean env vars must normalize to what
Spark's conf parser accepts."""

import pytest

from adi_226_datawarehouse_project_spark.session import _env_bool, get_spark


def test_get_spark_returns_existing_session_unchanged(spark, monkeypatch):
    """builder.getOrCreate APPLIES every .config to a reused session —
    a second get_spark() call used to silently flip shuffle partitions
    / ANSI / cache compression mid-run on the shared session (the
    driver's verify session runs ansi=true, 200 shuffle partitions).
    With a session alive, get_spark must hand it back untouched."""
    key = "spark.sql.shuffle.partitions"
    ckey = "spark.sql.inMemoryColumnarStorage.compressed"
    prev, cprev = spark.conf.get(key), spark.conf.get(ckey)
    try:
        spark.conf.set(key, "7")
        # env re-read must not mutate the live session either: force the
        # env to the OPPOSITE of the current conf before the call.
        monkeypatch.setenv(
            "SPARK_GRAFT_CACHE_COMPRESS",
            "false" if spark.conf.get(ckey) == "true" else "true",
        )
        s2 = get_spark(shuffle_partitions=99)
        assert s2 is spark
        assert spark.conf.get(key) == "7"  # not 99, not re-defaulted
        assert spark.conf.get(ckey) == cprev
    finally:
        spark.conf.set(key, prev)


def test_get_spark_warns_when_explicit_args_ignored(spark):
    """Reuse must not be SILENT about dropping explicitly passed
    settings: the caller asked for a conf the live session won't get."""
    with pytest.warns(RuntimeWarning, match="shuffle_partitions"):
        assert get_spark(shuffle_partitions=99) is spark


def test_get_spark_no_warning_on_default_args(spark, recwarn):
    """A bare get_spark() reusing the live session is the intended
    fast path — no warning noise."""
    assert get_spark() is spark
    assert not [w for w in recwarn if issubclass(w.category, RuntimeWarning)]


def test_is_live_rejects_stopped_or_absent_contexts(spark):
    """getOrCreate checks context liveness before reusing; get_spark
    must too — sc.stop() leaves SparkSession._instantiatedSession set,
    and handing back that corpse fails on first use instead of
    building a fresh session."""
    from adi_226_datawarehouse_project_spark.session import _is_live

    class _DeadSC:
        _jsc = None

    class _DeadSession:
        _sc = _DeadSC()

    class _Exploding:
        @property
        def _sc(self):
            raise RuntimeError("gateway gone")

    assert _is_live(spark)
    assert not _is_live(None)
    assert not _is_live(_DeadSession())
    assert not _is_live(_Exploding())


def test_env_bool_normalizes_and_rejects(monkeypatch):
    """SPARK_GRAFT_UI=1 passed raw into spark.ui.enabled crashed
    session creation with an IllegalArgumentException that never named
    the env var; common spellings normalize, garbage raises by name."""
    monkeypatch.delenv("X_BOOL", raising=False)
    assert _env_bool("X_BOOL", "false") == "false"
    for raw, want in [
        ("1", "true"), ("true", "true"), ("YES", "true"), ("On", "true"),
        ("0", "false"), ("False", "false"), ("no", "false"), ("OFF", "false"),
    ]:
        monkeypatch.setenv("X_BOOL", raw)
        assert _env_bool("X_BOOL", "false") == want, raw
    monkeypatch.setenv("X_BOOL", "maybe")
    with pytest.raises(ValueError, match="X_BOOL"):
        _env_bool("X_BOOL", "false")
