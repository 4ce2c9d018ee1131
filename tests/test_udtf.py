"""Python UDTF surface: the lateral-join table function must be
row-identical to the native Column-expression chunker on real fixture
documents (escape hatch == production path), including edge shapes
(empty docs, exact-boundary lengths)."""

import pytest
from pyspark.sql import functions as F

from adi_226_datawarehouse_project_spark.functions.udtf_ops import register_udtfs
from adi_226_datawarehouse_project_spark.operators.training import chunk_documents
from adi_226_datawarehouse_project_spark.sources.catalog import load_table
from conftest import SF_SMALL

W, S = 32, 24


def _rows(df):
    return sorted(
        (
            r["doc_id"],
            r["chunk_idx"],
            r["n_chunks"],
            r["chunk_text"],
            r["chunk_tokens"],
        )
        for r in df.collect()
    )


def test_udtf_matches_native_chunker_on_fixtures(spark):
    register_udtfs(spark)
    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    docs.createOrReplaceTempView("udtf_docs")
    native = chunk_documents(docs, "doc_id", "text", window=W, stride=S)
    via_udtf = spark.sql(
        f"SELECT d.doc_id, c.chunk_idx, c.n_chunks, c.chunk_text, c.chunk_tokens"
        f" FROM udtf_docs d, LATERAL chunk_documents_udtf(d.text, {W}, {S}) c"
    )
    assert _rows(native) == _rows(via_udtf)
    assert native.count() > docs.count()  # fixtures do produce multi-chunk docs


def test_udtf_edge_shapes(spark):
    register_udtfs(spark)
    rows = [
        (1, ""),                                  # empty → one empty chunk
        (2, "  A  b "),                           # whitespace + case folding
        (3, " ".join(f"t{i}" for i in range(3))), # exactly window when W=3
        (4, " ".join(f"t{i}" for i in range(5))), # window 3 stride 2 → 2 chunks
    ]
    df = spark.createDataFrame(rows, "doc_id INT, text STRING")
    df.createOrReplaceTempView("udtf_edge")
    native = chunk_documents(df, "doc_id", "text", window=3, stride=2)
    via_udtf = spark.sql(
        "SELECT d.doc_id, c.chunk_idx, c.n_chunks, c.chunk_text, c.chunk_tokens"
        " FROM udtf_edge d, LATERAL chunk_documents_udtf(d.text, 3, 2) c"
    )
    assert _rows(native) == _rows(via_udtf)


def test_udtf_rejects_bad_window(spark):
    register_udtfs(spark)
    df = spark.createDataFrame([(1, "a b")], "doc_id INT, text STRING")
    df.createOrReplaceTempView("udtf_bad")
    with pytest.raises(Exception, match="positive"):
        spark.sql(
            "SELECT * FROM udtf_bad d, LATERAL chunk_documents_udtf(d.text, 0, 2) c"
        ).collect()


def test_scalar_pandas_udf_matches_native_token_count(spark):
    from adi_226_datawarehouse_project_spark.functions.text import token_count
    from adi_226_datawarehouse_project_spark.functions.udtf_ops import (
        token_count_pandas_udf,
    )

    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    extra = spark.createDataFrame(
        [(90001, ""), (90002, "  A  b "), (90003, None)],
        "doc_id BIGINT, text STRING",
    )
    both = docs.unionByName(extra)
    udf = token_count_pandas_udf()
    out = both.select(
        "doc_id",
        token_count(F.col("text")).cast("int").alias("native"),
        udf(F.col("text")).alias("via_udf"),
    )
    mism = out.filter(
        ~F.col("native").eqNullSafe(F.col("via_udf"))
    ).count()
    assert mism == 0
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan  # Arrow batch path, not row pickling


def test_pandas_twin_matches_native_on_unicode_whitespace(spark):
    """The native tokenizer splits on Java \\s+ (ASCII-only); pandas'
    bare .str.split() splits on Unicode whitespace, so the twins used
    to disagree on NBSP-bearing web text ('a\\u00a0b': native 1 token,
    old pandas twin 2)."""
    from adi_226_datawarehouse_project_spark.functions.text import token_count
    from adi_226_datawarehouse_project_spark.functions.udtf_ops import (
        token_count_pandas_udf,
    )

    df = spark.createDataFrame(
        [
            (1, "a b"),          # NBSP: one native token
            (2, "a b c"),        # thin space: two native tokens
            (3, " x\ty \r\n z "),     # ASCII whitespace: three
        ],
        "doc_id BIGINT, text STRING",
    )
    udf = token_count_pandas_udf()
    rows = df.select(
        token_count(F.col("text")).cast("int").alias("native"),
        udf(F.col("text")).alias("via_udf"),
    ).collect()
    assert all(r["native"] == r["via_udf"] for r in rows), rows
    assert [r["native"] for r in rows] == [1, 2, 3]
