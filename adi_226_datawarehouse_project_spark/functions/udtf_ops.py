"""Python UDTF surface — the table-function extension point the
reference never needed (SURVEY §2.11: no UDTFs anywhere), exposed here
so a user with genuinely imperative row→rows logic has a sanctioned
escape hatch.

Engine stance, explicit: UDTFs run in Python workers — they are the
SLOW path, like row-wise UDFs. Every shipped operator with the same
semantics (``operators/training.chunk_documents``) is pure JVM-side
Column expressions and is the production path. The UDTF here exists to
(a) pin the API surface with a test, and (b) serve as the template —
note the ``terminate``-free streaming-safe shape and the lateral-join
registration — for logic that truly cannot be expressed as
expressions. ``tests/test_udtf.py`` holds the two row-identical: the
escape hatch provably computes the same thing the native path does.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf

_RETURN_TYPE = (
    "chunk_idx: int, n_chunks: int, chunk_text: string, chunk_tokens: int"
)


@udtf(returnType=_RETURN_TYPE)
class ChunkDocumentsUDTF:
    """Sliding-window document chunking as a table function — the
    imperative twin of ``training.chunk_documents`` (same tokenizer,
    same ``1 + ceil(max(n_tokens − window, 0) / stride)`` chunk count,
    same 0-based indices), yielding one row per chunk."""

    def eval(self, text: str, window: int, stride: int):
        if window is None or stride is None or window <= 0 or stride <= 0:
            raise ValueError(f"window and stride must be positive: {window}, {stride}")
        toks = [t for t in (text or "").lower().strip().split() if t]
        n_chunks = 1 + math.ceil(max(len(toks) - window, 0) / stride)
        for i in range(n_chunks):
            piece = toks[i * stride : i * stride + window]
            yield i, n_chunks, " ".join(piece), len(piece)


def register_udtfs(spark: SparkSession) -> None:
    """Register the engine's UDTFs for SQL lateral joins::

        SELECT d.doc_id, c.*
        FROM documents d, LATERAL chunk_documents_udtf(d.text, 32, 24) c
    """
    spark.udtf.register("chunk_documents_udtf", ChunkDocumentsUDTF)


def token_count_pandas_udf():
    """Scalar Arrow-batched pandas UDF twin of
    ``functions.text.token_count`` — completes the Python extension
    surface set (scalar pandas_udf / grouped applyInPandasWithState /
    mapInPandas / UDTF), with the same engine stance as the UDTF above:
    the native Column expression is the production path; this is the
    template for scalar logic that genuinely needs a Python library.
    Built lazily (the decorator needs an active session)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def _token_count(s: pd.Series) -> pd.Series:
        # Mirror the native expression EXACTLY. The native path splits
        # on Java regex \s+ — ASCII whitespace only ([ \t\n\x0B\f\r]) —
        # while pandas' bare .str.split() splits on UNICODE whitespace,
        # so the two twins disagreed on NBSP-bearing web text. Counting
        # runs of non-ASCII-whitespace matches the native tokenization
        # (empty-token filtering included) without needing trim/lower.
        n = s.fillna("").str.count(r"[^ \t\n\x0B\f\r]+")
        # NULL in, NULL out — token_count guards NULLs itself since r12
        # (the legacy sizeOfNull -1 never leaks out of it), so the twin
        # mirrors that conf-independent contract.
        return n.where(~s.isna(), other=pd.NA).astype("Int32")

    return _token_count
