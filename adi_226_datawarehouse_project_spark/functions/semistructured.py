"""Semi-structured column handling with Spark 4's VARIANT type — the
modern upgrade of the reference's JSON-at-the-reader-level story
(SURVEY §1.2: MongoDB docs / SODA payloads land as inferred columns;
anything ragged gets stringly-typed). VARIANT stores the parsed,
BINARY-encoded document in a single column:

- ingestion needs NO up-front schema (unlike ``from_json``), so a
  producer adding fields never breaks the pipeline;
- field access (``variant_get``) evaluates against the binary
  encoding — no per-query string re-parse, and paths that don't exist
  are NULL (``try_variant_get``) instead of schema errors;
- parquet round-trips the variant natively.

`shred_variant` is the warehouse end of the pattern: project the hot
fields into real typed columns ONCE at load (so scans of those fields
get pushdown/stats like any column) while keeping the full variant for
the long tail of rarely-queried keys — the "shredding" layout
Snowflake/BigQuery semi-structured guides describe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def to_variant(col: Column | str) -> Column:
    """Parse a JSON string column into a VARIANT (schema-free)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.parse_json(c)


def variant_field(v: Column | str, path: str, dtype: str) -> Column:
    """Typed field extraction: ``variant_get(v, '$.a.b[0]', dtype)``;
    missing paths / uncastable values yield NULL (try_ semantics —
    dirty-input-safe, the engine's P15 policy)."""
    name = v if isinstance(v, str) else None
    if name is None:
        raise ValueError("variant_field takes the variant COLUMN NAME (expr paths)")
    return F.expr(f"try_variant_get({name}, '{path}', '{dtype}')")


def shred_variant(
    df: DataFrame,
    variant_col: str,
    fields: dict[str, tuple[str, str]],
    keep_variant: bool = True,
) -> DataFrame:
    """Shred hot fields out of a variant column into typed columns:
    ``fields = {out_name: (path, dtype)}``. The variant itself stays
    (``keep_variant``) for the un-shredded long tail."""
    out = df
    for out_name, (path, dtype) in fields.items():
        out = out.withColumn(out_name, variant_field(variant_col, path, dtype))
    return out if keep_variant else out.drop(variant_col)
