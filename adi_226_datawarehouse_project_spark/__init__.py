"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference NYC-311 x Airbnb star-schema warehouse
(Sbnikitha/ADI-226-Datawarehouse-project), rebuilt Spark-first.

Layers
------
``sources``    readers/writers + a catalog that registers the driver's
               parquet fixtures as temp views.
``functions``  scalar/column functions: geohash encoding, cleaning
               (multi-format timestamps, tz, normalization, currency
               try-cast), date-part suite, text analysis.
``operators``  composite dataflow operators: incremental left-anti
               upsert, dedup family (exact/minhash/simhash/ngram/
               embedding), similarity search.
``model``      star-schema builder (dims + facts from the synthetic
               raw fixtures), conformed dim_date.
``plans``      the golden analytical query suite (reference notebook
               queries re-targeted at the synthetic star schema) plus
               the operator-level differential query inventory.
``streaming``  Structured Streaming demo over the events table.
``multimodal`` binary-column plumbing (decode/feature-extract stubs).

Everything is declarative DataFrame/Spark SQL so Catalyst/AQE owns the
physical plan; Python UDFs appear only where semantics demand them and
then always as Arrow-vectorized pandas UDFs.
"""

__version__ = "0.1.0"
