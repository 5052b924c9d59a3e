"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference log-analytics service
(im-prafful/logstream-processing-service).

Layout
------
- ``session``    : SparkSession factory tuned for the target scale.
- ``sources``    : table loaders / sinks (parquet, CSV staging, JDBC-gated).
- ``functions``  : scalar/text/vector expression helpers (dual-dialect where
                   a DuckDB oracle needs the same arithmetic).
- ``operators``  : relational + dataflow operators (filters, aggs, windows,
                   joins, upserts, dedup, similarity, text analysis).
- ``ml``         : embedding featurizer, clustering, anomaly scoring,
                   clustering-quality metrics.
- ``streaming``  : Structured Streaming shell over the same batch transforms.
- ``plans``      : plan-inspection helpers (pushdown / broadcast assertions).

Every operator is a pure ``DataFrame -> DataFrame`` transform so the batch
path is oracle-checkable; streaming wraps the identical transforms in
``readStream`` / ``foreachBatch``.
"""

__version__ = "0.1.0"
