"""reddit_sse_stream_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of pushshift/reddit_sse_stream.

The reference (``/root/reference/sse.py``) is a single-file Flask+Redis SSE
streamer whose "queries" are per-connection URL params. This package
re-expresses that surface Spark-first:

- the filter/projection algebra (``sse.py:154-237``) becomes a compiled
  ``QuerySpec -> pyspark.sql.Column`` (see :mod:`reddit_sse_stream_spark.spec`),
- the two id-ordered streams (``sse.py:88-102``) become DataFrames / a custom
  Structured Streaming source (:mod:`reddit_sse_stream_spark.streaming.source`),
- the SSE sink (``sse.py:239-241``) becomes ``foreachBatch`` framing
  (:mod:`reddit_sse_stream_spark.streaming.sink`),
- everything the reference lacks (joins, window functions, grouping sets,
  dedup, similarity search, text analysis) is exposed via the query catalog
  (:mod:`reddit_sse_stream_spark.plans.catalog`).
"""

__version__ = "0.1.0"
