"""Source-format coverage: the engine's tables are parquet, but a user
switching from the reference (or landing raw crawl output) arrives with
JSONL and CSV.  These tests pin that the same DataFrame round-trips
losslessly through each format with an EXPLICIT schema (schema inference
is nondeterministic under partitioning and banned in the loaders), and
that a partitioned parquet layout prunes at the scan.

Reference parity note: the reference's only 'format' is the Redis hash +
JSON-string payload (sse.py:148-152); JSON lines is therefore the closest
on-disk twin of its native record shape.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from reddit_sse_stream_spark.sources.tables import load_table


def _sorted_rows(df, key):
    return [tuple(r) for r in df.orderBy(key).collect()]


def test_documents_jsonl_roundtrip(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "docs_jsonl")
    docs.write.mode("overwrite").json(path)
    back = spark.read.schema(docs.schema).json(path)
    assert back.schema == docs.schema
    assert _sorted_rows(back, "doc_id") == _sorted_rows(docs, "doc_id")


def test_documents_csv_roundtrip_with_quoting(spark, sf_dir, tmp_path):
    # text columns exercise the quoting path (multiline/comma payloads must
    # survive); escape explicitly, never rely on inference
    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "docs_csv")
    docs.write.mode("overwrite").option("header", True).option("quoteAll", True).option(
        "escape", '"'
    ).csv(path)
    back = (
        spark.read.schema(docs.schema)
        .option("header", True)
        .option("quote", '"')
        .option("escape", '"')
        .option("multiLine", True)
        .csv(path)
    )
    assert _sorted_rows(back, "doc_id") == _sorted_rows(docs, "doc_id")


def test_events_partitioned_write_prunes_scan(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "events_by_type")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(path)
    back = spark.read.parquet(path)
    one = back.filter(F.col("event_type") == "click")
    plan = one._jdf.queryExecution().executedPlan().toString()
    # partition pruning must reach the scan: the partition filter appears in
    # PartitionFilters, and the pruned read returns exactly the slice
    assert "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters")[1][:200]
    assert one.count() == ev.filter(F.col("event_type") == "click").count()
    # round-trip equality modulo the partition column becoming the last col
    a = sorted(tuple(r) for r in back.select(*ev.columns).collect())
    b = sorted(tuple(r) for r in ev.collect())
    assert a == b


def test_documents_orc_roundtrip(spark, sf_dir, tmp_path):
    """ORC is the other columnar format Spark ships natively (warehouse
    migrations land with it); the same explicit-schema rule applies and
    values must round-trip bit-for-bit, including the full text column."""
    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "docs_orc")
    docs.write.orc(path)
    back = spark.read.schema(docs.schema).orc(path)
    assert back.schema == docs.schema
    assert _sorted_rows(back, "doc_id") == _sorted_rows(docs, "doc_id")


def test_embeddings_array_column_survives_orc(spark, sf_dir, tmp_path):
    """array<float> embedding columns are the loss-prone case (ORC list
    encoding): assert exact float equality, not approximate."""
    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "emb_orc")
    emb.write.orc(path)
    back = spark.read.schema(emb.schema).orc(path)
    assert _sorted_rows(back, "vec_id") == _sorted_rows(emb, "vec_id")
