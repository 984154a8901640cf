"""File-format sources/sinks beyond parquet: JSON, CSV, ORC, partitioned
parquet — schema-preserving roundtrips (SURVEY.md §2.8 source surface).

Always read with an explicit schema (never ``inferSchema`` — a second full
scan at 100 TB); always write with explicit mode. Delta/Iceberg/Hudi need
jars absent from this image — constructors raise cleanly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_FORMATS = ("parquet", "json", "csv", "orc")


def write_table(df: DataFrame, path: str, fmt: str = "parquet", partition_by: list[str] | None = None) -> None:
    if fmt not in _FORMATS:
        raise ValueError(f"format {fmt!r} not supported (have {_FORMATS}; lakehouse formats need jars)")
    writer = df.write.mode("overwrite").format(fmt)
    if fmt in ("csv", "json"):
        # default text timestampFormat truncates to millis; keep micros
        writer = writer.option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
    if fmt == "csv":
        writer = writer.option("header", "true")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def read_table(spark: SparkSession, path: str, schema: StructType, fmt: str = "parquet") -> DataFrame:
    if fmt not in _FORMATS:
        raise ValueError(f"format {fmt!r} not supported")
    reader = spark.read.schema(schema).format(fmt)
    if fmt in ("csv", "json"):
        reader = reader.option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
    if fmt == "csv":
        reader = reader.option("header", "true")
    return reader.load(path)


def write_layout(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    cluster_by: list[str] | None = None,
    max_records_per_file: int = 5_000_000,
) -> None:
    """The 100 TB output layout: hive-partition directories on the coarse
    filter columns (partition pruning skips whole directories at planning
    time), rows clustered by ``cluster_by`` within each file (parquet
    row-group min/max stats turn point/range predicates into row-group
    skips), file size bounded so a single task never writes an unsplittable
    monster file.

    ``sortWithinPartitions`` is a partition-local sort — NO extra shuffle
    beyond the write's own distribution.
    """
    out = df
    if cluster_by:
        out = out.sortWithinPartitions(*cluster_by)
    (
        out.write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*partition_by)
        .parquet(path)
    )
