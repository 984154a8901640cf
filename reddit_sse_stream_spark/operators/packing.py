"""Sequence packing for training-data pipelines: concatenate documents in a
deterministic order and chunk the token stream into fixed-budget packs
(GPT-style pretraining packing — a doc belongs to the pack where its first
token lands).

Scale shape: packing is per ``group_col`` shard (source/file/partition), so
the running-sum window partitions by group — NO global orderBy, which would
funnel 100 TB through one task. One shuffle on the group key; everything
else is codegen window arithmetic on integers (exact in every engine).

Within a shard the order is (doc_id) — stable and reproducible, so the same
input always yields the same packs (required for resumable training runs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from . import text


def pack_sequences(
    docs: DataFrame,
    budget: int = 512,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assign every document a ``pack_id`` within its group.

    Output: (id, group, n_tokens, start_offset, pack_id) where
    ``start_offset`` is the doc's first-token position in the group's
    concatenated stream and ``pack_id = floor(start_offset / budget)``.
    """
    toks = docs.select(
        id_col,
        group_col,
        text.token_count(text_col).cast("bigint").alias("n_tokens"),
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("start_offset")
    return toks.select(
        id_col,
        group_col,
        "n_tokens",
        start,
    ).withColumn(
        "pack_id", F.floor(F.col("start_offset") / F.lit(float(budget))).cast("bigint")
    )
