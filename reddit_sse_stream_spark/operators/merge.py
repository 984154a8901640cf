"""M1/M2 — two-stream interleave + per-batch event-time sort.

The reference appends comments and submissions into one ``feed`` list and
sorts by ``created_utc`` per poll batch (/root/reference/sse.py:145,181,224,
228-229). Its sort key is a *string* epoch (lexicographic == numeric for
equal-width epochs until 2286); we sort on the BIGINT epoch, with ``id`` as
a deterministic tiebreak (Python's stable sort preserved arrival order —
comments before submissions at equal timestamps; our union preserves the
same rc-then-rs construction order only per-partition, so the explicit
tiebreak keeps output deterministic under any partitioning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def interleave(rc: DataFrame, rs: DataFrame) -> DataFrame:
    """M1 — union by name; missing columns (domain/over_18/is_self on rc)
    become NULLs, exactly like the reference's ragged tuples."""
    return rc.unionByName(rs, allowMissingColumns=True)


def event_time_sort(batch: DataFrame) -> DataFrame:
    """M2 — per-batch sort. On a streaming DF this is only legal inside
    ``foreachBatch`` (global orderBy is undefined on unbounded input), which
    is exactly the reference's per-poll-batch semantics."""
    return batch.orderBy("created_utc", "id")
