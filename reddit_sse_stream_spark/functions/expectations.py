"""Data-quality expectation checks over a DataFrame — the admission gate a
training-data pipeline runs before a corpus snapshot is accepted
(Great-Expectations-style, but expressed as one aggregate plan).

Each rule is a boolean Column ("row passes"); the report is ONE pass over
the data producing per-rule violation counts and rates — never one job per
rule (at 100 TB, N separate validation scans would dominate the pipeline).
All rules evaluate inside the same whole-stage-codegen aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def expectation_report(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """(rule, n_rows, n_violations, violation_rate) — one aggregate job.

    ``rules`` maps rule name -> boolean Column that is True when the row
    PASSES.  Null rule results count as violations (an unevaluable
    expectation is a failed expectation).
    """
    if not rules:
        raise ValueError("expectation_report needs at least one rule")
    aggs = [F.count(F.lit(1)).alias("_n")]
    for name, col in rules.items():
        aggs.append(
            F.sum(F.when(~F.coalesce(col, F.lit(False)), 1).otherwise(0)).alias(
                f"_v_{name}"
            )
        )
    row = df.agg(*aggs)
    # unpivot the single aggregate row into (rule, counts) — stack() is
    # codegen-local on one row, no shuffle
    pairs = ", ".join(f"'{name}', _v_{name}" for name in rules)
    return row.selectExpr(
        f"stack({len(rules)}, {pairs}) AS (rule, n_violations)", "_n AS n_rows"
    ).select(
        "rule",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_violations").cast("long").alias("n_violations"),
        (
            F.floor(F.col("n_violations") * 10000.0 / F.greatest("n_rows", F.lit(1)))
            / 10000.0
        ).alias("violation_rate"),
    )
