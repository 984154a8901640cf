"""Two-arm fresh/post-suite variance adjudication for a HEADLINE query —
the harness that settled the r10 streaming-e2e drop and the r11 residual
IVF-PQ spread, generalized to any catalog row (VERDICT r11 next #3:
``knn_ivf_incremental_assign`` showed the widest same-code spread of the
r11 artifact, 3.653-9.112 s over 7 runs, and had no adjudication).

Protocol, one session:
  1. warm the query once at sf0.001 (JVM, codegen, Arrow workers);
  2. run it N times FRESH at the target sf (only its own
     release_local_checkpoints between runs — the state bench.py's
     early slots see);
  3. run the heavy-row contamination proxy once (checkpoint pressure,
     GC debris, page-cache churn — the state a LATE bench slot
     inherits);
  4. run it N more times POST-SUITE.

Non-overlapping arms => slot contamination (fix = run order / cleanup);
overlapping arms => host noise (fix = median-of-MAX_RUNS, already in
bench.py via HIGH_VARIANCE).

Usage: python tools/query_variance.py [query] [runs_per_arm]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reddit_sse_stream_spark.plans.catalog import QUERIES
from reddit_sse_stream_spark.session import get_spark, release_local_checkpoints

HEAVY = (
    "knn_ivfpq_residual_topk",
    "text_suffix_ranks",
    "knn_ivfpq_topk",
    "dedup_source_minhash_sampled",
    "dedup_semdedup_cells",
    "dedup_minhash_lsh",
)


def timed(spark, name: str, sf_dir: str) -> float:
    start = time.perf_counter()
    QUERIES[name].spark(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    dt = time.perf_counter() - start
    release_local_checkpoints(spark)
    return round(dt, 3)


def main() -> None:
    name = sys.argv[1] if len(sys.argv) > 1 else "knn_ivf_incremental_assign"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("query_variance")

    timed(spark, name, "/root/testdata/sf0.001")  # warm-up, discarded

    fresh = [timed(spark, name, sf_dir) for _ in range(runs)]
    for q in HEAVY:
        if q != name:
            timed(spark, q, sf_dir)
    post = [timed(spark, name, sf_dir) for _ in range(runs)]

    fr, po = sorted(fresh), sorted(post)
    out = {
        "query": name,
        "runs_per_arm": runs,
        "fresh_sorted": fr,
        "post_suite_sorted": po,
        "fresh_median": fr[runs // 2],
        "post_median": po[runs // 2],
        "arms_overlap": fr[-1] >= po[0] and po[-1] >= fr[0],
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
