"""Root-cause experiment for the r10 streaming-e2e drop (VERDICT r10
next #1): the 8-client e2e fell 21.5k -> 15.8k events/s on a faster host
with zero streaming-code change — a single-point measurement that could
be (a) host contention, (b) contamination from the 41-query headline
loop that precedes the e2e's slot in bench.py, or (c) a real regression
hiding behind "implausible".

Protocol: in ONE session,
  1. warm the streaming path once (JVM + Python DataSource + codegen);
  2. run the e2e N times FRESH (before any headline query has run);
  3. run a heavy-query contamination proxy (the 6 most expensive
     headline rows, one pass — checkpoint pressure, GC debris, page
     cache churn — the state the e2e inherits in bench.py's run order);
  4. run the e2e N more times POST-SUITE.

If post-suite rates sit systematically below fresh rates, the r10 drop
is bench-suite contamination and the e2e's slot must move/clean; if the
two distributions overlap, the drop was host noise and the median+spread
regime (which this experiment's N-run protocol becomes in bench.py)
absorbs it going forward.

Usage: python tools/e2e_variance.py [runs_per_arm]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from reddit_sse_stream_spark.plans.catalog import QUERIES
from reddit_sse_stream_spark.session import get_spark, release_local_checkpoints

HEAVY = (
    "knn_ivfpq_residual_topk",
    "text_suffix_ranks",
    "knn_ivfpq_topk",
    "knn_ivf_incremental_assign",
    "dedup_source_minhash_sampled",
    "dedup_semdedup_cells",
)


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("e2e_variance")

    # warm-up: one throwaway e2e at the smallest sf (JVM, Python
    # DataSource workers, HTTP server code paths all compile/heat)
    bench.streaming_e2e(spark, "/root/testdata/sf0.001")

    fresh = [bench.streaming_e2e(spark, sf_dir) for _ in range(runs)]
    for q in HEAVY:
        QUERIES[q].spark(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        release_local_checkpoints(spark)
    post = [bench.streaming_e2e(spark, sf_dir) for _ in range(runs)]

    def rates(arm):
        return sorted(r["streaming_e2e_events_per_sec"] for r in arm)

    out = {
        "runs_per_arm": runs,
        "fresh_rates_sorted": rates(fresh),
        "post_suite_rates_sorted": rates(post),
        "fresh_median": rates(fresh)[runs // 2],
        "post_median": rates(post)[runs // 2],
        "fresh_detail": fresh,
        "post_detail": post,
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
