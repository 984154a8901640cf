"""Peak-memory flatness check for the blocked-GEMM rows (VERDICT r10
next #4 tail): the 100 TB claim is that the Arrow/numpy kernels behind
``dedup_semdedup_cells``, ``dedup_embedding_cosine_lsh`` and
``embed_hard_negatives`` hold LIVE memory bounded by the GEMM block
(~16 MB), not by cell/bucket size — so the pyspark-worker peak RSS must
stay ~flat as the embeddings table grows 4x (sf0.01 -> sf0.1).

Run once per scale in a FRESH process (worker RSS ratchets within a
session, so sharing one JVM would launder the small scale's peak into
the large one's):

    python tools/peakmem_gemm.py /root/testdata/sf0.01 [row]
    python tools/peakmem_gemm.py /root/testdata/sf0.1 [row]

With ``row`` given, only that catalog row runs — one row per process
keeps the worker-RSS ratchet of earlier rows out of the measurement.
The per-kernel claim reads off ``pyworker max`` (largest single worker);
the summed series additionally grows with concurrent task count.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import PeakRssSampler
from reddit_sse_stream_spark.plans.catalog import QUERIES
from reddit_sse_stream_spark.session import get_spark, release_local_checkpoints

ROWS = (
    "dedup_semdedup_cells",
    "dedup_embedding_cosine_lsh",
    "embed_hard_negatives",
)


def main() -> None:
    sf_dir = sys.argv[1]
    rows = (sys.argv[2],) if len(sys.argv) > 2 else ROWS
    spark = get_spark("peakmem_gemm")
    sampler = PeakRssSampler().start()
    for name in rows:
        # warm pass so the worker pool exists before the measured run
        QUERIES[name].spark(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        release_local_checkpoints(spark)
        sampler.reset()
        QUERIES[name].spark(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        release_local_checkpoints(spark)
        p = sampler.peaks_mb()
        print(
            f"{name} @ {sf_dir}: pyworker max "
            f"{p['peak_rss_pyworker_max_mb']} MB, pyworkers sum "
            f"{p['peak_rss_pyworkers_mb']} MB, jvm {p['peak_rss_jvm_mb']} MB"
        )
    sampler.stop()


if __name__ == "__main__":
    main()
