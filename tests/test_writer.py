"""SSE file sink (Python Data Source writer API): batch + streaming writes,
commit/abort protocol, byte-parity with the live broadcaster's framing."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from reddit_sse_stream_spark.sources.feed import feed_df
from reddit_sse_stream_spark.streaming.sink import format_frame
from reddit_sse_stream_spark.streaming.source import read_feed_stream
from reddit_sse_stream_spark.streaming.writer import SSEFilesDataSource

EVENTS = "/root/testdata/sf0.001/events.parquet"


def _read_frames(out_dir: str, suffix: str = ".sse") -> str:
    parts = sorted(
        p for p in os.listdir(out_dir) if p.endswith(suffix)
    )
    return "".join(
        open(os.path.join(out_dir, p), encoding="utf-8").read() for p in parts
    )


def test_batch_write_sse_files_byte_parity(spark, sf_dir, tmp_path):
    spark.dataSource.register(SSEFilesDataSource)
    out = str(tmp_path / "sse_out")
    fd = (
        feed_df(spark, sf_dir)
        .filter(F.col("id") < 50)
        .select("id", "event", "json")
        .coalesce(1)
        .sortWithinPartitions("id")
    )
    fd.write.format("sse_files").option("path", out).mode("append").save()

    rows = fd.collect()
    want = "".join(format_frame(r["id"], r["event"], r["json"]) for r in rows)
    assert _read_frames(out) == want
    # no temp residue after a successful commit
    assert not [p for p in os.listdir(out) if p.startswith(".tmp-")]


def test_batch_write_requires_path(spark, sf_dir):
    spark.dataSource.register(SSEFilesDataSource)
    fd = feed_df(spark, sf_dir).limit(1).select("id", "event", "json")
    with pytest.raises(Exception, match="path"):
        fd.write.format("sse_files").mode("append").save()


def test_stream_write_sse_files_batch_addressed(spark, tmp_path):
    """Streaming writes land batch-addressed files whose concatenation
    equals the full replayed feed — and replaying a batch can only
    overwrite its own files (idempotent naming), never append."""
    spark.dataSource.register(SSEFilesDataSource)
    out = str(tmp_path / "sse_stream_out")
    ckpt = str(tmp_path / "ckpt")
    rc = read_feed_stream(
        spark, EVENTS, "rc", backfill=100000, max_ids_per_batch=300
    ).select("id", "event", "json")
    q = (
        rc.writeStream.format("sse_files")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()

    names = sorted(p for p in os.listdir(out) if p.endswith(".sse"))
    assert names and all(n.startswith("batch-") for n in names)
    # multiple micro-batches: the 300-id cap needs several polls for 1000 ids
    batches = {n.split("-part-")[0] for n in names}
    assert len(batches) > 1
    ids_in_files = [
        int(ln.split("id: ", 1)[1])
        for ln in _read_frames(out).splitlines()
        if ln.startswith("id: ")
    ]
    from reddit_sse_stream_spark.sources.tables import load_table  # noqa: F401

    want_ids = [
        r["id"]
        for r in feed_df(spark, "/root/testdata/sf0.001")
        .filter(F.col("event") == "rc")
        .collect()
    ]
    assert sorted(ids_in_files) == sorted(want_ids)
    assert not [p for p in os.listdir(out) if p.startswith(".tmp-")]


def test_streaming_pipeline_filter_dedup_to_sse_files(spark, sf_dir, tmp_path):
    """End-to-end streaming corpus shape: feed source -> subreddit filter ->
    streaming dedup on a content fingerprint -> durable SSE file sink.
    Must equal the batch twin (filter + keep-first-id per fingerprint)."""
    from pyspark.sql import Window

    spark.dataSource.register(SSEFilesDataSource)
    out = str(tmp_path / "pipe_out")
    ckpt = str(tmp_path / "pipe_ckpt")

    rc = read_feed_stream(
        spark, EVENTS, "rc", backfill=100000, max_ids_per_batch=400
    )
    staged = (
        rc.filter(F.col("subreddit") == "click")
        .withColumn("fp", F.substring(F.md5("json"), 1, 16))
        .dropDuplicates(["fp"])
        .select("id", "event", "json")
    )
    q = (
        staged.writeStream.format("sse_files")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got_ids = sorted(
        int(ln.split("id: ", 1)[1])
        for ln in _read_frames(out).splitlines()
        if ln.startswith("id: ")
    )
    w = Window.partitionBy("fp").orderBy("id")
    want_ids = sorted(
        r["id"]
        for r in feed_df(spark, sf_dir)
        .filter((F.col("event") == "rc") & (F.col("subreddit") == "click"))
        .withColumn("fp", F.substring(F.md5("json"), 1, 16))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .collect()
    )
    assert got_ids == want_ids and len(got_ids) > 0


def test_stream_writer_restart_is_idempotent(spark, tmp_path):
    """Restarting from a completed checkpoint must not re-emit: the file
    set (names AND bytes) is unchanged after a second run over the same
    source range."""
    spark.dataSource.register(SSEFilesDataSource)
    out = str(tmp_path / "restart_out")
    ckpt = str(tmp_path / "restart_ckpt")

    def run_once():
        rc = read_feed_stream(
            spark, EVENTS, "rc", backfill=100000, max_ids_per_batch=400
        ).select("id", "event", "json")
        q = (
            rc.writeStream.format("sse_files")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )
        q.processAllAvailable()
        q.stop()

    run_once()
    first = {
        p: open(os.path.join(out, p), encoding="utf-8").read()
        for p in os.listdir(out)
        if p.endswith(".sse")
    }
    run_once()
    second = {
        p: open(os.path.join(out, p), encoding="utf-8").read()
        for p in os.listdir(out)
        if p.endswith(".sse")
    }
    assert first == second and len(first) > 0


def test_stream_commit_sweeps_stale_replay_files_and_tmps(tmp_path):
    """A replayed batch (failure after commit, before the offset log
    recorded it) can run with fewer partitions than the first attempt.
    Commit must remove the first attempt's higher-pid files for that batch
    — otherwise they survive as duplicate frames — and sweep leftover
    .tmp files from losing task attempts."""
    import reddit_sse_stream_spark.streaming.writer as W

    out = tmp_path / "replay_out"
    out.mkdir()
    # first attempt's leftovers: 3 partitions + a losing attempt's tmp
    stale_keep = out / "batch-0000000001-part-00000.sse"  # will be replaced
    stale_extra = out / "batch-0000000001-part-00002.sse"  # must be removed
    other_batch = out / "batch-0000000000-part-00007.sse"  # other batch: kept
    tmp_orphan = out / ".tmp-00009-deadbeef"
    for f in (stale_keep, stale_extra, other_batch, tmp_orphan):
        f.write_text("stale\n")

    # current (replay) attempt: only 2 partitions
    w = W.SSEFilesStreamWriter({"path": str(out)})
    msgs = []
    for pid in (0, 1):
        t = out / f".tmp-{pid:05d}-attempt2"
        t.write_text(f"fresh-{pid}\n")
        msgs.append(W._Committed(str(t), pid, 1))
    w.commit(msgs, batchId=1)

    names = sorted(p.name for p in out.iterdir())
    assert names == [
        "batch-0000000000-part-00007.sse",
        "batch-0000000001-part-00000.sse",
        "batch-0000000001-part-00001.sse",
    ]
    assert (out / "batch-0000000001-part-00000.sse").read_text() == "fresh-0\n"


class _FakeFS:
    """In-memory ArchiveFS: proves the commit protocol touches the
    filesystem ONLY through the seam (an object-store implementation is a
    drop-in)."""

    def __init__(self):
        import io

        self.files: dict[str, str] = {}
        self._io = io

    def makedirs(self, path):
        pass

    def open_write(self, path):
        io, files = self._io, self.files

        class _W(io.StringIO):
            def __exit__(s, *a):
                files[path] = s.getvalue()
                return False

        return _W()

    def open_read(self, path):
        return self._io.StringIO(self.files[path])

    def replace(self, src, dst):
        self.files[dst] = self.files.pop(src)

    def remove(self, path):
        del self.files[path]

    def exists(self, path):
        return path in self.files

    def isdir(self, path):
        return True

    def listdir(self, path):
        import os as _os

        return [_os.path.basename(k) for k in self.files]

    def join(self, *parts):
        import os as _os

        return _os.path.join(*parts)


def test_stream_commit_protocol_runs_entirely_through_fs_seam():
    """Replay cleanup + finalize + tmp sweep against a pure in-memory FS:
    no os call escapes the ArchiveFS interface, so an S3/GCS ArchiveFS is
    a drop-in (VERDICT r03 #8)."""
    import reddit_sse_stream_spark.streaming.writer as W

    fs = _FakeFS()
    out = "/archive"
    fs.files["/archive/batch-0000000001-part-00002.sse"] = "stale\n"
    fs.files["/archive/.tmp-00009-orphan"] = "orphan\n"
    w = W.SSEFilesStreamWriter({"path": out}, fs=fs)
    for pid in (0, 1):
        fs.files[f"/archive/.tmp-{pid:05d}-a2"] = f"fresh-{pid}\n"
    msgs = [W._Committed(f"/archive/.tmp-{pid:05d}-a2", pid, 1) for pid in (0, 1)]
    w.commit(msgs, batchId=1)
    assert sorted(fs.files) == [
        "/archive/batch-0000000001-part-00000.sse",
        "/archive/batch-0000000001-part-00001.sse",
    ]
    assert fs.files["/archive/batch-0000000001-part-00000.sse"] == "fresh-0\n"


def test_cloud_scheme_paths_are_rejected_with_pointer():
    from reddit_sse_stream_spark.streaming.fsops import fs_for_path

    import pytest as _pytest

    with _pytest.raises(NotImplementedError, match="rename-free"):
        fs_for_path("s3://bucket/archive")
    assert fs_for_path("/local/path").__class__.__name__ == "LocalFS"


def test_sse_files_roundtrip_write_then_read(spark, sf_dir, tmp_path):
    """write -> read round-trip: the archive reader reproduces the exact
    (id, event, json) rows that were framed, one partition per file."""
    spark.dataSource.register(SSEFilesDataSource)
    out = str(tmp_path / "rt")
    fd = (
        feed_df(spark, sf_dir)
        .filter(F.col("id") < 120)
        .select("id", "event", "json")
    )
    fd.write.format("sse_files").option("path", out).mode("append").save()

    back = spark.read.format("sse_files").option("path", out).load()
    assert back.schema.simpleString() == "struct<id:bigint,event:string,json:string>"
    got = sorted(map(tuple, back.collect()))
    want = sorted(map(tuple, fd.collect()))
    assert got == want
    assert back.rdd.getNumPartitions() == len(
        [p for p in os.listdir(out) if p.endswith(".sse")]
    )
