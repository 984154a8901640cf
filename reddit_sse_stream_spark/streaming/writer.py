"""SSE-frame file sink on the Python Data Source writer API — the durable
twin of the in-memory broadcaster (``streaming/sink.py``).

The reference serves frames over a socket and loses them on disconnect
(/root/reference/sse.py:241-252 — the Response generator is the only copy).
This writer lands the same ``id:/event:/data:`` wire format in
per-partition ``.sse`` files instead, giving the feed a replayable archive:

- batch: ``df.write.format("sse_files").option("path", dir)
  .mode("append").save()`` (Python data sources require an explicit
  append/overwrite mode)
- streaming: ``df.writeStream.format("sse_files")...`` — exactly-once per
  micro-batch via batch-addressed final files: executors write to
  attempt-unique temp files, and ``commit(messages, batchId)`` renames them
  to ``batch-{batchId}-part-{pid}.sse``; a replayed batch re-renames onto
  the SAME final paths instead of appending duplicates — the idempotent
  contract Spark's own file sinks use.

Rows must carry the feed columns ``id``, ``event``, ``json``
(FEED_DDL, streaming/source.py) — the frame is
``format_frame(id, event, json)``, identical bytes to the live SSE socket.

Commit protocol: a failed/partial job leaves only ``*.tmp`` files (swept by
``abort``), never a visible partial output.  Scale shape: one file per
partition, frames assembled executor-side, no driver data movement.

Every filesystem touch goes through the :mod:`fsops` seam
(``ArchiveFS``): the commit protocol assumes POSIX atomic rename and
read-after-write listing — true on local/shared filesystems, NOT on
object stores; an S3/GCS archive drops in by implementing ArchiveFS with
a rename-free commit (see fsops.py docstring).
"""

from __future__ import annotations

import uuid
from collections.abc import Iterator
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

from reddit_sse_stream_spark.streaming.fsops import ArchiveFS, fs_for_path, iter_frames
from reddit_sse_stream_spark.streaming.sink import format_frame

#: schema served by the batch reader (the wire-format fields)
SSE_READ_DDL = "id long, event string, json string"


@dataclass
class _Committed(WriterCommitMessage):
    tmp_path: str
    partition_id: int
    n_rows: int


def _write_rows(fs: ArchiveFS, rows, tmp_path: str) -> int:
    n = 0
    with fs.open_write(tmp_path) as fh:
        for row in rows:
            fh.write(format_frame(row["id"], row["event"], row["json"]))
            n += 1
    return n


class _SSEFilesWriterBase:
    def __init__(self, options, fs: ArchiveFS | None = None):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("sse_files sink requires option 'path'")
        self.fs = fs if fs is not None else fs_for_path(self.path)

    def _write_tmp(self, iterator: Iterator) -> _Committed:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        self.fs.makedirs(self.path)
        # attempt-unique temp name: two attempts of the same task can never
        # collide; only the committed attempt's file gets renamed into place
        tmp = self.fs.join(self.path, f".tmp-{pid:05d}-{uuid.uuid4().hex}")
        n = _write_rows(self.fs, iterator, tmp)
        return _Committed(tmp, pid, n)

    def _finalize(self, messages, stem_fmt: str) -> None:
        self.fs.makedirs(self.path)
        for m in messages:
            if m is not None:
                final = self.fs.join(self.path, stem_fmt.format(pid=m.partition_id))
                self.fs.replace(m.tmp_path, final)

    def _abort(self, messages) -> None:
        for m in messages:
            if m is not None and self.fs.exists(m.tmp_path):
                self.fs.remove(m.tmp_path)


class SSEFilesBatchWriter(_SSEFilesWriterBase, DataSourceWriter):
    def write(self, iterator: Iterator) -> WriterCommitMessage:
        return self._write_tmp(iterator)

    def commit(self, messages) -> None:
        self._finalize(messages, "part-{pid:05d}.sse")

    def abort(self, messages) -> None:
        self._abort(messages)


class SSEFilesStreamWriter(_SSEFilesWriterBase, DataSourceStreamWriter):
    def write(self, iterator: Iterator) -> WriterCommitMessage:
        return self._write_tmp(iterator)

    def commit(self, messages, batchId: int) -> None:  # noqa: N803 (API name)
        """Exactly-once on replay: a batch replayed after a
        failure-after-commit may run with FEWER partitions than the first
        attempt — renaming onto batch-{id}-part-{pid} alone would leave the
        first attempt's higher-pid files in the archive as duplicate
        frames.  So before renaming, remove every existing file of THIS
        batch that the current attempt did not produce; afterwards sweep
        leftover .tmp files (losing task attempts are otherwise only
        cleaned on abort, never after a successful commit).  Microbatches
        of a streaming query commit serially, so no other attempt of any
        batch is writing this directory concurrently."""
        stem_fmt = f"batch-{batchId:010d}-part-{{pid:05d}}.sse"
        expected = {
            stem_fmt.format(pid=m.partition_id) for m in messages if m is not None
        }
        prefix = f"batch-{batchId:010d}-part-"
        if self.fs.isdir(self.path):
            for name in self.fs.listdir(self.path):
                if name.startswith(prefix) and name.endswith(".sse") and name not in expected:
                    self.fs.remove(self.fs.join(self.path, name))
        self._finalize(messages, stem_fmt)
        for name in self.fs.listdir(self.path):
            if name.startswith(".tmp-"):
                self.fs.remove(self.fs.join(self.path, name))

    def abort(self, messages, batchId: int) -> None:  # noqa: N803
        self._abort(messages)


class _SSEFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class SSEFilesReader(DataSourceReader):
    """Batch reader: each ``.sse`` file is one InputPartition (the archive
    is produced one-file-per-write-partition, so read parallelism mirrors
    write parallelism); frames parse back into (id, event, json) rows —
    the inverse of :func:`format_frame`, executor-side."""

    def __init__(self, options, fs: ArchiveFS | None = None):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("sse_files source requires option 'path'")
        self.fs = fs if fs is not None else fs_for_path(self.path)

    def partitions(self):
        return [
            _SSEFilePartition(self.fs.join(self.path, p))
            for p in sorted(self.fs.listdir(self.path))
            if p.endswith(".sse")
        ]

    def read(self, partition: _SSEFilePartition):
        yield from iter_frames(self.fs, partition.path)


class SSEFilesDataSource(DataSource):
    """``spark.dataSource.register(SSEFilesDataSource)``; then format
    ``sse_files`` works for ``df.write``, ``df.writeStream``, and
    ``spark.read`` (round-trip: archive frames, read them back as rows)."""

    @classmethod
    def name(cls) -> str:
        return "sse_files"

    def schema(self) -> str:
        return SSE_READ_DDL

    def reader(self, schema) -> SSEFilesReader:
        return SSEFilesReader(self.options)

    def writer(self, schema, overwrite: bool) -> SSEFilesBatchWriter:
        return SSEFilesBatchWriter(self.options)

    def streamWriter(self, schema, overwrite: bool) -> SSEFilesStreamWriter:
        return SSEFilesStreamWriter(self.options)
