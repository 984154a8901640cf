"""Filesystem seam for the SSE file archive (writer.py).

The sink's commit protocol does driver-side ``listdir`` + ``rename`` +
``remove`` (exactly-once replay cleanup, writer.py). On a shared/local
POSIX filesystem those are atomic and immediately consistent — the
sandbox and any NFS-backed cluster satisfy that. An OBJECT STORE does
not: S3/GCS have no atomic rename (copy+delete) and historically no
list-after-write consistency, so the same protocol needs a manifest- or
conditional-put-based implementation (the approach Spark's own cloud
committers take).

This module isolates every filesystem operation the archive touches
behind :class:`ArchiveFS`, so an object-store implementation is a
drop-in: implement the same nine methods (atomic ``replace`` being the
load-bearing one) and pass it to the writer/reader. :func:`fs_for_path`
is the dispatch point; only local paths are implemented here — cloud
schemes raise with a pointer to this docstring rather than pretending.
"""

from __future__ import annotations

import os
from collections.abc import Iterator


class ArchiveFS:
    """Interface: the exact set of filesystem ops writer.py/reader use.

    Contract notes for implementers:
    - ``replace(src, dst)`` must be atomic and overwrite ``dst`` (POSIX
      rename semantics) — the exactly-once replay story depends on it.
    - ``listdir`` must reflect completed ``replace``/``remove`` calls made
      by the SAME process (read-after-write consistency on one node).
    """

    def makedirs(self, path: str) -> None:
        raise NotImplementedError

    def open_write(self, path: str):
        raise NotImplementedError

    def open_read(self, path: str):
        raise NotImplementedError

    def replace(self, src: str, dst: str) -> None:
        raise NotImplementedError

    def remove(self, path: str) -> None:
        raise NotImplementedError

    def exists(self, path: str) -> bool:
        raise NotImplementedError

    def isdir(self, path: str) -> bool:
        raise NotImplementedError

    def listdir(self, path: str) -> list[str]:
        raise NotImplementedError

    def join(self, *parts: str) -> str:
        raise NotImplementedError


class LocalFS(ArchiveFS):
    """Local/shared-POSIX implementation — stateless, so it pickles to
    executors for free."""

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def open_write(self, path: str):
        return open(path, "w", encoding="utf-8")

    def open_read(self, path: str):
        return open(path, encoding="utf-8")

    def replace(self, src: str, dst: str) -> None:
        os.replace(src, dst)

    def remove(self, path: str) -> None:
        os.remove(path)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def isdir(self, path: str) -> bool:
        return os.path.isdir(path)

    def listdir(self, path: str) -> list[str]:
        return os.listdir(path)

    def join(self, *parts: str) -> str:
        return os.path.join(*parts)


_CLOUD_SCHEMES = ("s3://", "s3a://", "gs://", "abfs://", "abfss://", "wasbs://")


def fs_for_path(path: str) -> ArchiveFS:
    """Dispatch point for the archive filesystem.

    Local (and scheme-less shared-FS) paths get :class:`LocalFS`. Cloud
    schemes raise: an object-store archive needs a manifest-/conditional-
    put-based commit (no atomic rename there) — see the module docstring.
    """
    low = path.lower()
    for scheme in _CLOUD_SCHEMES:
        if low.startswith(scheme):
            raise NotImplementedError(
                f"object-store archive ({scheme}) needs a rename-free commit "
                "implementation of ArchiveFS — see streaming/fsops.py"
            )
    return LocalFS()


def iter_frames(fs: ArchiveFS, path: str) -> Iterator[tuple[int, str | None, str | None]]:
    """Parse one ``.sse`` file back into (id, event, data) tuples — the
    inverse of ``format_frame``, shared by the batch reader."""
    fields: dict[str, str] = {}
    with fs.open_read(path) as fh:
        for raw in fh:
            line = raw.rstrip("\n")
            if line == "":
                if fields:
                    yield (
                        int(fields["id"]),
                        fields.get("event"),
                        fields.get("data"),
                    )
                fields = {}
            elif ":" in line:
                k, v = line.split(":", 1)
                fields[k.strip()] = v.lstrip()
