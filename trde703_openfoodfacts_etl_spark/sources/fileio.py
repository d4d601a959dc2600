"""Catalog/manifest I/O seam: every driver-side filesystem operation the
lake needs, behind one small interface.

The lake's data files are read and written by Spark executors through
whatever Hadoop FileSystem the path scheme resolves to — that part is
already object-store-ready. What is NOT automatically portable is the
driver-side catalog work: listing snapshots, reading/CAS-writing manifest
JSON, collecting footer stats for freshly written files, and vacuuming
orphans. This module isolates exactly those calls so a real deployment can
swap in an object-store or catalog-service implementation without touching
the engine:

| method                 | local impl              | S3/GCS/catalog mapping               |
|------------------------|-------------------------|--------------------------------------|
| ``list_names``         | ``os.listdir``          | ListObjectsV2 under prefix           |
| ``read_json``          | ``open`` + ``json``     | GET object                           |
| ``write_json_if_absent``| tmp + fsync + ``os.link`` (EEXIST = lost CAS) | conditional PUT (``If-None-Match: *`` / GCS ``ifGenerationMatch=0``) or catalog CAS |
| ``parquet_stats``      | ``pq.read_metadata`` + ``os.path.getsize`` | same via pyarrow's fsspec, or trust the committer's manifest |
| ``walk_files``         | ``os.walk``             | paginated ListObjectsV2              |
| ``remove``             | ``os.remove``           | DELETE object                        |
| ``makedirs``           | ``os.makedirs``         | no-op (object stores have no dirs)   |

Single-writer-per-stream is NOT assumed: correctness of concurrent commits
rests only on ``write_json_if_absent`` being a true compare-and-swap, which
every listed backend provides.
"""

from __future__ import annotations

import json
import os


class LocalManifestIO:
    """The local-filesystem implementation (and the interface definition —
    duck-typed; implement these methods for another backend)."""

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def list_names(self, dir_path: str) -> list[str]:
        """Names (not paths) under dir_path; empty if it doesn't exist."""
        if not os.path.isdir(dir_path):
            return []
        return os.listdir(dir_path)

    def read_json(self, path: str) -> dict:
        with open(path) as f:
            return json.load(f)

    def write_json_if_absent(self, path: str, obj: dict) -> None:
        """Atomic create-if-absent (the commit CAS). Raises
        ``FileExistsError`` if ``path`` already exists — the caller lost
        the race. ``os.link`` (unlike ``rename``) fails with EEXIST, so two
        writers racing to commit the same snapshot id cannot silently
        last-writer-win; readers only ever see a fully written manifest
        (the temp file is fsync'd before linking)."""
        tmp = path + f".tmp.{os.getpid()}.{id(obj)}"
        with open(tmp, "w") as f:
            json.dump(obj, f)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, path)
        finally:
            # missing_ok: an orphan-sweeper (vacuum) may have raced us on a
            # long-stalled temp; its absence must not shadow the link result
            import contextlib

            with contextlib.suppress(FileNotFoundError):
                os.unlink(tmp)

    def parquet_stats(self, path: str) -> tuple[int, int]:
        """(num_rows, file_bytes) from the parquet footer."""
        import pyarrow.parquet as pq

        return pq.read_metadata(path).num_rows, os.path.getsize(path)

    def walk_files(self, root: str) -> list[str]:
        out = []
        for dirpath, _, files in os.walk(root):
            for fn in files:
                out.append(os.path.join(dirpath, fn))
        return out

    def remove(self, path: str) -> None:
        os.remove(path)

    def mtime(self, path: str) -> float:
        """Last-modified unix time (object store: LastModified metadata).
        Used by vacuum's orphan-commit-temp sweep."""
        return os.path.getmtime(path)

    def is_commit_temp(self, name: str) -> bool:
        """True if ``name`` (a bare name from ``list_names``) is this
        backend's commit-temp litter — the ``write_json_if_absent`` temp a
        writer that died pre-link leaves behind. The naming convention is
        private to the backend, so vacuum's orphan sweep asks the seam
        instead of hardcoding it; a backend whose conditional-PUT leaves no
        litter returns False unconditionally."""
        return ".json.tmp." in name

    def remove_tree(self, path: str) -> None:
        """Recursive delete (used only for epoch dirs that ended up empty —
        an object store has no dirs, so the non-local impl is a prefix
        delete of whatever marker objects the committer left)."""
        import shutil

        shutil.rmtree(path, ignore_errors=True)
