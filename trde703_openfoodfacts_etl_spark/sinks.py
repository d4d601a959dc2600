"""Pluggable batch sinks: where a CDC microbatch lands after the merge.

The reference hardwires its gold write to a JDBC database
(etl/silver_to_gold.py:48-61 — MariaDB via spark.write.jdbc); this engine
keeps the lake MERGE as the default but exposes the same seam as an
interface, so a deployment can fan a batch out to the lake, an external
warehouse, a parquet export directory, or a console/debug sink without
touching the pipeline drivers.

Every sink takes the *transformed* batch DataFrame; idempotence contracts:

- :class:`LakeMergeSink` — exactly-once (manifest batch-id marker).
- :class:`ParquetDirSink` — idempotent per batch_id (one subdir per batch,
  overwrite semantics on redelivery).
- :class:`JdbcSink` — the reference's S4: append/overwrite via the Spark
  JDBC writer. At-least-once unless the target table has a key and the
  mode is merge-on-key (left to the database). Exercised end-to-end in
  tests against embedded Derby (Spark bundles its driver); other targets
  need their driver jar on the classpath or ``.save()`` fails loudly.
- :class:`ConsoleSink` — debug (reference S9).
"""

from __future__ import annotations

import os
from typing import Protocol

from .operators.merge import apply_batch
from .sources.lake import LakeTable


class Sink(Protocol):
    def write(self, batch_df, batch_id: int) -> dict:
        """Land one microbatch; returns sink metrics."""
        ...


class LakeMergeSink:
    """Default: LWW MERGE into the bucketed snapshot lake (exactly-once)."""

    def __init__(self, lake: LakeTable, stream_id: str = "default",
                 mode: str = "cow", files_per_bucket: int = 1):
        self.lake = lake
        self.stream_id = stream_id
        self.mode = mode
        self.files_per_bucket = files_per_bucket

    def write(self, batch_df, batch_id: int) -> dict:
        return apply_batch(
            self.lake, batch_df, batch_id, stream_id=self.stream_id,
            mode=self.mode, files_per_bucket=self.files_per_bucket,
        )


class ParquetDirSink:
    """Append-only parquet export, one directory per batch id — redelivery
    overwrites the same directory, so downstream readers see each batch at
    most once (the directory name is the idempotence token)."""

    def __init__(self, root: str):
        self.root = root

    def write(self, batch_df, batch_id: int) -> dict:
        out = os.path.join(self.root, f"batch_id={batch_id}")
        batch_df.write.mode("overwrite").parquet(out)
        return {"batch_id": batch_id, "path": out}


class JdbcSink:
    """Reference-parity JDBC sink (S4, etl/silver_to_gold.py:48-61).

    Builds the standard Spark JDBC writer; round-tripped in tests against
    embedded Derby (append mode + batchsize), so the endpoint is executed,
    not just planned. Against a driverless URL ``write`` raises whatever
    the JVM raises at connect time — never a silent no-op."""

    def __init__(self, url: str, table: str, mode: str = "append",
                 properties: dict[str, str] | None = None):
        self.url = url
        self.table = table
        self.mode = mode
        self.properties = properties or {}

    def writer(self, batch_df):
        w = (
            batch_df.write.format("jdbc")
            .option("url", self.url)
            .option("dbtable", self.table)
            .mode(self.mode)
        )
        for k, v in self.properties.items():
            w = w.option(k, v)
        return w

    def write(self, batch_df, batch_id: int) -> dict:
        self.writer(batch_df).save()
        return {"batch_id": batch_id, "table": self.table}


class ConsoleSink:
    """Debug sink (reference S9): show N rows, count the rest."""

    def __init__(self, num_rows: int = 20):
        self.num_rows = num_rows

    def write(self, batch_df, batch_id: int) -> dict:
        batch_df.show(self.num_rows, truncate=False)
        return {"batch_id": batch_id, "rows": batch_df.count()}


class FanoutSink:
    """Compose sinks: one batch lands in every target, in order. The lake
    sink should come first so its exactly-once marker gates reprocessing."""

    def __init__(self, *sinks: Sink):
        self.sinks = sinks

    def write(self, batch_df, batch_id: int) -> dict:
        return {"fanout": [s.write(batch_df, batch_id) for s in self.sinks]}
