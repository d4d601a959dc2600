"""Iceberg-semantics lake table built from scratch on public Spark APIs.

The sandbox Spark has no Iceberg/Delta jars, so the engine implements the
semantics the north rule needs itself (see SURVEY.md §7.1):

- **data layout**: parquet files under ``data/epoch=<snapshot>/_bucket=<b>/``;
  the table is hash-bucketed on ``conv_id`` (``pmod(xxhash64(conv_id), P)``)
  so a whole conversation co-locates in one bucket → manifest-driven
  partition pruning for merges and conversation-local queries;
- **snapshots**: numbered JSON manifests under ``manifests/``; a commit is a
  write-temp + atomic ``os.rename``; readers resolve ``latest = max(id)``.
  Old snapshots stay readable (time travel) until vacuumed;
- **copy-on-write MERGE**: a commit replaces the file list of only the
  buckets it changed; untouched buckets keep their existing files;
- **exactly-once**: the manifest records the last applied ``batch_id`` per
  stream — a redelivered foreachBatch epoch is a no-op (analog of the
  reference's double-load caveat, docs/architecture.md:184-191, fixed);
- **schema evolution without ALTER**: the manifest carries every historical
  schema; each file records its ``schema_id``; readers group files by
  schema, read each group with its exact physical schema, cast to the
  current unified schema, and ``unionByName`` — old files stay readable
  after adds/widens (generalizes etl/bronze_to_silver.py:59-181);
- **lineage/metrics**: per-bucket high-watermark LSN, row/byte counts, and
  per-batch apply metrics live in the manifest (resumability evidence).

Physical row = user schema + meta columns ``_deleted`` (tombstone — keeps
LWW order-independent across delete/re-insert races), ``_lsn`` (winning WAL
position), ``_row_hash`` (change detection for no-op skip, lift of the
reference's md5 row_hash, etl/bronze_to_silver.py:255-263).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schema import (
    KEY_COLS,
    META_BUCKET,
    META_COLS,
    META_DELETED,
    META_LSN,
    META_ROW_HASH,
    conform,
    merge_schemas,
    schema_from_json,
    schema_to_json,
)

MANIFEST_DIR = "manifests"
DATA_DIR = "data"

#: MOR read-path split guards (all evaluated from manifest row stats before
#: any job runs; failing any falls back to the full-aggregate resolve). The
#: contested-key resolve broadcasts the delta keyset as xxhash64 longs (8
#: B/key — probing the base on a derived long is ~2× cheaper than on the
#: (string, int) key pair, measured) and scans the base twice; its saving is
#: the avoided shuffle+aggregate of the clean base rows, so it pays off when
#: the delta is SMALL — absolutely (the broadcast long-hash relation must
#: build fast) and relative to the base — and the base is big enough that
#: the avoided shuffle beats the split's fixed overheads. Interleaved A/B on
#: identical states (BENCH/mor_readamp.json split_ab): 15.5M-row base at
#: 0.6% contested → split 3.8 s vs full-agg 5.8 s median (1.5×); a 3.9M-row
#: base measured even (1.87 s vs 1.99 s) in calibration — hence the min-base
#: floor. The win grows with base size — and further on a real cluster,
#: where the avoided exchange crosses a network.
MOR_SPLIT_MAX_DELTA_ROWS = 4_000_000
MOR_SPLIT_MAX_DELTA_FRACTION = 0.1
MOR_SPLIT_MIN_BASE_ROWS = 2_000_000


class SnapshotConflict(Exception):
    """Another writer committed the same snapshot id first (CAS lost)."""


class SnapshotNotFound(FileNotFoundError):
    """A requested snapshot id does not exist — most commonly because
    :meth:`LakeTable.vacuum` removed it past the retention window. Raised
    loudly so time travel / ``changes()`` across a vacuumed boundary never
    silently degrades to diffing against the oldest survivor."""


def bucket_expr(num_buckets: int, col: str = "conv_id"):
    """Stable bucket of a conversation; JVM-side, codegen'd."""
    return F.pmod(F.xxhash64(F.col(col)), F.lit(num_buckets)).cast("int")


def row_hash_expr(payload_cols: list[str]):
    """Change-detection hash over the payload (order-stable column list)."""
    return F.xxhash64(*[F.col(c) for c in payload_cols])


def _physical_schema(user_schema: T.StructType) -> T.StructType:
    return T.StructType(
        list(user_schema.fields)
        + [
            T.StructField(META_LSN, T.LongType(), True),
            T.StructField(META_ROW_HASH, T.LongType(), True),
            T.StructField(META_DELETED, T.BooleanType(), True),
        ]
    )


class LakeTable:
    def __init__(self, spark, root: str, io=None):
        from .fileio import LocalManifestIO

        self.spark = spark
        self.root = root
        #: driver-side catalog I/O seam (sources/fileio.py): swap for an
        #: object-store/catalog implementation in a real deployment; data
        #: files always go through Spark's own Hadoop FileSystem layer.
        self.io = io or LocalManifestIO()

    # -- creation / snapshot plumbing ------------------------------------

    @classmethod
    def create(cls, spark, root: str, schema: T.StructType, num_buckets: int = 16, io=None):
        t = cls(spark, root, io=io)
        t.io.makedirs(os.path.join(root, MANIFEST_DIR))
        t.io.makedirs(os.path.join(root, DATA_DIR))
        if t.latest_id() is None:
            snap = {
                "snapshot_id": 0,
                "parent": None,
                "num_buckets": num_buckets,
                "schema_id": 0,
                "schemas": {"0": schema_to_json(schema)},
                "buckets": {},
                "streams": {},
                "evolution": [],
                "metrics": {},
                "created_unix": time.time(),
            }
            try:
                t._write_snapshot(snap)
            except SnapshotConflict:
                pass  # another writer initialized the table concurrently
        return t

    def _snap_path(self, sid: int) -> str:
        return os.path.join(self.root, MANIFEST_DIR, f"snapshot-{sid:012d}.json")

    def latest_id(self) -> int | None:
        ids = [
            int(f[len("snapshot-") : -len(".json")])
            for f in self.io.list_names(os.path.join(self.root, MANIFEST_DIR))
            if f.startswith("snapshot-") and f.endswith(".json")
        ]
        return max(ids) if ids else None

    def snapshot(self, sid: int | None = None) -> dict:
        sid = self.latest_id() if sid is None else sid
        if sid is None:
            raise FileNotFoundError(f"no snapshots under {self.root}")
        try:
            return self.io.read_json(self._snap_path(sid))
        except FileNotFoundError:
            latest = self.latest_id()
            raise SnapshotNotFound(
                f"snapshot {sid} does not exist under {self.root} (latest "
                f"committed id: {latest}); if it existed earlier it was "
                "removed by vacuum() past the retention window — time "
                "travel / changes() across a vacuumed boundary is gone by "
                "policy, not recoverable"
            ) from None

    def _write_snapshot(self, snap: dict) -> None:
        """Atomic compare-and-swap commit via the IO seam's create-if-absent
        (locally: temp write + fsync + ``os.link``; on an object store: a
        conditional PUT / catalog CAS — see sources/fileio.py). A writer
        losing the race gets :class:`SnapshotConflict` and retries against
        the new head (see ``apply_batch``'s retry loop)."""
        try:
            self.io.write_json_if_absent(self._snap_path(snap["snapshot_id"]), snap)
        except FileExistsError:
            raise SnapshotConflict(
                f"snapshot {snap['snapshot_id']} already committed by another writer"
            ) from None

    # -- schema ------------------------------------------------------------

    def user_schema(self, snap: dict | None = None) -> T.StructType:
        snap = snap or self.snapshot()
        return schema_from_json(snap["schemas"][str(snap["schema_id"])])

    def evolve_schema(self, snap: dict, incoming: T.StructType) -> tuple[dict, T.StructType]:
        """Merge an incoming batch schema; returns (updated snap dict,
        unified user schema). Mutates a copy of `snap`."""
        current = self.user_schema(snap)
        unified, report = merge_schemas(current, incoming)
        if report["added"] or report["widened"]:
            new_id = max(int(k) for k in snap["schemas"]) + 1
            snap = dict(snap)
            snap["schemas"] = dict(snap["schemas"])
            snap["schemas"][str(new_id)] = schema_to_json(unified)
            snap["schema_id"] = new_id
            snap["evolution"] = snap["evolution"] + [
                {"schema_id": new_id, **report}
            ]
        return snap, unified

    # -- read path -----------------------------------------------------------

    def read(
        self,
        snapshot_id: int | None = None,
        buckets: list[int] | None = None,
        include_deleted: bool = False,
        with_meta: bool = False,
        snap: dict | None = None,
    ):
        """Read table state. Groups data files by schema_id, reads each group
        with its exact physical schema (mixed int32/int64 files never hit the
        vectorized reader with a mismatched schema), casts to the unified
        schema, unions by name. Bucket pruning = simply not listing files of
        other buckets (manifest-driven partition pruning).

        ``snap`` overrides the committed snapshot — the merge passes its
        in-flight (schema-evolved, not yet committed) snapshot so current
        rows conform to the batch's unified schema."""
        snap = snap or self.snapshot(snapshot_id)
        unified = self.user_schema(snap)
        phys_unified = _physical_schema(unified)
        groups: dict[int, list[str]] = {}
        for b, binfo in snap["buckets"].items():
            if buckets is not None and int(b) not in buckets:
                continue
            for fe in binfo["files"]:
                groups.setdefault(fe["schema_id"], []).append(
                    os.path.join(self.root, fe["path"])
                )
        # merge-on-read: buckets carrying unmerged delta files resolve LWW at
        # read time — selectively: only delta buckets pay the aggregate,
        # compacted buckets stream straight through (union afterwards).
        delta_buckets = {
            int(b)
            for b, binfo in snap["buckets"].items()
            if binfo.get("delta") and (buckets is None or int(b) in buckets)
        }

        def _assemble(groups_: dict[int, list[str]]):
            df_ = None
            for sid_, paths in sorted(groups_.items()):
                phys = _physical_schema(schema_from_json(snap["schemas"][str(sid_)]))
                part = conform(self.spark.read.schema(phys).parquet(*paths), phys_unified)
                df_ = part if df_ is None else df_.unionByName(part)
            return df_

        if delta_buckets:
            clean_g: dict[int, list[str]] = {}
            base_g: dict[int, list[str]] = {}
            delta_g: dict[int, list[str]] = {}
            delta_rows = 0
            base_rows = 0
            split_ok = True
            for b, binfo in snap["buckets"].items():
                if buckets is not None and int(b) not in buckets:
                    continue
                if int(b) not in delta_buckets:
                    for fe in binfo["files"]:
                        clean_g.setdefault(fe["schema_id"], []).append(
                            os.path.join(self.root, fe["path"])
                        )
                    continue
                tagged = 0
                for fe in binfo["files"]:
                    if fe.get("rows") is None:
                        split_ok = False
                    if fe.get("delta"):
                        tagged += 1
                        delta_rows += int(fe.get("rows") or 0)
                        delta_g.setdefault(fe["schema_id"], []).append(
                            os.path.join(self.root, fe["path"])
                        )
                    else:
                        base_rows += int(fe.get("rows") or 0)
                        base_g.setdefault(fe["schema_id"], []).append(
                            os.path.join(self.root, fe["path"])
                        )
                if tagged == 0:
                    # pre-tag manifest (no per-file delta markers): base and
                    # delta files are indistinguishable — full-agg fallback
                    split_ok = False
            if delta_rows > MOR_SPLIT_MAX_DELTA_ROWS:
                split_ok = False
            if delta_rows > MOR_SPLIT_MAX_DELTA_FRACTION * base_rows:
                # widely-contested base: the broadcast build + second base
                # scan would cost more than the full aggregate (measured)
                split_ok = False
            if base_rows < MOR_SPLIT_MIN_BASE_ROWS:
                # small base: the avoided shuffle is cheaper than the
                # split's fixed overheads (measured A/B) — full agg wins
                split_ok = False

            nonkey = [f.name for f in phys_unified.fields if f.name not in KEY_COLS]
            order = F.struct(
                F.coalesce(F.col("ts"), F.lit("1970-01-01 00:00:00").cast("timestamp")),
                F.col(META_LSN),
            )
            carried = F.struct(*[F.col(c) for c in nonkey])

            def _lww(df_):
                return (
                    df_.groupBy(*KEY_COLS)
                    .agg(F.max_by(carried, order).alias("_w"))
                    .select(*KEY_COLS, *[F.col(f"_w.{c}").alias(c) for c in nonkey])
                )

            if split_ok:
                # contested-key split: the compacted base within a delta
                # bucket is key-unique (every replace commit — COW merge,
                # compaction, rebucket — writes LWW-resolved state), so only
                # keys that appear in a delta file can change. Broadcast the
                # contested keyset as xxhash64 longs (guarded by the
                # MOR_SPLIT_* bounds, known from manifest stats before any
                # job runs): clean base rows stream straight from the scan —
                # no shuffle, no aggregate — and only (delta rows + contested
                # base rows) pay the LWW aggregate. A hash collision merely
                # routes an extra base row through the aggregate, where it
                # forms its own (conv_id, turn_idx) group and is emitted
                # unchanged — never a correctness effect. This keeps the MOR
                # scan cost ∝ delta size instead of a step function on "any
                # delta exists".
                ddf = _assemble(delta_g)
                bdf = _assemble(base_g)
                if bdf is None:
                    ddf = _lww(ddf)
                else:
                    hk = F.xxhash64(*KEY_COLS)
                    contested = F.broadcast(
                        ddf.select(hk.alias("_mor_hk")).distinct()
                    )
                    b_h = bdf.withColumn("_mor_hk", hk)
                    clean_b = b_h.join(contested, "_mor_hk", "left_anti").drop("_mor_hk")
                    hot_b = b_h.join(contested, "_mor_hk", "left_semi").drop("_mor_hk")
                    ddf = clean_b.unionByName(_lww(ddf.unionByName(hot_b)))
            else:
                merged_g: dict[int, list[str]] = {}
                for sid_, paths in list(base_g.items()) + list(delta_g.items()):
                    merged_g.setdefault(sid_, []).extend(paths)
                ddf = _lww(_assemble(merged_g))
            cdf = _assemble(clean_g)
            df = ddf if cdf is None else cdf.unionByName(ddf)
        else:
            df = _assemble(groups)
        if df is None:
            df = self.spark.createDataFrame([], phys_unified)
        if not include_deleted:
            df = df.filter(~F.coalesce(F.col(META_DELETED), F.lit(False)))
        if not with_meta:
            df = df.drop(*META_COLS)
        return df

    # -- write path ----------------------------------------------------------

    def write_bucket_files(
        self,
        df,
        snapshot_id: int,
        schema_id: int,
        files_per_bucket: int = 1,
        pre_partitioned: bool = False,
    ) -> dict[int, list[dict]]:
        """Write a physical DataFrame (user cols + meta cols + _bucket) as
        per-bucket parquet under data/epoch=<snapshot_id>/, return
        {bucket: [file entries]} for the manifest.

        ``pre_partitioned=True`` means the caller's plan is already
        bucket-clustered (e.g. the merge reuses its aggregate exchange) — no
        extra shuffle is added; each task's rows split into per-bucket files
        by the dynamic-partition writer. Otherwise one repartition by bucket
        yields one file per bucket per task."""
        # unique suffix: two writers racing toward the same child snapshot id
        # must never share a data directory (the CAS on the manifest decides
        # the winner; the loser's files stay orphaned until vacuum)
        rel_epoch = os.path.join(
            DATA_DIR, f"epoch={snapshot_id}-{uuid.uuid4().hex[:8]}"
        )
        out = os.path.join(self.root, rel_epoch)
        writer = df
        if not pre_partitioned:
            if files_per_bucket > 1:
                writer = writer.repartition(
                    files_per_bucket * 64, META_BUCKET, F.col("conv_id")
                )
            else:
                writer = writer.repartition(META_BUCKET)
        (
            # prefixing the sort with the partition column satisfies the file
            # writer's required ordering, so Spark skips its own re-sort and
            # files stay key-sorted (stable (conv_id, turn_idx) reads).
            writer.sortWithinPartitions(META_BUCKET, *KEY_COLS)
            .write.mode("overwrite")
            .partitionBy(META_BUCKET)
            .parquet(out)
        )
        entries: dict[int, list[dict]] = {}
        for d in self.io.list_names(out):
            if not d.startswith(f"{META_BUCKET}="):
                continue
            b = int(d.split("=")[1])
            for fn in self.io.list_names(os.path.join(out, d)):
                if not fn.endswith(".parquet"):
                    continue
                rows, nbytes = self.io.parquet_stats(os.path.join(out, d, fn))
                entries.setdefault(b, []).append(
                    {
                        "path": os.path.join(rel_epoch, d, fn),
                        "rows": rows,
                        "bytes": nbytes,
                        "schema_id": schema_id,
                    }
                )
        if not entries:
            # empty write (e.g. a fully-gated MOR batch): the epoch dir holds
            # only a _SUCCESS marker and would otherwise sit orphaned forever
            # (vacuum removes parquet files, not bare dirs)
            self.io.remove_tree(out)
        return entries

    def commit(
        self,
        snap: dict,
        replaced_buckets: dict[int, list[dict]],
        bucket_hwm: dict[int, int],
        bucket_rows: dict[int, int],
        stream_id: str,
        batch_id: int,
        metrics: dict,
        append: bool = False,
        stream_hwm: str | None = None,
        watermark_ts: float | None = None,
        bucket_tombstones: dict[int, int] | None = None,
    ) -> dict:
        """Produce + atomically write the child snapshot: replace (COW) or
        append (MOR delta) file lists for written buckets, bump per-bucket
        high-watermark LSN, record the applied batch id (idempotence marker)
        and batch metrics."""
        new = dict(snap)
        new["parent"] = snap["snapshot_id"]
        new["snapshot_id"] = snap["snapshot_id"] + 1
        bks = {k: dict(v) for k, v in snap["buckets"].items()}
        for b, files in replaced_buckets.items():
            if append:
                prev = bks.get(str(b), {"files": [], "hwm_lsn": 0, "rows": None})
                # per-file delta tag: the read path uses it to tell the
                # key-unique compacted base apart from appended delta files,
                # so only contested keys pay the read-time LWW aggregate
                bks[str(b)] = {
                    "files": list(prev["files"]) + [dict(fe, delta=True) for fe in files],
                    "hwm_lsn": max(int(prev.get("hwm_lsn") or 0), int(bucket_hwm.get(b, 0))),
                    "rows": None,  # unknown until compaction (LWW-at-read)
                    "delta": True,
                }
                continue
            bks[str(b)] = {
                "files": files,
                "hwm_lsn": int(bucket_hwm.get(b, bks.get(str(b), {}).get("hwm_lsn", 0))),
                "rows": int(bucket_rows.get(b, 0)),
                "tombstones": int((bucket_tombstones or {}).get(b, 0)),
            }
        for b, hwm in bucket_hwm.items():
            if str(b) in bks and b not in replaced_buckets:
                bks[str(b)] = dict(bks[str(b)], hwm_lsn=max(bks[str(b)]["hwm_lsn"], int(hwm)))
        new["buckets"] = bks
        new["streams"] = dict(snap.get("streams", {}), **{stream_id: int(batch_id)})
        if stream_hwm is not None:
            # segment high-watermark, committed atomically with the batch
            # marker: resume skips exactly the applied segments even if the
            # WAL listing has grown since (positional re-slicing is unsafe)
            new["stream_hwm"] = dict(
                snap.get("stream_hwm", {}), **{stream_id: stream_hwm}
            )
        if watermark_ts is not None:
            # event-time watermark (max event ts ever applied): the tombstone
            # GC horizon derives from it (Structured Streaming watermark
            # semantics — an event older than watermark - lateness is late
            # beyond tolerance and may no longer resurrect a GC'd key)
            new["watermark_ts"] = max(
                float(snap.get("watermark_ts") or 0.0), float(watermark_ts)
            )
        new["metrics"] = metrics
        new["created_unix"] = time.time()
        self._write_snapshot(new)
        return new

    def last_batch_id(self, stream_id: str, snap: dict | None = None) -> int:
        snap = snap or self.snapshot()
        return int(snap.get("streams", {}).get(stream_id, -1))

    def last_segment_hwm(self, stream_id: str, snap: dict | None = None) -> str | None:
        """Last applied WAL segment (relative path) for ``stream_id``."""
        snap = snap or self.snapshot()
        return snap.get("stream_hwm", {}).get(stream_id)

    def total_rows(self, snap: dict | None = None) -> int:
        snap = snap or self.snapshot()
        if any(b.get("delta") for b in snap["buckets"].values()):
            # MOR deltas pending: exact live count needs the read-time merge
            return self.read(snap=snap).count()
        return sum(b.get("rows") or 0 for b in snap["buckets"].values())

    def delta_pressure(self, snap: dict | None = None) -> dict[int, int]:
        """Delta file count per MOR bucket (compaction-policy signal)."""
        snap = snap or self.snapshot()
        return {
            int(b): len(binfo["files"])
            for b, binfo in snap["buckets"].items()
            if binfo.get("delta")
        }

    def maybe_compact(self, max_delta_files: int = 8, files_per_bucket: int = 1) -> dict | None:
        """Auto-compaction policy: fold buckets whose delta file count
        exceeds the threshold (read amplification bound). In production this
        runs as an async maintenance job; inline here."""
        todo = [b for b, n in self.delta_pressure().items() if n > max_delta_files]
        if not todo:
            return None
        return self.compact(buckets=todo, files_per_bucket=files_per_bucket)

    def watermark_ts(self, snap: dict | None = None) -> float:
        """Max event-time (unix seconds) ever applied to the table."""
        snap = snap or self.snapshot()
        return float(snap.get("watermark_ts") or 0.0)

    def gc_tombstones(
        self,
        allowed_lateness_sec: float,
        files_per_bucket: int = 1,
    ) -> dict | None:
        """Retention-policy tombstone GC, driven by the manifest watermark.

        A tombstone must outlive every event that could still lose to it:
        under LWW order (event_ts, lsn), that is any late event with an
        older ts. Once the table watermark (max applied event ts) has moved
        ``allowed_lateness_sec`` past a tombstone's ts, such an event is
        late beyond tolerance (same contract as a streaming watermark) and
        the tombstone can go. Buckets are selected from manifest tombstone
        counts — no scan; returns the new snapshot, or None if nothing to do.
        """
        snap = self.snapshot()
        horizon = self.watermark_ts(snap) - allowed_lateness_sec
        if horizon <= 0:
            return None
        todo = [
            int(b)
            for b, binfo in snap["buckets"].items()
            if binfo.get("delta") or (binfo.get("tombstones") or 0) > 0
        ]
        if not todo:
            return None
        return self.compact(
            buckets=todo,
            files_per_bucket=files_per_bucket,
            drop_tombstones_ts_before=horizon,
            include_non_delta=True,
        )

    # -- SCD2 / history ------------------------------------------------------

    def snapshot_lineage(self) -> list[dict]:
        """Snapshot chain root → latest (parent pointers, time travel axis).
        Stops at the retention horizon: a parent manifest removed by
        :meth:`vacuum` ends the chain (history beyond the keep window is
        gone by policy, not an error)."""
        chain = [self.snapshot()]
        while chain[-1]["parent"] is not None:
            try:
                chain.append(self.snapshot(chain[-1]["parent"]))
            except FileNotFoundError:
                break  # vacuumed beyond retention
        return list(reversed(chain))

    def key_history(self, conv_id: str, turn_idx: int, max_versions: int = 10_000):
        """Per-key SCD2 version history across the snapshot lineage.

        The reference tracks row versions with effective_from/effective_to/
        is_current (etl/bronze_to_silver.py:255-263,
        sql/ddl/01_create_dimensions.sql:78-81); this lake derives the same
        lineage from its snapshots instead of storing it per row. Manifest
        pruning twice over: only the key's bucket is read, and only at
        snapshots where that bucket's file list actually changed (unchanged
        bucket ⇒ unchanged version). One Spark job (a union over the changed
        snapshots); interval stitching is driver-side over ≤ lineage-length
        rows, bounded by ``max_versions`` — a pathological key whose bucket
        changed in more snapshots than that raises instead of ballooning the
        driver (vacuum the lineage, or use read_asof for point lookups).
        Returns a DataFrame: one row per distinct version with
        valid_from/valid_to snapshot ids + commit times and is_current.
        """
        chain = self.snapshot_lineage()

        # the key's bucket: same xxhash64-pmod the engine writes with —
        # PER SNAPSHOT: num_buckets can change across the chain (rebucket),
        # moving the key to a different bucket id mid-lineage
        bcache: dict[int, int] = {}

        def _bucket_of(p: int) -> int:
            if p not in bcache:
                bcache[p] = (
                    self.spark.createDataFrame([(conv_id,)], "c string")
                    .select(bucket_expr(p, col="c").alias("b"))
                    .first()["b"]
                )
            return bcache[p]

        reads = []
        prev_files = object()
        for snap in chain:
            b = _bucket_of(int(snap["num_buckets"]))
            entry = snap["buckets"].get(str(b), {})
            files = tuple(fe["path"] for fe in entry.get("files", []))
            if files == prev_files:
                continue
            prev_files = files
            if len(reads) >= max_versions:
                raise ValueError(
                    f"key_history({conv_id!r}, {turn_idx}): bucket {b} changed "
                    f"in more than max_versions={max_versions} snapshots; "
                    "raise max_versions, vacuum the lineage, or use "
                    "read_asof for point-in-time lookups"
                )
            df = self.read(
                snap=snap, buckets=[b], include_deleted=True, with_meta=True
            ).filter(
                (F.col("conv_id") == conv_id) & (F.col("turn_idx") == turn_idx)
            )
            reads.append(
                df.withColumn("_snapshot_id", F.lit(snap["snapshot_id"]))
                .withColumn("_committed_unix", F.lit(float(snap["created_unix"])))
            )
        user = self.user_schema(chain[-1])
        out_schema = T.StructType(
            list(user.fields)
            + [
                T.StructField(META_LSN, T.LongType(), True),
                T.StructField(META_DELETED, T.BooleanType(), True),
                T.StructField("valid_from_snapshot", T.LongType(), True),
                T.StructField("valid_from_unix", T.DoubleType(), True),
                T.StructField("valid_to_snapshot", T.LongType(), True),
                T.StructField("valid_to_unix", T.DoubleType(), True),
                T.StructField("is_current", T.BooleanType(), True),
            ]
        )
        if not reads:
            return self.spark.createDataFrame([], out_schema)
        allv = reads[0]
        for r in reads[1:]:
            allv = allv.unionByName(r)
        rows = sorted(allv.collect(), key=lambda r: r["_snapshot_id"])
        # stitch: a new version starts when the row hash / deleted flag flips
        versions: list[dict] = []
        prev_key = object()
        for r in rows:
            cur_key = (r[META_ROW_HASH], bool(r[META_DELETED]))
            if cur_key != prev_key:
                if versions:
                    versions[-1]["valid_to_snapshot"] = r["_snapshot_id"]
                    versions[-1]["valid_to_unix"] = r["_committed_unix"]
                d = r.asDict()
                versions.append(
                    {
                        **{k: d.get(k) for k in [f.name for f in user.fields]},
                        META_LSN: d.get(META_LSN),
                        META_DELETED: bool(d.get(META_DELETED) or False),
                        "valid_from_snapshot": d["_snapshot_id"],
                        "valid_from_unix": d["_committed_unix"],
                        "valid_to_snapshot": None,
                        "valid_to_unix": None,
                    }
                )
                prev_key = cur_key
        for v in versions:
            v["is_current"] = v["valid_to_snapshot"] is None
        data = [tuple(v[f.name] for f in out_schema.fields) for v in versions]
        return self.spark.createDataFrame(data, out_schema)

    def read_asof(self, as_of_unix: float, **read_kwargs):
        """Table state as of a wall-clock time: the latest snapshot whose
        commit time ≤ ``as_of_unix`` (reference SCD2 'AS OF' reads over
        effective_from/effective_to, sql/ddl/01_create_dimensions.sql:78-81)."""
        best = None
        for snap in self.snapshot_lineage():
            if float(snap["created_unix"]) <= as_of_unix:
                best = snap
        if best is None:
            raise ValueError(f"no snapshot committed at or before {as_of_unix}")
        return self.read(snap=best, **read_kwargs)

    def compact(
        self,
        buckets: list[int] | None = None,
        files_per_bucket: int = 1,
        drop_tombstones_below_lsn: int | None = None,
        drop_tombstones_ts_before: float | None = None,
        include_non_delta: bool = False,
    ) -> dict:
        """Merge-on-read compaction: rewrite delta-carrying buckets into a
        single resolved generation (LWW applied once). Tombstones are
        retained by default — they keep late zombies out. GC knobs:
        ``drop_tombstones_below_lsn`` (WAL retention horizon — no event
        below that position can still arrive) and
        ``drop_tombstones_ts_before`` (event-time watermark horizon — see
        :meth:`gc_tombstones`). ``include_non_delta`` lets the GC rewrite
        already-compacted buckets that still carry old tombstones.
        Returns the new snapshot."""
        snap = self.snapshot()
        todo = [
            int(b)
            for b, binfo in snap["buckets"].items()
            if (binfo.get("delta") or include_non_delta)
            and (buckets is None or int(b) in buckets)
        ]
        if not todo:
            return snap
        resolved = self.read(
            buckets=todo, include_deleted=True, with_meta=True, snap=snap
        ).withColumn(META_BUCKET, bucket_expr(snap["num_buckets"]))
        if drop_tombstones_below_lsn is not None:
            resolved = resolved.filter(
                ~(F.col(META_DELETED) & (F.col(META_LSN) < drop_tombstones_below_lsn))
            )
        if drop_tombstones_ts_before is not None:
            ts_unix = F.coalesce(
                F.col("ts").cast("timestamp_ltz").cast("double"), F.lit(0.0)
            )
            resolved = resolved.filter(
                ~(F.col(META_DELETED) & (ts_unix < drop_tombstones_ts_before))
            )
        written = self.write_bucket_files(
            resolved, snap["snapshot_id"] + 1, snap["schema_id"], files_per_bucket
        )
        # buckets whose resolved state is empty (e.g. everything tombstoned
        # and GC'd) still replace their file lists — with an empty list
        replaced = {b: written.get(b, []) for b in todo}
        stats = (
            resolved.groupBy(META_BUCKET)
            .agg(
                F.sum(F.when(~F.col(META_DELETED), 1).otherwise(0)).alias("live"),
                F.sum(F.when(F.col(META_DELETED), 1).otherwise(0)).alias("dead"),
                F.max(META_LSN).alias("hwm"),
            )
            .collect()
        )
        rows = {int(r[META_BUCKET]): int(r["live"]) for r in stats}
        rows = {b: rows.get(b, 0) for b in todo}
        dead = {int(r[META_BUCKET]): int(r["dead"]) for r in stats}
        dead = {b: dead.get(b, 0) for b in todo}
        hwm = {
            b: max(
                next((int(r["hwm"]) for r in stats if int(r[META_BUCKET]) == b), 0),
                int(snap["buckets"].get(str(b), {}).get("hwm_lsn") or 0),
            )
            for b in todo
        }
        new = self.commit(
            snap, replaced, hwm, rows, "compaction",
            self.last_batch_id("compaction", snap) + 1,
            {"compacted_buckets": todo},
            bucket_tombstones=dead,
        )
        return new

    def rebucket(self, new_num_buckets: int, files_per_bucket: int = 1) -> dict:
        """Bucket-count evolution as a committed snapshot operation — the
        Iceberg partition-spec-evolution analog. ``num_buckets`` is chosen at
        :meth:`create` time; a table that grows 100× would otherwise be stuck
        with COW rewrite units and pruning granularity sized for day one.

        One Spark job: read the full current state (tombstones kept, MOR
        deltas resolved by the read path), re-hash every row under
        ``bucket_expr(new_num_buckets)``, write all buckets into one new
        epoch, and commit a child snapshot whose ENTIRE buckets map is
        replaced and which carries the new ``num_buckets``. Because
        ``num_buckets`` is per-snapshot and every reader/writer derives
        bucketing from the snapshot it reads, everything downstream follows
        automatically: time travel to a pre-rebucket snapshot reads the old
        layout (its file lists are pinned in the old manifest), resumed
        ingest merges under the new bucketing (``apply_batch`` re-reads the
        head snapshot per batch and on CAS retry), ``key_history`` hashes
        each snapshot with its own bucket count, and vacuum reclaims the old
        layout's files once the pre-rebucket snapshots age out.

        Cost model at scale: one full-table rewrite — the same price as a
        global compaction, amortized over the 100× of growth that motivated
        it. Concurrency: single CAS attempt; a concurrent writer winning the
        race raises :class:`SnapshotConflict` (re-run against the new head —
        same contract as :meth:`compact`). Per-new-bucket ``hwm_lsn`` is
        re-derived from the data; the table-wide high-watermark is preserved
        via the rebucket metrics entry (resume correctness rides
        ``stream_hwm``/batch markers, which carry over untouched).
        """
        snap = self.snapshot()
        old_p = int(snap["num_buckets"])
        if int(new_num_buckets) == old_p:
            return snap
        if new_num_buckets < 1:
            raise ValueError(f"rebucket: num_buckets must be >= 1, got {new_num_buckets}")
        resolved = self.read(
            include_deleted=True, with_meta=True, snap=snap
        ).withColumn(META_BUCKET, bucket_expr(new_num_buckets))
        written = self.write_bucket_files(
            resolved, snap["snapshot_id"] + 1, snap["schema_id"], files_per_bucket
        )
        # Manifest stats come from a skinny re-read of the files just
        # written (3 columns, no shuffle-heavy MOR resolve) — re-running the
        # `resolved` plan here would repeat the full-table read + LWW
        # aggregate the write job already executed, doubling rebucket cost.
        # The files carry no _bucket column (it was the partition dir), so
        # recompute it from conv_id — byte-identical to what was written.
        if written:
            paths = [
                os.path.join(self.root, fe["path"])
                for files in written.values()
                for fe in files
            ]
            skinny = (
                self.spark.read.parquet(*paths)
                .select("conv_id", META_DELETED, META_LSN)
                .withColumn(META_BUCKET, bucket_expr(int(new_num_buckets)))
            )
            stats = (
                skinny.groupBy(META_BUCKET)
                .agg(
                    F.sum(F.when(~F.coalesce(F.col(META_DELETED), F.lit(False)), 1).otherwise(0)).alias("live"),
                    F.sum(F.when(F.coalesce(F.col(META_DELETED), F.lit(False)), 1).otherwise(0)).alias("dead"),
                    F.max(META_LSN).alias("hwm"),
                )
                .collect()
            )
        else:
            stats = []
        table_hwm = max(
            (int(b.get("hwm_lsn") or 0) for b in snap["buckets"].values()), default=0
        )
        new = dict(snap)
        new["parent"] = snap["snapshot_id"]
        new["snapshot_id"] = snap["snapshot_id"] + 1
        new["num_buckets"] = int(new_num_buckets)
        new["buckets"] = {
            str(int(r[META_BUCKET])): {
                "files": written.get(int(r[META_BUCKET]), []),
                "hwm_lsn": int(r["hwm"] or 0),
                "rows": int(r["live"]),
                "tombstones": int(r["dead"]),
            }
            for r in stats
        }
        new["metrics"] = {
            "rebucket": {
                "from_buckets": old_p,
                "to_buckets": int(new_num_buckets),
                "table_hwm_lsn": table_hwm,
                "rows": sum(int(r["live"]) for r in stats),
            }
        }
        new["created_unix"] = time.time()
        self._write_snapshot(new)
        return new

    def maybe_rebucket(
        self,
        target_bucket_bytes: int = 1 << 30,
        growth_factor: int = 4,
        max_buckets: int = 4096,
        files_per_bucket: int = 1,
    ) -> dict | None:
        """Rebucket policy (the :meth:`maybe_compact` analog for layout):
        when the MEDIAN bytes per occupied bucket exceeds
        ``target_bucket_bytes``, grow the bucket count by ``growth_factor``
        (geometric — each rewrite buys factor× headroom, so total rewrite
        work over the table's lifetime is O(size · log_factor(growth)))
        capped at ``max_buckets``. Pure manifest arithmetic — no scan; in
        production this runs on the maintenance cadence next to
        ``maybe_compact``/``vacuum``. Returns the new snapshot or None.

        Skew-safe by construction: the median ignores a hot key's bucket
        (a single conversation hashes to ONE bucket at any P, so no amount
        of growth can split it — only the typical bucket's load should
        drive a rewrite), and growth is skipped entirely when fewer than
        half the current buckets are occupied (per-key data already sits
        alone in its bucket; more buckets cannot spread it and the rewrite
        would be futile — prevents a repeated grow-to-cap storm on a
        degenerate hot-key-only table)."""
        snap = self.snapshot()
        occupied = [b for b in snap["buckets"].values() if b["files"]]
        if not occupied:
            return None
        cur = int(snap["num_buckets"])
        if len(occupied) * 2 < cur:
            return None
        sizes = sorted(sum(fe["bytes"] for fe in b["files"]) for b in occupied)
        if sizes[len(sizes) // 2] <= target_bucket_bytes:
            return None
        if cur >= max_buckets:
            return None
        return self.rebucket(
            min(cur * growth_factor, max_buckets), files_per_bucket=files_per_bucket
        )

    def changes(self, from_snapshot: int, to_snapshot: int | None = None):
        """Changelog between two snapshots (CDC-out): one row per key whose
        state differs, with change_type ∈ {insert, update, delete}.

        Snapshot diffing reads only buckets whose file lists differ between
        the manifests (manifest-driven pruning again), joins old vs new
        state on the natural key, and classifies by row-hash. Scales as
        O(changed buckets), not O(table).

        Across a :meth:`rebucket` boundary the two snapshots disagree on
        bucket layout, so bucket-id pruning is meaningless — both sides are
        read in full (accurate: the rebucket rewrote every file) and the
        row-hash classification still yields exactly the real data changes
        (pure re-hashing produces no changelog rows)."""
        s_from = self.snapshot(from_snapshot)
        s_to = self.snapshot(to_snapshot if to_snapshot is not None else self.latest_id())
        if int(s_from["num_buckets"]) != int(s_to["num_buckets"]):
            from_b, to_b = None, None  # layouts differ: full read both sides
        else:
            changed = [
                int(b)
                for b in set(s_from["buckets"]) | set(s_to["buckets"])
                if s_from["buckets"].get(b, {}).get("files")
                != s_to["buckets"].get(b, {}).get("files")
            ]
            from_b, to_b = changed, changed
        old = self.read(snap=s_from, buckets=from_b, with_meta=True).select(
            *KEY_COLS, F.col(META_ROW_HASH).alias("_old_hash")
        )
        new = self.read(snap=s_to, buckets=to_b, with_meta=True)
        j = new.alias("n").join(old.alias("o"), KEY_COLS, "full_outer")
        change_type = (
            F.when(F.col(f"o._old_hash").isNull() & F.col(f"n.{META_ROW_HASH}").isNotNull(), "insert")
            .when(F.col(f"n.{META_ROW_HASH}").isNull() & F.col("o._old_hash").isNotNull(), "delete")
            .when(~F.col(f"n.{META_ROW_HASH}").eqNullSafe(F.col("o._old_hash")), "update")
            .otherwise(None)
        )
        user_cols = [f.name for f in self.user_schema(s_to).fields if f.name not in KEY_COLS]
        return (
            j.withColumn("change_type", change_type)
            .filter(F.col("change_type").isNotNull())
            .select(*KEY_COLS, *[F.col(f"n.{c}").alias(c) for c in user_cols], "change_type")
        )

    def vacuum(self, keep_snapshots: int = 2, orphan_tmp_age_sec: float = 3600.0) -> list[str]:
        """Delete data files referenced only by snapshots older than the
        newest `keep_snapshots` (and those manifests). Returns removed paths.

        Also sweeps commit-temp litter: a writer that died between its CAS
        temp write and the link leaves ``snapshot-*.json.tmp.*`` behind
        (chaos-campaign finding — the old id parse choked on it). Temps
        older than ``orphan_tmp_age_sec`` are orphans by definition (a live
        CAS holds its temp for milliseconds) and are removed; younger ones
        are left for the in-flight writer."""
        mdir = os.path.join(self.root, MANIFEST_DIR)
        names = self.io.list_names(mdir)
        now = time.time()
        # the temp-name convention is the IO backend's private business —
        # ask the seam (older duck-typed backends without the method simply
        # have no litter to sweep)
        is_temp = getattr(self.io, "is_commit_temp", lambda _n: False)
        for f in names:
            if is_temp(f):
                p = os.path.join(mdir, f)
                try:
                    if now - self.io.mtime(p) > orphan_tmp_age_sec:
                        self.io.remove(p)
                except OSError:
                    pass  # raced with the writer's own cleanup
        ids = sorted(
            int(f[len("snapshot-") : -len(".json")])
            for f in names
            if f.startswith("snapshot-") and f.endswith(".json")
        )
        keep = set(ids[-keep_snapshots:])
        live: set[str] = set()
        for sid in keep:
            s = self.snapshot(sid)
            for binfo in s["buckets"].values():
                live.update(fe["path"] for fe in binfo["files"])
        removed = []
        for full in self.io.walk_files(os.path.join(self.root, DATA_DIR)):
            rel = os.path.relpath(full, self.root)
            if full.endswith(".parquet") and rel not in live:
                self.io.remove(full)
                removed.append(rel)
        for sid in ids:
            if sid not in keep:
                self.io.remove(self._snap_path(sid))
        return removed
