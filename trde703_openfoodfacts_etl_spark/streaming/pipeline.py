"""Change-feed tailing: Structured Streaming and incremental microbatch drivers.

Two drivers share the same :func:`..operators.merge.apply_batch` sink:

- :func:`run_stream` — idiomatic Structured Streaming: parquet file source
  over the WAL directory, ``foreachBatch`` apply, Spark checkpoint for
  source offsets + the lake manifest's batch-id marker for sink idempotence
  (together: exactly-once). Requires a fixed source schema (Spark streaming
  sources cannot change schema mid-query), so it reads with the current
  superset schema.

- :func:`run_incremental` — binlog-tail microbatcher for the general case
  the north rule describes: segments are discovered in order, each batch's
  Arrow schema is read from the parquet footers (no Spark job) and diffed
  against the lake schema, so added columns / widened types arriving
  mid-stream evolve the lake live. Resume is segment-watermark-based: the
  manifest records the last applied segment path (atomically with the batch
  marker), so a restarted run skips exactly the applied segments — even if
  the WAL listing grew in between — and re-applies at most the one
  uncommitted batch (whose data files, if any, were never referenced by a
  manifest).

This closes the reference's declared gap "Pas de mode incrémental: Full
reload à chaque run" (docs/architecture.md:265,273) and replaces its bash
stage sequencing (run-pipeline.sh:59-77).
"""

from __future__ import annotations

import os
import re

from ..operators.merge import apply_batch
from ..schema import (
    SchemaEvolutionError,
    arrow_schema_of_parquet,
    arrow_schema_of_segment,
    merge_schemas,
    widen,
)
from ..sources.lake import LakeTable


def _natural_key(path: str) -> str:
    """Order-preserving sort key: every digit run zero-padded to 20 chars,
    so ``segment=10`` sorts after ``segment=2`` (plain lexicographic order
    scrambles unpadded sequence numbers past 9). Pure-string keys keep
    comparisons total — including against a persisted high-watermark."""
    return re.sub(r"\d+", lambda m: m.group(0).zfill(20), path)


def list_segments(segments_dir: str) -> list[str]:
    """WAL segments in commit order (natural numeric order on path).
    Parquet, ORC, and JSON-lines (``.jsonl`` — Debezium-export-style)
    segments may be mixed in one WAL; each batch unifies all of them.

    Path components starting with ``_`` or ``.`` are skipped — the
    Hadoop/Spark hidden-path convention. A concurrent Spark writer stages
    in-flight task files under ``_temporary/``; Spark's own file source
    filters those, but this listing feeds EXPLICIT-path reads
    (``spark.read.parquet(*files)``) which do not, so without the filter a
    concurrent append could leak uncommitted (or footer-less, mid-write)
    task files into a batch."""
    out = []
    for dirpath, dirnames, files in os.walk(segments_dir):
        dirnames[:] = [d for d in dirnames if not d.startswith(("_", "."))]
        for f in files:
            if f.endswith((".parquet", ".orc", ".jsonl")) and not f.startswith(
                ("_", ".")
            ):
                out.append(os.path.join(dirpath, f))
    return sorted(out, key=_natural_key)


_FOOTER_CACHE: dict[str, str] = {}


def read_batch(spark, paths: list[str], json_payload_schema=None):
    """Read one microbatch of segment files, unifying footer schemas
    (per-batch Arrow-schema diff; v1/v2 boundary can fall inside a batch).

    Footer reads are driver-side and serial, so Spark-written segment
    directories (``part-*`` files — one writer, one schema per directory)
    are cached: one footer read covers the directory. Individually named
    segment files (schema may differ file-to-file) are always read.

    ``.jsonl`` segments (one JSON CDC envelope per line — the
    Debezium-export wire shape) are parsed against the DECLARED
    ``json_payload_schema`` via the same ``from_json`` path as the Kafka
    source (sources/kafka.py) — never schema inference, which would scan
    the data twice and mistype int32/timestamp columns (JSON has neither).
    A JSON feed that evolves needs the superset schema passed in, exactly
    like a Kafka topic; footer-diff live evolution is the columnar paths'
    feature. Malformed lines parse to a NULL envelope and are dropped by
    the parser's op/lsn filter — never crashed on, never merged.

    ``.orc`` segments get the full parquet treatment — footer schema read
    driver-side via pyarrow.orc, per-schema-group reads, live evolution —
    ORC carries real types, so nothing needs declaring.
    """
    jsonl = [p for p in paths if p.endswith(".jsonl")]
    paths = [p for p in paths if not p.endswith(".jsonl")]
    json_df = None
    if jsonl:
        if json_payload_schema is None:
            raise ValueError(
                "read_batch: .jsonl segments need json_payload_schema= "
                "(declared payload schema; JSON carries no types)"
            )
        from ..sources.kafka import parse_cdc_envelope

        json_df = parse_cdc_envelope(
            spark.read.text(jsonl), json_payload_schema
        )
        if not paths:
            return json_df
    by_schema: dict[tuple[str, str], list[str]] = {}
    schemas = {}
    for p in paths:
        fmt = "orc" if p.endswith(".orc") else "parquet"
        cacheable = os.path.basename(p).startswith("part-")
        key = os.path.dirname(p) if cacheable else p
        sj = _FOOTER_CACHE.get(key)
        if sj is None:
            s = arrow_schema_of_segment(p)
            sj = s.json()
            if cacheable:
                _FOOTER_CACHE[key] = sj
            schemas[sj] = s
        elif sj not in schemas:
            from ..schema import schema_from_json

            schemas[sj] = schema_from_json(sj)
        by_schema.setdefault((sj, fmt), []).append(p)
    unified = None
    for s in schemas.values():
        unified = s if unified is None else merge_schemas(unified, s)[0]
    from ..schema import conform

    df = None
    if json_df is not None:
        # a batch can straddle formats: unify the JSON envelope schema with
        # the parquet footers' and conform both sides
        unified = merge_schemas(unified, json_df.schema)[0]
        df = conform(json_df, unified)
    for (sj, fmt), group in by_schema.items():
        reader = spark.read.schema(schemas[sj])
        raw = reader.orc(*group) if fmt == "orc" else reader.parquet(*group)
        part = conform(raw, unified)
        df = part if df is None else df.unionByName(part)
    return df


def run_incremental(
    lake: LakeTable,
    segments_dir: str,
    stream_id: str = "default",
    segments_per_batch: int = 1,
    transform=None,
    max_batches: int | None = None,
    files_per_bucket: int = 1,
    mode: str = "cow",
    auto_compact_after: int | None = None,
    auto_vacuum_every: int | None = None,
    vacuum_keep_snapshots: int = 4,
    auto_rebucket_target_bytes: int | None = None,
    json_payload_schema=None,
) -> list[dict]:
    """Tail the WAL directory batch by batch; resumable + idempotent.

    Resume is watermark-based, not positional: the manifest records the last
    *applied segment* (relative path) per stream, committed atomically with
    the batch marker. A resumed run skips exactly the applied segments and
    batches the remainder — safe under any ``segments_per_batch`` even when
    new segments arrived between runs (positional re-slicing of the grown
    listing would silently drop segments that fall into an already-committed
    batch id). Requires only that new segments sort after applied ones in
    natural order — true of any sequence-numbered binlog.

    ``transform`` (optional) maps the raw batch DataFrame → enriched batch
    (e.g. vectorized text normalization / quality columns) before the merge.
    ``auto_compact_after`` (MOR): fold buckets down once their delta file
    count exceeds the threshold (bounds read amplification during ingest).
    ``auto_vacuum_every``: every K applied batches, drop snapshots (and the
    data files only they reference) beyond the newest
    ``vacuum_keep_snapshots`` — long-running ingest keeps a bounded file
    count while time travel stays available inside the keep window (the
    maintenance-job analog of ``maybe_compact``).
    ``auto_rebucket_target_bytes``: after each batch, grow the bucket count
    (``LakeTable.maybe_rebucket``, geometric ×4) once mean bytes per
    occupied bucket crosses the target — the table's layout keeps pace with
    unbounded growth without operator intervention.
    """
    segs = list_segments(segments_dir)
    hwm = lake.last_segment_hwm(stream_id)
    if hwm is not None:
        hk = _natural_key(hwm)
        segs = [
            p for p in segs
            if _natural_key(os.path.relpath(p, segments_dir)) > hk
        ]
    batches = [
        segs[i : i + segments_per_batch] for i in range(0, len(segs), segments_per_batch)
    ]
    next_id = lake.last_batch_id(stream_id) + 1
    out = []
    for i, paths in enumerate(batches):
        if max_batches is not None and len(out) >= max_batches:
            break
        df = read_batch(lake.spark, paths, json_payload_schema=json_payload_schema)
        if transform is not None:
            df = transform(df)
        out.append(
            apply_batch(
                lake, df, next_id + i, stream_id=stream_id,
                files_per_bucket=files_per_bucket, mode=mode,
                segment_hwm=os.path.relpath(paths[-1], segments_dir),
            )
        )
        if auto_compact_after is not None and mode == "mor":
            lake.maybe_compact(max_delta_files=auto_compact_after,
                               files_per_bucket=files_per_bucket)
        if auto_rebucket_target_bytes is not None:
            lake.maybe_rebucket(target_bucket_bytes=auto_rebucket_target_bytes,
                                files_per_bucket=files_per_bucket)
        if auto_vacuum_every is not None and len(out) % auto_vacuum_every == 0:
            lake.vacuum(keep_snapshots=vacuum_keep_snapshots)
    return out


def run_stream(
    lake: LakeTable,
    segments_dir: str,
    source_schema,
    checkpoint_dir: str,
    stream_id: str = "stream",
    transform=None,
    max_files_per_trigger: int = 4,
    files_per_bucket: int = 1,
    mode: str = "cow",
    auto_compact_after: int | None = None,
    auto_vacuum_every: int | None = None,
    vacuum_keep_snapshots: int = 4,
    auto_rebucket_target_bytes: int | None = None,
):
    """Structured Streaming driver: readStream → foreachBatch(merge).

    Runs with the available-now trigger (drains everything currently in the
    WAL directory, then stops) so tests and bench runs are synchronous; a
    production deployment drops the trigger for continuous tailing.

    The maintenance knobs mirror :func:`run_incremental` — a continuous
    deployment never returns to an operator between batches, so compaction
    (``auto_compact_after``, MOR only), snapshot/file GC
    (``auto_vacuum_every`` / ``vacuum_keep_snapshots``) and bucket-layout
    growth (``auto_rebucket_target_bytes``) run inside ``foreachBatch``,
    after the batch's lake commit. A crash between the commit and its
    maintenance loses nothing: maintenance is state-derived (delta depth,
    snapshot count, bytes/bucket), so the next batch's pass re-evaluates
    the same conditions.

    A Spark streaming source cannot change schema mid-query, so the declared
    ``source_schema`` is fixed — a segment whose parquet footer carries
    columns (or wider types) the declared schema lacks would be SILENTLY
    conformed (extra columns dropped). Each microbatch therefore verifies
    its input files' footers against the declared schema and raises
    :class:`SchemaEvolutionError` pointing to :func:`run_incremental` (the
    driver that evolves schema live) instead of dropping data.
    """
    spark = lake.spark
    stream = (
        spark.readStream.schema(source_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(segments_dir)
    )
    metrics: list[dict] = []
    declared = {f.name: f.dataType for f in source_schema.fields}
    checked: set[str] = set()

    def _assert_footer_schemas():
        # The micro-batch DataFrame doesn't expose its input files, so the
        # guard re-lists the WAL directory on EVERY microbatch (footer reads
        # are cached per file, so steady-state cost is one listing). A
        # snapshot taken before query start would race: a segment created
        # between that listing and the availableNow trigger fixing ITS
        # listing would be read but never footer-checked — exactly the
        # silent conform-and-drop this guard exists to prevent. Re-listing
        # also covers continuous (trigger-less) deployments, at the price of
        # possibly refusing an evolved segment this availableNow pass would
        # not have read — fail-loud beats data loss.
        for p in list_segments(segments_dir):
            if p in checked:
                continue
            if p.endswith((".jsonl", ".orc")):
                # the parquet streaming source would NEVER read this file —
                # silent data loss, so refuse
                raise ValueError(
                    f"run_stream: {p} is a non-parquet segment; the parquet "
                    "streaming source cannot consume it — use "
                    "run_incremental (orc: works directly; jsonl: pass "
                    "json_payload_schema=...)"
                )
            try:
                footer = arrow_schema_of_parquet(p)
            except FileNotFoundError:
                # listed, then vanished before the footer read (e.g. a
                # task-commit rename racing the listing): the stream cannot
                # have read it either; it is re-checked if it reappears
                continue
            extra = [f.name for f in footer.fields if f.name not in declared]
            wider = [
                f.name
                for f in footer.fields
                if f.name in declared
                and f.dataType != declared[f.name]
                and widen(declared[f.name], f.dataType) != declared[f.name]
            ]
            if extra or wider:
                raise SchemaEvolutionError(
                    f"run_stream: segment {p} evolved beyond the declared "
                    f"source schema (new columns {extra}, widened {wider}); "
                    "a fixed-schema streaming source would silently drop "
                    "them — use run_incremental, which evolves the lake "
                    "schema per batch, or restart run_stream with the new "
                    "superset schema"
                )
            checked.add(p)

    def _apply(batch_df, batch_id: int):
        _assert_footer_schemas()
        df = transform(batch_df) if transform is not None else batch_df
        metrics.append(
            apply_batch(
                lake, df, batch_id, stream_id=stream_id,
                files_per_bucket=files_per_bucket, mode=mode,
            )
        )
        if auto_compact_after is not None and mode == "mor":
            lake.maybe_compact(max_delta_files=auto_compact_after,
                               files_per_bucket=files_per_bucket)
        if auto_rebucket_target_bytes is not None:
            lake.maybe_rebucket(target_bucket_bytes=auto_rebucket_target_bytes,
                                files_per_bucket=files_per_bucket)
        if auto_vacuum_every is not None and len(metrics) % auto_vacuum_every == 0:
            lake.vacuum(keep_snapshots=vacuum_keep_snapshots)

    q = (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return metrics
