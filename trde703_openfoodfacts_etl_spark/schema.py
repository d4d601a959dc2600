"""Canonical transcript schema, CDC event envelope, and schema diff/merge.

Maps the reference's "conforming projection with missing-column tolerance"
(reference: etl/bronze_to_silver.py:59-184 — absent source columns
materialize as typed nulls) into a general per-batch schema-evolution rule:

- columns present in the batch but not in the lake → ADD (nullable) to the
  lake schema;
- columns whose batch type is a WIDENING of the lake type
  (int→long, int→double, long→double, float→double) → widen the lake type;
- anything else incompatible → hard error (never corrupt the lake).

The lake never requires an ALTER statement: the unified schema is carried in
the snapshot manifest and every reader casts file groups to it on read.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Canonical shapes (BASELINE.json input_hint)
# ---------------------------------------------------------------------------

#: Base lake-table row: one conversation turn.
TRANSCRIPT_FIELDS = [
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("turn_idx", T.IntegerType(), False),
    T.StructField("role", T.StringType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("tool", T.StringType(), True),
    T.StructField("ts", T.TimestampType(), True),
]
TRANSCRIPT_SCHEMA = T.StructType(TRANSCRIPT_FIELDS)

#: CDC envelope columns wrapping a transcript row (binlog/WAL position).
CDC_ENVELOPE_FIELDS = [
    T.StructField("op", T.StringType(), False),  # I / U / D
    T.StructField("lsn", T.LongType(), False),  # monotone WAL position
    T.StructField("event_ts", T.TimestampType(), True),  # commit time
]

#: Full CDC event schema (v1): envelope + payload.
CDC_SCHEMA = T.StructType(CDC_ENVELOPE_FIELDS + TRANSCRIPT_FIELDS)

#: v2 adds a metadata column mid-stream and widens turn_idx (FIXTURES.md §3).
CDC_SCHEMA_V2 = T.StructType(
    CDC_ENVELOPE_FIELDS
    + [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.LongType(), False),  # widened int32→int64
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("tool_meta", T.StringType(), True),  # added column
        T.StructField("ts", T.TimestampType(), True),
    ]
)

#: Natural key of the lake table (analog of reference barcode `code`,
#: reference: docs/data_dictionary.md:105).
KEY_COLS = ["conv_id", "turn_idx"]

#: LWW ordering (ts, lsn) — replaces reference
#: desc(coalesce(last_modified_t, 0)) (etl/bronze_to_silver.py:230-232).
ORDER_COLS = ["ts", "lsn"]

#: Internal lake bookkeeping columns (never part of the user schema).
META_DELETED = "_deleted"
META_LSN = "_lsn"
META_ROW_HASH = "_row_hash"
META_BUCKET = "_bucket"
META_COLS = [META_DELETED, META_LSN, META_ROW_HASH]

# ---------------------------------------------------------------------------
# Widening lattice + merge
# ---------------------------------------------------------------------------

_WIDEN: dict[tuple[str, str], T.DataType] = {
    ("integer", "long"): T.LongType(),
    ("short", "integer"): T.IntegerType(),
    ("short", "long"): T.LongType(),
    ("byte", "short"): T.ShortType(),
    ("byte", "integer"): T.IntegerType(),
    ("byte", "long"): T.LongType(),
    ("integer", "double"): T.DoubleType(),
    ("long", "double"): T.DoubleType(),
    ("float", "double"): T.DoubleType(),
    ("integer", "float"): T.FloatType(),
    ("date", "timestamp"): T.TimestampType(),
    # with the session timezone pinned to UTC these are value-identical;
    # unify on the session-TZ type
    ("timestamp_ntz", "timestamp"): T.TimestampType(),
    ("date", "timestamp_ntz"): T.TimestampType(),
}


#: max base-10 digits an integral type can need (for int→decimal widening)
_INT_DIGITS = {"byte": 3, "short": 5, "integer": 10, "long": 20}


def _widen_decimal(a: T.DataType, b: T.DataType) -> T.DataType | None:
    """Decimal lattice (reference uses decimal(3,2) completeness scores,
    etl/utils/quality.py:33, and DECIMAL(10,2) facts,
    sql/ddl/02_create_facts.sql:14-23): the merged type keeps the max scale
    and the max integral width — decimal(p1,s1) ∨ decimal(p2,s2) =
    decimal(max(p1-s1, p2-s2) + max(s1,s2), max(s1,s2)); integral types join
    as decimal(digits, 0). Exceeding Spark's 38-digit cap, or mixing decimal
    with float/double/string, is incompatible (never silently lose
    precision) → None, which merge_schemas turns into SchemaEvolutionError.
    """

    def ps(t: T.DataType) -> tuple[int, int] | None:
        if isinstance(t, T.DecimalType):
            return t.precision, t.scale
        d = _INT_DIGITS.get(t.typeName())
        return (d, 0) if d is not None else None

    pa, pb = ps(a), ps(b)
    if pa is None or pb is None:
        return None
    scale = max(pa[1], pb[1])
    integral = max(pa[0] - pa[1], pb[0] - pb[1])
    if integral + scale > 38:
        return None
    return T.DecimalType(integral + scale, scale)


def widen(a: T.DataType, b: T.DataType) -> T.DataType | None:
    """Least common widened type of a and b, or None if incompatible."""
    if a == b:
        return a
    if isinstance(a, T.DecimalType) or isinstance(b, T.DecimalType):
        return _widen_decimal(a, b)
    key = (a.typeName(), b.typeName())
    if key in _WIDEN:
        return _WIDEN[key]
    rkey = (b.typeName(), a.typeName())
    if rkey in _WIDEN:
        return _WIDEN[rkey]
    return None


class SchemaEvolutionError(ValueError):
    pass


def merge_schemas(current: T.StructType, incoming: T.StructType) -> tuple[T.StructType, dict]:
    """Merge an incoming batch schema into the lake schema.

    Returns (unified_schema, change_report). change_report holds
    ``added`` / ``widened`` lists so the commit can record lineage.
    Column order: current columns first (possibly widened), then new
    columns in incoming order — old readers keep their positions.
    """
    added: list[str] = []
    widened: list[str] = []
    by_name = {f.name: f for f in incoming.fields}
    out: list[T.StructField] = []
    for f in current.fields:
        inc = by_name.get(f.name)
        if inc is None:
            out.append(f)
            continue
        t = widen(f.dataType, inc.dataType)
        if t is None:
            raise SchemaEvolutionError(
                f"column {f.name}: cannot merge {f.dataType.simpleString()} "
                f"with {inc.dataType.simpleString()}"
            )
        if t != f.dataType:
            widened.append(f"{f.name}:{f.dataType.simpleString()}->{t.simpleString()}")
        out.append(T.StructField(f.name, t, nullable=f.nullable or inc.nullable))
    have = {f.name for f in out}
    for f in incoming.fields:
        if f.name not in have:
            # New columns are always nullable: rows written before the column
            # existed read as null (reference's lit(None).cast(T) pattern).
            out.append(T.StructField(f.name, f.dataType, nullable=True))
            added.append(f"{f.name}:{f.dataType.simpleString()}")
    return T.StructType(out), {"added": added, "widened": widened}


def conform(df, target: T.StructType):
    """Project/cast df to exactly `target` (missing columns → typed nulls).

    The Spark-first lift of the reference's defensive projection
    (etl/bronze_to_silver.py:59-181): one declarative select Catalyst can
    prune/push through, no per-column ifs at runtime.
    """
    from pyspark.sql import functions as F

    cols = set(df.columns)
    exprs = []
    for f in target.fields:
        if f.name in cols:
            exprs.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            exprs.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*exprs)


def schema_to_json(s: T.StructType) -> str:
    return s.json()


def schema_from_json(j: str) -> T.StructType:
    return T.StructType.fromJson(__import__("json").loads(j))


def arrow_schema_of_parquet(path: str) -> T.StructType:
    """Read a parquet file's Arrow schema footer (no Spark job) and convert
    to a Spark StructType — the per-batch schema-diff entry point."""
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import from_arrow_schema

    return from_arrow_schema(pq.read_schema(path))


def arrow_schema_of_orc(path: str) -> T.StructType:
    """ORC twin of :func:`arrow_schema_of_parquet`: read the ORC file
    footer's Arrow schema driver-side (no Spark job).

    ORC has no TIMESTAMP_NTZ physical type — Spark writes it as int64 and
    annotates the field with ``spark.sql.catalyst.type`` metadata, which
    Spark's own reader honors. Honor it here too, or an NTZ column's
    footer diff would report bigint and hard-fail schema evolution."""
    import pyarrow.orc as po
    from pyspark.sql.pandas.types import from_arrow_schema

    sch = po.ORCFile(path).schema
    base = from_arrow_schema(sch)
    fields: list[T.StructField] = []
    for i, f in enumerate(base.fields):
        meta = sch.field(i).metadata or {}
        catalyst = meta.get(b"spark.sql.catalyst.type")
        if catalyst:
            from pyspark.sql.types import _parse_datatype_string

            dt = _parse_datatype_string(catalyst.decode())
            fields.append(T.StructField(f.name, dt, f.nullable))
        else:
            fields.append(f)
    return T.StructType(fields)


def arrow_schema_of_segment(path: str) -> T.StructType:
    """Footer schema of a columnar WAL segment (parquet or ORC)."""
    if path.endswith(".orc"):
        return arrow_schema_of_orc(path)
    return arrow_schema_of_parquet(path)
