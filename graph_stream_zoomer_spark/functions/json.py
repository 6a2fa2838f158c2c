"""Semi-structured (JSON string) column handling — typed metadata
promotion for event/metadata payloads (e.g. the events table's ``props``).
Beyond-reference addition (no graph-stream-zoomer counterpart; the
closest analog is the reference's property-bag extraction, P1/P6 in
SURVEY.md §2 — this is the same promote-to-typed-column step for opaque
JSON instead of Gradoop property maps).

Two stages of the standard pipeline pattern:
  1. DISCOVER: ``json_key_stats`` profiles which keys exist and how often —
     the schema-inference step you run once per source at 100 TB instead
     of ``spark.read.json``'s full-corpus inference pass.
  2. PROMOTE: ``promote_json`` parses the column ONCE per row with
     ``from_json`` against an explicit DDL schema and promotes the fields
     to typed top-level columns (Catalyst prunes the parse to the consumed
     fields). Corrupt payloads don't kill the job: the parsed struct is
     null and the raw payload is preserved in ``corrupt_col`` for
     quarantine — same policy as the Kafka source adapter
     (sources/kafka.py).

Both are pure projections — zero shuffle, stream-transparent (they run
unchanged on ``readStream`` inputs), and whole-stage-codegen friendly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def json_key_stats(df: DataFrame, json_col: str = "props") -> DataFrame:
    """Key histogram over a JSON-object string column: one row per
    top-level key with occurrence count and presence ratio. One
    map-side-combinable groupBy on the (tiny) key domain; the row total
    joins in as a broadcast 1-row aggregate (no driver-side action)."""
    total = df.agg(F.count(F.lit(1)).alias("_total"))
    keys = df.select(
        F.explode(F.json_object_keys(F.col(json_col))).alias("key")
    )
    return (
        keys.groupBy("key")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .crossJoin(F.broadcast(total))
        .select(
            "key",
            "n_rows",
            F.round(
                F.col("n_rows") / F.greatest(F.col("_total"), F.lit(1)), 5
            ).alias("presence"),
        )
    )


def promote_json(
    df: DataFrame,
    json_col: str = "props",
    ddl: str = "k INT",
    prefix: str = "",
    drop: bool = False,
    corrupt_col: str | None = None,
) -> DataFrame:
    """Promote fields of a JSON string column to typed top-level columns.

    ``ddl`` is an explicit Spark DDL schema ("k INT, name STRING") — one
    ``from_json`` parse per row, fields pruned to what downstream consumes.
    Missing keys and type mismatches come out null (from_json PERMISSIVE
    semantics — the parsed struct is all-null, NOT null, on corrupt input).
    When ``corrupt_col`` is set, unparseable payloads keep their raw bytes
    there via from_json's ``columnNameOfCorruptRecord`` channel (null
    elsewhere) so a later filter can quarantine instead of silently
    nulling.
    """
    # Parse the DDL properly — a naive split(",") mis-parses any type with
    # embedded commas (DECIMAL(10,2), ARRAY<STRUCT<a:INT,b:INT>>, MAP<..>),
    # inventing bogus field names. StructType.fromDDL gives the real field
    # list, and the same StructType feeds from_json.
    from pyspark.sql.types import StructField, StructType
    from pyspark.sql.types import StringType

    schema = StructType.fromDDL(ddl)
    field_names = [f.name for f in schema.fields]
    if corrupt_col is not None:
        parsed = F.from_json(
            F.col(json_col),
            StructType(schema.fields + [StructField("_corrupt", StringType())]),
            {"columnNameOfCorruptRecord": "_corrupt"},
        )
    else:
        parsed = F.from_json(F.col(json_col), schema)
    out = df.withColumn("_parsed", parsed)
    for name in field_names:
        out = out.withColumn(prefix + name, F.col("_parsed")[name])
    if corrupt_col is not None:
        out = out.withColumn(corrupt_col, F.col("_parsed")["_corrupt"])
    out = out.drop("_parsed")
    if drop:
        out = out.drop(json_col)
    return out
