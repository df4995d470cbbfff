"""JSONL corpus source — the interchange format public text corpora ship
as (Dolma, RedPajama, FineWeb dumps are all JSON-lines), read into the
``documents`` shape the curation plan consumes.

Scale rules this reader hard-codes rather than documents:

- **Explicit schema, never inference.** ``spark.read.json`` without a
  schema runs a FULL extra pass over the corpus just to infer one; at
  100 TB that doubles ingest cost. The documents schema is the default
  and callers override with their own DDL string.
- **Dead-letter, not fail.** PERMISSIVE mode routes malformed lines into
  a ``_corrupt_record`` column (the same contract as the Kafka source's
  dead-letter split and the WARC reader's ``content_len_ok`` flag) so a
  few broken lines in a multi-TB dump are auditable instead of fatal.
- **Lineage.** ``_src_file`` from ``input_file_name()`` — the
  per-partition lineage column the pipeline manifest records.

Splittability note (affects partitioning, not correctness): uncompressed
and bgzip/zstd-seekable JSONL splits per-line across tasks; plain ``.gz``
does not (one task per file) — at corpus scale store zstd or repartition
immediately after read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# the documents-table shape (TESTDATA.md) — the curation plan's input grain
DOCUMENTS_DDL = "doc_id bigint, text string, lang string, source string, n_chars bigint"

CORRUPT_COL = "_corrupt_record"


def load_documents_jsonl(
    spark: SparkSession,
    path: str,
    schema: str | T.StructType | None = None,
    lineage: bool = True,
) -> DataFrame:
    """Read a JSONL corpus with an explicit schema + dead-letter column.

    Returns the parsed frame with ``_corrupt_record`` (null on good rows,
    the raw line on malformed ones) and ``_src_file``. Filter with
    :func:`split_dead_letters` before handing the good side to
    ``plans.curation.run_curation``.

    Implementation: ``read.text`` + ``from_json`` rather than
    ``read.json`` — same line-splittable scan and Jackson parse, but the
    corrupt-record column comes out as a REAL column, so dead-letter
    queries work without Spark's internal-corrupt-column restriction
    (``read.json`` disallows plans that reference only
    ``_corrupt_record``; the documented workaround is ``cache()``, which
    is not a move available at 100 TB)."""
    if schema is None:
        schema = DOCUMENTS_DDL
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    if CORRUPT_COL not in schema.fieldNames():
        schema = T.StructType(
            list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
        )
    raw = spark.read.text(path).where(F.trim(F.col("value")) != "")
    df = raw.select(
        F.from_json(
            F.col("value"),
            schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ).alias("_r"),
        F.col("value"),
    ).select(
        "_r.*",
        # a line whose parse yields a NULL struct (not even a corrupt
        # field) is dead-lettered with the raw line
        F.when(
            F.col("_r").isNull(), F.col("value")
        ).otherwise(F.col(f"_r.{CORRUPT_COL}")).alias("_dead"),
    ).drop(CORRUPT_COL).withColumnRenamed("_dead", CORRUPT_COL)
    if lineage:
        df = df.withColumn("_src_file", F.input_file_name())
    return df


def split_dead_letters(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, dead) split on the corrupt-record column. The dead side
    keeps the raw line + lineage so a corpus build can quantify and
    re-drive malformed input (the manifest's dead-letter count)."""
    good = df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    dead = df.where(F.col(CORRUPT_COL).isNotNull())
    return good, dead
