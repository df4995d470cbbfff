"""WARC (Web ARChive, ISO 28500) record source — crawl-file ingestion.

Common Crawl ships the public web as concatenated WARC records; a
training-corpus pipeline's true S1 source is a bucket of ``*.warc`` files,
not a parquet of clean documents. This module supplies that face the same
way sources/kafka.py supplies the broker face: a real binary-file reader
(``read_warc_files`` → Spark's ``binaryFile`` source) plus a pure-column
record parser, and a deterministic wrapper/generator so the parser is
verified end-to-end in-sandbox with no external data.

Parsing is entirely built-in string/regexp column functions (split on a
lookahead keeps each record self-contained; header fields via
regexp_extract; body boundaries at the ``CRLF CRLF`` separators the spec
mandates) — JVM codegen, no UDF, no shuffle: at 100 TB the record split
fuses into the file scan and each ~1 GiB WARC file is one input split.

Round-trip contract: ``wrap_record`` → ``parse_warc`` returns the exact
payload bytes (the record layout appends exactly one trailing
``CRLF CRLF`` separator, and the parser strips exactly one) — proven
under the driver gate: the ``d_text_profile`` catalog entry threads the
documents table through WARC wrap → group-into-files → parse → HTML
extraction and still matches the unchanged raw-text-hash oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CRLF = "\r\n"
_SEP = CRLF + CRLF
# split keeps each record intact: zero-width lookahead at every version line
_RECORD_SPLIT_RE = r"(?=WARC/1\.0\r\n)"


def wrap_record(
    doc_id,
    html,
    uri=None,
    warc_type: str = "response",
):
    """One spec-shaped WARC response record around an HTML payload:
    WARC headers, blank line, HTTP/1.1 response (status line + headers +
    body), one record separator. ``Content-Length`` is the real octet
    length of the HTTP block, so parsers that honor it agree with ours."""
    if uri is None:
        uri = F.concat(F.lit("https://crawl.example/doc/"), doc_id.cast("string"))
    http_block = F.concat(
        F.lit(
            "HTTP/1.1 200 OK" + CRLF + "Content-Type: text/html; charset=utf-8"
        ),
        F.lit(_SEP),
        html,
    )
    return F.concat(
        F.lit("WARC/1.0" + CRLF),
        F.lit("WARC-Type: " + warc_type + CRLF),
        F.lit("WARC-Record-ID: <urn:doc:"),
        doc_id.cast("string"),
        F.lit(">" + CRLF),
        F.lit("WARC-Target-URI: "),
        uri,
        F.lit(CRLF),
        F.lit("Content-Type: application/http; msgtype=response" + CRLF),
        F.lit("Content-Length: "),
        F.octet_length(http_block).cast("string"),
        F.lit(_SEP),
        http_block,
        F.lit(_SEP),
    )


def group_warc_files(
    df: DataFrame,
    record_col: str = "record",
    id_col: str = "doc_id",
    n_files: int = 32,
) -> DataFrame:
    """Concatenate records into synthetic WARC file payloads —
    ``(file_id, payload)``, deterministic membership (hash of the id) and
    within-file order (by id). One narrow shuffle; synthesis-only (real
    ingestion reads files that already exist)."""
    fid = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_files)).alias("file_id")
    return (
        df.select(fid, F.col(id_col).alias("_k"), F.col(record_col).alias("_r"))
        .groupBy("file_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_k", "_r"))),
                    lambda s: s["_r"],
                ),
                "",
            ).alias("payload")
        )
    )


def parse_warc(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Split WARC file payloads into records and parse each one.

    Output columns: ``warc_type``, ``record_id``, ``target_uri``,
    ``warc_content_length`` (declared), ``http_status``,
    ``http_content_type``, ``html`` (exact body bytes), ``content_len_ok``
    (declared length vs measured — a malformed-record flag, the dead-letter
    predicate for real crawls)."""
    recs = F.filter(
        F.split(F.col(payload_col), _RECORD_SPLIT_RE),
        lambda r: r.startswith("WARC/1.0" + CRLF),
    )
    out = df.select(
        *[c for c in df.columns if c != payload_col],
        F.posexplode(recs).alias("record_idx", "_rec"),
    )
    rec = F.col("_rec")
    warc_hdrs = F.regexp_extract(rec, r"(?s)^WARC/1\.0\r\n(.*?)\r\n\r\n", 1)
    hdr = lambda name: F.regexp_extract(  # noqa: E731
        warc_hdrs, r"(?i)(?:^|\r\n)" + name + r": ([^\r]*)", 1
    )
    # body of the record = after the first CRLF CRLF; HTTP body = after the
    # next one; exactly one trailing record separator comes off the end.
    http_block = F.regexp_replace(rec, r"(?s)^.*?\r\n\r\n", "")
    http_block = F.regexp_replace(http_block, r"\r\n\r\n$", "")
    html = F.regexp_replace(http_block, r"(?s)^.*?\r\n\r\n", "")
    return (
        out.withColumn("warc_type", hdr("WARC-Type"))
        .withColumn(
            "record_id", F.regexp_extract(hdr("WARC-Record-ID"), r"<(.*)>", 1)
        )
        .withColumn("target_uri", hdr("WARC-Target-URI"))
        # malformed/truncated records yield '' from regexp_extract — NULL,
        # not an ANSI cast error (they must reach the dead-letter filter)
        .withColumn(
            "warc_content_length",
            F.nullif(hdr("Content-Length"), F.lit("")).cast("long"),
        )
        .withColumn(
            "http_status",
            F.nullif(
                F.regexp_extract(http_block, r"^HTTP/1\.[01] (\d{3})", 1), F.lit("")
            ).cast("int"),
        )
        .withColumn(
            "http_content_type",
            F.regexp_extract(http_block, r"(?i)\r\nContent-Type: ([^\r]*)", 1),
        )
        .withColumn("html", html)
        .withColumn(
            "content_len_ok",
            F.col("warc_content_length") == F.octet_length(http_block),
        )
        .drop("_rec")
    )


def read_warc_files(spark: SparkSession, path: str) -> DataFrame:
    """Real crawl-file face: whole-file binary read → utf-8 payloads ready
    for :func:`parse_warc`. (Production WARCs are gzip *members* per
    record; Spark's codec handles ``.warc.gz`` transparently when read as
    text — the binaryFile face covers the uncompressed/test case, and the
    parser is identical either way.)"""
    return spark.read.format("binaryFile").load(path).select(
        F.col("path").alias("warc_path"),
        F.decode(F.col("content"), "utf-8").alias("payload"),
    )
