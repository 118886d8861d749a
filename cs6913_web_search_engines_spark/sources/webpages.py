"""Web-pages corpus: synthesis, extraction, docID minting.

The engine's input is an Iceberg/Parquet table of Common-Crawl-style
web pages ``(url string, warc_ts timestamp, html binary, text string,
lang string)``, plus ``status int`` and ``thread string`` fetch-
outcome/attribution columns feeding the crawl-log analytics (the
reference's log rows each carry a status and a fetching thread,
``web_crawler.py:586-650,816-853``).  In this sandbox we synthesize that table
deterministically from the driver's ``documents.parquet`` (doc_id,
text, lang, source, n_chars) — same shape, same content, seedless
(pure functions of doc_id/text), so Spark and the DuckDB oracle agree
byte-for-byte.

Extraction invariant (north rule): ``extract_text(html)`` must be
byte-identical to the page's ``text`` column per url.  The synthetic
html wraps text in a fixed template and extraction takes the bytes
between the ``<p>`` markers, shared by engine and oracle.

The reference's docID-assignment role (crawl order + dataset prep,
``web_crawler.py`` + ``IndexBuilder.cpp:131-156``) is played by
:func:`mint_doc_ids` — dense 0..N-1 by url order, deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Duplicated doc_id inside the page body exercises the extraction
# boundary; the trailing query+fragment exercise the URL operators
# (F6/F7/F8 in SURVEY §2.2).
_URL_SQL = (
    "concat('https://www.', source, cast(doc_id % 97 as string),"
    "'.example.nz/docs/', cast(doc_id as string), '.html?session=abc#frag')"
)
# Three anchor links per page feed the link-graph operators (F10/J9,
# web_crawler.py:506-539): a root-relative link (urljoin case), a
# cross-domain absolute link (drives real in-degree), and a skewed
# hub link (7 hub domains, head-of-distribution case).
_LINK_REL_SQL = "concat('/docs/', cast((doc_id * 7 + 13) % 500 as string), '.html')"
_LINK_ABS_SQL = (
    "concat('https://www.', source, cast((doc_id + 1) % 97 as string),"
    "'.example.nz/docs/', cast(doc_id + 1 as string), '.html?ref=', "
    "cast(doc_id as string))"
)
_LINK_HUB_SQL = "concat('https://hub', cast(doc_id % 7 as string), '.example.nz/index.html')"
# Fetch outcome (A9 tail, web_crawler.py:826-853): the reference's
# crawl log keys its histogram on the HTTP status (plus the string
# 'Unexpected Failure' for parse/redirect-limit errors, which the
# typed schema models as -1).  ~90% success, deterministic in doc_id.
_STATUS_SQL = (
    "CAST(CASE WHEN doc_id % 41 = 0 THEN 404"
    " WHEN doc_id % 41 = 1 THEN 500"
    " WHEN doc_id % 41 = 2 THEN 301"
    " WHEN doc_id % 41 = 3 THEN -1"
    " ELSE 200 END AS INT)"
)
# Fetch-worker attribution (A9 tail): the reference crawls with 10
# named threads and logs per-thread URL totals
# (web_crawler.py:586-597,846-853); deterministic in doc_id.
_THREAD_SQL = "concat('Thread-', CAST(doc_id % 10 + 1 AS STRING))"
_HTML_SQL = (
    # coalesce: Spark's concat is NULL-absorbing while DuckDB's skips
    # NULL arguments — a NULL text would produce html = NULL in the
    # engine but a full template in the oracle; '' is the one value
    # both agree on
    "concat('<html><head><title>doc ', cast(doc_id as string),"
    "'</title></head><body><p>', coalesce(text, ''), '</p>',"
    f"'<a href=\"', {_LINK_REL_SQL}, '\">r</a>',"
    f"'<a href=\"', {_LINK_ABS_SQL}, '\">a</a>',"
    f"'<a href=\"', {_LINK_HUB_SQL}, '\">h</a>',"
    "'</body></html>')"
)
# (?s): '.' must match newlines (same inline flag in Java regex and
# DuckDB RE2) — without it any page whose body text spans lines
# extracts to '' and silently indexes as an empty document
_EXTRACT_RE = "(?s)<p>(.*)</p>"


def synthesize(documents: DataFrame) -> DataFrame:
    """documents(doc_id, text, lang, source, ...) → web-pages table."""
    return documents.select(
        F.expr(_URL_SQL).alias("url"),
        # days + minutes split keeps every component inside int32 up
        # to ~5.9e12 docs (a bare mins=doc_id cast wraps at 2^31 —
        # inside the target corpus scale — while the DuckDB twin's
        # to_minutes(BIGINT) would not, silently diverging)
        (F.to_timestamp(F.lit("2024-01-01 00:00:00"))
         + F.make_interval(
             days=F.expr("doc_id div 1440").cast("int"),
             mins=F.expr("doc_id % 1440").cast("int"))).alias("warc_ts"),
        F.encode(F.expr(_HTML_SQL), "UTF-8").alias("html"),
        F.col("text"),
        F.col("lang"),
        F.expr(_STATUS_SQL).alias("status"),
        F.expr(_THREAD_SQL).alias("thread"),
    )


def synthesize_sql(documents_rel: str = "documents") -> str:
    """DuckDB-SQL mirror of :func:`synthesize` (oracle side).

    DuckDB accepts ``STRING`` as a VARCHAR alias, so the projection
    strings are shared verbatim with the Spark side.
    """
    return f"""
        SELECT {_URL_SQL} AS url,
               TIMESTAMP '2024-01-01 00:00:00'
                   + to_minutes(CAST(doc_id AS BIGINT)) AS warc_ts,
               ENCODE({_HTML_SQL}) AS html,
               text, lang,
               {_STATUS_SQL} AS status,
               {_THREAD_SQL} AS thread
        FROM {documents_rel}
    """


def extract_text(pages: DataFrame) -> DataFrame:
    """Adds ``extracted`` — byte-identical to ``text`` per url."""
    return pages.withColumn(
        "extracted", F.regexp_extract(F.decode(F.col("html"), "UTF-8"), _EXTRACT_RE, 1)
    )


EXTRACT_SQL = f"regexp_extract(DECODE(html), '{_EXTRACT_RE}', 1)"


def mint_doc_ids(pages: DataFrame) -> DataFrame:
    """Dense doc_id 0..N-1 by url order (deterministic crawl-order analog).

    A global ``row_number`` window is a single-reducer sort at 10^12
    rows; use :func:`mint_doc_ids_scalable` for the real pipeline.
    This exact variant exists for fixtures and oracle parity.
    """
    w = Window.orderBy("url")
    return pages.withColumn("doc_id", F.row_number().over(w) - F.lit(1))


def mint_doc_ids_scalable(pages: DataFrame, n_buckets: int = 4096) -> DataFrame:
    """Dense doc_id by url order without a global sort.

    Two-pass: range-bucket urls, count per bucket, broadcast the
    prefix-sum of bucket offsets, then doc_id = bucket_offset +
    rank-within-bucket.  Each pass is fully parallel; the only global
    structure is the (tiny) bucket-offset map.

    The bucketed table is MATERIALIZED once (localCheckpoint) before
    the count pass: RangePartitioner re-samples its boundaries per
    action (the reservoir seed incorporates the RDD id), so without
    pinning, the count job and the rank job could disagree about which
    bucket a boundary-adjacent url belongs to — offset + rank would
    then mint colliding/holey doc_ids.  Exhaustive sampling hides this
    at fixture scale; the 10^12-row regime this function exists for is
    exactly where sampling kicks in.
    """
    bucketed = pages.repartitionByRange(n_buckets, "url")
    part = F.spark_partition_id()
    with_pid = (bucketed.withColumn("_pid", part)
                .localCheckpoint(eager=True))
    counts = with_pid.groupBy("_pid").count().orderBy("_pid").collect()
    offsets, acc = {}, 0
    for row in counts:
        offsets[row["_pid"]] = acc
        acc += row["count"]
    offmap = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
    w = Window.partitionBy("_pid").orderBy("url")
    return (
        with_pid.withColumn("_rk", F.row_number().over(w) - F.lit(1))
        .withColumn("doc_id", (offmap[F.col("_pid")] + F.col("_rk")).cast("long"))
        .drop("_pid", "_rk")
    )
