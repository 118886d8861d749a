"""Crawl-output analytics: URL ops, per-domain stats, priority scoring.

The reference crawler (``web_crawler/web_crawler.py``) keeps its
state in lock-guarded dicts and computes priorities imperatively;
the analytics over that state map to plain DataFrame ops (SURVEY
§1.7, §2.2 F6-F9, §2.3 A9, §2.8 M5).  Live HTTP stays out of scope —
the input is the synthesized web-pages table (sources/webpages.py).

All string surgery uses regexes shared verbatim between Spark SQL and
DuckDB, and the priority bucket chains are one CASE-expression string
evaluated by both engines, so the oracle agrees exactly.

Scale shape: everything here is scan → narrow projections → one
groupBy(domain) (plus one groupBy(second_last) broadcast back) — the
classic two-level rollup; no skew risk beyond domain popularity,
which AQE handles (domains are many and shallow compared to terms).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


# web_crawler.py:112-124 — extension blacklist (joined to one regex).
BLACKLIST_EXT = (
    "jpg|jpeg|png|gif|bmp|svg|pdf|doc|docx|xls|xlsx|ppt|txt|zip|rar|tar|gz|7z|bz2"
    "|mp3|wav|ogg|aac|flac|mp4|avi|mov|mkv|webm|exe|bin|dll|msi|sh|iso|css|js"
    "|json|xml|rss|ico|ttf|woff|woff2|eot|swf|flv|fla|php|aspx|cgi|py|pl|rb|jsp"
    "|dat|log|bak"
)
# web_crawler.py:126-130 — common second-last domains.
SL_WHITELIST = ("ac", "ai", "biz", "co", "com", "cri", "edu", "govt", "health",
                "info", "int", "io", "mil", "net", "org", "tech", "xyz")

# Shared column SQL (valid in both Spark SQL and DuckDB), parametric
# in the column so the same surgery applies to page urls and links.
# Patterns are written BACKSLASH-FREE (literal dot = [.], ? literal
# inside classes): Spark's SQL parser treats backslash in a
# single-quoted literal as an escape while DuckDB keeps it, so
# '^www\.' silently ran as '^www.' (any char) in Spark only —
# stripping 'www2'/'wwwx' prefixes and mismatching the oracle on any
# host matching ^www[^.]:


def _host_of(c: str) -> str:    # F8 web_crawler.py:163-170
    return f"regexp_extract({c}, '^[a-z]+://([^/?#]+)', 1)"


def _path_of(c: str) -> str:
    return f"regexp_extract({c}, '^[a-z]+://[^/?#]+([^?#]*)', 1)"


def _min_of(c: str) -> str:
    # F7 web_crawler.py:559-584: '//' + lower(host)-www. + path-rstrip-/
    return (
        f"concat('//', regexp_replace(lower({_host_of(c)}), '^www[.]', ''), "
        f"regexp_replace({_path_of(c)}, '/+$', ''))"
    )


_NORM = "regexp_replace(url, '[?#].*$', '')"                 # F6 web_crawler.py:542-556
_HOST = _host_of("url")
_PATH = _path_of("url")
_MIN = _min_of("url")


def _sl_sql(host_expr: str) -> str:
    # second-last label: 'example.co.nz' → 'co' (web_crawler.py:187-196)
    return f"regexp_extract({host_expr}, '([^.]+)[.][^.]+$', 1)"


def url_features(pages: DataFrame) -> DataFrame:
    """(url, url_norm, url_min, domain, second_last, is_valid) — the
    reference's URL toolkit as one narrow projection."""
    valid = (
        F.expr(f"{_HOST}").endswith(".nz")
        & ~F.lower("url").rlike(f"\\.({BLACKLIST_EXT})$")
    )
    return pages.select(
        "url",
        F.expr(_NORM).alias("url_norm"),
        F.expr(_MIN).alias("url_min"),
        F.expr(_HOST).alias("domain"),
        F.expr(_sl_sql(_HOST)).alias("second_last"),
        valid.cast("boolean").alias("is_valid"),
    )


def url_features_sql(pages_rel: str) -> str:
    return f"""
SELECT url,
       {_NORM} AS url_norm,
       {_MIN} AS url_min,
       {_HOST} AS domain,
       {_sl_sql(_HOST)} AS second_last,
       ({_HOST} LIKE '%.nz')
           AND NOT regexp_matches(lower(url), '\\.({BLACKLIST_EXT})$') AS is_valid
FROM ({pages_rel})
"""


def domain_stats(pages: DataFrame) -> DataFrame:
    """Per-domain crawl-log rollup (A9, web_crawler.py:799-853):
    page count, total/avg page bytes, first/last fetch time, and the
    fetch-success rate (status == 200, web_crawler.py:800)."""
    return (
        pages.select(
            F.expr(_HOST).alias("domain"),
            F.octet_length("html").alias("nbytes"),
            "warc_ts",
            (F.col("status") == 200).cast("int").alias("ok"),
        )
        .groupBy("domain")
        .agg(
            F.count("*").cast("int").alias("n_pages"),
            F.sum("nbytes").alias("total_bytes"),
            F.round(F.avg("nbytes"), 6).alias("avg_bytes"),
            F.min("warc_ts").alias("first_ts"),
            F.max("warc_ts").alias("last_ts"),
            F.sum("ok").cast("int").alias("n_ok"),
            F.round(F.sum("ok") / F.count("*"), 6).alias("success_rate"),
        )
    )


def domain_stats_sql(pages_rel: str) -> str:
    return f"""
SELECT {_HOST} AS domain,
       CAST(COUNT(*) AS INT) AS n_pages,
       CAST(SUM(octet_length(html)) AS BIGINT) AS total_bytes,
       ROUND(AVG(octet_length(html)), 6) AS avg_bytes,
       MIN(warc_ts) AS first_ts,
       MAX(warc_ts) AS last_ts,
       CAST(SUM(CASE WHEN status = 200 THEN 1 ELSE 0 END) AS INT) AS n_ok,
       ROUND(SUM(CASE WHEN status = 200 THEN 1 ELSE 0 END)
                 / COUNT(*)::DOUBLE, 6) AS success_rate
FROM ({pages_rel})
GROUP BY 1
"""


def status_histogram(pages: DataFrame) -> DataFrame:
    """A9 — the crawl log's HTTP-status-code summary
    (web_crawler.py:826-853: per-status counts over url_visited;
    'Unexpected Failure' is status = -1 in the typed schema).  One
    hash-agg on a ~5-value key: map-side partial aggregation reduces
    each partition to a handful of rows, so at 10^12 pages the shuffle
    is O(partitions), not O(rows)."""
    return pages.groupBy("status").agg(
        F.count("*").cast("long").alias("n_pages"),
        F.sum(F.octet_length("html")).alias("total_bytes"),
    )


def status_histogram_sql(pages_rel: str) -> str:
    return f"""
SELECT status, CAST(COUNT(*) AS BIGINT) AS n_pages,
       CAST(SUM(octet_length(html)) AS BIGINT) AS total_bytes
FROM ({pages_rel})
GROUP BY 1
"""


def crawl_summary(pages: DataFrame) -> DataFrame:
    """A9 — the crawl log's closing statistics block
    (web_crawler.py:799-841): total trials, successful (status 200)
    pages, total size in MB, and the reference's avg-page-size formula
    ``total_size_bytes / successful_pages / 1024`` KB
    (web_crawler.py:803).  Single global agg — one row out."""
    ok = (F.col("status") == 200).cast("int")
    return pages.agg(
        F.count("*").cast("long").alias("total_pages"),
        F.sum(ok).cast("long").alias("ok_pages"),
        F.round(F.sum(F.octet_length("html")) / F.lit(1024.0 * 1024.0), 6)
        .alias("total_mb"),
        F.round(
            F.sum(F.octet_length("html"))
            / F.greatest(F.sum(ok), F.lit(1)) / F.lit(1024.0), 6
        ).alias("avg_ok_kb"),
    )


def thread_stats(pages: DataFrame) -> DataFrame:
    """A9 — per-thread crawl totals ("Thread-i processed N URLs",
    web_crawler.py:846-853's thread_stats block, plus the per-thread
    success split the log derives).  One hash-agg on the 10-value
    thread key; at any scale this is a map-side-combined 10-row
    aggregate."""
    ok = (F.col("status") == 200).cast("int")
    return pages.groupBy("thread").agg(
        F.count("*").cast("long").alias("n_urls"),
        F.sum(ok).cast("long").alias("n_ok"),
        F.round(F.sum(F.octet_length("html")) / F.lit(1024.0), 6)
        .alias("total_kb"),
    )


def thread_stats_sql(pages_rel: str) -> str:
    return f"""
SELECT thread, CAST(COUNT(*) AS BIGINT) AS n_urls,
       CAST(SUM(CASE WHEN status = 200 THEN 1 ELSE 0 END) AS BIGINT) AS n_ok,
       ROUND(SUM(octet_length(html)) / 1024.0, 6) AS total_kb
FROM ({pages_rel}) GROUP BY thread
"""


def crawl_summary_sql(pages_rel: str) -> str:
    return f"""
SELECT CAST(COUNT(*) AS BIGINT) AS total_pages,
       CAST(SUM(CASE WHEN status = 200 THEN 1 ELSE 0 END) AS BIGINT) AS ok_pages,
       ROUND(SUM(octet_length(html)) / (1024.0 * 1024.0), 6) AS total_mb,
       ROUND(SUM(octet_length(html))
                 / GREATEST(SUM(CASE WHEN status = 200 THEN 1 ELSE 0 END), 1)
                 / 1024.0, 6) AS avg_ok_kb
FROM ({pages_rel})
"""


# --- link graph (F10 / J9 / in-degree) --------------------------------------

# href extraction: the batch analog of BeautifulSoup a[href]
# (web_crawler.py:506-539); resolution implements the urljoin cases
# the crawler actually hits: absolute http(s) passthrough,
# root-relative, and dir-relative (no ../ traversal).
_SCHEME = "regexp_extract(url, '^([a-z]+)://', 1)"
_BASE_DIR = f"regexp_replace({_path_of('url')}, '[^/]*$', '')"
# dir-relative resolution needs a '/' even when the base URL has no
# path at all ('https://a.nz' + 'about.html' must NOT yield
# 'https://a.nzabout.html' — urljoin gives 'https://a.nz/about.html')
_BASE_DIR_SAFE = f"CASE WHEN {_BASE_DIR} = '' THEN '/' ELSE {_BASE_DIR} END"
# urljoin fidelity (shared verbatim with the DuckDB oracle twin):
# protocol-relative '//host/path' inherits only the scheme, and
# foreign-scheme hrefs (mailto:, javascript:, ftp:) pass through
# unchanged — their host then fails the .nz validity check and the
# crawler drops them, exactly as the reference's urljoin + filter do.
# Without these branches '//cdn.other.nz/x' was credited to the BASE
# host and 'mailto:...' became a crawlable same-host URL.
_RESOLVE = (
    "CASE WHEN raw_link LIKE 'http://%' OR raw_link LIKE 'https://%' THEN raw_link "
    f"WHEN raw_link LIKE '//%' THEN concat({_SCHEME}, ':', raw_link) "
    "WHEN regexp_extract(raw_link, '^([a-zA-Z][a-zA-Z0-9+.-]*):', 1) <> '' "
    "THEN raw_link "
    f"WHEN raw_link LIKE '/%' THEN concat({_SCHEME}, '://', {_HOST}, raw_link) "
    # query-only / fragment-only hrefs resolve against the FULL base
    # URL, not its directory (urljoin: '?page=2' replaces the base's
    # query keeping the page path; '#sec' keeps path AND query) — the
    # extremely common pagination/anchor hrefs used to collapse to the
    # base dir, minting phantom frontier urls
    "WHEN raw_link LIKE '?%' "
    "THEN concat(regexp_replace(url, '[?#].*$', ''), raw_link) "
    "WHEN raw_link LIKE '#%' "
    "THEN concat(regexp_replace(url, '#.*$', ''), raw_link) "
    "WHEN raw_link = '' THEN url "
    f"ELSE concat({_SCHEME}, '://', {_HOST}, {_BASE_DIR_SAFE}, raw_link) END"
)
_HREF_ALL = "regexp_extract_all({html_str}, 'href=\"([^\"]*)\"', 1)"


def extract_links(pages: DataFrame) -> DataFrame:
    """(url, link) — one row per href, resolved to an absolute URL
    (F10, web_crawler.py:506-539).  Narrow explode + projections, no
    shuffle; at 10^12 pages this is a map-only stage."""
    exploded = pages.select(
        "url",
        F.explode(
            F.expr(_HREF_ALL.format(html_str="decode(html, 'UTF-8')"))
        ).alias("raw_link"),
    )
    return exploded.select("url", F.expr(_RESOLVE).alias("link"))


def link_graph(pages: DataFrame) -> DataFrame:
    """(url, link, link_domain, link_min, is_valid, cross_domain) —
    the edge table feeding in-degree (web_crawler.py:172-185) and the
    frontier anti-join (web_crawler.py:728-741)."""
    lh = _host_of("link")
    valid = (
        F.expr(lh).endswith(".nz")
        & ~F.lower("link").rlike(f"\\.({BLACKLIST_EXT})$")
    )
    return extract_links(pages).select(
        "url",
        "link",
        F.expr(lh).alias("link_domain"),
        F.expr(_min_of("link")).alias("link_min"),
        valid.cast("boolean").alias("is_valid"),
        (F.expr(lh) != F.expr(_HOST)).cast("boolean").alias("cross_domain"),
    )


def _per_url_rollup(pages: DataFrame) -> DataFrame:
    """(link_min, domain, xd) — ONE groupBy over the valid link graph,
    shared by :func:`domain_in_degree` and :func:`frontier_new_urls`.
    The HTML decode + href explode feeding it is the dominant scan at
    corpus scale; deriving both consumers from this identical subtree
    lets Spark reuse the exchange instead of decoding the corpus twice
    per :func:`frontier_order` call."""
    lg = link_graph(pages).filter(F.col("is_valid"))
    return lg.groupBy("link_min").agg(
        F.min("link_domain").alias("domain"),
        F.max(F.col("cross_domain").cast("int")).alias("xd"),
    )


def domain_in_degree(pages: DataFrame,
                     per_url: DataFrame | None = None) -> DataFrame:
    """(domain, in_degree) — REAL in-degree from the link graph.

    Batch analog of the crawler's enqueue-time accounting
    (web_crawler.py:172-185): each distinct enqueued URL (by url_min,
    the enqueue-dedup key) counts once toward its domain iff some
    cross-domain page links to it (same-domain links never increment
    in_degree; the reference's thread-order dependence is replaced by
    the order-free 'any cross-domain parent' rule)."""
    if per_url is None:
        per_url = _per_url_rollup(pages)
    return (
        per_url.filter(F.col("xd") == 1)
        .groupBy("domain")
        .agg(F.count("*").cast("long").alias("in_degree"))
    )


def frontier_new_urls(pages: DataFrame,
                      per_url: DataFrame | None = None) -> DataFrame:
    """(url_min, domain) — valid candidate links not yet crawled:
    ``links LEFT ANTI JOIN seen ON url_min`` (J9,
    web_crawler.py:728-741).  Both sides shuffle once on url_min."""
    if per_url is None:
        per_url = _per_url_rollup(pages)
    seen = pages.select(F.expr(_MIN).alias("url_min")).distinct()
    return (
        per_url.select(F.col("link_min").alias("url_min"), "domain")
        .join(seen, "url_min", "left_anti")
    )


def frontier_order(pages: DataFrame, budget: int = 1000) -> DataFrame:
    """T7 — priority-ordered frontier: (url_min, domain,
    final_priority, pos) for the next ``budget`` uncrawled candidates.

    The reference's PriorityQueue pops the SMALLEST final_priority
    first with queue-index FIFO tiebreak (web_crawler.py:88,141-143);
    batch input has no arrival order, so url_min is the deterministic
    tiebreak.  Unseen domains score exactly as the crawler's
    enqueue-time ``get_priority`` on first sight (enqueue_count 0,
    link-graph in-degree, second-last count from crawled state).
    ``orderBy().limit(budget)`` is a distributed TakeOrdered — no
    global sort materializes at 10^12 candidates."""
    # one link-graph rollup feeds both the candidate set and the
    # in-degree.  Column pruning specializes the two aggregates (one
    # consumer drops xd), so exchange reuse does NOT fire on its own —
    # materialize the rollup once (lazy localCheckpoint: first action
    # computes it, the second branch reads it back).  Storage is
    # O(distinct candidate URLs) post-aggregation rows vs decoding +
    # href-exploding the whole corpus twice.
    per_url = _per_url_rollup(pages).localCheckpoint(eager=False)
    cand = frontier_new_urls(pages, per_url=per_url)
    crawled = (
        pages.select(F.expr(_HOST).alias("domain"))
        .groupBy("domain")
        .agg((F.count("*") - 1).cast("long").alias("enqueue_count"))
    )
    sl = (
        crawled.withColumn("second_last", F.expr(_sl_sql("domain")))
        .groupBy("second_last")
        .agg((F.sum("enqueue_count") + F.count("*")).cast("long").alias("sl_count"))
    )
    d = (
        cand.join(crawled, "domain", "left")
        .fillna(0, subset=["enqueue_count"])
        .withColumn("second_last", F.expr(_sl_sql("domain")))
        .join(domain_in_degree(pages, per_url=per_url)
              .withColumnRenamed("in_degree", "indeg"),
              "domain", "left")
        .fillna(0, subset=["indeg"])
        .withColumnRenamed("indeg", "in_degree")
        .join(F.broadcast(sl), "second_last", "left")
        .fillna(0, subset=["sl_count"])
    )
    d = d.selectExpr("url_min", *_priority_exprs())
    top = d.orderBy(F.col("final_priority").asc(), F.col("url_min").asc()) \
           .limit(budget)
    w = Window.orderBy(F.col("final_priority").asc(), F.col("url_min").asc())
    return top.select(
        "url_min", "domain", "final_priority",
        F.row_number().over(w).cast("int").alias("pos"),
    )


def frontier_order_sql(pages_rel: str, budget: int = 1000) -> str:
    return f"""
WITH {_in_degree_cte(pages_rel)},
cand AS (
    SELECT link_min AS url_min, MIN(link_domain) AS domain
    FROM lg WHERE is_valid GROUP BY 1),
seen AS (SELECT DISTINCT {_MIN} AS url_min FROM ({pages_rel})),
newc AS (
    SELECT url_min, domain FROM cand
    WHERE url_min NOT IN (SELECT url_min FROM seen)),
crawled AS (
    SELECT {_HOST} AS domain, CAST(COUNT(*) - 1 AS BIGINT) AS enqueue_count
    FROM ({pages_rel}) GROUP BY 1),
sl AS (
    SELECT {_sl_sql("domain")} AS second_last,
           CAST(SUM(enqueue_count) + COUNT(*) AS BIGINT) AS sl_count
    FROM crawled GROUP BY 1),
d AS (
    SELECT n.url_min, n.domain,
           COALESCE(c.enqueue_count, 0) AS enqueue_count,
           {_sl_sql("n.domain")} AS second_last,
           COALESCE(i.in_degree, 0) AS in_degree,
           COALESCE(s.sl_count, 0) AS sl_count
    FROM newc n
    LEFT JOIN crawled c ON c.domain = n.domain
    LEFT JOIN indeg i ON i.domain = n.domain
    LEFT JOIN sl s ON s.second_last = {_sl_sql("n.domain")}),
scored AS (SELECT url_min, {", ".join(_priority_exprs())} FROM d)
SELECT url_min, domain, final_priority,
       CAST(ROW_NUMBER() OVER (ORDER BY final_priority, url_min) AS INT) AS pos
FROM scored
ORDER BY final_priority, url_min
LIMIT {budget}
"""


def _links_ctes(pages_rel: str) -> str:
    """DuckDB CTEs 'lg' (the valid link graph) shared by the oracle
    SQL of link_graph / domain_in_degree / frontier / crawl_priority."""
    href = _HREF_ALL.format(html_str="DECODE(html)")
    lh = _host_of("link")
    return f"""
exploded AS (
    SELECT url, UNNEST({href}) AS raw_link
    FROM ({pages_rel})),
linked AS (
    SELECT url, {_RESOLVE} AS link FROM exploded),
lg AS (
    SELECT url, link,
           {lh} AS link_domain,
           {_min_of("link")} AS link_min,
           ({lh} LIKE '%.nz')
               AND NOT regexp_matches(lower(link), '\\.({BLACKLIST_EXT})$')
               AS is_valid,
           {lh} <> {_HOST} AS cross_domain
    FROM linked)"""


def link_graph_sql(pages_rel: str) -> str:
    return f"""
WITH {_links_ctes(pages_rel)}
SELECT url, link, link_domain, link_min, is_valid, cross_domain FROM lg
"""


def _in_degree_cte(pages_rel: str) -> str:
    return f"""{_links_ctes(pages_rel)},
per_url AS (
    SELECT link_min, MIN(link_domain) AS domain,
           MAX(CAST(cross_domain AS INT)) AS xd
    FROM lg WHERE is_valid GROUP BY 1),
indeg AS (
    SELECT domain, CAST(COUNT(*) AS BIGINT) AS in_degree
    FROM per_url WHERE xd = 1 GROUP BY 1)"""


def domain_in_degree_sql(pages_rel: str) -> str:
    return f"WITH {_in_degree_cte(pages_rel)} SELECT domain, in_degree FROM indeg"


def frontier_new_urls_sql(pages_rel: str) -> str:
    return f"""
WITH {_links_ctes(pages_rel)},
cand AS (
    SELECT link_min AS url_min, MIN(link_domain) AS domain
    FROM lg WHERE is_valid GROUP BY 1),
seen AS (SELECT DISTINCT {_MIN} AS url_min FROM ({pages_rel}))
SELECT url_min, domain FROM cand
WHERE url_min NOT IN (SELECT url_min FROM seen)
"""


# --- priority scoring (M5) --------------------------------------------------
# Bucket chains transcribed from web_crawler.py:213-328; weighted sum
# 47*domain + 13*in_degree + 29*second_last at web_crawler.py:330-341.

_DOMAIN_PRI = """CASE
    WHEN {c} = 0 THEN 1 WHEN {c} = 1 THEN 2 WHEN {c} = 2 THEN 3
    WHEN {c} <= 5 THEN 4 WHEN {c} <= 10 THEN 5 WHEN {c} <= 100 THEN 6
    WHEN {c} <= 1000 THEN 7 WHEN {c} <= 10000 THEN 8
    WHEN {c} <= 1000000 THEN 9 ELSE 10 END"""

_INDEG_PRI = """CASE
    WHEN {c} = 0 THEN 10 WHEN {c} = 1 THEN 9 WHEN {c} = 2 THEN 8
    WHEN {c} <= 5 THEN 7 WHEN {c} <= 10 THEN 6 WHEN {c} <= 20 THEN 5
    WHEN {c} <= 50 THEN 4 WHEN {c} <= 500 THEN 3 WHEN {c} <= 8000 THEN 2
    ELSE 1 END"""

_SL_PRI_WHITE = """CASE
    WHEN {c} = 0 THEN 1 WHEN {c} <= 5 THEN 2 WHEN {c} <= 20 THEN 3
    WHEN {c} <= 50 THEN 4 WHEN {c} <= 200 THEN 5 WHEN {c} <= 500 THEN 6
    WHEN {c} <= 1000 THEN 7 WHEN {c} <= 10000 THEN 8
    WHEN {c} <= 100000 THEN 9 ELSE 10 END"""

_SL_PRI_OTHER = """CASE
    WHEN {c} = 0 THEN 2 WHEN {c} <= 3 THEN 3 WHEN {c} <= 6 THEN 4
    WHEN {c} <= 15 THEN 5 WHEN {c} <= 50 THEN 6 WHEN {c} <= 600 THEN 8
    WHEN {c} <= 10000 THEN 9 ELSE 10 END"""


def _priority_exprs() -> list[str]:
    """Shared select-expressions over columns (domain, second_last,
    enqueue_count, in_degree, sl_count) — identical in Spark SQL and
    DuckDB."""
    white = ", ".join(f"'{w}'" for w in SL_WHITELIST)
    dp = _DOMAIN_PRI.format(c="enqueue_count")
    ip = _INDEG_PRI.format(c="in_degree")
    sp = (f"CASE WHEN second_last IN ({white}) "
          f"THEN {_SL_PRI_WHITE.format(c='sl_count')} "
          f"ELSE {_SL_PRI_OTHER.format(c='sl_count')} END")
    return [
        "domain", "second_last", "enqueue_count", "in_degree", "sl_count",
        f"CAST({dp} AS INT) AS domain_pri",
        f"CAST({ip} AS INT) AS in_degree_pri",
        f"CAST({sp} AS INT) AS second_last_pri",
        f"CAST(({dp}) * 47 + ({ip}) * 13 + ({sp}) * 29 AS INT) AS final_priority",
    ]


def crawl_priority(pages: DataFrame) -> DataFrame:
    """Per-domain frontier priority (M5).  enqueue_count = pages seen
    for the domain − 1 (first sight enqueues at count 0,
    web_crawler.py:172-185); in_degree is the REAL link-graph
    in-degree (:func:`domain_in_degree`; crawled domains without
    cross-domain in-links score 0); sl_count = pages sharing the
    second-last label.  Scale shape: one groupBy(domain), one
    broadcast of the (tiny) second-last rollup, one join against the
    in-degree rollup — all keyed on domain."""
    base = (
        pages.select(F.expr(_HOST).alias("domain"))
        .groupBy("domain")
        .agg((F.count("*") - 1).cast("long").alias("enqueue_count"))
        .withColumn("second_last", F.expr(_sl_sql("domain")))
        .join(domain_in_degree(pages), "domain", "left")
        .fillna(0, subset=["in_degree"])
    )
    sl = base.groupBy("second_last").agg(
        (F.sum("enqueue_count") + F.count("*")).alias("sl_count")
    )
    d = base.join(F.broadcast(sl), "second_last")
    return d.selectExpr(*_priority_exprs())


def crawl_priority_sql(pages_rel: str) -> str:
    return f"""
WITH {_in_degree_cte(pages_rel)},
base AS (
    SELECT domain, enqueue_count,
           {_sl_sql("domain")} AS second_last,
           COALESCE(i.in_degree, 0) AS in_degree
    FROM (SELECT {_HOST} AS domain, COUNT(*) - 1 AS enqueue_count
          FROM ({pages_rel}) GROUP BY 1)
    LEFT JOIN indeg i USING (domain)),
sl AS (
    SELECT second_last,
           CAST(SUM(enqueue_count) + COUNT(*) AS BIGINT) AS sl_count
    FROM base GROUP BY 1),
d AS (SELECT b.*, sl.sl_count FROM base b JOIN sl USING (second_last))
SELECT {", ".join(_priority_exprs())} FROM d
"""
