"""Link extraction / in-degree / frontier semantics on hand-built
pages (reference: web_crawler.py:506-539 extract_links+urljoin,
:172-185 in-degree accounting, :728-741 frontier dedup)."""

import datetime

import pytest
from pyspark.sql import functions as F

from cs6913_web_search_engines_spark.operators import weblog


def _pages(spark, rows):
    ts = datetime.datetime(2024, 1, 1)
    data = [(url, ts, html.encode(), "", "en") for url, html in rows]
    return spark.createDataFrame(
        data, "url string, warc_ts timestamp, html binary, text string, lang string"
    )


@pytest.fixture(scope="module")
def linkpages(spark):
    return _pages(spark, [
        ("https://www.a.example.nz/dir/page.html?q=1#f",
         '<a href="https://b.example.nz/x.html">abs</a>'
         '<a href="/root.html">rootrel</a>'
         '<a href="sub.html">dirrel</a>'
         '<a href="">empty</a>'),
        ("https://b.example.nz/x.html",
         '<a href="https://b.example.nz/y.html">samedom</a>'
         '<a href="https://c.example.com/off.html">offsite</a>'
         '<a href="https://www.a.example.nz/dir/page.html">back</a>'),
    ])


def test_extract_links_urljoin_cases(linkpages):
    links = {(r["url"], r["link"]) for r in weblog.extract_links(linkpages).collect()}
    base = "https://www.a.example.nz/dir/page.html?q=1#f"
    assert (base, "https://b.example.nz/x.html") in links          # absolute
    assert (base, "https://www.a.example.nz/root.html") in links   # root-relative
    assert (base, "https://www.a.example.nz/dir/sub.html") in links  # dir-relative
    assert (base, base) in links                                   # empty href = self
    assert len([p for p in links if p[0] == base]) == 4


def test_link_graph_validity_and_cross_domain(linkpages):
    lg = {r["link"]: r for r in weblog.link_graph(linkpages)
          .filter(F.col("url") == "https://b.example.nz/x.html").collect()}
    assert lg["https://c.example.com/off.html"]["is_valid"] is False  # not .nz
    assert lg["https://b.example.nz/y.html"]["cross_domain"] is False
    assert lg["https://www.a.example.nz/dir/page.html"]["cross_domain"] is True


def test_in_degree_counts_cross_domain_distinct_urls(linkpages):
    indeg = {r["domain"]: r["in_degree"]
             for r in weblog.domain_in_degree(linkpages).collect()}
    # b.example.nz: x.html linked cross-domain from a; y.html only
    # same-domain → not counted
    assert indeg["b.example.nz"] == 1
    # a's page linked back cross-domain from b (www-stripped min dedup)
    assert indeg.get("www.a.example.nz") == 1


def test_frontier_anti_join_excludes_seen(linkpages):
    out = {r["url_min"] for r in weblog.frontier_new_urls(linkpages).collect()}
    # crawled pages (by url_min) must not reappear
    assert "//b.example.nz/x.html" not in out
    assert "//a.example.nz/dir/page.html" not in out
    # new candidates do
    assert "//b.example.nz/y.html" in out
    assert "//a.example.nz/root.html" in out
    assert "//a.example.nz/dir/sub.html" in out


def test_crawl_priority_uses_real_in_degree(linkpages):
    pri = {r["domain"]: r for r in weblog.crawl_priority(linkpages).collect()}
    assert pri["b.example.nz"]["in_degree"] == 1
    # bucket: in_degree 1 → priority 9 (web_crawler.py:213-341 chain)
    assert pri["b.example.nz"]["in_degree_pri"] == 9


def test_thread_stats_partition_the_crawl(spark, documents):
    # A9 per-thread totals (web_crawler.py:846-853): 10 named threads,
    # counts partition the page set, ok counts respect the status split
    from cs6913_web_search_engines_spark.sources import webpages

    pages = webpages.synthesize(documents)
    rows = {r["thread"]: r for r in weblog.thread_stats(pages).collect()}
    assert set(rows) == {f"Thread-{i}" for i in range(1, 11)}
    assert sum(r["n_urls"] for r in rows.values()) == documents.count()
    total_ok = pages.filter(F.col("status") == 200).count()
    assert sum(r["n_ok"] for r in rows.values()) == total_ok
    assert all(r["n_ok"] <= r["n_urls"] for r in rows.values())


def test_resolve_matches_urljoin_on_edge_hrefs(spark):
    """The shared _RESOLVE expression must reproduce urllib
    urljoin for the href shapes real HTML contains: protocol-relative
    (scheme-only inheritance), foreign schemes (pass through — the
    validity filter then drops them, like the reference crawler), and
    dir-relative links on a path-less base URL."""
    from urllib.parse import urljoin

    cases = [
        ("http://a.example.nz/p/q.html", "//cdn.other.nz/x"),
        ("http://a.example.nz/p/q.html", "mailto:x@b.nz"),
        ("http://a.example.nz/p/q.html", "javascript:void(0)"),
        ("https://a.example.nz", "about.html"),
        ("http://a.example.nz/p/q.html", "r.html"),
        ("http://a.example.nz/p/q.html", "/root.html"),
        ("http://a.example.nz/p/q.html", "https://b.example.nz/z"),
    ]
    html = lambda links: "<html>" + "".join(
        f'<a href="{l}">x</a>' for l in links) + "</html>"
    pages = spark.createDataFrame(
        [(u, html([l]).encode()) for u, l in cases], "url string, html binary")
    got = {(r["url"], r["link"]) for r in weblog.extract_links(pages).collect()}
    want = {(u, urljoin(u, l)) for u, l in cases}
    assert got == want
    # foreign-scheme links must be invalid (reference drops non-http)
    lg = {r["link"]: r["is_valid"] for r in weblog.link_graph(pages).collect()}
    assert lg["mailto:x@b.nz"] is False
    assert lg["javascript:void(0)"] is False
    # protocol-relative now resolves to the TRUE host (a .nz domain →
    # valid, and credited to cdn.other.nz, not the base host)
    assert lg["http://cdn.other.nz/x"] is True


def test_extract_text_handles_multiline_bodies(spark):
    """(?s) extraction: a body spanning lines must extract
    byte-identically, not as '' (Java regex '.' excludes newlines —
    the synthetic corpus never exercised one)."""
    from cs6913_web_search_engines_spark.sources import webpages

    body = "line one\nline two\nline three"
    pages = spark.createDataFrame(
        [("http://a.example.nz/x",
          f"<html><body><p>{body}</p></body></html>".encode())],
        "url string, html binary")
    got = webpages.extract_text(pages).collect()[0]["extracted"]
    assert got == body


def test_scalable_minting_dense_and_repeatable(spark, documents):
    """mint_doc_ids_scalable: ids dense 0..N-1 by url order, and
    IDENTICAL across repeated actions on the same DataFrame (the
    bucketed table is pinned, so range-boundary re-sampling between
    the count pass and the rank pass cannot shift assignments)."""
    from cs6913_web_search_engines_spark.sources import webpages

    pages = webpages.synthesize(documents).select("url")
    minted = webpages.mint_doc_ids_scalable(pages, n_buckets=8)
    a = sorted((r["url"], r["doc_id"]) for r in minted.collect())
    b = sorted((r["url"], r["doc_id"]) for r in minted.collect())
    assert a == b                                 # action-stable
    ids = [d for _, d in a]
    assert sorted(ids) == list(range(len(ids)))   # dense 0..N-1
    by_url = [d for _, d in sorted(a)]
    assert by_url == sorted(by_url)               # url order


def test_resolve_matches_urljoin_on_query_fragment_and_host_shapes(spark):
    """Pin _RESOLVE (shared verbatim with the DuckDB oracle twin)
    against urllib.parse.urljoin for the href shapes it claims to
    cover — including query-only ('?page=2') and fragment-only
    ('#sec') hrefs, which used to resolve against the base DIRECTORY
    instead of the full base URL."""
    from urllib.parse import urljoin

    base = "https://www2.a.example.nz/dir/page.html?q=1"
    hrefs = ["https://b.example.nz/x.html", "//cdn.example.nz/lib.js",
             "/root.html", "sub.html", "?page=2", "#sec", "?page=2#top",
             "mailto:x@example.nz", ""]
    html = "".join(f'<a href="{h}">x</a>' for h in hrefs)
    pages = _pages(spark, [(base, html)])
    got = {r["link"] for r in weblog.extract_links(pages).collect()}
    want = set()
    for h in hrefs:
        if h.startswith("mailto:"):
            want.add(h)          # foreign scheme passes through for
            continue             # the validity filter to drop
        want.add(urljoin(base, h))
    assert got == want, got.symmetric_difference(want)
