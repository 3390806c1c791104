"""Web-crawl preprocessing: HTML boilerplate extraction and URL
canonicalization — the two transforms every crawl-to-training-data
pipeline runs before any dedup/quality stage (north-star extension; no
reference counterpart).

Both operators are PURE JVM column expressions (Java regex /
``parse_url`` / array higher-order functions) — no UDFs, no Python in
the hot path — so they whole-stage-codegen and scale like any map-side
projection: zero shuffles, linear in corpus bytes.

The catalog entries pair each with an expression-only synthetic
generator (HTML wrapped around ``documents.text``, URLs derived from
``doc_id``) whose inverse is closed-form, so the DuckDB oracle verifies
REAL extraction work arithmetically (the m04 pattern) without needing a
crawl corpus in the sandbox.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# blocks whose CONTENT is boilerplate, not text: dropped whole
_HTML_BLOCK_DROP = r"(?is)<(script|style|nav|footer|header|aside)\b[^>]*>.*?</\1>"
# fallback: an UNCLOSED boilerplate open tag (real crawl HTML, not the
# synthetic generator) would otherwise leak its entire body through the
# generic tag strip; matched blocks are gone by the time this runs, so
# anything still matching an open tag has no closer — drop to EOF
_HTML_BLOCK_DROP_UNCLOSED = (
    r"(?is)<(script|style|nav|footer|header|aside)\b[^>]*>.*$"
)
_HTML_HEAD_DROP = r"(?is)<head\b[^>]*>.*?</head>"
_HTML_COMMENT_DROP = r"(?s)<!--.*?-->"
_HTML_TAG = r"(?s)<[^>]+>"


def html_from_documents(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Wrap each document's text in a deterministic HTML page: head
    (title/script/style), nav + footer boilerplate, an h1, and the text
    as the main paragraph with ``& < >`` entity-escaped plus a fixed
    entity tail — everything :func:`strip_html` must remove or decode.
    Expression-only, so the closed-form inverse is
    ``'Doc <id> ' || squeeze(text) || ' & <tail>'``."""
    escaped = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col(text_col), "&", "&amp;"), "<", "&lt;"
        ),
        ">",
        "&gt;",
    )
    html = F.concat(
        F.lit(
            "<html><head><title>Ignore Me</title>"
            '<script type="text/javascript">var x = "<p>not text</p>";'
            "</script><style>.c{color:red}</style></head><body>"
            "<nav>Home | About | Contact</nav>"
            "<!-- build 1234 --><h1>Doc "
        ),
        F.col("doc_id").cast("string"),
        F.lit("</h1><p>"),
        escaped,
        F.lit(" &amp; &lt;tail&gt;</p><footer>(c) example.com</footer>"
              "</body></html>"),
    )
    return docs.select("doc_id", html.alias("html"))


def _decode_entities(col: Column) -> Column:
    # amp LAST: '&amp;lt;' must become '&lt;' (literal), not '<'
    out = F.regexp_replace(col, "&lt;", "<")
    out = F.regexp_replace(out, "&gt;", ">")
    out = F.regexp_replace(out, "&quot;", '"')
    out = F.regexp_replace(out, "&#39;", "'")
    return F.regexp_replace(out, "&amp;", "&")


def strip_html(
    df: DataFrame, html_col: str = "html", keep: tuple = ()
) -> DataFrame:
    """REAL HTML text extraction (trafilatura-class boilerplate removal,
    regex tier): drop head/script/style/nav/footer/header/aside blocks
    and comments, flatten remaining tags to whitespace, decode the
    standard entities, squeeze whitespace. Returns (doc_id,
    text_extracted, n_chars_extracted).

    Order matters: block drops BEFORE the generic tag strip (a
    ``<script>`` body may contain literal ``<p>`` markup that must die
    with its block, not leak into the text), entity decode AFTER tag
    removal (decoded ``<`` must not look like markup). ``keep`` names
    extra input columns to carry through (pipeline composition).

    Known leak modes on malformed crawl HTML (regex tier, documented):
    an UNCLOSED script/style/nav/... tag drops everything from the open
    tag to end-of-document (the fallback pass — conservative: prefers
    losing tail text over leaking script bodies into training data); a
    NESTED same-tag block (``<nav><nav>..</nav>..</nav>``) closes at
    the first ``</nav>``, so the outer tail leaks as text until the
    generic strip; a bare ``<`` in unescaped text swallows content up
    to the next ``>`` via the generic tag regex. A DOM-building parser
    tier would fix all three; regex is the deliberate JVM-codegen
    trade-off here."""
    e = F.regexp_replace(F.col(html_col), _HTML_HEAD_DROP, " ")
    e = F.regexp_replace(e, _HTML_BLOCK_DROP, " ")
    e = F.regexp_replace(e, _HTML_BLOCK_DROP_UNCLOSED, " ")
    e = F.regexp_replace(e, _HTML_COMMENT_DROP, " ")
    e = F.regexp_replace(e, _HTML_TAG, " ")
    e = _decode_entities(e)
    e = F.trim(F.regexp_replace(e, r"\s+", " "))
    return df.select(
        "doc_id",
        *keep,
        e.alias("text_extracted"),
        F.length(e).cast("int").alias("n_chars_extracted"),
    )


def urls_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic messy URLs per document: uppercase scheme/host,
    explicit default port, tracking params (utm_*, ref, fbclid) around
    a real ``id`` param, and a fragment — every normalization
    :func:`canonicalize_urls` performs. Closed-form inverse:
    ``https://example<d%7>.com/path/<d>/?id=<d>`` with 3 dropped
    params."""
    url = F.concat(
        F.lit("HTTPS://WWW.Example"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".COM:443/path/"),
        F.col("doc_id").cast("string"),
        F.lit("/?utm_source=news&fbclid=XYZ&id="),
        F.col("doc_id").cast("string"),
        F.lit("&ref=abc#frag"),
    )
    return docs.select("doc_id", url.alias("url"))


# literal PREFIX matches via startswith — never SQL LIKE, whose '_' is
# a single-char wildcard ('utm_%' would also drop 'utma=1'/'utmz=...',
# wrongly merging genuinely different URLs into one canonical form)
_TRACKING_PREFIXES = ("utm_", "ref=", "fbclid=", "gclid=", "mc_eid=")


def canonicalize_urls(
    df: DataFrame, url_col: str = "url", keep: tuple = ()
) -> DataFrame:
    """URL canonicalization for crawl dedup (the URL-level dedup key
    every pipeline computes before any content hash): lowercase
    scheme/host, strip a ``www.`` prefix, drop default ports (80/443),
    drop the fragment, remove tracking parameters
    (utm_*/ref/fbclid/gclid/mc_eid) and SORT the surviving query params
    so param order can't split identical resources. Returns (doc_id,
    canonical_url, domain, n_params_dropped). Built on Spark's
    ``parse_url`` + array higher-order functions — JVM-side
    whole-stage-codegen, no UDF."""
    u = F.col(url_col)
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host0 = F.lower(F.expr(f"parse_url({url_col}, 'HOST')"))
    host = F.regexp_replace(host0, r"^www\.", "")
    port = F.expr(
        f"regexp_extract({url_col},"
        " '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*?:([0-9]+)(/|$|\\\\?)', 1)"
    )
    default_port = (
        ((scheme == "https") & (port == "443"))
        | ((scheme == "http") & (port == "80"))
        | (port == "")
    )
    path = F.coalesce(F.expr(f"parse_url({url_col}, 'PATH')"), F.lit(""))
    query = F.expr(f"parse_url({url_col}, 'QUERY')")
    params = F.when(
        query.isNull() | (query == ""), F.array().cast("array<string>")
    ).otherwise(F.split(query, "&"))
    drop_cond = " OR ".join(
        f"startswith(p, '{pref}')" for pref in _TRACKING_PREFIXES
    )
    kept = F.expr(
        f"array_sort(filter(__params, p -> NOT ({drop_cond})))"
    )
    out = df.withColumn("__params", params).withColumn("__kept", kept)
    canonical = F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(default_port, F.lit("")).otherwise(F.concat(F.lit(":"), port)),
        path,
        F.when(
            F.size("__kept") > 0,
            F.concat(F.lit("?"), F.array_join("__kept", "&")),
        ).otherwise(F.lit("")),
    )
    return out.select(
        "doc_id",
        *keep,
        canonical.alias("canonical_url"),
        host.alias("domain"),
        (F.size("__params") - F.size("__kept"))
        .cast("int")
        .alias("n_params_dropped"),
    )


def crawl_records_from_documents(
    docs: DataFrame, mirror_groups: int = 100, text_col: str = "text"
) -> DataFrame:
    """One synthetic crawl record per document — (doc_id, url, html) in a
    SINGLE projection (no joins): the HTML page of
    :func:`html_from_documents` plus a messy MIRRORED url. Mirroring:
    ``m = doc_id % mirror_groups`` keys host/path/id, so every group of
    ~corpus/m docs shares one canonical URL while carrying doc-unique
    tracking params — the repost/mirror pattern URL-level dedup exists
    for. Closed-form canonical:
    ``https://example<m%7>.com/mirror/<m>/?id=<m>``."""
    m = (F.col("doc_id") % mirror_groups).cast("string")
    url = F.concat(
        F.lit("HTTPS://WWW.Example"),
        ((F.col("doc_id") % mirror_groups) % 7).cast("string"),
        F.lit(".COM:443/mirror/"),
        m,
        F.lit("/?utm_source=s"),
        F.col("doc_id").cast("string"),
        F.lit("&id="),
        m,
        F.lit("&ref=r"),
        F.col("doc_id").cast("string"),
        F.lit("#frag"),
    )
    escaped = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col(text_col), "&", "&amp;"), "<", "&lt;"
        ),
        ">",
        "&gt;",
    )
    html = F.concat(
        F.lit(
            "<html><head><title>Ignore Me</title>"
            '<script type="text/javascript">var x = "<p>not text</p>";'
            "</script><style>.c{color:red}</style></head><body>"
            "<nav>Home | About | Contact</nav>"
            "<!-- build 1234 --><h1>Doc "
        ),
        F.col("doc_id").cast("string"),
        F.lit("</h1><p>"),
        escaped,
        F.lit(" &amp; &lt;tail&gt;</p><footer>(c) example.com</footer>"
              "</body></html>"),
    )
    return docs.select("doc_id", url.alias("url"), html.alias("html"))
