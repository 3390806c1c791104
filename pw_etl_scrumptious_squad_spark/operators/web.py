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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

# blocks whose CONTENT is boilerplate, not text: dropped whole
_HTML_BLOCK_DROP = r"(?is)<(script|style|nav|footer|header|aside)\b[^>]*>.*?</\1>"
# INNERMOST-first variant (round 8, tag-soup battery): the tempered dot
# (?:(?!<\1\b).) refuses to cross another same-tag opener, so on nested
# same-tag soup (<nav><nav>A</nav>B</nav>) it matches the INNER block and
# leaves the outer opener in place for the next pass — the plain
# non-greedy regex instead consumed the outer opener with the inner
# closer and leaked the outer tail ("B") as text. Applied a fixed K
# times before the generic drop, nesting depth <= K+1 is handled; real
# crawl HTML essentially never nests boilerplate deeper.
_HTML_BLOCK_DROP_NESTED = (
    r"(?is)<(script|style|nav|footer|header|aside)\b[^>]*>"
    r"(?:(?!<\1\b).)*?</\1>"
)
# fallback: an UNCLOSED boilerplate open tag (real crawl HTML, not the
# synthetic generator) would otherwise leak its entire body through the
# generic tag strip; matched blocks are gone by the time this runs, so
# anything still matching an open tag has no closer — drop to EOF
_HTML_BLOCK_DROP_UNCLOSED = (
    r"(?is)<(script|style|nav|footer|header|aside)\b[^>]*>.*$"
)
_HTML_HEAD_DROP = r"(?is)<head\b[^>]*>.*?</head>"
_HTML_COMMENT_DROP = r"(?s)<!--.*?-->"
# unclosed comment: browsers treat '<!--' with no closer as
# comment-to-EOF; without this, '<!-- SCRIPTPAYLOAD' leaked its bytes
# through the generic tag strip (no '>' to terminate on)
_HTML_COMMENT_DROP_UNCLOSED = r"(?s)<!--.*$"
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

    Conservative-drop modes on malformed crawl HTML (regex tier,
    documented): an UNCLOSED script/style/nav/... tag or an UNCLOSED
    comment drops everything from its start to end-of-document
    (fallback passes — prefer losing tail text over leaking script
    bytes into training data); a bare ``<`` in unescaped text swallows
    content up to the next ``>`` via the generic tag regex (again
    over-deletion, not leakage). NESTED same-tag blocks resolve
    innermost-first through 3 tempered passes + the generic drop, so
    depth <= 4 is exact; deeper same-tag boilerplate nesting (absent
    from real crawls) would leak outer-tail text. NOT a leak mode
    (round 8): a commented-out unclosed boilerplate tag
    (``<!-- <script src=x> -->``) is removed with its comment before
    the unclosed-block fallback runs, so it no longer over-deletes the
    document tail. The round-8 tag-soup fuzz battery
    (tests/test_web.py) pins the invariant that no script/style/nav
    payload byte ever reaches extracted text."""
    e = F.regexp_replace(F.col(html_col), _HTML_HEAD_DROP, " ")
    # innermost-first nested passes BEFORE the generic drop: the generic
    # non-greedy regex consumes a nested outer opener with the inner
    # closer, leaking the outer tail — run K tempered passes so depth
    # <= K+1 same-tag nesting resolves inside-out (round-8 battery fix).
    # Pass 1 does the generic pass's work on non-nested HTML (the
    # overwhelming case), so passes 2..K scan an opener-free string.
    for _ in range(3):
        e = F.regexp_replace(e, _HTML_BLOCK_DROP_NESTED, " ")
    e = F.regexp_replace(e, _HTML_BLOCK_DROP, " ")
    # comments BEFORE the unclosed-block fallback (round-8 advice fix):
    # a commented-out unclosed boilerplate tag ('<!-- <script src=x> -->'
    # with no closer) must die with its comment, not trigger the
    # drop-to-EOF fallback and delete all following document text.
    # Closed blocks are already gone, so a '<!--' inside a live script
    # body cannot reach this pass; stripping whole comments here cannot
    # leak block content.
    e = F.regexp_replace(e, _HTML_COMMENT_DROP, " ")
    e = F.regexp_replace(e, _HTML_COMMENT_DROP_UNCLOSED, " ")
    e = F.regexp_replace(e, _HTML_BLOCK_DROP_UNCLOSED, " ")
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


WARC_SCHEMA = None  # built lazily (pyspark types import stays top-level-free)


def warc_from_documents(
    docs: DataFrame,
    records_per_chunk: int = 25,
    text_col: str = "text",
) -> DataFrame:
    """Generator twin of :func:`parse_warc_records`: pack documents into
    concatenated WARC/1.0 response records, ``records_per_chunk`` per
    binary chunk (``chunk_id = doc_id div k`` — the multi-record .warc
    file shape CommonCrawl ingestion reads). Per doc: Target-URI
    ``https://example<doc_id%7>.com/doc/<doc_id>``, Date
    ``2024-01-<doc_id%28+1>T00:00:00Z``, payload = the document's UTF-8
    text — every field closed-form for an SQL oracle. Returns
    ``(chunk_id, data binary)``."""
    from pyspark.sql import types as T

    def batches(parts):
        import pandas as pd

        # accumulate across ALL Arrow batches of the partition and emit
        # once: mapInPandas may split one partition into several pdf
        # batches, and a per-batch emit would duplicate chunk_id rows
        # with fragment payloads (round-8 advice fix)
        chunks: dict[int, list[tuple[int, bytes]]] = {}
        for pdf in parts:
            for did, text in zip(pdf["doc_id"], pdf[text_col]):
                d = int(did)
                payload = (text or "").encode("utf-8")
                rec = (
                    b"WARC/1.0\r\n"
                    b"WARC-Type: response\r\n"
                    + f"WARC-Record-ID: <urn:doc:{d}>\r\n".encode()
                    + f"WARC-Date: 2024-01-{d % 28 + 1:02d}T00:00:00Z\r\n".encode()
                    + f"WARC-Target-URI: https://example{d % 7}.com/doc/{d}\r\n".encode()
                    + f"Content-Length: {len(payload)}\r\n".encode()
                    + b"\r\n"
                    + payload
                    + b"\r\n\r\n"
                )
                chunks.setdefault(d // records_per_chunk, []).append((d, rec))
        yield pd.DataFrame(
            [
                # doc_id order inside the chunk: deterministic bytes
                # regardless of post-shuffle arrival order
                {
                    "chunk_id": cid,
                    "data": b"".join(r for _, r in sorted(recs)),
                }
                for cid, recs in sorted(chunks.items())
            ],
            columns=["chunk_id", "data"],
        )

    schema = T.StructType(
        [
            T.StructField("chunk_id", T.LongType(), False),
            T.StructField("data", T.BinaryType(), False),
        ]
    )
    # chunk assembly requires all of a chunk's docs in one partition:
    # repartition on the CHUNK key — floor(doc_id / k), NOT the float
    # division doc_id/k (which scattered same-chunk docs across
    # partitions; round-8 advice fix). Deliberately a BARE
    # repartition(expr): AQE sizes the reduce side — at gate scale
    # (~10 MB) it coalesces to one task, which MEASURES FASTER than a
    # forced 64-way fan-out (round-9 A/B: forcing numPartitions made
    # both the copy and organic runs ~25-50% slower — per-task Python
    # worker overhead beats the loop savings at this size), while a
    # 100 TB shuffle stays thousands of partitions under the same
    # advisory byte target. One bounded shuffle — the ingest direction
    # reads whole .warc files per task, no shuffle at all.
    return (
        docs.select("doc_id", text_col)
        .repartition(F.floor(F.col("doc_id") / F.lit(records_per_chunk)))
        .mapInPandas(batches, schema)
    )


def parse_warc_records(
    df: DataFrame, data_col: str = "data"
) -> DataFrame:
    """Parse concatenated WARC/1.0 records out of binary chunks — the
    CommonCrawl ingestion step: each input row is a .warc file's bytes
    (or a range-fetched slice aligned to record starts); output is one
    row per record with the standard headers and the RAW payload.

    Real parsing, not split-on-delimiter: the payload is sliced by
    ``Content-Length`` octets, so payload bytes containing
    ``WARC/1.0`` banners or blank lines cannot split a record (the
    property delimiter-splitting gets wrong on real crawl data —
    pinned in tests). Headers are latin-1-decoded per the WARC spec's
    octet orientation; unknown headers are ignored; a malformed record
    (no Content-Length, truncated payload) raises loudly with the
    chunk offset. One Arrow-batched map stage, no shuffle."""
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("warc_type", T.StringType()),
            T.StructField("record_id", T.StringType()),
            T.StructField("warc_date", T.StringType()),
            T.StructField("target_uri", T.StringType()),
            T.StructField("content_length", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def parse_chunk(buf: bytes):
        pos, n = 0, len(buf)
        while pos < n:
            # skip inter-record CRLFs
            while pos < n and buf[pos : pos + 2] == b"\r\n":
                pos += 2
            if pos >= n:
                break
            end = buf.find(b"\r\n\r\n", pos)
            if end < 0 or not buf[pos:].startswith(b"WARC/"):
                raise ValueError(f"malformed WARC record at offset {pos}")
            headers: dict[str, str] = {}
            lines = buf[pos:end].decode("latin-1").split("\r\n")
            for line in lines[1:]:
                k, _, v = line.partition(":")
                headers[k.strip().lower()] = v.strip()
            if "content-length" not in headers:
                raise ValueError(f"record at {pos} has no Content-Length")
            clen = int(headers["content-length"])
            body_start = end + 4
            if body_start + clen > n:
                raise ValueError(f"record at {pos} truncated payload")
            yield {
                "warc_type": headers.get("warc-type"),
                "record_id": headers.get("warc-record-id"),
                "warc_date": headers.get("warc-date"),
                "target_uri": headers.get("warc-target-uri"),
                "content_length": clen,
                "payload": buf[body_start : body_start + clen],
            }
            pos = body_start + clen

    def batches(parts):
        import pandas as pd

        for pdf in parts:
            rows = []
            for data in pdf[data_col]:
                rows.extend(parse_chunk(bytes(data)))
            yield pd.DataFrame(
                rows,
                columns=[f.name for f in out_schema.fields],
            )

    return df.select(data_col).mapInPandas(batches, out_schema)


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


def robots_from_domains(domains: DataFrame, domain_col: str = "domain_id") -> DataFrame:
    """Generator twin of :func:`parse_robots`: a deterministic
    robots.txt per domain id — a comment line, a Googlebot-only group
    whose blanket ``Disallow: /`` must NOT leak into '*' evaluation
    (the classic robots-parsing bug), then the wildcard group with a
    deny prefix, a LONGER allow carve-out under it, and a generic
    deny. Returns ``(domain_id, robots_txt)``."""
    d = F.col(domain_col).cast("string")
    txt = F.concat(
        F.lit("# robots for example"), d, F.lit("\n"),
        F.lit("User-agent: Googlebot\nDisallow: /\n\n"),
        F.lit("User-agent: *\n"),
        F.lit("Disallow: /p"), d, F.lit("/\n"),
        F.lit("Allow: /p"), d, F.lit("/open/\n"),
        F.lit("Disallow: /blocked/\n"),
    )
    return domains.select(F.col(domain_col), txt.alias("robots_txt"))


def parse_robots(
    df: DataFrame,
    domain_col: str = "domain_id",
    robots_col: str = "robots_txt",
    user_agent: str = "*",
) -> DataFrame:
    """REAL robots.txt parsing (REP, RFC 9309 shape): split lines, strip
    ``#`` comments and whitespace, assemble User-agent GROUPS (a group
    starts at a ``User-agent:`` line not directly preceded by another
    ``User-agent:`` line — consecutive UA lines share one group), keep
    the groups that name ``user_agent``, and emit their Allow/Disallow
    directives as ``(domain, is_allow, path_prefix, prefix_len)``.
    Empty-path directives (``Disallow:`` = allow all) are dropped.

    All JVM expressions: one posexplode over lines, one per-domain
    window for the group assembly (lag + running sum), one semi join
    from directives to matching-UA groups. The Googlebot-only blanket
    deny in the generator exists precisely to catch group-scoping bugs
    — a parser that ignores grouping denies everything."""
    lines = df.select(
        F.col(domain_col).alias("domain_id"),
        F.posexplode(F.split(F.col(robots_col), "\n")).alias("pos", "raw"),
    ).select(
        "domain_id",
        "pos",
        F.trim(F.regexp_replace("raw", "#.*$", "")).alias("line"),
    ).filter(F.col("line") != "")
    parts = lines.select(
        "domain_id",
        "pos",
        F.lower(F.trim(F.regexp_extract("line", r"^([^:]+):", 1))).alias("key"),
        F.trim(F.regexp_extract("line", r"^[^:]+:(.*)$", 1)).alias("value"),
    ).filter(F.col("key").isin("user-agent", "allow", "disallow"))
    w = Window.partitionBy("domain_id").orderBy("pos")
    grouped = parts.withColumn(
        "ua_start",
        (
            (F.col("key") == "user-agent")
            & (F.coalesce(F.lag("key").over(w), F.lit("")) != "user-agent")
        ).cast("int"),
    ).withColumn("group_id", F.sum("ua_start").over(w))
    uas = (
        grouped.filter(
            (F.col("key") == "user-agent") & (F.col("value") == user_agent)
        )
        .select("domain_id", "group_id")
        .distinct()
    )
    return (
        grouped.filter(F.col("key") != "user-agent")
        .join(uas, ["domain_id", "group_id"], "left_semi")
        .filter(F.col("value") != "")
        .select(
            "domain_id",
            (F.col("key") == "allow").cast("int").alias("is_allow"),
            F.col("value").alias("path_prefix"),
            F.length("value").cast("int").alias("prefix_len"),
        )
    )


def apply_robots(
    urls: DataFrame,
    rules: DataFrame,
    domain_col: str = "domain_id",
    path_col: str = "path",
    keep: tuple = (),
) -> DataFrame:
    """Evaluate URLs against parsed robots rules with the
    longest-match-wins precedence (ties go to Allow — the REP rule):
    join on domain (rules broadcast — a rules table is domains x a few
    directives, tiny next to a URL corpus), keep prefix matches, pick
    the winner per URL by ``max_by(struct(prefix_len, is_allow))``;
    URLs matching no rule are allowed. Returns the input columns plus
    ``(allowed int, matched_rule string|null)``. One map-side broadcast
    join + one hash-agg on the URL key — no shuffle of the URL corpus
    beyond the agg's partial/final split."""
    u = urls.select(
        F.col(domain_col).alias("domain_id"), path_col, *keep
    )
    j = u.join(broadcast(rules), "domain_id", "left").withColumn(
        "__match",
        F.col("path_prefix").isNotNull()
        & F.col(path_col).startswith(F.col("path_prefix")),
    )
    agg = j.groupBy("domain_id", path_col, *keep).agg(
        F.expr(
            "max_by(struct(is_allow, path_prefix),"
            " struct(prefix_len, is_allow))"
            " FILTER (WHERE __match)"
        ).alias("__w")
    )
    return agg.select(
        "domain_id",
        path_col,
        *keep,
        F.coalesce(F.col("__w.is_allow"), F.lit(1)).cast("int").alias("allowed"),
        F.col("__w.path_prefix").alias("matched_rule"),
    )


def warc_from_crawl_records(
    rec: DataFrame, records_per_chunk: int = 25
) -> DataFrame:
    """Pack (doc_id, url, html) crawl records into concatenated WARC
    response chunks — :func:`warc_from_documents` with the page's messy
    URL as WARC-Target-URI and the full HTML as payload; the x05
    pipeline's raw-archive input. Returns ``(chunk_id, data binary)``."""
    from pyspark.sql import types as T

    def batches(parts):
        import pandas as pd

        # accumulate over all Arrow batches, emit once (see
        # warc_from_documents — same round-8 advice fix)
        chunks: dict[int, list[tuple[int, bytes]]] = {}
        for pdf in parts:
            for did, url, html in zip(pdf["doc_id"], pdf["url"], pdf["html"]):
                d = int(did)
                payload = (html or "").encode("utf-8")
                recb = (
                    b"WARC/1.0\r\n"
                    b"WARC-Type: response\r\n"
                    + f"WARC-Record-ID: <urn:doc:{d}>\r\n".encode()
                    + f"WARC-Target-URI: {url}\r\n".encode()
                    + f"Content-Length: {len(payload)}\r\n".encode()
                    + b"\r\n"
                    + payload
                    + b"\r\n\r\n"
                )
                chunks.setdefault(d // records_per_chunk, []).append((d, recb))
        yield pd.DataFrame(
            [
                {
                    "chunk_id": cid,
                    "data": b"".join(r for _, r in sorted(recs)),
                }
                for cid, recs in sorted(chunks.items())
            ],
            columns=["chunk_id", "data"],
        )

    schema = T.StructType(
        [
            T.StructField("chunk_id", T.LongType(), False),
            T.StructField("data", T.BinaryType(), False),
        ]
    )
    # bare repartition(expr) on purpose — same AQE-sizing rationale as
    # warc_from_documents (the measured A/B is in that function)
    return (
        rec.select("doc_id", "url", "html")
        .repartition(F.floor(F.col("doc_id") / F.lit(records_per_chunk)))
        .mapInPandas(batches, schema)
    )
