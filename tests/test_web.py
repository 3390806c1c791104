"""Web-crawl preprocessing: HTML boilerplate extraction and URL
canonicalization edge cases the catalog's formula corpus can't force."""

from pw_etl_scrumptious_squad_spark.operators import web


def test_strip_html_drops_boilerplate_and_decodes_entities(spark):
    df = spark.createDataFrame(
        [
            (
                1,
                "<html><head><title>T</title><script>if(a<b){x='<p>no</p>'}"
                "</script></head><body><nav>menu</nav><h1>Head</h1>"
                "<p>alpha &amp; beta &lt;gamma&gt; &quot;q&quot; &#39;s&#39;"
                "</p><aside>ad</aside><!-- note --><footer>foot</footer>"
                "</body></html>",
            ),
            # unclosed tags + nested blocks + multiline whitespace
            (2, "<body><p>one\n\n two</p><div>three<br>four</div></body>"),
            # a script body containing an entity that must NOT leak
            (3, "<script>var s='&amp;';</script><p>kept</p>"),
        ],
        "doc_id LONG, html STRING",
    )
    got = {r["doc_id"]: r for r in web.strip_html(df).collect()}
    assert got[1]["text_extracted"] == "Head alpha & beta <gamma> \"q\" 's'"
    assert got[2]["text_extracted"] == "one two three four"
    assert got[3]["text_extracted"] == "kept"
    assert got[2]["n_chars_extracted"] == len("one two three four")


def test_strip_html_roundtrips_generated_pages(spark):
    docs = spark.createDataFrame(
        [
            (0, "plain words"),
            (1, "with & ampersand < less > greater"),
            (2, ""),
            (3, "  spaced   out  "),
        ],
        "doc_id LONG, text STRING",
    )
    got = {
        r["doc_id"]: r["text_extracted"]
        for r in web.strip_html(web.html_from_documents(docs)).collect()
    }
    assert got[0] == "Doc 0 plain words & <tail>"
    assert got[1] == "Doc 1 with & ampersand < less > greater & <tail>"
    assert got[2] == "Doc 2 & <tail>"
    assert got[3] == "Doc 3 spaced out & <tail>"


def test_strip_html_unclosed_block_does_not_leak(spark):
    """Round-6 advice: an unclosed script/style/nav tag must not leak
    its body through the generic tag strip — the fallback pass drops
    from the orphan open tag to end-of-document (conservative: tail
    text after the orphan is sacrificed, script bodies never leak)."""
    df = spark.createDataFrame(
        [
            (1, "<p>keep</p><script>var leak = 'SECRET';"),
            (2, "<p>a</p><style>.x{color:red}\nbody{leak}"),
            (3, "<p>pre</p><nav>menu without close <p>lost tail</p>"),
            # closed block followed by an orphan: both die
            (4, "<script>x</script><p>mid</p><script>var y='LEAK2'"),
        ],
        "doc_id LONG, html STRING",
    )
    got = {r["doc_id"]: r["text_extracted"] for r in web.strip_html(df).collect()}
    assert got[1] == "keep"
    assert got[2] == "a"
    assert got[3] == "pre"
    assert got[4] == "mid"


def test_tracking_filter_underscore_is_literal(spark):
    """Round-6 advice: 'utm_' must match literally — SQL LIKE's '_'
    single-char wildcard would also drop utma/utmz/mcXeid params,
    wrongly merging distinct URLs into one canonical form."""
    df = spark.createDataFrame(
        [
            (1, "https://ex.com/p?utma=1&id=7"),
            (2, "https://ex.com/p?utmz=2&id=7"),
            (3, "https://ex.com/p?mcXeid=3&id=7"),
            (4, "https://ex.com/p?utm_source=s&id=7"),
            (5, "https://ex.com/p?mc_eid=e&id=7"),
        ],
        "doc_id LONG, url STRING",
    )
    got = {r["doc_id"]: r for r in web.canonicalize_urls(df).collect()}
    # non-tracking lookalikes are KEPT (distinct canonical forms)...
    assert got[1]["canonical_url"] == "https://ex.com/p?id=7&utma=1"
    assert got[2]["canonical_url"] == "https://ex.com/p?id=7&utmz=2"
    assert got[3]["canonical_url"] == "https://ex.com/p?id=7&mcXeid=3"
    assert got[1]["n_params_dropped"] == 0
    # ...real tracking params are still dropped
    assert got[4]["canonical_url"] == "https://ex.com/p?id=7"
    assert got[5]["canonical_url"] == "https://ex.com/p?id=7"


def test_canonicalize_urls_edge_cases(spark):
    df = spark.createDataFrame(
        [
            # default https port + www + tracking + fragment
            (1, "HTTPS://WWW.Ex.COM:443/a/?utm_source=x&id=1#f"),
            # http with default port 80
            (2, "http://ex.com:80/b?ref=z&b=2&a=1"),
            # NON-default port must be kept
            (3, "https://ex.com:8443/c?x=1"),
            # no query at all
            (4, "https://sub.ex.com/d"),
            # params sorted, only tracking dropped
            (5, "https://ex.com/e?z=9&utm_campaign=c&a=1&gclid=g"),
        ],
        "doc_id LONG, url STRING",
    )
    got = {r["doc_id"]: r for r in web.canonicalize_urls(df).collect()}
    assert got[1]["canonical_url"] == "https://ex.com/a/?id=1"
    assert got[1]["domain"] == "ex.com"
    assert got[1]["n_params_dropped"] == 1
    assert got[2]["canonical_url"] == "http://ex.com/b?a=1&b=2"
    assert got[3]["canonical_url"] == "https://ex.com:8443/c?x=1"
    assert got[4]["canonical_url"] == "https://sub.ex.com/d"
    assert got[4]["n_params_dropped"] == 0
    assert got[5]["canonical_url"] == "https://ex.com/e?a=1&z=9"
    assert got[5]["n_params_dropped"] == 2


def test_canonical_url_is_a_dedup_key(spark):
    """The point of canonicalization: the same resource reached through
    different tracking params / casing / ports collapses to one key."""
    variants = [
        (i, u)
        for i, u in enumerate(
            [
                "https://www.ex.com/page?id=7&utm_source=a",
                "HTTPS://EX.COM:443/page?utm_campaign=b&id=7",
                "https://ex.com/page?id=7#section",
            ]
        )
    ]
    df = spark.createDataFrame(variants, "doc_id LONG, url STRING")
    keys = {
        r["canonical_url"] for r in web.canonicalize_urls(df).collect()
    }
    assert keys == {"https://ex.com/page?id=7"}


def test_warc_roundtrip_and_length_driven_parse(spark):
    """WARC ingest (y70): records round-trip byte-exact through the
    generator/parser pair, and parsing is Content-Length-driven — a
    payload containing a WARC banner and blank lines must NOT split its
    record (the bug delimiter-splitting has on real crawl data)."""
    docs = spark.createDataFrame(
        [
            (0, "plain text"),
            (1, ""),  # empty payload: Content-Length 0
            # adversarial payload: embedded banner + header-like lines
            (2, "WARC/1.0\r\nWARC-Type: response\r\n\r\nfake inner record"),
            (3, "multi\r\n\r\nblank\r\n\r\nlines"),
            (26, "crosses a chunk boundary at 25"),
        ],
        "doc_id LONG, text STRING",
    )
    chunks = web.warc_from_documents(docs, records_per_chunk=25)
    # docs 0..3 share chunk 0; doc 26 is chunk 1
    assert chunks.count() == 2
    parsed = {
        int(r["target_uri"].rsplit("/", 1)[1]): r
        for r in web.parse_warc_records(chunks).collect()
    }
    assert len(parsed) == 5
    for d, text in [(0, "plain text"), (1, ""), (26, "crosses a chunk boundary at 25")]:
        assert bytes(parsed[d]["payload"]) == text.encode()
    # the adversarial payloads survive intact — not split at the banner
    assert bytes(parsed[2]["payload"]).startswith(b"WARC/1.0")
    assert parsed[2]["content_length"] == len(
        "WARC/1.0\r\nWARC-Type: response\r\n\r\nfake inner record"
    )
    assert bytes(parsed[3]["payload"]) == b"multi\r\n\r\nblank\r\n\r\nlines"
    assert parsed[0]["warc_type"] == "response"
    assert parsed[0]["record_id"] == "<urn:doc:0>"
    assert parsed[26]["warc_date"] == "2024-01-27T00:00:00Z"


def test_strip_html_commented_orphan_tag_keeps_tail(spark):
    """Round-8 advice regression: a commented-out UNCLOSED boilerplate
    tag must die with its comment — previously the unclosed-block
    fallback ran first and deleted every byte after the comment."""
    df = spark.createDataFrame(
        [
            (1, "before <!-- <script src=x> --> after text"),
            (2, "a <!-- <nav> --> b <!-- <style media=x> --> c"),
        ],
        "doc_id LONG, html STRING",
    )
    out = {r["doc_id"]: r["text_extracted"] for r in web.strip_html(df).collect()}
    assert out[1] == "before after text"
    assert out[2] == "a b c"


def test_strip_html_tag_soup_fuzz_no_boilerplate_leak(spark):
    """Round-8 tag-soup fuzz battery: randomized malformed HTML —
    unclosed and nested boilerplate blocks (depth <= 4), commented-out
    orphans, unclosed comments, truncated entities, bare '<' — with a
    unique sentinel payload inside every boilerplate region. Invariant:
    no sentinel byte ever reaches extracted text."""
    import random

    rng = random.Random(0x5EED8)
    tags = ["script", "style", "nav", "footer", "header", "aside"]

    def boiler(i: int) -> str:
        tag = rng.choice(tags)
        payload = f"ZBOILER{i}Z"
        kind = rng.randrange(6)
        if kind == 0:  # plain closed block
            return f"<{tag} a=b>{payload}</{tag}>"
        if kind == 1:  # unclosed block (drops to EOF — conservative)
            return f"<{tag}>{payload} no closer"
        if kind == 2:  # nested same-tag, depth 2-4, payload at each level
            depth = rng.randrange(2, 5)
            s = payload + "mid"
            for lv in range(depth):
                s = f"<{tag}>lv{lv} {payload} {s} tail{lv} {payload}</{tag}>"
            return s
        if kind == 3:  # commented-out orphan opener
            return f"<!-- <{tag} src=x> {payload} -->"
        if kind == 4:  # unclosed comment (drops to EOF)
            return f"<!-- {payload} never closed"
        # cross-tag nesting
        other = rng.choice([t for t in tags if t != tag])
        return f"<{tag}><{other}>{payload}</{other}> {payload}</{tag}>"

    def noise() -> str:
        return rng.choice(
            [
                "plain words here",
                "&amp; &lt;ok&gt;",
                "&am truncated &#x entity",
                "bare < swallows to next > then text",
                "<p class='x'>para</p>",
                "<b>bold</b> <i>it</i>",
                "</script> stray closer",
                "<div><div>deep</div></div>",
            ]
        )

    rows = []
    for doc in range(60):
        parts = []
        for i in range(rng.randrange(2, 7)):
            parts.append(noise())
            parts.append(boiler(doc * 100 + i))
        parts.append(noise())
        rows.append((doc, " ".join(parts)))
    df = spark.createDataFrame(rows, "doc_id LONG, html STRING")
    out = web.strip_html(df).collect()
    assert len(out) == 60
    for r in out:
        assert "ZBOILER" not in (r["text_extracted"] or ""), (
            r["doc_id"],
            r["text_extracted"],
            rows[r["doc_id"]][1],
        )


def test_strip_html_nested_same_tag_outer_tail_dropped(spark):
    """Nested same-tag soup resolves innermost-first: the outer tail
    ('B') that the plain non-greedy regex leaked must be dropped, and
    text after the whole block survives."""
    df = spark.createDataFrame(
        [
            (1, "x <nav><nav>A</nav>B</nav> y"),
            (2, "x <nav><nav><nav>A</nav>B</nav>C</nav> y"),
            (3, "x <script><style>A</style>B</script> y"),
        ],
        "doc_id LONG, html STRING",
    )
    out = {r["doc_id"]: r["text_extracted"] for r in web.strip_html(df).collect()}
    assert out[1] == "x y"
    assert out[2] == "x y"
    assert out[3] == "x y"


def test_warc_chunk_colocation_without_aqe_coalesce(spark):
    """Round-8 advice regression: repartitioning on the float division
    doc_id/k (instead of floor(doc_id/k)) scattered same-chunk docs
    across shuffle partitions, so 50 docs / k=25 emitted up to 16
    fragment rows for 2 chunk_ids — masked locally only when AQE
    coalesced the tiny shuffle to one partition. Pin the contract with
    coalescing OFF: exactly one row per chunk_id, payload complete and
    in doc_id order."""
    docs = spark.createDataFrame(
        [(d, f"doc {d}") for d in range(50)], "doc_id LONG, text STRING"
    )
    coalesce_key = "spark.sql.adaptive.coalescePartitions.enabled"
    prev = spark.conf.get(coalesce_key, "true")
    spark.conf.set(coalesce_key, "false")
    try:
        rows = web.warc_from_documents(docs, records_per_chunk=25).collect()
    finally:
        spark.conf.set(coalesce_key, prev)
    assert sorted(r["chunk_id"] for r in rows) == [0, 1]
    for r in rows:
        lo = int(r["chunk_id"]) * 25
        expected = b"".join(
            f"WARC/1.0\r\nWARC-Type: response\r\n"
            f"WARC-Record-ID: <urn:doc:{d}>\r\n"
            f"WARC-Date: 2024-01-{d % 28 + 1:02d}T00:00:00Z\r\n"
            f"WARC-Target-URI: https://example{d % 7}.com/doc/{d}\r\n"
            f"Content-Length: {len(f'doc {d}'.encode())}\r\n\r\n"
            f"doc {d}\r\n\r\n".encode()
            for d in range(lo, lo + 25)
        )
        assert bytes(r["data"]) == expected
    # same contract for the crawl-record packer (x05's input direction)
    recs = spark.createDataFrame(
        [(d, f"https://m{d}.com/", f"<p>{d}</p>") for d in range(50)],
        "doc_id LONG, url STRING, html STRING",
    )
    spark.conf.set(coalesce_key, "false")
    try:
        rows2 = web.warc_from_crawl_records(recs, records_per_chunk=25).collect()
    finally:
        spark.conf.set(coalesce_key, prev)
    assert sorted(r["chunk_id"] for r in rows2) == [0, 1]
    for r in rows2:
        lo = int(r["chunk_id"]) * 25
        data = bytes(r["data"])
        assert data.count(b"WARC/1.0\r\n") == 25
        # doc_id-sorted record order inside the chunk
        order = [
            int(seg.split(b">")[0])
            for seg in data.split(b"WARC-Record-ID: <urn:doc:")[1:]
        ]
        assert order == list(range(lo, lo + 25))


def test_warc_parse_malformed_raises_loudly(spark):
    import pytest

    def run(data: bytes):
        df = spark.createDataFrame([(1, bytearray(data))], "chunk_id LONG, data BINARY")
        return web.parse_warc_records(df).collect()

    with pytest.raises(Exception, match="malformed WARC"):
        run(b"not a warc record at all\r\n\r\n")
    with pytest.raises(Exception, match="no Content-Length"):
        run(b"WARC/1.0\r\nWARC-Type: response\r\n\r\npayload")
    with pytest.raises(Exception, match="truncated"):
        run(b"WARC/1.0\r\nContent-Length: 999\r\n\r\nshort")


def test_parse_robots_groups_and_rep_precedence(spark):
    """robots parsing + REP evaluation on hand-built files: consecutive
    User-agent lines share a group; other agents' groups don't leak;
    comments and empty directives are dropped; longest match wins with
    ties going to Allow."""
    robots = (
        "# header comment\n"
        "User-agent: Googlebot\n"
        "Disallow: /\n"
        "\n"
        "User-agent: FooBot\n"
        "User-agent: *\n"          # shares the group with FooBot
        "Disallow: /a/\n"
        "Allow: /a/b/\n"
        "disallow: /c/   # inline comment\n"  # lowercase key + comment
        "Disallow:\n"               # empty = allow-all, dropped
        "Allow: /a/x/\n"
        "Disallow: /a/x/\n"         # same length as the Allow -> Allow wins
    )
    df = spark.createDataFrame([(1, robots)], "domain_id LONG, robots_txt STRING")
    rules = web.parse_robots(df)
    got = {
        (r["is_allow"], r["path_prefix"]) for r in rules.collect()
    }
    assert got == {
        (0, "/a/"), (1, "/a/b/"), (0, "/c/"), (1, "/a/x/"), (0, "/a/x/")
    }  # Googlebot's blanket deny absent; empty directive absent

    urls = spark.createDataFrame(
        [
            (1, 1, "/a/deep/page"),    # deny /a/
            (2, 1, "/a/b/page"),       # allow /a/b/ (longer)
            (3, 1, "/c/page"),         # deny /c/
            (4, 1, "/free"),           # no rule -> allowed
            (5, 1, "/a/x/page"),       # tie length -> Allow wins
            (6, 2, "/a/deep/page"),    # unknown domain -> allowed
        ],
        "doc_id LONG, domain_id LONG, path STRING",
    )
    out = {
        r["doc_id"]: r
        for r in web.apply_robots(urls, rules, keep=("doc_id",)).collect()
    }
    assert [out[i]["allowed"] for i in range(1, 7)] == [0, 1, 0, 1, 1, 1]
    assert out[2]["matched_rule"] == "/a/b/"
    assert out[5]["matched_rule"] == "/a/x/"
    assert out[4]["matched_rule"] is None and out[6]["matched_rule"] is None
