"""URL canonicalization chain: cross-engine parity and contract cases.

The catalog rows (`feed_url_canonical_host`, `feed_url_host_cap`) verify
the chain end to end over the synthesized feed; these tests drive the
SAME generated expressions over hand-built adversarial URLs the
synthesizer never produces (root path, all-tracking query, host == a
public suffix, deep subdomains) in BOTH engines.
"""

import duckdb
import pytest

from reddit_sse_stream_spark.operators.urlnorm import (
    PUBLIC_SUFFIXES,
    canonical_parts,
    synth_url_sql,
)

ADVERSARIAL = [
    # (raw, want_host, want_canon)
    (
        "HTTP://WWW.Site.COM:80/p/1/?utm_source=x&q=1#sec",
        "site.com",
        "http://site.com/p/1?q=1",
    ),
    ("https://site.com:443/", "site.com", "https://site.com/"),
    ("http://site.com", "site.com", "http://site.com"),
    # all-tracking query disappears entirely (no dangling '?')
    (
        "http://site.com/a?utm_a=1&utm_b=2&ref=x&fbclid=z",
        "site.com",
        "http://site.com/a",
    ),
    # non-default port survives; default port for the OTHER scheme too
    ("http://site.com:8080/a", "site.com", "http://site.com:8080/a"),
    ("http://site.com:443/a", "site.com", "http://site.com:443/a"),
    # deep subdomain; www only strips as a LEADING label
    (
        "https://a.b.www.site.co.uk/x/",
        "a.b.www.site.co.uk",
        "https://a.b.www.site.co.uk/x",
    ),
    # kept-param order is preserved, never sorted
    (
        "http://s.io/p?z=9&utm_x=1&a=2",
        "s.io",
        "http://s.io/p?z=9&a=2",
    ),
    # r14 review regressions: 'utmost'/'utmx' are NOT tracking params
    # (LIKE's '_' wildcard would have dropped them); a '?' inside the
    # fragment must NOT resurrect fragment text as a query; a second
    # '?' inside the query belongs to the query
    (
        "http://a.com/p?utmost=1&q=2",
        "a.com",
        "http://a.com/p?utmost=1&q=2",
    ),
    ("http://a.com/p?utmx=1", "a.com", "http://a.com/p?utmx=1"),
    ("http://a.com/p#x?y=1", "a.com", "http://a.com/p"),
    (
        "http://a.com/p?x=1?y=2#f?z=3",
        "a.com",
        "http://a.com/p?x=1?y=2",
    ),
    # r15 ADVICE: userinfo is stripped (not folded into the host), with
    # or without a password, and composes with www./port/default-port
    # handling; a bracketed IPv6 literal is the WHOLE host — the first
    # ':' inside the brackets is not a port separator
    ("http://user@site.com/", "site.com", "http://site.com/"),
    (
        "https://user:pw@WWW.Site.com:443/a/",
        "site.com",
        "https://site.com/a",
    ),
    ("http://[::1]:8080/a", "[::1]", "http://[::1]:8080/a"),
    ("http://[::1]:80/a", "[::1]", "http://[::1]/a"),
    ("https://[2001:DB8::7]/x", "[2001:db8::7]", "https://[2001:db8::7]/x"),
    ("http://u@[::1]:9/p", "[::1]", "http://[::1]:9/p"),
]


def _duck_chain(urls):
    con = duckdb.connect()
    parts = canonical_parts("raw_url", "duckdb")
    vals = ", ".join(f"({i}, '{u}')" for i, u in enumerate(urls))
    return con.execute(
        f"SELECT {parts['host']}, {parts['canon_url']} "
        f"FROM (SELECT id, raw_url FROM (VALUES {vals}) v(id, raw_url)) "
        f"ORDER BY id"
    ).fetchall()


def _spark_chain(spark, urls):
    parts = canonical_parts("raw_url", "spark")
    df = spark.createDataFrame(
        list(enumerate(urls)), "id long, raw_url string"
    )
    rows = (
        df.selectExpr(
            "id", f"{parts['host']} AS h", f"{parts['canon_url']} AS c"
        )
        .orderBy("id")
        .collect()
    )
    return [(r["h"], r["c"]) for r in rows]


def test_canonical_chain_expected_values_and_parity(spark):
    urls = [u for u, _, _ in ADVERSARIAL]
    duck = _duck_chain(urls)
    spk = _spark_chain(spark, urls)
    for (raw, want_h, want_c), d, s in zip(ADVERSARIAL, duck, spk):
        assert d == (want_h, want_c), raw
        assert s == (want_h, want_c), raw


def test_synth_url_parity_and_reconvergence(spark):
    """The synthesizer produces identical raw URLs on both engines, and
    ids that differ only in case/www/tracking noise canonicalize to the
    same URL (the property the catalog row's dedup rate measures)."""
    rows = [(i, "dom1.example.com") for i in range(0, 4620)]
    synth = synth_url_sql()
    parts_s = canonical_parts("raw_url", "spark")
    df = spark.createDataFrame(rows, "id long, domain string")
    got = (
        df.selectExpr("id", f"{synth} AS raw_url")
        .selectExpr("id", "raw_url", f"{parts_s['canon_url']} AS c")
        .collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t(id BIGINT, domain VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    parts_d = canonical_parts("raw_url", "duckdb")
    duck = dict(
        con.execute(
            f"SELECT id, {parts_d['canon_url']} FROM "
            f"(SELECT id, {synth} AS raw_url FROM t)"
        ).fetchall()
    )
    n_raw = len({r["raw_url"] for r in got})
    n_canon = len({r["c"] for r in got})
    assert n_canon < n_raw  # canonicalization must merge variants
    for r in got:
        assert duck[r["id"]] == r["c"]


def _fuzz_urls(n: int = 150) -> list[str]:
    """Seeded messy-URL generator (the test_text_fuzz convention: one
    batched Spark round-trip, deterministic seed): random scheme case,
    1-4 host labels with optional www./port, paths with optional
    trailing slash, query params mixing tracking and kept keys in
    random order, optional fragments."""
    import random

    rng = random.Random("urlnorm-fuzz")
    schemes = ["http", "HTTP", "https", "HTTPS", "Http", "ftp"]
    label_chars = "abcdefghijklmnopqrstuvwxyz0123456789-"
    out = []
    for _ in range(n):
        scheme = rng.choice(schemes)
        labels = [
            "".join(rng.choice(label_chars) for _ in range(rng.randrange(1, 8)))
            for _ in range(rng.randrange(1, 5))
        ]
        host = ".".join(labels)
        if rng.random() < 0.3:
            host = "www." + host
        if rng.random() < 0.3:
            host = host.upper()
        if rng.random() < 0.15:  # bracketed IPv6 literal replaces host
            host = rng.choice(["[::1]", "[2001:DB8::7]", "[fe80::a:b]"])
        userinfo = rng.choice(["", "", "", "", "u@", "user:pw@", "U.x@"])
        host = userinfo + host
        port = rng.choice(["", ":80", ":443", ":8080", ":1", ":65535"])
        segs = [
            "".join(rng.choice(label_chars) for _ in range(rng.randrange(1, 6)))
            for _ in range(rng.randrange(0, 4))
        ]
        path = "/" + "/".join(segs) if segs else rng.choice(["", "/"])
        if segs and rng.random() < 0.5:
            path += "/"
        params = []
        for _ in range(rng.randrange(0, 5)):
            k = rng.choice(
                ["utm_source", "utm_x", "utmost", "utmx", "ref", "refx",
                 "fbclid", "q", "id", "a_b"]
            )
            v = "".join(rng.choice(label_chars) for _ in range(rng.randrange(0, 4)))
            params.append(f"{k}={v}")
        query = "?" + "&".join(params) if params else ""
        frag = rng.choice(["", "#x", "#sec-1", "#x?y=1", "#?q=9"])
        out.append(f"{scheme}://{host}{port}{path}{query}{frag}")
    return out


def test_canonical_chain_engine_parity_fuzz(spark):
    """The property every URL-row value oracle rests on: the generated
    chain produces BIT-IDENTICAL (host, canon_url) on Spark and DuckDB
    over seeded random messy URLs — including shapes the catalog's
    synthesizer never emits (ftp scheme, empty path, 1-label hosts,
    0-value params, extreme ports)."""
    urls = _fuzz_urls()
    duck = _duck_chain(urls)
    spk = _spark_chain(spark, urls)
    for raw, d, s in zip(urls, duck, spk):
        assert d == s, raw


def test_site_diversify_non_dom_domain_no_engine_divergence(spark):
    """A domain that does not start with dom<digits> must take the
    fallback branch on BOTH engines — DuckDB raises on CAST('' AS
    BIGINT) where Spark yields NULL, so the expression guards the CAST
    behind an emptiness CASE (r14 review finding)."""
    from reddit_sse_stream_spark.operators.urlnorm import site_diversify_sql

    expr = site_diversify_sql("d")
    cases = ["other.example.com", "dom.example.com", "x", "dom12.y.z"]
    duck = duckdb.connect().execute(
        f"SELECT {expr} FROM (SELECT unnest({cases!r}) AS d)"
    ).fetchall()
    spk = (
        spark.createDataFrame([(c,) for c in cases], "d string")
        .selectExpr(f"{expr} AS s")
        .collect()
    )
    assert [d[0] for d in duck] == [r["s"] for r in spk]
    assert duck[0][0] == "other.sites.io"
    assert duck[3][0] == "dom12.example.com"  # 12 % 3 == 0


def test_public_suffix_table_shapes():
    """The literal PSL stand-in must contain both shapes the matcher's
    longest-suffix logic needs: single-label TLDs and multi-label
    suffixes whose presence makes last-two-labels wrong."""
    assert "com" in PUBLIC_SUFFIXES
    assert any("." in s for s in PUBLIC_SUFFIXES)
    assert len(set(PUBLIC_SUFFIXES)) == len(PUBLIC_SUFFIXES)
