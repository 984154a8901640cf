"""Cross-engine fuzz for the shared-dialect SQL generators (r14 verdict
next #3).

The r14 urlnorm self-review proved the dual-oracle blind-spot class is
REAL: three edge bugs where Spark and DuckDB agreed on the buggy
behavior, so the value oracle was structurally blind — only randomized
parity + engine-independent-property fuzz caught them.  This file gives
every other shared-dialect generated chain the same treatment the URL
chain got (tests/test_urlnorm.py) and the PSL matcher got
(tests/test_psl.py):

- ``layout.morton_key`` / ``morton_key_sql``: random-point triple
  parity (Spark column, generated SQL in DuckDB, pure-Python loop) +
  the decode round-trip property (de-interleaving the key recovers
  both inputs — engine-independent);
- ``layout.hilbert_key`` / ``hilbert_key_sql_ctes``: random-point
  triple parity off the structured lattice the fixed tests use, +
  random-rectangle LOCALITY properties (bijection on the rectangle;
  Hilbert's mean contiguous-run count beats Morton's over seeded
  random rectangles — the property the Z-order audit's pruning win
  rests on);
- ``urlnorm.site_diversify_sql``: random arbitrary domains (dom-shaped
  and not, uppercase, leading dots, huge indices) — Spark/DuckDB parity
  + a pure-Python model of the rewrite;
- ``sketches.equidepth_approx_bins``: adversarial TIE distributions
  (all-equal, 999:1 skew, tiny integer domains, powers-of-two, single
  row, outliers) — the engine-independent contract (tie-aware rank
  bracket + exact partition cover) must hold on every one, which is
  exactly what its ``*_approx_contract`` oracles assert with literal
  1s.
"""

import random

import duckdb

from reddit_sse_stream_spark.operators import layout, sketches, urlnorm

# --------------------------------------------------------------------- #
# pure-Python references (loop-shaped on purpose: no code shape shared  #
# with the SQL generators they check)                                   #
# --------------------------------------------------------------------- #


def _py_morton(x: int, y: int, bits: int) -> int:
    k = 0
    for i in range(bits):
        k |= ((x >> i) & 1) << (2 * i)
        k |= ((y >> i) & 1) << (2 * i + 1)
    return k


def _py_morton_decode(k: int, bits: int) -> tuple[int, int]:
    x = y = 0
    for i in range(bits):
        x |= ((k >> (2 * i)) & 1) << i
        y |= ((k >> (2 * i + 1)) & 1) << i
    return x, y


def _py_hilbert_xy2d(n: int, x: int, y: int) -> int:
    """Textbook public-domain iterative xy->d walk."""
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


# --------------------------------------------------------------------- #
# Morton                                                                #
# --------------------------------------------------------------------- #


def test_morton_fuzz_triple_parity_and_roundtrip(spark, duck):
    rng = random.Random("morton-fuzz")
    bits = 16
    pts = [
        (rng.randrange(0, 1 << bits), rng.randrange(0, 1 << bits))
        for _ in range(300)
    ]
    want = [_py_morton(x, y, bits) for x, y in pts]
    # decode round-trip: the interleave is a bijection (engine-free)
    for (x, y), k in zip(pts, want):
        assert _py_morton_decode(k, bits) == (x, y)
    # Spark column expression
    df = spark.createDataFrame(pts, "x long, y long")
    from pyspark.sql import functions as F

    got_s = [
        r["k"]
        for r in df.select(
            layout.morton_key(F.col("x"), F.col("y"), bits).alias("k")
        )
        .orderBy("x", "y")
        .collect()
    ]
    by_pt = dict(zip(sorted(pts), got_s))
    assert [by_pt[p] for p in pts] == want
    # generated SQL in DuckDB
    vals = ", ".join(f"({x}, {y})" for x, y in pts)
    # CAST to BIGINT: DuckDB infers INTEGER for VALUES literals and the
    # interleave's `<< 31` overflows INT32 — the catalog oracles feed
    # the generator BIGINT columns, so match that contract here
    got_d = [
        r[0]
        for r in duck.execute(
            f"SELECT {layout.morton_key_sql('x', 'y', bits)} FROM "
            f"(SELECT CAST(a AS BIGINT) AS x, CAST(b AS BIGINT) AS y "
            f"FROM (VALUES {vals}) v(a, b))"
        ).fetchall()
    ]
    assert got_d == want


# --------------------------------------------------------------------- #
# Hilbert                                                               #
# --------------------------------------------------------------------- #


def test_hilbert_fuzz_random_points_triple_parity(spark, duck):
    """Random (not lattice-structured) points at bits=8: the chained
    Spark SELECTs, the generated DuckDB CTE chain, and the textbook
    loop agree point-for-point."""
    rng = random.Random("hilbert-fuzz")
    n = 1 << 8
    pts = sorted(
        {(rng.randrange(n), rng.randrange(n)) for _ in range(250)}
    )
    want = {p: _py_hilbert_xy2d(n, *p) for p in pts}
    df = spark.createDataFrame(pts, "x long, y long")
    for r in layout.hilbert_key(df, "x", "y", bits=8).collect():
        assert r["hkey"] == want[(r["x"], r["y"])]
    ctes, final = layout.hilbert_key_sql_ctes("pts", "x", "y", bits=8)
    vals = ", ".join(f"({x}, {y})" for x, y in pts)
    sql = (
        f"WITH pts AS (SELECT * FROM (VALUES {vals}) v(x, y)),\n"
        f"{ctes}\nSELECT x, y, hkey FROM {final}"
    )
    for x, y, h in duck.execute(sql).fetchall():
        assert h == want[(x, y)]


def test_hilbert_random_rectangle_locality():
    """Seeded random rectangles on the 64x64 grid: (a) the walk is a
    bijection restricted to every rectangle (no duplicate codes); (b)
    averaged over the rectangles, Hilbert needs FEWER contiguous code
    runs to cover a rectangle than Morton — the locality property that
    makes equal-size code ranges cover tighter rectangles, i.e. the
    entire reason layout_hilbert_skipping_audit exists.  Uses the
    Python references (proven equal to both engines above), so the
    property check needs no Spark session and stays fast."""
    rng = random.Random("hilbert-rect")
    n, bits = 64, 6

    def runs(keys: list[int]) -> int:
        ks = sorted(keys)
        return 1 + sum(
            1 for a, b in zip(ks, ks[1:]) if b != a + 1
        )

    h_runs = m_runs = 0
    for _ in range(40):
        w = rng.randrange(2, 17)
        ht = rng.randrange(2, 17)
        x0 = rng.randrange(0, n - w)
        y0 = rng.randrange(0, n - ht)
        cells = [
            (x, y)
            for x in range(x0, x0 + w)
            for y in range(y0, y0 + ht)
        ]
        hk = [_py_hilbert_xy2d(n, x, y) for x, y in cells]
        mk = [_py_morton(x, y, bits) for x, y in cells]
        assert len(set(hk)) == len(cells)  # bijection on the rect
        assert len(set(mk)) == len(cells)
        h_runs += runs(hk)
        m_runs += runs(mk)
    assert h_runs < m_runs, (h_runs, m_runs)


# --------------------------------------------------------------------- #
# site_diversify_sql                                                    #
# --------------------------------------------------------------------- #


def _py_site_diversify(d: str) -> str:
    import re

    m = re.match(r"^dom([0-9]+)", d)
    first = re.match(r"^([^.]+)", d)
    prefix = first.group(1) if first else ""
    if not m:
        return prefix + ".sites.io"
    k = int(m.group(1)) % 3
    zone = {
        0: ".example.com",
        1: ".example.co.uk",
        2: ".sites.io",
    }[k]
    return prefix + zone


def test_site_diversify_fuzz_parity_and_model(spark, duck):
    rng = random.Random("site-fuzz")
    chars = "abcdefghijklmnopqrstuvwxyz0123456789-"
    domains = set()
    for _ in range(200):
        shape = rng.randrange(5)
        if shape == 0:  # canonical dom<k> shape
            dom = f"dom{rng.randrange(0, 10**rng.randrange(1, 9))}"
        elif shape == 1:  # dom with non-digit tail
            dom = f"dom{rng.randrange(100)}x{rng.randrange(10)}"
        elif shape == 2:  # arbitrary word
            dom = "".join(
                rng.choice(chars) for _ in range(rng.randrange(1, 10))
            )
        elif shape == 3:  # uppercase / mixed
            dom = "DOM" + str(rng.randrange(100))
        else:  # multi-label
            dom = ".".join(
                "".join(rng.choice(chars) for _ in range(3))
                for _ in range(rng.randrange(2, 4))
            )
        domains.add(dom + rng.choice(["", ".example.com", ".x.y"]))
    domains = sorted(domains)
    expr = urlnorm.site_diversify_sql("d")
    want = [_py_site_diversify(d) for d in domains]
    vals = ", ".join(f"('{d}')" for d in domains)
    got_d = [
        r[0]
        for r in duck.execute(
            f"SELECT {expr} FROM (VALUES {vals}) v(d)"
        ).fetchall()
    ]
    assert got_d == want
    df = spark.createDataFrame([(d,) for d in domains], "d string")
    got_s = [
        r["s"]
        for r in df.selectExpr(f"{expr} AS s").collect()
    ]
    assert got_s == want
    # engine-free properties: zone always one of the three; prefix is
    # the first label; stability (pure function of the domain)
    for d, s in zip(domains, want):
        assert s.endswith((".example.com", ".example.co.uk", ".sites.io"))
        assert s.startswith(d.split(".", 1)[0])


# --------------------------------------------------------------------- #
# equidepth bracket contract on adversarial tie distributions           #
# --------------------------------------------------------------------- #


def _adversarial_distributions() -> dict[str, list[float]]:
    rng = random.Random("eqd-fuzz")
    return {
        "all_equal": [7.0] * 900,
        "skew_999_1": [1.0] * 999 + [2.0],
        "tiny_int_domain": [float(rng.randrange(4)) for _ in range(800)],
        "powers_of_two": [
            float(1 << rng.randrange(10)) for _ in range(600)
        ],
        "single_row": [42.0],
        "outlier": [1.0] * 500 + [1e12],
        "negative_ties": [
            float(rng.choice([-5, -5, -5, 0, 3])) for _ in range(700)
        ],
    }


def test_equidepth_contract_holds_on_adversarial_ties(spark):
    """The tie-aware rank bracket and the exact partition cover must
    hold on EVERY adversarial distribution — duplicate cutpoints,
    duplicate blocks spanning bins, empty interior bins, one-row
    inputs.  This is the engine-independent property the
    ``*_approx_contract`` rows' literal-1 oracles assert; a boundary
    convention bug (open/closed flip) or a naive |count - n/k| band
    breaks it here first."""
    for name, vals in _adversarial_distributions().items():
        df = spark.createDataFrame([(v,) for v in vals], "v double")
        rows = sketches.equidepth_approx_bins(df, "v", k=8).collect()
        assert len(rows) == 8, name
        for r in rows:
            assert r["n_total"] == len(vals), name
            assert r["boundary_rank_ok"] == 1, (name, r["bin"])
            assert r["partition_complete"] == 1, (name, r["bin"])


# --------------------------------------------------------------------- #
# r15 generators: alignment score + PSL-class host synthesis            #
# --------------------------------------------------------------------- #


def _py_align_score(
    sum_rgb: int, checksum: int, pix_peak: int, w: int, h: int, text: str
) -> int:
    """Loop-shaped model of _align_score_sql: integer descriptors,
    double cosine, floor at 1e-4."""
    import math

    iv = [
        sum_rgb % 997 + 1,
        checksum % 983 + 1,
        pix_peak + 1,
        w * 31,
        h * 37,
    ]
    tv = []
    for k in range(5):
        acc = 0
        for p, c in enumerate(text):
            if p % 5 == k:
                acc += ord(c)
        tv.append(1 + acc % 1000)
    dot = sum(float(a) * b for a, b in zip(iv, tv))
    ni = sum(float(a) * a for a in iv)
    nt = sum(float(a) * a for a in tv)
    return math.floor(dot / (math.sqrt(ni) * math.sqrt(nt)) * 10000)


def test_align_score_fuzz_triple_parity(spark, duck):
    """media_text_alignment_gate's scoring chain is a NEW dual-dialect
    generator, so it gets the urlnorm treatment: random feature/caption
    inputs (beyond what the fixture's images produce) -> identical
    fixed-point score from the Spark rendering, the DuckDB rendering,
    and the loop model."""
    from reddit_sse_stream_spark.plans.catalog import _align_score_sql

    rng = random.Random("align-fuzz")
    words = ["spark", "table", "join", "agg", "row", "vector", "the", "a"]
    cases = []
    for _ in range(120):
        cases.append(
            (
                rng.randrange(0, 10**7),  # sum_rgb
                rng.randrange(0, 2**31),  # checksum
                rng.randrange(0, 256),  # pix_peak
                rng.randrange(8, 41),  # img_w
                rng.randrange(8, 25),  # img_h
                " ".join(
                    rng.choice(words)
                    for _ in range(rng.randrange(1, 40))
                ),
            )
        )
    want = [_py_align_score(*c) for c in cases]
    df = spark.createDataFrame(
        [(i, *c) for i, c in enumerate(cases)],
        "id long, sum_rgb long, checksum long, pix_peak long, "
        "img_w long, img_h long, text string",
    )
    got_s = [
        r["a"]
        for r in df.selectExpr(
            "id", f"{_align_score_sql('spark')} AS a"
        )
        .orderBy("id")
        .collect()
    ]
    assert got_s == want
    vals = ", ".join(
        f"({i}, {c[0]}, {c[1]}, {c[2]}, {c[3]}, {c[4]}, '{c[5]}')"
        for i, c in enumerate(cases)
    )
    got_d = [
        r[0]
        for r in duck.execute(
            f"SELECT {_align_score_sql('duckdb')} FROM "
            f"(SELECT id, CAST(a AS BIGINT) AS sum_rgb, "
            f"CAST(b AS BIGINT) AS checksum, CAST(c AS BIGINT) AS pix_peak, "
            f"CAST(d AS BIGINT) AS img_w, CAST(e AS BIGINT) AS img_h, "
            f"f AS text, string_split(f, '') AS cs "
            f"FROM (VALUES {vals}) v(id, a, b, c, d, e, f) ORDER BY id)"
        ).fetchall()
    ]
    assert got_d == want


def test_psl_class_host_sql_parity_and_model(spark, duck):
    """The PSL-class row's host synthesizer: identical text runs on both
    engines; the loop model pins the zone/label rotation."""
    from reddit_sse_stream_spark.plans.catalog import _psl_class_host_sql

    def model(i: int) -> str:
        zone = [
            "example.com", "co.uk", "cdn", "www.cdn", "zone9",
        ][i % 5]
        lead = f"d{i % 4}." if i % 4 == 0 else ""
        return f"{lead}s{i % 7}.{zone}"

    ids = list(range(0, 200)) + [10**9 + 7, 123456789]
    want = [model(i) for i in ids]
    expr = _psl_class_host_sql("doc_id")
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got_s = [
        r["h"]
        for r in df.selectExpr("doc_id", f"{expr} AS h")
        .orderBy("doc_id")
        .collect()
    ]
    # ids list is ascending already except the tail two — sort both
    by_id_s = dict(zip(sorted(ids), got_s))
    assert [by_id_s[i] for i in sorted(ids)] == [
        model(i) for i in sorted(ids)
    ]
    vals = ", ".join(f"({i})" for i in ids)
    got_d = [
        r[0]
        for r in duck.execute(
            f"SELECT {expr} FROM (SELECT CAST(x AS BIGINT) AS doc_id "
            f"FROM (VALUES {vals}) v(x)) ORDER BY doc_id"
        ).fetchall()
    ]
    assert got_d == [model(i) for i in sorted(ids)]
