"""Public-suffix matcher: full rule classes, realistic fan-out, and
triple-implementation fuzz (r14 verdict next #4 + the fuzz-extension
directive #3).

The catalog row (`feed_url_canonical_host`) verifies the matcher over
the 11-entry stand-in table end to end; these tests exercise what that
fixture cannot: a HUNDREDS-of-entries rule table (the docstring claim
"millions of PSL entries stay a hash join" needs at least a
realistic-fan-out stress), the real PSL's wildcard (``*.ck``) and
exception (``!www.ck``) rule classes, and a seeded host fuzz comparing
THREE implementations — the Spark frame, the generated DuckDB CTEs, and
the pure-Python loop reference (`registered_domain_py`).  The Python
anchor is the point: the r14 urlnorm review proved a dual SQL oracle is
structurally blind to bugs both engines agree on; the loop
implementation shares no code shape with the SQL.
"""

import random

import duckdb

from reddit_sse_stream_spark.operators.urlnorm import (
    PUBLIC_SUFFIXES,
    normalize_psl_rules,
    registered_domain_duckdb_ctes,
    registered_domain_frame,
    registered_domain_py,
)


def _big_psl() -> list[str]:
    """Deterministic ~300-entry PSL-shaped fixture: single-label TLDs,
    multi-label suffixes at fan-out (many zones sharing the label
    shapes), wildcard zones with and without their parent listed (the
    real PSL's ``ck`` lists only ``*.ck``), and exception rules for
    half the wildcard zones (the real ``!www.ck`` pattern)."""
    rules: list[str] = []
    rules += [f"t{i:03d}" for i in range(150)]  # single-label TLDs
    rules += [f"co.t{i:03d}" for i in range(0, 80)]  # multi-label
    rules += [f"ac.t{i:03d}" for i in range(40, 100)]
    for i in range(30):  # wildcard zones w00..w29
        rules.append(f"*.w{i:02d}")
        if i % 2 == 0:  # parent listed for even zones only
            rules.append(f"w{i:02d}")
        if i % 3 == 0:  # exception for every third zone
            rules.append(f"!www.w{i:02d}")
    assert len(rules) == len(set(rules))
    assert len(rules) > 300
    return rules


def _duck_reg(hosts: list[str], rules) -> dict[str, str]:
    con = duckdb.connect()
    vals = ", ".join(f"('{h}')" for h in hosts)
    q = (
        f"WITH hosts AS (SELECT * FROM (VALUES {vals}) v(host)),\n"
        f"{registered_domain_duckdb_ctes('hosts', rules)}\n"
        f"SELECT host, registered_domain FROM psl_reg"
    )
    return dict(con.execute(q).fetchall())


def _spark_reg(spark, hosts: list[str], rules) -> dict[str, str]:
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    rows = registered_domain_frame(df, rules).collect()
    return {r["host"]: r["registered_domain"] for r in rows}


# hand-computed expectations over the wildcard/exception classes
WILDCARD_CASES = [
    # *.w00 (+ parent w00, + !www.w00)
    ("foo.w00", "foo.w00"),  # * consumes foo -> ps = foo.w00 = host
    ("a.foo.w00", "a.foo.w00"),  # registered = label + ps
    ("x.a.foo.w00", "a.foo.w00"),
    ("w00", "w00"),  # parent listed: host IS a suffix -> itself
    ("www.w00", "www.w00"),  # exception: ps = w00, reg = www.w00
    # exception prevails over the wildcard: ps = w00, reg = www.w00
    # even with extra leading labels (spec: "the prevailing rule is
    # the one which is an exception rule", then ps = rule minus its
    # leftmost label)
    ("b.www.w00", "www.w00"),
    # *.w01 (no parent, no exception)
    ("foo.w01", "foo.w01"),
    ("a.foo.w01", "a.foo.w01"),
    ("w01", "w01"),  # no rule matches bare w01 -> deviation: itself
    # !www.w06 beats *.w06
    ("www.w06", "www.w06"),
]


def test_rule_normalization_shapes():
    norm = normalize_psl_rules(["com", "*.ck", "!www.ck"])
    assert norm == [("com", 1, 0), ("ck", 1, -1), ("www.ck", 0, 1)]


def test_wildcard_exception_semantics_all_three_engines(spark):
    rules = _big_psl()
    hosts = [h for h, _ in WILDCARD_CASES]
    want = {h: w for h, w in WILDCARD_CASES}
    py = {h: registered_domain_py(h, rules) for h in hosts}
    duck = _duck_reg(hosts, rules)
    spk = _spark_reg(spark, hosts, rules)
    for h in hosts:
        assert py[h] == want[h], h
        assert duck[h] == py[h], h
        assert spk[h] == py[h], h


def test_exception_beats_longer_wildcard():
    """Spec clause: if any exception rule matches, it prevails over
    every other matching rule regardless of label count.  For
    www.w00 the wildcard *.w00 also matches (public suffix www.w00 ->
    registered domain would need a 3rd label) but the exception makes
    www.w00 itself the registered domain."""
    rules = ["*.w00", "!www.w00"]
    assert registered_domain_py("www.w00", rules) == "www.w00"
    assert registered_domain_py("a.www.w00", rules) == "www.w00"
    # without the exception, the wildcard governs
    assert registered_domain_py("a.www.w00", ["*.w00"]) == "a.www.w00"


def test_realistic_fanout_longest_match(spark):
    """Hundreds of rules, deep hosts: longest match must win at
    fan-out — site.co.t050 rolls to site.co.t050 (co.t050 is a listed
    multi-label suffix), not co.t050; a.b.site.t050 rolls to
    site.t050."""
    rules = _big_psl()
    hosts = [
        "site.co.t050",
        "deep.site.co.t050",
        "a.b.site.t050",
        "site.ac.t050",
        "plain.t149",
        "co.t149",  # co.t149 NOT a rule (only t149): reg = co.t149
        "unknown.zone",
    ]
    want = {
        "site.co.t050": "site.co.t050",
        "deep.site.co.t050": "site.co.t050",
        "a.b.site.t050": "site.t050",
        "site.ac.t050": "site.ac.t050",
        "plain.t149": "plain.t149",
        "co.t149": "co.t149",
        "unknown.zone": "unknown.zone",
    }
    py = {h: registered_domain_py(h, rules) for h in hosts}
    assert py == want
    assert _duck_reg(hosts, rules) == want
    assert _spark_reg(spark, hosts, rules) == want


def _fuzz_hosts(n: int = 400) -> list[str]:
    rng = random.Random("psl-fuzz")
    zones = (
        [f"t{i:03d}" for i in range(0, 150, 7)]
        + [f"co.t{i:03d}" for i in range(0, 80, 9)]
        + [f"w{i:02d}" for i in range(30)]
        + ["www.w00", "www.w06", "zone", "xx"]
    )
    label_chars = "abcdefghijklmnopqrstuvwxyz0123456789-"
    out = set()
    for _ in range(n):
        depth = rng.randrange(0, 4)
        labels = [
            "".join(
                rng.choice(label_chars)
                for _ in range(rng.randrange(1, 6))
            )
            for _ in range(depth)
        ]
        out.add(".".join(labels + [rng.choice(zones)]))
    return sorted(out)


def test_fuzz_triple_parity(spark):
    """Seeded random hosts over the big fixture: the Spark frame, the
    generated DuckDB CTEs, and the pure-Python reference agree on every
    host — including hosts that ARE suffixes, wildcard zones at every
    depth, exception hosts with extra labels, and unknown zones."""
    rules = _big_psl()
    hosts = _fuzz_hosts()
    py = {h: registered_domain_py(h, rules) for h in hosts}
    duck = _duck_reg(hosts, rules)
    spk = _spark_reg(spark, hosts, rules)
    assert duck == py
    assert spk == py


def test_small_standin_unchanged_by_generalization(spark):
    """The 11-entry catalog table has only normal rules; the
    generalized matcher must produce exactly what the pre-r15
    longest-match produced on it (the catalog row's values are pinned
    by prior driver proofs)."""
    hosts = [
        "site.com",
        "a.b.site.co.uk",
        "sites.io",
        "x.sites.io",
        "unknown.zone",
        "com",
    ]
    want = {
        "site.com": "site.com",
        "a.b.site.co.uk": "site.co.uk",
        "sites.io": "sites.io",
        "x.sites.io": "sites.io",
        "unknown.zone": "unknown.zone",
        "com": "com",
    }
    assert {
        h: registered_domain_py(h, PUBLIC_SUFFIXES) for h in hosts
    } == want
    assert _duck_reg(hosts, PUBLIC_SUFFIXES) == want
    assert _spark_reg(spark, hosts, PUBLIC_SUFFIXES) == want
