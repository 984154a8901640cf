"""Randomized agreement tests: the three QuerySpec backends (PySpark
Column, ANSI SQL, Python-row) must accept exactly the same rows for ANY
spec — seeded exhaustive-ish sweep over the parameter lattice.

The SQL backend runs in DuckDB (hundreds of specs, milliseconds each); the
Spark backend is sampled on a subset (JVM round-trips are the slow part).
The Python-row backend composes pre-type predicate AND type filter,
mirroring how the sink applies them.
"""

from __future__ import annotations

import itertools
import random

import duckdb
import pytest

from reddit_sse_stream_spark.spec import QuerySpec

AUTHORS = ["alice", "Bob", "carol", "a,b"]
SUBS = ["news", "politics", "funny"]
DOMAINS = ["x.com", "Y.ORG", "z.net"]


def _random_rows(rng: random.Random, n: int = 120) -> list[dict]:
    rows = []
    for i in range(n):
        is_rc = rng.random() < 0.5
        rows.append(
            {
                "id": i,
                "event": "rc" if is_rc else "rs",
                "author": rng.choice(AUTHORS + ["zeke", "ALICE"]),
                "subreddit": rng.choice(SUBS + ["sports"]),
                "domain": None if is_rc else rng.choice([None] + [d.lower() for d in DOMAINS]),
                "over_18": None if is_rc else rng.random() < 0.5,
                "is_self": None if is_rc else rng.random() < 0.5,
                "created_utc": 1000 + i,
                "json": f'{{"k":"{i}"}}',
            }
        )
    return rows


def _random_specs(rng: random.Random, n: int = 150) -> list[QuerySpec]:
    specs = []
    for _ in range(n):
        params: dict[str, list[str]] = {}
        if rng.random() < 0.5:
            params["author"] = rng.sample(AUTHORS, rng.randint(1, 2))
        if rng.random() < 0.5:
            params["subreddit"] = rng.sample(SUBS, rng.randint(1, 2))
        if rng.random() < 0.4:
            params["domain"] = [",".join(rng.sample(DOMAINS, rng.randint(1, 2)))]
        if rng.random() < 0.4:
            params["over_18"] = [rng.choice(["true", "FALSE", "True"])]
        if rng.random() < 0.4:
            params["is_self"] = [rng.choice(["true", "false"])]
        if rng.random() < 0.6:
            params["type"] = [
                rng.choice(["comments", "comment", "rc", "submissions", "rs", "junk"])
            ]
        specs.append(QuerySpec.from_params(params))
    return specs


def _duck_table(rows: list[dict]) -> str:
    vals = ", ".join(
        "({id}, '{event}', '{author}', '{subreddit}', {domain}, {o18}, {iself}, {cu}, '{json}')".format(
            id=r["id"],
            event=r["event"],
            author=r["author"],
            subreddit=r["subreddit"],
            domain="NULL" if r["domain"] is None else f"'{r['domain']}'",
            o18="NULL" if r["over_18"] is None else str(r["over_18"]).upper(),
            iself="NULL" if r["is_self"] is None else str(r["is_self"]).upper(),
            cu=r["created_utc"],
            json=r["json"],
        )
        for r in rows
    )
    return (
        f"SELECT * FROM (VALUES {vals}) AS t"
        "(id, event, author, subreddit, domain, over_18, is_self, created_utc, json)"
    )


def _py_accepts(spec: QuerySpec, row: dict) -> bool:
    return spec.predicate_py_pre_type()(row) and spec.type_match_py()(row["event"])


def test_sql_and_python_backends_agree_on_150_random_specs():
    rng = random.Random(42)
    rows = _random_rows(rng)
    specs = _random_specs(rng)
    con = duckdb.connect()
    base = _duck_table(rows)
    for spec in specs:
        sql_ids = {
            r[0]
            for r in con.execute(
                f"SELECT id FROM ({base}) WHERE {spec.predicate_sql()}"
            ).fetchall()
        }
        py_ids = {r["id"] for r in rows if _py_accepts(spec, r)}
        assert sql_ids == py_ids, f"SQL vs Python drift for {spec}"


def test_all_three_backends_agree_on_sampled_specs(spark):
    rng = random.Random(7)
    rows = _random_rows(rng)
    specs = _random_specs(rng, n=12)
    schema = (
        "id long, event string, author string, subreddit string, domain string, "
        "over_18 boolean, is_self boolean, created_utc long, json string"
    )
    df = spark.createDataFrame([tuple(r.values()) for r in rows], schema).cache()
    con = duckdb.connect()
    base = _duck_table(rows)
    for spec in specs:
        spark_ids = {r[0] for r in df.filter(spec.predicate()).select("id").collect()}
        sql_ids = {
            r[0]
            for r in con.execute(
                f"SELECT id FROM ({base}) WHERE {spec.predicate_sql()}"
            ).fetchall()
        }
        py_ids = {r["id"] for r in rows if _py_accepts(spec, r)}
        assert spark_ids == sql_ids == py_ids, f"backend drift for {spec}"


def test_type_lattice_exhaustive():
    """Every type value x stream tag combination, all three backends."""
    rows = [
        {"id": 0, "event": "rc", "author": "a", "subreddit": "s", "domain": None,
         "over_18": None, "is_self": None, "created_utc": 0, "json": "{}"},
        {"id": 1, "event": "rs", "author": "a", "subreddit": "s", "domain": "d.com",
         "over_18": True, "is_self": False, "created_utc": 1, "json": "{}"},
    ]
    con = duckdb.connect()
    base = _duck_table(rows)
    for t in ["comments", "comment", "commentX", "rc", "rs", "submissions",
              "submission", "sub", "junk", "RC", "Comments"]:
        spec = QuerySpec(type=t)
        sql_ids = {
            r[0]
            for r in con.execute(
                f"SELECT id FROM ({base}) WHERE {spec.predicate_sql()}"
            ).fetchall()
        }
        py_ids = {r["id"] for r in rows if _py_accepts(spec, r)}
        assert sql_ids == py_ids, f"type={t!r}"


def test_p2_projection_fuzz(spark):
    """P2 vs the reference's own dict-comprehension semantics
    (sse.py:234-237) over random payloads and key lists."""
    import json as jsonlib

    from pyspark.sql import functions as F

    from reddit_sse_stream_spark.operators.projection import json_key_subset

    rng = random.Random(3)
    keys_pool = ["a", "b", "c", "dd", "e_e"]
    payloads = []
    for _ in range(40):
        obj = {k: str(rng.randint(0, 99)) for k in rng.sample(keys_pool, rng.randint(0, 4))}
        payloads.append(jsonlib.dumps(obj))
    df = spark.createDataFrame([(p,) for p in payloads], "json string").cache()
    for _ in range(6):
        keys = rng.sample(keys_pool, rng.randint(1, 3))
        got = [
            r[0] for r in df.select(json_key_subset("json", keys).alias("d")).collect()
        ]
        for payload, out in zip(payloads, got):
            expected = {k: v for k, v in jsonlib.loads(payload).items() if k in keys}
            assert jsonlib.loads(out) == expected


# ----------------------------------------------------------- hypothesis


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAS_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    _HAS_HYPOTHESIS = False


if _HAS_HYPOTHESIS:

    _spec_strategy = st.builds(
        QuerySpec,
        type=st.one_of(
            st.none(),
            st.sampled_from(["comments", "comment", "rc", "rs", "submissions", "junk"]),
        ),
        authors=st.lists(st.sampled_from(AUTHORS + ["ALICE"]), max_size=2).map(tuple),
        subreddits=st.lists(st.sampled_from(SUBS), max_size=2).map(tuple),
        domains=st.lists(
            st.sampled_from([d.lower() for d in DOMAINS]), max_size=2
        ).map(tuple),
        over_18=st.one_of(st.none(), st.sampled_from(["true", "FALSE", "True"])),
        is_self=st.one_of(st.none(), st.sampled_from(["true", "false"])),
    )

    _row_strategy = st.builds(
        dict,
        id=st.integers(min_value=0, max_value=10**6),
        event=st.sampled_from(["rc", "rs"]),
        author=st.sampled_from(AUTHORS + ["zeke", "ALICE"]),
        subreddit=st.sampled_from(SUBS + ["sports"]),
        domain=st.one_of(st.none(), st.sampled_from([d.lower() for d in DOMAINS])),
        over_18=st.one_of(st.none(), st.booleans()),
        is_self=st.one_of(st.none(), st.booleans()),
        created_utc=st.integers(min_value=0, max_value=10**9),
        json=st.just('{"k":"1"}'),
    )

    @given(spec=_spec_strategy, rows=st.lists(_row_strategy, min_size=1, max_size=30))
    @settings(max_examples=200, deadline=None)
    def test_hypothesis_sql_python_backend_agreement(spec, rows):
        """Property: for ANY spec and ANY row set, the SQL backend (DuckDB)
        and the Python-row backend accept identical rows. rc rows must have
        NULL rs-only fields (enforced below) to mirror the feed shape."""
        for r in rows:
            if r["event"] == "rc":
                r["domain"] = None
                r["over_18"] = None
                r["is_self"] = None
        for i, r in enumerate(rows):
            r["id"] = i
        con = duckdb.connect()
        base = _duck_table(rows)
        sql_ids = {
            r[0]
            for r in con.execute(
                f"SELECT id FROM ({base}) WHERE {spec.predicate_sql()}"
            ).fetchall()
        }
        py_ids = {r["id"] for r in rows if _py_accepts(spec, r)}
        assert sql_ids == py_ids


# ------------------------------------------------ text operator properties


def test_word_ngrams_matches_python_reference(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from reddit_sse_stream_spark.operators import text as T

    words = st.lists(st.sampled_from("alpha beta gamma delta eps".split()), max_size=12)
    docs = st.lists(words, min_size=1, max_size=6)

    @settings(max_examples=12, deadline=None)
    @given(docs=docs, n=st.integers(min_value=2, max_value=4))
    def run(docs, n):
        rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = sorted(
            (r["doc_id"], r["gram"]) for r in T.word_ngrams(df, n).collect()
        )
        want = sorted(
            (i, " ".join(ws[j : j + n]))
            for i, ws in enumerate(docs)
            # split(r'\s+') on "" yields [''], one token — mirror that
            for toks in [" ".join(ws).split(" ") if ws else [""]]
            for j in range(max(len(toks) - n + 1, 0))
            for ws in [toks]
        )
        assert got == want

    run()


def test_repetition_score_matches_python_reference(spark):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from reddit_sse_stream_spark.operators import text as T

    words = st.lists(
        st.sampled_from("a b c d".split()), min_size=2, max_size=20
    )

    @settings(max_examples=12, deadline=None)
    @given(docs=st.lists(words, min_size=1, max_size=5))
    def run(docs):
        rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: (r["n_bigrams"], r["n_unique"], r["dup_frac"])
            for r in T.repetition_score(df).collect()
        }
        import math

        for i, ws in enumerate(docs):
            grams = [" ".join(ws[j : j + 2]) for j in range(len(ws) - 1)]
            nb, nu = len(grams), len(set(grams))
            frac = math.floor((nb - nu) / max(nb, 1) * 10000) / 10000.0
            assert got[i] == (nb, nu, frac)

    run()


def test_minhash_md5_jaccard_matches_python_exact(spark):
    """The md5 minhash pipeline's Jaccard values must equal a pure-Python
    recomputation over the same hashed shingle sets, for synthetic corpora
    with planted duplicates."""
    import hashlib
    import math

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from reddit_sse_stream_spark.operators import dedup as D

    P = (1 << 31) - 1
    vocab = "w0 w1 w2 w3 w4 w5 w6 w7".split()
    doc = st.lists(st.sampled_from(vocab), min_size=6, max_size=14)

    def shingle_set(ws):
        return {
            int(
                hashlib.md5(" ".join(ws[j : j + 5]).encode()).hexdigest()[:15], 16
            )
            % P
            for j in range(len(ws) - 4)
        }

    @settings(max_examples=6, deadline=None)
    @given(base=doc, mutate_at=st.integers(min_value=0, max_value=5))
    def run(base, mutate_at):
        near = list(base)
        near[mutate_at % len(near)] = "w9"  # one-token mutation -> near-dup
        docs = [(0, " ".join(base)), (1, " ".join(near)), (2, " ".join(reversed(vocab)))]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            (r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in D.minhash_md5_near_dups(df, threshold=0.0).collect()
        }
        sets = {i: shingle_set(t.split()) for i, t in docs}
        for (a, b), j in got.items():
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            assert j == math.floor(inter * 10000.0 / union) / 10000.0

    run()
