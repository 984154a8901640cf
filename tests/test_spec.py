"""Pinning tests for the QuerySpec compiler: reference validation (V1-V3),
backfill clamp (S3/Q4), and the filter-algebra quirks (Q1/Q2, F1-F7 order
semantics) on a tiny in-memory feed."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from reddit_sse_stream_spark.spec import MAX_BACKFILL, QuerySpec, SpecError

FEED_SCHEMA = (
    "id long, event string, author string, subreddit string, domain string, "
    "over_18 boolean, is_self boolean, created_utc long, json string"
)

ROWS = [
    # comments
    (1, "rc", "alice", "politics", None, None, None, 100, '{"a":1}'),
    (2, "rc", "Bob", "news", None, None, None, 101, '{"a":2}'),
    # submissions
    (3, "rs", "alice", "news", "example.com", True, False, 102, '{"a":3}'),
    (4, "rs", "carol", "politics", "Other.ORG", False, True, 103, '{"a":4}'),
    (5, "rs", "dave", "funny", None, False, False, 104, '{"a":5}'),
]


@pytest.fixture(scope="module")
def feed(spark):
    return spark.createDataFrame(ROWS, FEED_SCHEMA).cache()


def _ids(feed, spec: QuerySpec) -> list[int]:
    return sorted(r[0] for r in feed.filter(spec.predicate()).select("id").collect())


# ---------------------------------------------------------------- V1-V3 / S3


def test_v1_backfill_start_id_mutual_exclusion():
    with pytest.raises(SpecError):
        QuerySpec.from_params({"comment_backfill": ["10"], "comment_start_id": ["5"]})


def test_v2_backfill_must_be_int():
    with pytest.raises(SpecError):
        QuerySpec.from_params({"comment_backfill": ["ten"]})


def test_v3_start_id_must_be_int():
    with pytest.raises(SpecError):
        QuerySpec.from_params({"submission_start_id": ["abc"]})


def test_s3_backfill_clamped_at_100k():
    # Q4: code clamps BOTH streams at 100_000 (sse.py:65); README's 25_000
    # claim for submissions is wrong.
    spec = QuerySpec.from_params(
        {"comment_backfill": ["200000"], "submission_backfill": ["200000"]}
    )
    assert spec.comment_backfill == MAX_BACKFILL
    assert spec.submission_backfill == MAX_BACKFILL


# ------------------------------------------------------------- whitelist F2-F5


def test_f5_vacuous_truth_no_whitelist(feed):
    assert _ids(feed, QuerySpec()) == [1, 2, 3, 4, 5]


def test_f2_author_case_sensitive(feed):
    # Q2: author matching is exact/case-sensitive (sse.py:170)
    assert _ids(feed, QuerySpec(authors=("bob",))) == []
    assert _ids(feed, QuerySpec(authors=("Bob",))) == [2]


def test_f2_author_commas_not_split(feed):
    # Q2: '?author=a,b' matches only the literal string 'a,b' (README wrong)
    assert _ids(feed, QuerySpec(authors=("alice,Bob",))) == []


def test_f4_domain_case_insensitive(feed):
    # domain list lowered at parse; record side lowered at read (sse.py:198,213)
    spec = QuerySpec.from_params({"domain": ["OTHER.org,EXAMPLE.COM"]})
    assert spec.domains == ("other.org", "example.com")
    assert _ids(feed, spec) == [3, 4]


def test_q1_domain_blocks_all_comments(feed):
    # Q1: bare ?domain= gives comments no whitelist path (sse.py:156 vs 169-175)
    assert _ids(feed, QuerySpec(domains=("example.com",))) == [3]


def test_q1_author_blocks_other_stream_rows(feed):
    # symmetric: ?author= whitelists nothing else; submissions by others drop
    assert _ids(feed, QuerySpec(authors=("alice",))) == [1, 3]


def test_f5_whitelist_is_disjunction(feed):
    spec = QuerySpec(authors=("dave",), subreddits=("politics",))
    assert _ids(feed, spec) == [1, 4, 5]


# ---------------------------------------------------------------- F6/F7 flags


def test_f6_over18_case_insensitive_string_equality(feed):
    assert _ids(feed, QuerySpec(over_18="TRUE")) == [1, 2, 3]  # rc unaffected
    assert _ids(feed, QuerySpec(over_18="false")) == [1, 2, 4, 5]


def test_f6_f7_conjunctive_with_whitelist(feed):
    spec = QuerySpec(subreddits=("politics",), over_18="false")
    assert _ids(feed, spec) == [1, 4]


# ------------------------------------------------------------------ F1 type


def test_f1_type_variants(feed):
    assert _ids(feed, QuerySpec(type="comments")) == [1, 2]
    assert _ids(feed, QuerySpec(type="comment")) == [1, 2]
    assert _ids(feed, QuerySpec(type="rc")) == [1, 2]
    assert _ids(feed, QuerySpec(type="submissions")) == [3, 4, 5]
    assert _ids(feed, QuerySpec(type="rs")) == [3, 4, 5]
    assert _ids(feed, QuerySpec(type="bogus")) == []


def test_sql_backend_matches_spark_backend(feed, duck):
    """The two compiler backends must agree on every spec shape."""
    specs = [
        QuerySpec(),
        QuerySpec(authors=("alice",)),
        QuerySpec(domains=("example.com",)),
        QuerySpec(type="rs", over_18="true"),
        QuerySpec(authors=("Bob",), subreddits=("funny",), domains=("other.org",), is_self="FALSE"),
    ]
    rows_sql = ", ".join(
        f"({r[0]}, '{r[1]}', '{r[2]}', '{r[3]}', "
        + (f"'{r[4]}'" if r[4] is not None else "NULL")
        + ", "
        + ("NULL" if r[5] is None else str(r[5]).upper())
        + ", "
        + ("NULL" if r[6] is None else str(r[6]).upper())
        + f", {r[7]}, '{r[8]}')"
        for r in ROWS
    )
    base = (
        f"SELECT * FROM (VALUES {rows_sql}) "
        "AS t(id, event, author, subreddit, domain, over_18, is_self, created_utc, json)"
    )
    for spec in specs:
        duck_ids = sorted(
            r[0]
            for r in duck.execute(
                f"SELECT id FROM ({base}) WHERE {spec.predicate_sql()}"
            ).fetchall()
        )
        assert duck_ids == _ids(feed, spec), f"backend drift for {spec}"
