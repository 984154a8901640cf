"""Live-Redis integration for the protocol adapter — import-gated: the
container ships no redis package/server, so this skips there; on a host
with redis it exercises the same key layout the fake client pins
(``rc:id:N`` hashes, ``rc:max_id``/``rs:max_id`` cursors, pipelined
HGETALL windows with was_full bookkeeping; /root/reference/sse.py:88-162).
"""

from __future__ import annotations

import pytest

redis = pytest.importorskip("redis")

from reddit_sse_stream_spark.sources.redis_adapter import RedisFeedAdapter  # noqa: E402


@pytest.fixture(scope="module")
def live_client():
    client = redis.Redis(host="localhost", port=6379, db=15)
    try:
        client.ping()
    except Exception:
        pytest.skip("no live redis server on localhost:6379")
    client.flushdb()
    yield client
    client.flushdb()


def test_adapter_round_trip_against_live_redis(live_client):
    for i in range(5):
        live_client.hset(
            f"rc:id:{i}", mapping={"author": f"u{i}", "body": "x"}
        )
    live_client.set("rc:max_id", 4)
    live_client.set("rs:max_id", -1)
    adapter = RedisFeedAdapter(live_client, stream="rc", buffer_size=10)
    assert adapter.max_ids() == (4, -1)
    poll = adapter.poll(cursor=-1)
    assert [r["id"] for r in poll.rows] == [0, 1, 2, 3, 4]
    assert poll.cursor == 4
    assert not poll.was_full  # ids 5..9 probed and absent
    assert all(r["event"] == "rc" for r in poll.rows)
    assert poll.rows[0]["author"] == "u0"
