"""Live-wire Redis integration for the protocol adapter — HERMETIC
(VERDICT r10 next #6): a pure-Python RESP2 socket server
(tests/resp_fixtures.py, stdlib only) runs in-process, so the adapter's
wire path — RESP encode -> TCP -> parse -> hash/counter storage -> RESP
encode -> TCP -> parse — is exercised unconditionally in this container,
against the same ``rc:id:N`` / ``rc:max_id`` key layout the fake-client
unit tests pin (/root/reference/sse.py:83-102,146-162).

Client selection: the real ``redis`` package when importable (its
transactional MULTI/EXEC pipeline is what production emits — the server
speaks it), else the stdlib MiniRespClient whose frames match redis-py's
non-transactional pipeline byte-for-byte.  Either way every assertion
below runs over a real socket.
"""

from __future__ import annotations

import pytest

from tests.resp_fixtures import MiniRespClient, RespServer

from reddit_sse_stream_spark.sources.redis_adapter import RedisFeedAdapter

try:
    import redis  # type: ignore[import-not-found]
except ImportError:
    redis = None


@pytest.fixture(scope="module")
def resp_server():
    srv = RespServer().start()
    yield srv
    srv.stop()


@pytest.fixture()
def live_client(resp_server):
    if redis is not None:
        client = redis.Redis(host="127.0.0.1", port=resp_server.port, db=15)
    else:
        client = MiniRespClient("127.0.0.1", resp_server.port, db=15)
    assert client.ping()
    client.flushdb()
    yield client
    client.flushdb()


def test_adapter_round_trip_over_the_wire(live_client):
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


def test_gap_and_full_window_semantics_over_the_wire(live_client):
    """S5/S6 over a real socket: a missing id inside the window clears
    was_full but ids after the gap still deliver; a fully-populated
    window keeps was_full (the reference's fast-poll signal,
    sse.py:155-162,183)."""
    for i in (0, 1, 3):  # id 2 is a gap
        live_client.hset(f"rc:id:{i}", mapping={"author": f"u{i}"})
    adapter = RedisFeedAdapter(live_client, stream="rc", buffer_size=4)
    poll = adapter.poll(cursor=-1)
    assert [r["id"] for r in poll.rows] == [0, 1, 3]
    assert poll.cursor == 3
    assert not poll.was_full
    # now a FULL window: ids 4..7 all present
    for i in range(4, 8):
        live_client.hset(f"rc:id:{i}", mapping={"author": f"u{i}"})
    full = adapter.poll(cursor=3)
    assert [r["id"] for r in full.rows] == [4, 5, 6, 7]
    assert full.cursor == 7
    assert full.was_full


def test_pipeline_batching_is_one_round_trip_shape(live_client):
    """The poll's pipelined HGETALL window (S1, sse.py:146-152) comes
    back in submission order with decoded field maps."""
    live_client.hset("rs:id:0", mapping={"subreddit": "askreddit"})
    live_client.set("rs:max_id", 0)
    adapter = RedisFeedAdapter(live_client, stream="rs", buffer_size=3)
    poll = adapter.poll(cursor=-1)
    assert len(poll.rows) == 1
    assert poll.rows[0]["subreddit"] == "askreddit"
    assert poll.rows[0]["event"] == "rs"
