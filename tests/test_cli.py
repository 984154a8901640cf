"""CLI end-to-end: `python -m reddit_sse_stream_spark serve` in a subprocess,
consumed over real HTTP with the stdlib consumer — the full
reference-replacement loop (serve -> filter params -> SSE frames -> 400s)."""

from __future__ import annotations

import json
import socket
import subprocess
import sys
import time
import urllib.error
import urllib.request

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def served():
    port = _free_port()
    proc = subprocess.Popen(
        [
            sys.executable, "-m", "reddit_sse_stream_spark", "serve",
            "--events", "/root/testdata/sf0.001/events.parquet",
            "--backfill", "100000", "--port", str(port), "--poll-ms", "300",
        ],
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    base = f"http://127.0.0.1:{port}"
    # wait for the HTTP layer (it binds before Spark finishes warming)
    for _ in range(120):
        try:
            urllib.request.urlopen(f"{base}/test", timeout=2)
            break
        except Exception:
            time.sleep(1)
    else:
        proc.kill()
        pytest.fail("serve subprocess never came up")
    yield base
    proc.terminate()
    proc.wait(timeout=30)


def test_serve_streams_filtered_frames(served):
    from tools.consume_sse import iter_events

    deadline = time.time() + 120
    got = []
    while time.time() < deadline and len(got) < 3:
        try:
            for ev in iter_events(f"{served}/?type=rc&subreddit=click"):
                got.append(ev)
                if len(got) >= 3:
                    break
        except Exception:
            time.sleep(2)
    assert len(got) >= 3, "no SSE frames arrived"
    for event_id, event, data in got:
        assert event == "rc"
        assert int(event_id) >= 0
        json.loads(data)  # payload is valid JSON


def test_serve_validation_400(served):
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(f"{served}/?comment_backfill=x", timeout=10)
    assert exc.value.code == 400
