"""Consumer parity example (cf. /root/reference/consumer_example.py):
connect to the engine's SSE endpoint with the stdlib and print frames.

Run the demo end to end (server + one streaming query + this consumer):

    python examples/consume_sse.py

It starts an in-process SSEServer, streams a 200-event backfill through the
Structured Streaming source, and prints the frames a real client receives
for ``?type=comments&subreddit=click&filter=k``.
"""

from __future__ import annotations

import http.client
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from reddit_sse_stream_spark.session import get_spark
    from reddit_sse_stream_spark.streaming.sink import SSEBroadcaster
    from reddit_sse_stream_spark.streaming.server import SSEServer
    from reddit_sse_stream_spark.streaming.source import read_feed_stream

    spark = get_spark("consume_sse_example")
    broadcaster = SSEBroadcaster()
    server = SSEServer(broadcaster).start()

    conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=1)
    conn.request("GET", "/?type=comments&subreddit=click&filter=k")
    resp = conn.getresponse()
    print(f"connected: HTTP {resp.status} {resp.getheader('Content-Type')}")

    rc = read_feed_stream(
        spark, "/root/testdata/sf0.001/events.parquet", "rc", backfill=200
    )
    rs = read_feed_stream(
        spark, "/root/testdata/sf0.001/events.parquet", "rs", backfill=200
    )
    query = (
        rc.unionByName(rs).writeStream.foreachBatch(broadcaster.foreach_batch).start()
    )
    query.processAllAvailable()

    # read until the stream idles: stdlib http.client can't resume a
    # response after a socket timeout, so the first timeout is our
    # end-of-demo signal (frames are already flushed by now)
    buf = b""
    while True:
        try:
            chunk = resp.read1(65536)
        except (TimeoutError, OSError):
            break
        if not chunk:
            break
        buf += chunk
    print(buf.decode(), end="")
    print(f"--- {buf.count(b'event: rc')} comment frames received")

    query.stop()
    conn.close()
    server.stop()


if __name__ == "__main__":
    main()
