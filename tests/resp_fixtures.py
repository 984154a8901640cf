"""Hermetic RESP (REdis Serialization Protocol) test fixtures — stdlib
only (VERDICT r10 next #6): a pure-Python RESP2 socket SERVER plus a
minimal RESP2 wire CLIENT, so the Redis integration test exercises a
real TCP wire path (RESP encode -> socket -> parse -> storage -> RESP
encode -> socket -> parse) unconditionally, instead of importorskip'ing
on the absent ``redis`` package.  When the real ``redis`` package IS
installed, the test prefers it against the same server — the server
speaks enough RESP2 (including MULTI/EXEC, which redis-py's default
transactional pipeline emits) for both clients.

Protocol subset implemented (all the adapter's layout needs,
/root/reference/sse.py:83-102,146-152): PING, SELECT, FLUSHDB, GET,
SET, DEL, HSET, HGETALL, MULTI/EXEC.  RESP2 framing per the public
protocol spec: ``*N`` arrays of ``$len`` bulk strings in, ``+simple``/
``-error``/``:int``/``$bulk``/``*array`` out, ``$-1`` for null.
"""

from __future__ import annotations

import socket
import socketserver
import threading


# ---------------------------------------------------------------- server


def _encode(obj) -> bytes:
    """Python value -> RESP2 bytes."""
    if obj is None:
        return b"$-1\r\n"
    if isinstance(obj, bool):  # before int: bool is an int subclass
        return b":1\r\n" if obj else b":0\r\n"
    if isinstance(obj, int):
        return b":%d\r\n" % obj
    if isinstance(obj, SimpleString):
        return b"+" + obj.encode() + b"\r\n"
    if isinstance(obj, Error):
        return b"-" + obj.encode() + b"\r\n"
    if isinstance(obj, (bytes, str)):
        b = obj.encode() if isinstance(obj, str) else obj
        return b"$%d\r\n" % len(b) + b + b"\r\n"
    if isinstance(obj, (list, tuple)):
        return b"*%d\r\n" % len(obj) + b"".join(_encode(x) for x in obj)
    raise TypeError(f"cannot RESP-encode {type(obj)}")


class SimpleString(str):
    """Marker: encode as +OK style, not a bulk string."""


class Error(str):
    """Marker: encode as -ERR style."""


class _Reader:
    """Buffered RESP2 parser over a socket (client and server share it)."""

    def __init__(self, sock: socket.socket):
        self._sock = sock
        self._buf = b""

    def _line(self) -> bytes:
        while b"\r\n" not in self._buf:
            chunk = self._sock.recv(65536)
            if not chunk:
                raise ConnectionError("peer closed")
            self._buf += chunk
        line, self._buf = self._buf.split(b"\r\n", 1)
        return line

    def _exactly(self, n: int) -> bytes:
        while len(self._buf) < n + 2:
            chunk = self._sock.recv(65536)
            if not chunk:
                raise ConnectionError("peer closed")
            self._buf += chunk
        out, self._buf = self._buf[:n], self._buf[n + 2 :]
        return out

    def read(self):
        line = self._line()
        kind, rest = line[:1], line[1:]
        if kind == b"+":
            return rest
        if kind == b"-":
            raise ResponseError(rest.decode())
        if kind == b":":
            return int(rest)
        if kind == b"$":
            n = int(rest)
            return None if n == -1 else self._exactly(n)
        if kind == b"*":
            n = int(rest)
            return None if n == -1 else [self.read() for _ in range(n)]
        raise ConnectionError(f"bad RESP type byte {kind!r}")


class ResponseError(Exception):
    pass


class _Handler(socketserver.BaseRequestHandler):
    def handle(self) -> None:
        reader = _Reader(self.request)
        db = 0
        queued: list[list[bytes]] | None = None
        while True:
            try:
                cmd = reader.read()
            except ConnectionError:
                return
            if not isinstance(cmd, list) or not cmd:
                self.request.sendall(_encode(Error("ERR protocol")))
                continue
            name = cmd[0].upper()
            if name == b"MULTI":
                queued = []
                self.request.sendall(_encode(SimpleString("OK")))
            elif name == b"EXEC":
                replies = [
                    self._dispatch(c, db) for c in (queued or [])
                ]
                queued = None
                self.request.sendall(_encode(replies))
            elif queued is not None:
                queued.append(cmd)
                self.request.sendall(_encode(SimpleString("QUEUED")))
            elif name == b"SELECT":
                db = int(cmd[1])
                self.request.sendall(_encode(SimpleString("OK")))
            else:
                self.request.sendall(_encode(self._dispatch(cmd, db)))

    def _dispatch(self, cmd: list[bytes], db: int):
        store = self.server.dbs.setdefault(db, {})  # type: ignore[attr-defined]
        name, args = cmd[0].upper(), cmd[1:]
        with self.server.lock:  # type: ignore[attr-defined]
            if name == b"PING":
                return SimpleString("PONG")
            if name == b"FLUSHDB":
                store.clear()
                return SimpleString("OK")
            if name == b"SET":
                store[args[0]] = args[1]
                return SimpleString("OK")
            if name == b"GET":
                v = store.get(args[0])
                return v if v is None or isinstance(v, bytes) else Error(
                    "WRONGTYPE"
                )
            if name == b"DEL":
                return sum(1 for k in args if store.pop(k, None) is not None)
            if name == b"HSET":
                h = store.setdefault(args[0], {})
                if not isinstance(h, dict):
                    return Error("WRONGTYPE")
                added = 0
                for f, v in zip(args[1::2], args[2::2]):
                    added += f not in h
                    h[f] = v
                return added
            if name == b"HGETALL":
                h = store.get(args[0], {})
                if not isinstance(h, dict):
                    return Error("WRONGTYPE")
                flat: list[bytes] = []
                for f, v in h.items():
                    flat += [f, v]
                return flat
            return Error(f"ERR unknown command {name.decode()}")


class RespServer(socketserver.ThreadingTCPServer):
    """In-process RESP2 server on an ephemeral localhost port."""

    allow_reuse_address = True
    daemon_threads = True

    def __init__(self):
        super().__init__(("127.0.0.1", 0), _Handler)
        self.dbs: dict[int, dict] = {}
        self.lock = threading.RLock()
        self.port = self.server_address[1]
        self._thread = threading.Thread(target=self.serve_forever, daemon=True)

    def start(self) -> "RespServer":
        self._thread.start()
        return self

    def stop(self) -> None:
        self.shutdown()
        self.server_close()


# ---------------------------------------------------------------- client


class MiniRespClient:
    """Minimal stdlib RESP2 client with the redis-py surface the adapter
    duck-types (pipeline with get/hgetall/execute, plus ping/set/hset/
    flushdb) — byte-for-byte the same wire format redis-py emits for
    these commands (minus MULTI/EXEC, i.e. a non-transactional
    pipeline), so the adapter's serialization path is exercised over a
    real TCP socket even where the redis package is absent."""

    def __init__(self, host: str, port: int, db: int = 0):
        self._sock = socket.create_connection((host, port))
        self._reader = _Reader(self._sock)
        if db:
            self._cmd(b"SELECT", str(db).encode())

    @staticmethod
    def _arg(a) -> bytes:
        if isinstance(a, bytes):
            return a
        if isinstance(a, (int, float)):
            a = str(a)
        return a.encode()

    def _send(self, *parts) -> None:
        enc = [self._arg(p) for p in parts]
        msg = b"*%d\r\n" % len(enc) + b"".join(
            b"$%d\r\n%s\r\n" % (len(p), p) for p in enc
        )
        self._sock.sendall(msg)

    def _cmd(self, *parts):
        self._send(*parts)
        return self._reader.read()

    def ping(self) -> bool:
        return self._cmd(b"PING") == b"PONG"

    def flushdb(self) -> bool:
        return self._cmd(b"FLUSHDB") == b"OK"

    def set(self, key, value) -> bool:
        return self._cmd(b"SET", key, value) == b"OK"

    def get(self, key):
        return self._cmd(b"GET", key)

    def hset(self, key, mapping=None) -> int:
        flat: list = []
        for f, v in (mapping or {}).items():
            flat += [f, v]
        return self._cmd(b"HSET", key, *flat)

    def hgetall(self, key) -> dict:
        flat = self._cmd(b"HGETALL", key)
        return dict(zip(flat[::2], flat[1::2]))

    def pipeline(self) -> "MiniPipeline":
        return MiniPipeline(self)

    def close(self) -> None:
        self._sock.close()


class MiniPipeline:
    def __init__(self, client: MiniRespClient):
        self._client = client
        self._cmds: list[tuple] = []

    def get(self, key) -> "MiniPipeline":
        self._cmds.append((b"GET", key))
        return self

    def hgetall(self, key) -> "MiniPipeline":
        self._cmds.append((b"HGETALL", key))
        return self

    def execute(self) -> list:
        for c in self._cmds:
            self._client._send(*c)
        out = []
        for c in self._cmds:
            r = self._client._reader.read()
            if c[0] == b"HGETALL":
                r = dict(zip(r[::2], r[1::2]))
            out.append(r)
        self._cmds = []
        return out
