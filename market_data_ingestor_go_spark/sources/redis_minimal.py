"""Minimal RESP (Redis serialization protocol) client + server on the
standard library.

The reference's latest-value cache is Redis: pipelined ``SET name →
json(record) EX ttl`` per flush (cache_service.go:37-61) and a
SCAN-driven full read (cache_service.go:67-93). This container has no
redis-py and no redis-server (probed: no binary on PATH or disk, port
6379 refuses), so — exactly like ws_minimal (RFC 6455) and pg_minimal
(PG v3) — both sides of the wire are implemented from scratch:
``RESPClient`` speaks RESP2 for the engine, and ``MiniRedisServer`` is
an in-memory RESP server (SET/GET/DEL/MGET/SCAN/PING with PX/EX
expiry) so the K2 sink can run live over a real socket in tests. A
production deployment points the same client at a real Redis.

Scope (deliberate): RESP2 inline-free protocol, the command subset the
reference uses, passive TTL expiry (checked on read — what SCAN/GET
observe is indistinguishable from Redis's behavior), no AUTH/cluster.
"""

from __future__ import annotations

import socket
import threading
import time


class RedisError(Exception):
    """Server returned an -ERR reply or the stream desynced."""


def _encode_command(args) -> bytes:
    out = b"*%d\r\n" % len(args)
    for a in args:
        if isinstance(a, int):
            a = str(a).encode()
        elif isinstance(a, str):
            a = a.encode()
        out += b"$%d\r\n%s\r\n" % (len(a), a)
    return out


class _RESPStream:
    """Buffered RESP reply parser over a socket (shared by both ends)."""

    def __init__(self, sock: socket.socket):
        self.sock = sock
        self._buf = b""

    def read_line(self) -> bytes:
        while b"\r\n" not in self._buf:
            chunk = self.sock.recv(65536)
            if not chunk:
                raise RedisError("connection closed mid-reply")
            self._buf += chunk
        line, self._buf = self._buf.split(b"\r\n", 1)
        return line

    def read_exact(self, n: int) -> bytes:
        while len(self._buf) < n:
            chunk = self.sock.recv(65536)
            if not chunk:
                raise RedisError("connection closed mid-reply")
            self._buf += chunk
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def read_reply(self):
        line = self.read_line()
        t, rest = line[:1], line[1:]
        if t == b"+":
            return rest.decode()
        if t == b"-":
            raise RedisError(rest.decode())
        if t == b":":
            return int(rest)
        if t == b"$":
            n = int(rest)
            if n == -1:
                return None
            data = self.read_exact(n)
            self.read_exact(2)  # trailing \r\n
            return data.decode()
        if t == b"*":
            n = int(rest)
            if n == -1:
                return None
            return [self.read_reply() for _ in range(n)]
        raise RedisError(f"unknown reply type {t!r}")


class RESPClient:
    """One connection, one command at a time, plus explicit pipelining
    (``pipeline`` mirrors the reference's per-flush pipeline.Exec)."""

    def __init__(self, host: str = "127.0.0.1", port: int = 6379,
                 timeout: float = 5.0):
        self.sock = socket.create_connection((host, port), timeout=timeout)
        self._stream = _RESPStream(self.sock)

    def execute(self, *args):
        self.sock.sendall(_encode_command(args))
        return self._stream.read_reply()

    def pipeline(self, commands: list[tuple]) -> list:
        """Send every command, then read every reply — ONE round trip
        for the whole batch (cache_service.go:39/57 pipe.Set + Exec)."""
        if not commands:
            return []
        self.sock.sendall(b"".join(_encode_command(c) for c in commands))
        return [self._stream.read_reply() for _ in commands]

    # -- the reference's command subset -------------------------------

    def ping(self) -> str:
        return self.execute("PING")

    def set(self, key: str, value: str, px: int | None = None):
        args = ("SET", key, value) + (("PX", int(px)) if px else ())
        return self.execute(*args)

    def get(self, key: str):
        return self.execute("GET", key)

    def mget(self, keys: list[str]) -> list:
        return self.execute("MGET", *keys) if keys else []

    def scan_all(self, match: str | None = None,
                 count: int = 1000) -> list[str]:
        """Full cursor walk (cache_service.go:74-81 scans to cursor 0)."""
        cursor, keys = 0, []
        while True:
            args = ("SCAN", cursor) + (("MATCH", match) if match else ()) \
                + ("COUNT", count)
            cur, batch = self.execute(*args)
            keys.extend(batch)
            cursor = int(cur)
            if cursor == 0:
                return keys

    def close(self) -> None:
        try:
            self.sock.close()
        except OSError:
            pass


class MiniRedisServer:
    """In-memory RESP server: enough of Redis for the K2 cache contract
    (SET with PX/EX, GET, DEL, MGET, SCAN, PING, DBSIZE, FLUSHALL).
    TTL is passive — expired keys vanish from reads, like Redis."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        self._data: dict[str, tuple[str, float | None]] = {}  # k -> (v, deadline)
        self._lock = threading.Lock()
        self._listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._listener.bind((host, port))
        self._listener.listen(16)
        self.host, self.port = self._listener.getsockname()
        self._stopping = threading.Event()
        self._thread: threading.Thread | None = None

    def start(self) -> "MiniRedisServer":
        self._thread = threading.Thread(target=self._accept_loop, daemon=True)
        self._thread.start()
        return self

    def _accept_loop(self) -> None:
        while not self._stopping.is_set():
            try:
                self._listener.settimeout(0.2)
                sock, _ = self._listener.accept()
            except (socket.timeout, TimeoutError):
                continue
            except OSError:
                return
            threading.Thread(target=self._serve_conn, args=(sock,),
                             daemon=True).start()

    def _live(self, key: str) -> str | None:
        ent = self._data.get(key)
        if ent is None:
            return None
        val, deadline = ent
        if deadline is not None and time.monotonic() >= deadline:
            del self._data[key]
            return None
        return val

    def _handle(self, args: list[str]):
        cmd = args[0].upper()
        with self._lock:
            if cmd == "PING":
                return "+PONG"
            if cmd == "SET":
                key, val, rest = args[1], args[2], [a.upper() for a in args[3:]]
                deadline = None
                if "PX" in rest:
                    deadline = time.monotonic() + int(args[4 + rest.index("PX")]) / 1000.0
                elif "EX" in rest:
                    deadline = time.monotonic() + int(args[4 + rest.index("EX")])
                self._data[key] = (val, deadline)
                return "+OK"
            if cmd == "GET":
                val = self._live(args[1])
                return ("$", val)
            if cmd == "DEL":
                n = sum(1 for k in args[1:] if self._live(k) is not None
                        and self._data.pop(k, None) is not None)
                return (":", n)
            if cmd == "MGET":
                return ("*", [("$", self._live(k)) for k in args[1:]])
            if cmd == "SCAN":
                # single-pass cursor: return everything, cursor 0
                keys = [k for k in list(self._data) if self._live(k) is not None]
                if "MATCH" in (u := [a.upper() for a in args[2:]]):
                    import fnmatch
                    pat = args[3 + u.index("MATCH")]
                    keys = [k for k in keys if fnmatch.fnmatch(k, pat)]
                return ("*", [("$", "0"), ("*", [("$", k) for k in keys])])
            if cmd == "DBSIZE":
                return (":", sum(1 for k in list(self._data)
                                 if self._live(k) is not None))
            if cmd == "FLUSHALL":
                self._data.clear()
                return "+OK"
            return "-ERR unknown command '%s'" % cmd

    @staticmethod
    def _encode_reply(rep) -> bytes:
        if isinstance(rep, str):  # +OK / -ERR lines
            return rep.encode() + b"\r\n"
        kind, val = rep
        if kind == ":":
            return b":%d\r\n" % val
        if kind == "$":
            if val is None:
                return b"$-1\r\n"
            data = val.encode()
            return b"$%d\r\n%s\r\n" % (len(data), data)
        if kind == "*":
            return b"*%d\r\n" % len(val) + b"".join(
                MiniRedisServer._encode_reply(v) for v in val)
        raise RedisError(f"bad reply spec {rep!r}")

    def _serve_conn(self, sock: socket.socket) -> None:
        stream = _RESPStream(sock)
        try:
            while not self._stopping.is_set():
                sock.settimeout(0.5)
                try:
                    line = stream.read_line()
                except (socket.timeout, TimeoutError):
                    continue
                except RedisError:
                    return
                if not line.startswith(b"*"):
                    return  # inline commands out of scope
                nargs = int(line[1:])
                args = []
                for _ in range(nargs):
                    hdr = stream.read_line()
                    n = int(hdr[1:])
                    args.append(stream.read_exact(n).decode())
                    stream.read_exact(2)
                sock.sendall(self._encode_reply(self._handle(args)))
        except (OSError, RedisError):
            pass
        finally:
            try:
                sock.close()
            except OSError:
                pass

    def stop(self) -> None:
        self._stopping.set()
        try:
            self._listener.close()
        except OSError:
            pass
        if self._thread is not None:
            self._thread.join(timeout=2.0)
