"""Minimal RFC 6455 WebSocket client + server on the standard library.

The reference's two network surfaces are a WS *client* that ingests
market frames (ingestor.go:31-127) and a WS *server* that broadcasts
per-client views (server.go:43-130). This container has no
``websockets`` package, so round 1 could only ship the Spark-side
skeletons. This module implements just enough of RFC 6455 — the
upgrade handshake, text/ping/pong/close frames, client-side masking —
to run both paths live: ``streaming/sources.py`` falls back to
``connect`` when ``websockets`` is absent, and
``streaming/publisher.py`` uses ``WSServer`` for the broadcast sink.

Scope (deliberate): text + close + ping/pong opcodes only, no
fragmentation (FIN required), no permessage-deflate, no TLS. Market
frames are small single-fragment text messages on both sides, so this
covers the reference's wire behavior; a production deployment swaps
in the ``websockets`` package via the existing import-try.
"""

from __future__ import annotations

import base64
import hashlib
import os
import socket
import struct
import threading
import time
from urllib.parse import urlparse

_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

OP_TEXT = 0x1
OP_CLOSE = 0x8
OP_PING = 0x9
OP_PONG = 0xA

# Absolute sanity bound on incoming frame length even when no explicit
# read limit is configured: market frames are tiny; anything bigger is
# a desynced or hostile stream, not data.
DEFAULT_MAX_FRAME_BYTES = 1 << 20


class ConnectionClosed(Exception):
    """Peer sent a close frame or the socket died."""


class FrameTooLarge(ConnectionClosed):
    """Incoming frame exceeded the connection's read limit — the
    connection is closed, mirroring gorilla/websocket's SetReadLimit
    behavior (reference server.go:161 caps client frames at 512 B)."""


def _accept_key(key: str) -> str:
    return base64.b64encode(
        hashlib.sha1((key + _GUID).encode()).digest()).decode()


def _encode_frame(payload: bytes, opcode: int, mask: bool) -> bytes:
    head = bytes([0x80 | opcode])  # FIN + opcode
    n = len(payload)
    mask_bit = 0x80 if mask else 0
    if n < 126:
        head += bytes([mask_bit | n])
    elif n < (1 << 16):
        head += bytes([mask_bit | 126]) + struct.pack(">H", n)
    else:
        head += bytes([mask_bit | 127]) + struct.pack(">Q", n)
    if mask:
        key = os.urandom(4)
        body = bytes(b ^ key[i % 4] for i, b in enumerate(payload))
        return head + key + body
    return head + payload


class WSConnection:
    """A socket after the upgrade handshake; thread-safe sends.

    Incoming bytes accumulate in a per-connection buffer and frames are
    parsed out of it, so a recv() timeout mid-frame keeps the partial
    bytes for the next call instead of desyncing the stream (the old
    per-recv ``_recv_exact`` chain lost already-consumed header/payload
    bytes on timeout, after which payload bytes parsed as bogus frame
    headers). ``max_frame_bytes`` bounds the declared frame length
    BEFORE any payload read; a violation closes the connection.
    """

    def __init__(self, sock: socket.socket, mask_outgoing: bool,
                 headers: dict[str, str] | None = None, path: str = "/",
                 max_frame_bytes: int = DEFAULT_MAX_FRAME_BYTES,
                 initial_buffer: bytes = b""):
        self.sock = sock
        self.mask_outgoing = mask_outgoing
        self.headers = headers or {}  # request headers (server side)
        self.path = path
        self.max_frame_bytes = max_frame_bytes
        self.last_activity = time.monotonic()  # last complete frame seen
        self._rbuf = initial_buffer  # bytes read past the handshake / frame tail
        self._send_lock = threading.Lock()
        self._closed = False

    def send(self, text: str) -> None:
        frame = _encode_frame(text.encode(), OP_TEXT, self.mask_outgoing)
        with self._send_lock:
            self.sock.sendall(frame)

    def ping(self, payload: bytes = b"") -> None:
        with self._send_lock:
            self.sock.sendall(_encode_frame(payload, OP_PING, self.mask_outgoing))

    def _parse_frame(self) -> tuple[int, bytes] | None:
        """Parse one complete frame out of the receive buffer.

        Returns None when the buffer holds only a partial frame (the
        bytes stay buffered); raises FrameTooLarge on an oversized
        declared length (before reading the payload)."""
        buf = self._rbuf
        if len(buf) < 2:
            return None
        b1, b2 = buf[0], buf[1]
        opcode = b1 & 0x0F
        masked = bool(b2 & 0x80)
        n = b2 & 0x7F
        off = 2
        if n == 126:
            if len(buf) < off + 2:
                return None
            n = struct.unpack(">H", buf[off:off + 2])[0]
            off += 2
        elif n == 127:
            if len(buf) < off + 8:
                return None
            n = struct.unpack(">Q", buf[off:off + 8])[0]
            off += 8
        if self.max_frame_bytes is not None and n > self.max_frame_bytes:
            raise FrameTooLarge(
                f"frame of {n} bytes exceeds read limit {self.max_frame_bytes}")
        key = None
        if masked:
            if len(buf) < off + 4:
                return None
            key = buf[off:off + 4]
            off += 4
        if len(buf) < off + n:
            return None
        payload = buf[off:off + n]
        self._rbuf = buf[off + n:]
        if key:
            payload = bytes(b ^ key[i % 4] for i, b in enumerate(payload))
        self.last_activity = time.monotonic()
        return opcode, payload

    def recv(self, timeout: float | None = None) -> str:
        """Next text message; raises TimeoutError when no COMPLETE
        message arrives within ``timeout`` (matching websockets.sync
        semantics — an idle connection is NOT an error) and
        ConnectionClosed on close.

        The timeout is a per-CALL deadline, not per socket read: a
        peer trickling one partial-frame byte per read would otherwise
        reset the clock forever and starve the caller's timeout branch
        (where read pumps run their idle-eviction/ping logic)."""
        if self._closed:
            raise ConnectionClosed("already closed")
        deadline = None if timeout is None else time.monotonic() + timeout
        while True:
            try:
                frame = self._parse_frame()
            except FrameTooLarge:
                self.close()
                raise
            if frame is None:
                if deadline is not None:
                    remaining = deadline - time.monotonic()
                    if remaining <= 0:
                        # partial bytes stay in _rbuf for the next call
                        raise TimeoutError("recv timed out")
                    self.sock.settimeout(remaining)
                else:
                    self.sock.settimeout(None)
                try:
                    chunk = self.sock.recv(65536)
                except (socket.timeout, TimeoutError):
                    raise TimeoutError("recv timed out")
                except OSError as exc:
                    raise ConnectionClosed(str(exc)) from exc
                if not chunk:
                    raise ConnectionClosed("socket closed mid-stream")
                self._rbuf += chunk
                continue
            opcode, payload = frame
            if opcode == OP_TEXT:
                return payload.decode()
            if opcode == OP_PING:
                with self._send_lock:
                    self.sock.sendall(
                        _encode_frame(payload, OP_PONG, self.mask_outgoing))
                continue
            if opcode == OP_PONG:
                continue
            if opcode == OP_CLOSE:
                self.close()
                raise ConnectionClosed("peer sent close")
            # binary/continuation: out of scope — skip
            continue

    def close(self) -> None:
        if self._closed:
            return
        self._closed = True
        try:
            with self._send_lock:
                self.sock.sendall(_encode_frame(b"", OP_CLOSE, self.mask_outgoing))
        except OSError:
            pass
        try:
            self.sock.close()
        except OSError:
            pass


def connect(url: str, headers: dict[str, str] | None = None,
            timeout: float = 5.0) -> WSConnection:
    """Client-side connect + upgrade handshake (ws:// only)."""
    u = urlparse(url)
    if u.scheme not in ("ws", ""):
        raise ValueError(f"only ws:// supported, got {url!r}")
    host, port = u.hostname or "localhost", u.port or 80
    sock = socket.create_connection((host, port), timeout=timeout)
    key = base64.b64encode(os.urandom(16)).decode()
    lines = [
        f"GET {u.path or '/'} HTTP/1.1",
        f"Host: {host}:{port}",
        "Upgrade: websocket",
        "Connection: Upgrade",
        f"Sec-WebSocket-Key: {key}",
        "Sec-WebSocket-Version: 13",
    ] + [f"{k}: {v}" for k, v in (headers or {}).items()]
    sock.sendall(("\r\n".join(lines) + "\r\n\r\n").encode())
    resp = b""
    while b"\r\n\r\n" not in resp:
        chunk = sock.recv(4096)
        if not chunk:
            raise ConnectionClosed("server closed during handshake")
        resp += chunk
    head, tail = resp.split(b"\r\n\r\n", 1)
    status = head.split(b"\r\n", 1)[0]
    if b"101" not in status:
        sock.close()
        raise ConnectionClosed(f"upgrade refused: {status.decode(errors='replace')}")
    low = head.lower()
    expect = _accept_key(key).encode().lower()
    if b"sec-websocket-accept: " + expect not in low:
        sock.close()
        raise ConnectionClosed("bad Sec-WebSocket-Accept")
    # frames the server sent right after the 101 may ride the same
    # recv — seed them into the frame buffer instead of dropping them
    return WSConnection(sock, mask_outgoing=True, initial_buffer=tail)


class WSServer:
    """Threaded WS server: accepts upgrades, tracks live connections,
    hands each to ``on_connect(conn)`` in its own thread.

    The reference's server keeps a connection registry guarded by a
    mutex and broadcasts per-tick (server.go:43-87); ``connections()``
    + per-connection ``send`` reproduce that shape.
    """

    def __init__(self, host: str = "127.0.0.1", port: int = 0,
                 on_connect=None,
                 max_frame_bytes: int = DEFAULT_MAX_FRAME_BYTES):
        self.max_frame_bytes = max_frame_bytes
        self._listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._listener.bind((host, port))
        self._listener.listen(16)
        self.host, self.port = self._listener.getsockname()
        self.on_connect = on_connect
        self._conns: list[WSConnection] = []
        self._lock = threading.Lock()
        self._stopping = threading.Event()
        self._accept_thread: threading.Thread | None = None

    @property
    def url(self) -> str:
        return f"ws://{self.host}:{self.port}"

    def start(self) -> "WSServer":
        self._accept_thread = threading.Thread(
            target=self._accept_loop, daemon=True)
        self._accept_thread.start()
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
            try:
                conn = self._handshake(sock)
            except (OSError, ConnectionClosed, ValueError):
                sock.close()
                continue
            with self._lock:
                self._conns.append(conn)
            if self.on_connect is not None:
                threading.Thread(
                    target=self.on_connect, args=(conn,), daemon=True).start()

    def _handshake(self, sock: socket.socket) -> WSConnection:
        sock.settimeout(2.0)
        req = b""
        while b"\r\n\r\n" not in req:
            chunk = sock.recv(4096)
            if not chunk:
                raise ConnectionClosed("client closed during handshake")
            req += chunk
        rawhead, tail = req.split(b"\r\n\r\n", 1)
        head = rawhead.decode(errors="replace")
        lines = head.split("\r\n")
        path = lines[0].split(" ")[1] if len(lines[0].split(" ")) > 1 else "/"
        headers = {}
        for line in lines[1:]:
            if ": " in line:
                k, v = line.split(": ", 1)
                headers[k.lower()] = v
        key = headers.get("sec-websocket-key")
        if not key:
            raise ValueError("not a websocket upgrade")
        resp = (
            "HTTP/1.1 101 Switching Protocols\r\n"
            "Upgrade: websocket\r\n"
            "Connection: Upgrade\r\n"
            f"Sec-WebSocket-Accept: {_accept_key(key)}\r\n\r\n")
        sock.sendall(resp.encode())
        return WSConnection(sock, mask_outgoing=False,
                            headers=headers, path=path,
                            max_frame_bytes=self.max_frame_bytes,
                            initial_buffer=tail)

    def connections(self) -> list[WSConnection]:
        with self._lock:
            return [c for c in self._conns if not c._closed]

    def broadcast(self, text: str) -> int:
        """Best-effort send to every live connection; dead ones are
        dropped (server.go:82-87 removes failed conns). Returns the
        number of successful sends."""
        sent = 0
        for conn in self.connections():
            try:
                conn.send(text)
                sent += 1
            except OSError:
                conn.close()
        return sent

    def stop(self) -> None:
        self._stopping.set()
        try:
            self._listener.close()
        except OSError:
            pass
        for conn in self.connections():
            conn.close()
        if self._accept_thread is not None:
            self._accept_thread.join(timeout=2.0)
