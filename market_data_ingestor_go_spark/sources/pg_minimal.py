"""Minimal PostgreSQL v3 wire-protocol client (stdlib only).

The reference's primary sink is Postgres (postgres.go:103-136:
transactional batch INSERT; :46-97 DDL bootstrap; :138-163 point
reads). This container ships a full PostgreSQL 15 SERVER but no
client library (no psycopg2/JDBC jar), so — like streaming/ws_minimal
for the WS paths — this module implements just enough of the public
frontend/backend protocol to run those paths live against a real
server: startup with trust auth, the simple-query cycle
(RowDescription / DataRow / CommandComplete / ReadyForQuery), and
error surfacing. A production deployment swaps in the JDBC driver via
the existing connector gates; the SQL shipped over this client is the
same either way.

Scope (deliberate): trust/no-password auth, text-format results,
single-threaded connections. That covers DDL, transactional batch
appends, and point reads — the reference's entire PG surface.
"""

from __future__ import annotations

import socket
import struct

PROTOCOL_V3 = 196608  # (3 << 16) | 0


class PGError(Exception):
    """Server ErrorResponse (severity, code, message)."""


class PGConnection:
    """One blocking connection speaking the simple-query protocol."""

    def __init__(self, host: str = "127.0.0.1", port: int = 5432,
                 user: str = "app", database: str = "postgres",
                 timeout: float = 10.0):
        self.sock = socket.create_connection((host, port), timeout=timeout)
        params = f"user\0{user}\0database\0{database}\0\0".encode()
        body = struct.pack(">i", PROTOCOL_V3) + params
        self.sock.sendall(struct.pack(">i", len(body) + 4) + body)
        self._consume_until_ready()

    # -- framing -------------------------------------------------------

    def _recv_exact(self, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = self.sock.recv(n - len(buf))
            if not chunk:
                raise PGError("server closed the connection")
            buf += chunk
        return buf

    def _read_message(self) -> tuple[bytes, bytes]:
        mtype = self._recv_exact(1)
        (length,) = struct.unpack(">i", self._recv_exact(4))
        return mtype, self._recv_exact(length - 4)

    @staticmethod
    def _parse_error(payload: bytes) -> str:
        fields = {}
        for part in payload.split(b"\0"):
            if part:
                fields[chr(part[0])] = part[1:].decode(errors="replace")
        return f"{fields.get('S', '?')} {fields.get('C', '?')}: {fields.get('M', '?')}"

    def _consume_until_ready(self) -> None:
        err = None
        while True:
            mtype, payload = self._read_message()
            if mtype == b"R":
                (code,) = struct.unpack(">i", payload[:4])
                if code != 0:
                    raise PGError(f"auth method {code} not supported "
                                  "(trust-only client)")
            elif mtype == b"E":
                err = self._parse_error(payload)
            elif mtype == b"Z":
                if err:
                    raise PGError(err)
                return
            # 'S' ParameterStatus / 'K' BackendKeyData / 'N' notices: skip

    # -- the simple-query cycle ---------------------------------------

    def query(self, sql: str) -> tuple[list[str], list[tuple]]:
        """Run one (or several ';'-separated) statements; returns the
        LAST result set's (columns, text rows). Raises PGError on any
        ErrorResponse (the whole cycle still drains to ReadyForQuery,
        so the connection stays usable)."""
        body = sql.encode() + b"\0"
        self.sock.sendall(b"Q" + struct.pack(">i", len(body) + 4) + body)
        cols: list[str] = []
        rows: list[tuple] = []
        err = None
        while True:
            mtype, payload = self._read_message()
            if mtype == b"T":
                (n,) = struct.unpack(">h", payload[:2])
                cols, off = [], 2
                for _ in range(n):
                    end = payload.index(b"\0", off)
                    cols.append(payload[off:end].decode())
                    off = end + 1 + 18  # fixed per-field descriptor tail
                rows = []
            elif mtype == b"D":
                (n,) = struct.unpack(">h", payload[:2])
                off, vals = 2, []
                for _ in range(n):
                    (ln,) = struct.unpack(">i", payload[off:off + 4])
                    off += 4
                    if ln == -1:
                        vals.append(None)
                    else:
                        vals.append(payload[off:off + ln].decode())
                        off += ln
                rows.append(tuple(vals))
            elif mtype == b"E":
                err = self._parse_error(payload)
            elif mtype == b"Z":
                if err:
                    raise PGError(err)
                return cols, rows
            # 'C' CommandComplete / 'N' / 'S' / 'I' EmptyQuery: skip

    def close(self) -> None:
        try:
            self.sock.sendall(b"X" + struct.pack(">i", 4))
        except OSError:
            pass
        try:
            self.sock.close()
        except OSError:
            pass


def quote_literal(v) -> str:
    """SQL-literal encoding for the batch INSERT (text protocol)."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    s = str(v).replace("'", "''")
    return "'" + s + "'"
