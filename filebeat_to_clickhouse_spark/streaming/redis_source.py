"""Redis LIST / PUBSUB source sidecar (C3, config.yaml:35-40) — a
stdlib-only RESP client that drains the Filebeat redis output's data
structure into the spool landing dir, where the ordinary file stream +
wire parsers take over (the same sidecar pattern as the HTTP receiver:
Spark has no Redis streaming source, so the ~100 lines that talk RESP
stay OUTSIDE Spark and the Spark side remains an idiomatic file stream).

The reference declares this input and stubs the body with a TODO
(main.go:632-641, "needs the go-redis library"); the protocol is simple
enough to not need a library: RESP2 framing is length-prefixed text.

- ``mode="list"``: the Filebeat redis output RPUSHes one JSON event per
  LIST element; the sidecar drains with ``LPOP key COUNT n`` (Redis
  ≥ 6.2), falling back automatically to single-element ``LPOP`` against
  older servers, and spools each drained batch as one NDJSON body.
- ``mode="pubsub"``: SUBSCRIBE to the channel and spool each pushed
  message (no replay on restart — inherent to pub/sub, same caveat the
  reference's config comment implies).

Delivery semantics: LPOP is destructive, so list mode is at-most-once
across sidecar crashes (an element popped but not yet spooled is lost);
the atomic spool rename keeps the Spark side exactly-once from the
spool file onward. A production hardening is LMOVE to a processing list
+ trim-after-spool; out of scope here, documented for honesty.
"""

from __future__ import annotations

import itertools
import os
import socket
import threading
import time


class RespError(RuntimeError):
    """Server-reported RESP error (`-ERR ...`)."""


def _encode_command(*args: str | bytes) -> bytes:
    out = [b"*%d\r\n" % len(args)]
    for a in args:
        b = a if isinstance(a, bytes) else a.encode()
        out.append(b"$%d\r\n" % len(b))
        out.append(b + b"\r\n")
    return b"".join(out)


def _read_reply(f):
    """Parse one RESP2 reply from a buffered socket file. Returns
    str | int | bytes | None | list (recursively); raises RespError for
    error replies and EOFError on a closed connection."""
    line = f.readline()
    if not line:
        raise EOFError("redis connection closed")
    kind, rest = line[:1], line[1:-2]
    if kind == b"+":
        return rest.decode()
    if kind == b"-":
        raise RespError(rest.decode())
    if kind == b":":
        return int(rest)
    if kind == b"$":
        n = int(rest)
        if n == -1:
            return None
        payload = f.read(n + 2)[:-2]
        return payload
    if kind == b"*":
        n = int(rest)
        if n == -1:
            return None
        return [_read_reply(f) for _ in range(n)]
    raise RespError(f"unparseable RESP reply prefix: {line!r}")


class RedisSpoolSource:
    """Drain a Redis LIST or PUBSUB channel into ``spool_dir/redis/``.

    Bodies land via the same atomic ``.part`` → rename protocol as the
    HTTP receiver, so the file stream never observes partial writes and
    ``stream_spool_dir(spark, spool, fmt="redis")`` + the NDJSON parsers
    consume them unchanged.
    """

    def __init__(
        self,
        spool_dir: str,
        host: str = "127.0.0.1",
        port: int = 6379,
        key: str = "filebeat:logs",
        mode: str = "list",
        password: str = "",
        batch_size: int = 128,
        poll_interval: float = 0.2,
    ):
        if mode not in ("list", "pubsub"):
            raise ValueError(f"mode must be 'list' or 'pubsub', got {mode!r}")
        self.spool_dir = spool_dir
        self.host, self.port, self.key, self.mode = host, port, key, mode
        self.password, self.batch_size, self.poll_interval = password, batch_size, poll_interval
        os.makedirs(os.path.join(spool_dir, "redis"), exist_ok=True)
        self._seq = itertools.count()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._lpop_count_ok = True  # downgraded on first LPOP COUNT error

    # -- wire ---------------------------------------------------------------
    def _connect(self):
        sock = socket.create_connection((self.host, self.port), timeout=5)
        f = sock.makefile("rb")
        if self.password:
            sock.sendall(_encode_command("AUTH", self.password))
            _read_reply(f)
        return sock, f

    def _drain_list_once(self, sock, f) -> int:
        """One LPOP round; returns number of elements spooled."""
        if self._lpop_count_ok:
            sock.sendall(_encode_command("LPOP", self.key, str(self.batch_size)))
            try:
                reply = _read_reply(f)
            except RespError:
                # pre-6.2 server: LPOP takes no COUNT — downgrade for good
                self._lpop_count_ok = False
                return self._drain_list_once(sock, f)
            items = reply or []
        else:
            items = []
            for _ in range(self.batch_size):
                sock.sendall(_encode_command("LPOP", self.key))
                item = _read_reply(f)
                if item is None:
                    break
                items.append(item)
        if items:
            self._spool(b"\n".join(items))
        return len(items)

    def _run(self) -> None:
        try:
            sock, f = self._connect()
            if self.mode == "pubsub":
                sock.sendall(_encode_command("SUBSCRIBE", self.key))
                _read_reply(f)  # subscribe confirmation
                while not self._stop.is_set():
                    msg = _read_reply(f)
                    if isinstance(msg, list) and len(msg) == 3 and msg[0] == b"message":
                        self._spool(msg[2])
                return
            while not self._stop.is_set():
                if self._drain_list_once(sock, f) == 0:
                    self._stop.wait(self.poll_interval)
        except (EOFError, OSError):
            return  # connection closed (server gone or stop()): drain ends

    def _spool(self, body: bytes) -> str:
        name = f"{time.time_ns()}-{next(self._seq)}"
        tmp = os.path.join(self.spool_dir, "redis", f".{name}.part")
        final = os.path.join(self.spool_dir, "redis", f"{name}.body")
        with open(tmp, "wb") as out:
            out.write(body)
        os.rename(tmp, final)
        return final

    # -- lifecycle ----------------------------------------------------------
    def start(self) -> "RedisSpoolSource":
        self._thread.start()
        return self

    def stop(self, timeout: float = 5.0) -> None:
        self._stop.set()
        self._thread.join(timeout)

    def __enter__(self) -> "RedisSpoolSource":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()
