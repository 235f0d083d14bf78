"""remotetap processor — pass-through tap that broadcasts each batch as
OTLP/JSON to live subscribers.

Reference: `processor/remotetapprocessor/processor.go:91-108`
(ConsumeLogs marshals the WHOLE plog batch to one JSON document and
writes it to every subscribed channel, returning the data unchanged) and
`channelset.go:34-41` (zero subscribers → the write is a no-op, i.e. the
tap drops, never blocks the pipeline). The reference serves websocket
(`processor.go:66-81`); this rebuild serves plain TCP (the sandbox has no
websocket client surface) with identical framing: one JSON document per
line. The `limit` config (`config.go:19-29`, default 1 msg/s) is declared
but unwired in the reference processor; here it IS wired, as a
non-blocking token bucket — messages past the rate are dropped, because a
debugging tap must never apply backpressure to the pipeline.

Spark shape: a foreachBatch side-effect around the pass-through stream.
The marshal (`otlp_json_lines`) is the fileexporter's JVM-side grouped
assembly; only the final ≤`max_docs` marshaled documents cross to the
driver, bounded — the tap is a debug surface, not a data path.
"""

from __future__ import annotations

import socket
import threading
import time
from typing import Callable

from pyspark.sql import DataFrame


class TokenBucket:
    """golang.org/x/time/rate analog: `limit` tokens/sec, `burst` cap.
    `allow()` is the non-blocking Allow() — False drops the message."""

    def __init__(self, limit: float, burst: int = 1, clock: Callable[[], float] = time.monotonic):
        self.limit = float(limit)
        self.burst = max(1, int(burst))
        self._tokens = float(self.burst)
        self._clock = clock
        self._last = clock()
        self._mu = threading.Lock()

    def allow(self) -> bool:
        with self._mu:
            now = self._clock()
            self._tokens = min(
                self.burst, self._tokens + (now - self._last) * self.limit
            )
            self._last = now
            if self._tokens >= 1.0:
                self._tokens -= 1.0
                return True
            return False


class TapServer:
    """Line-framed TCP broadcaster — the channelSet + serve loop analog.
    Dead subscribers are dropped on write error (`processor.go:74-79`);
    zero subscribers means broadcast() is a no-op."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        self._srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._srv.bind((host, port))
        self._srv.listen(8)
        self.port = self._srv.getsockname()[1]
        self._clients: list[socket.socket] = []
        self._mu = threading.Lock()
        self._stop = threading.Event()
        self._accepter = threading.Thread(target=self._accept_loop, daemon=True)
        self._accepter.start()

    def _accept_loop(self) -> None:
        self._srv.settimeout(0.2)
        while not self._stop.is_set():
            try:
                conn, _ = self._srv.accept()
            except socket.timeout:
                continue
            except OSError:
                return
            with self._mu:
                self._clients.append(conn)

    def client_count(self) -> int:
        with self._mu:
            return len(self._clients)

    def broadcast(self, payload: bytes) -> None:
        if not payload.endswith(b"\n"):
            payload += b"\n"
        with self._mu:
            dead = []
            for c in self._clients:
                try:
                    c.sendall(payload)
                except OSError:
                    dead.append(c)
            for c in dead:
                self._clients.remove(c)
                try:
                    c.close()
                except OSError:
                    pass

    def stop(self) -> None:
        self._stop.set()
        try:
            self._srv.close()
        except OSError:
            pass
        with self._mu:
            for c in self._clients:
                try:
                    c.close()
                except OSError:
                    pass
            self._clients.clear()


def tap_batch(df: DataFrame, server: TapServer, bucket: TokenBucket | None, max_docs: int = 1000) -> DataFrame:
    """One ConsumeLogs: marshal the batch to OTLP/JSON documents and
    broadcast them as one message (rate-gated, non-blocking). Returns the
    input unchanged — the tap is transparent."""
    if bucket is None or bucket.allow():
        from ..sources.readers import otlp_json_lines

        docs = [r.value for r in otlp_json_lines(df).take(max_docs)]
        if docs:
            server.broadcast("\n".join(docs).encode())
    return df


def remote_tap_stream(
    stream_df: DataFrame,
    server: TapServer,
    sink: Callable[[DataFrame, int], None],
    limit: float = 1.0,
    burst: int = 1,
    max_docs: int = 1000,
):
    """Wire the tap into a streaming pipeline: per micro-batch, broadcast
    the OTLP/JSON rendering (rate-limited) THEN hand the untouched batch
    to the real sink — ConsumeLogs' pass-through contract."""
    bucket = TokenBucket(limit, burst)

    def fb(batch_df: DataFrame, batch_id: int) -> None:
        tap_batch(batch_df, server, bucket, max_docs)
        sink(batch_df, batch_id)

    return stream_df.writeStream.foreachBatch(fb)
