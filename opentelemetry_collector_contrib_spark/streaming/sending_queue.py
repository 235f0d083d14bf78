"""exporterhelper sending-queue + retry semantics for streaming sinks.

The reference wraps every exporter in exporterhelper, whose contract the
testbed pins end-to-end (`testbed/tests/log_test.go:167-220` —
`sending_queue.queue_size` full/not-full scenarios + `retry_on_failure`):

- a bounded in-process queue decouples the pipeline from the sink; when
  the queue is FULL new batches are REJECTED (the collector logs a drop
  and the testbed's queue-full scenario asserts sent < attempted);
- `retry_on_failure` retries transient sink errors with exponential
  backoff (initial_interval → max_interval, give up after
  max_elapsed_time); permanent errors are never retried
  (`consumererror.NewPermanent`, e.g. a marshaling failure in
  `kafka_exporter.go:130-133`);
- the file_storage persistent-queue extension survives restarts.

Spark mapping — the queue holds STAGED BATCHES, not rows:

- ``foreachBatch`` stages each micro-batch as parquet under the queue
  directory (one cheap local write — the file_storage persistent-queue
  analog: staged batches survive a driver restart) and enqueues the
  path;
- ``num_consumers`` drain threads write staged batches to the real sink
  via the retry wrapper; success deletes the staging files;
- ``queue_size`` bounds staged-but-unsent batches. ``on_full='drop'``
  rejects the batch (counted — the queue-full scenario);
  ``on_full='block'`` applies backpressure by blocking foreachBatch,
  which stalls the micro-batch engine exactly like a blocked collector
  pipeline;
- delivery is at-least-once from the SINK's viewpoint (a batch can land
  and crash before its dequeue is recorded) — the same contract the
  reference's persistent queue gives; the engine checkpoint upstream
  keeps the source side exactly-once.

Everything is driver-side ORCHESTRATION only — batch payloads move
executor-side (parquet write/read); the queue holds paths and counters.
"""

from __future__ import annotations

import os
import queue
import shutil
import threading
import time
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


class PermanentError(Exception):
    """Sink error that must NOT be retried (consumererror.NewPermanent
    analog — e.g. marshaling failures, `kafka_exporter.go:130-133`)."""


@dataclass
class RetryConfig:
    """retry_on_failure settings (exporterhelper defaults)."""

    enabled: bool = True
    initial_interval_s: float = 5.0
    max_interval_s: float = 30.0
    max_elapsed_s: float = 300.0
    multiplier: float = 1.5


@dataclass
class QueueStats:
    enqueued: int = 0
    sent: int = 0
    dropped_full: int = 0
    dropped_permanent: int = 0
    dropped_elapsed: int = 0
    retries: int = 0
    lock: threading.Lock = field(default_factory=threading.Lock, repr=False)

    def bump(self, name: str, by: int = 1) -> None:
        with self.lock:
            setattr(self, name, getattr(self, name) + by)


def send_with_retry(
    send: Callable[[], None],
    retry: RetryConfig,
    stats: QueueStats | None = None,
    sleep: Callable[[float], None] = time.sleep,
) -> bool:
    """Run ``send`` under the exporterhelper retry contract. Returns True
    on delivery, False when dropped (permanent error, retry disabled, or
    max_elapsed exhausted)."""
    start = time.monotonic()
    interval = retry.initial_interval_s
    while True:
        try:
            send()
            return True
        except PermanentError:
            if stats:
                stats.bump("dropped_permanent")
            return False
        except Exception:
            if not retry.enabled:
                if stats:
                    stats.bump("dropped_permanent")
                return False
            if time.monotonic() - start + interval > retry.max_elapsed_s:
                if stats:
                    stats.bump("dropped_elapsed")
                return False
            if stats:
                stats.bump("retries")
            sleep(interval)
            interval = min(interval * retry.multiplier, retry.max_interval_s)


class SendingQueue:
    """Bounded persistent sending queue in front of a batch sink.

    ``sink`` is called as ``sink(spark, staged_path, batch_id)`` from a
    consumer thread and must raise to signal failure (``PermanentError``
    to skip retries). Call ``enqueue(batch_df, batch_id)`` from
    foreachBatch, then ``shutdown()`` after the stream drains.
    """

    _STOP = (None, -1)

    def __init__(
        self,
        spark: SparkSession,
        sink: Callable[[SparkSession, str, int], None],
        queue_dir: str,
        queue_size: int = 100,
        num_consumers: int = 1,
        on_full: str = "drop",
        retry: RetryConfig | None = None,
    ) -> None:
        if on_full not in ("drop", "block"):
            raise ValueError(f"on_full must be drop|block, got {on_full!r}")
        self.spark = spark
        self.sink = sink
        self.queue_dir = queue_dir
        self.on_full = on_full
        self.retry = retry or RetryConfig()
        self.stats = QueueStats()
        self._q: queue.Queue = queue.Queue(maxsize=queue_size)
        os.makedirs(queue_dir, exist_ok=True)
        self._consumers = [
            threading.Thread(target=self._drain, daemon=True)
            for _ in range(num_consumers)
        ]
        for t in self._consumers:
            t.start()

    # -- producer side (foreachBatch) ------------------------------------
    def enqueue(self, batch_df: DataFrame, batch_id: int) -> bool:
        if self.on_full == "drop" and self._q.full():
            # best-effort pre-check: don't pay the parquet staging write
            # for a batch the full queue will reject anyway (put_nowait
            # below stays the authoritative check for the race)
            self.stats.bump("dropped_full")
            return False
        staged = os.path.join(self.queue_dir, f"batch-{batch_id:012d}")
        batch_df.write.mode("overwrite").parquet(staged)
        item = (staged, batch_id)
        if self.on_full == "block":
            self._q.put(item)  # backpressure: stalls the micro-batch
        else:
            try:
                self._q.put_nowait(item)
            except queue.Full:
                # queue-full contract: reject the batch, count the drop
                shutil.rmtree(staged, ignore_errors=True)
                self.stats.bump("dropped_full")
                return False
        self.stats.bump("enqueued")
        return True

    def foreach_batch(self) -> Callable[[DataFrame, int], None]:
        """The function to hand to ``writeStream.foreachBatch``."""
        return lambda df, bid: None if self.enqueue(df, bid) else None

    # -- consumer side ----------------------------------------------------
    def _drain(self) -> None:
        while True:
            staged, batch_id = self._q.get()
            if staged is None:
                self._q.task_done()
                return
            ok = send_with_retry(
                lambda: self.sink(self.spark, staged, batch_id),
                self.retry,
                self.stats,
            )
            if ok:
                self.stats.bump("sent")
                shutil.rmtree(staged, ignore_errors=True)
            # on drop the staged batch stays on disk: the restart-recovery
            # surface (file_storage analog) — recover_staged() reclaims it
            self._q.task_done()

    def shutdown(self, timeout_s: float = 60.0) -> QueueStats:
        """Drain outstanding batches, stop consumers, return stats.

        ``timeout_s`` bounds the WHOLE shutdown (queue.Queue.join has no
        timeout, so the drain is a deadline poll): a sink stuck in retry
        or a dead consumer can't hang the driver — consumers are daemon
        threads, so giving up is safe; undelivered batches stay staged on
        disk and ``recover_staged()`` reclaims them."""
        deadline = time.monotonic() + timeout_s
        while self._q.unfinished_tasks and time.monotonic() < deadline:
            time.sleep(0.05)
        for _ in self._consumers:
            try:
                # bounded: a full queue with a stuck consumer must not
                # hang the driver past the deadline (consumers are
                # daemons; undelivered batches stay staged on disk)
                self._q.put(
                    self._STOP,
                    timeout=max(0.05, deadline - time.monotonic()),
                )
            except queue.Full:
                break
        for t in self._consumers:
            t.join(timeout=max(0.1, deadline - time.monotonic()))
        return self.stats

    def recover_staged(self) -> list[str]:
        """Staged-but-unsent batch dirs left by a crash or drop — the
        restart half of the persistent queue: re-enqueue or inspect."""
        return sorted(
            os.path.join(self.queue_dir, d)
            for d in os.listdir(self.queue_dir)
            if d.startswith("batch-")
        )


def parquet_sink(out_dir: str) -> Callable[[SparkSession, str, int], None]:
    """Plain sink: append the staged batch to a parquet table."""

    def sink(spark: SparkSession, staged: str, batch_id: int) -> None:
        spark.read.parquet(staged).write.mode("append").parquet(out_dir)

    return sink
