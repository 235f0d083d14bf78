"""exporterhelper sending-queue + retry contract
(`testbed/tests/log_test.go:167-220` full/not-full scenarios,
retry_on_failure backoff, permanent-error no-retry)."""

import threading
import time

import pytest

from opentelemetry_collector_contrib_spark.streaming.sending_queue import (
    PermanentError,
    RetryConfig,
    SendingQueue,
    parquet_sink,
    send_with_retry,
)

_FAST = RetryConfig(initial_interval_s=0.01, max_interval_s=0.05, max_elapsed_s=1.0)


class TestRetry:
    def test_transient_failures_retry_until_success(self):
        calls = {"n": 0}

        def flaky():
            calls["n"] += 1
            if calls["n"] <= 3:
                raise RuntimeError("transient")

        assert send_with_retry(flaky, _FAST) is True
        assert calls["n"] == 4

    def test_permanent_error_never_retried(self):
        calls = {"n": 0}

        def perm():
            calls["n"] += 1
            raise PermanentError("marshaling failed")

        assert send_with_retry(perm, _FAST) is False
        assert calls["n"] == 1

    def test_retry_disabled_drops_on_first_failure(self):
        calls = {"n": 0}

        def fail():
            calls["n"] += 1
            raise RuntimeError("x")

        cfg = RetryConfig(enabled=False)
        assert send_with_retry(fail, cfg) is False
        assert calls["n"] == 1

    def test_max_elapsed_gives_up(self):
        cfg = RetryConfig(
            initial_interval_s=0.05, max_interval_s=0.05, max_elapsed_s=0.12
        )

        def always():
            raise RuntimeError("down")

        assert send_with_retry(always, cfg) is False

    def test_backoff_intervals_grow_and_cap(self):
        slept = []
        cfg = RetryConfig(
            initial_interval_s=1.0,
            max_interval_s=3.0,
            max_elapsed_s=1000.0,
            multiplier=2.0,
        )
        calls = {"n": 0}

        def flaky():
            calls["n"] += 1
            if calls["n"] <= 4:
                raise RuntimeError("t")

        assert send_with_retry(flaky, cfg, sleep=slept.append) is True
        assert slept == [1.0, 2.0, 3.0, 3.0]  # doubles then caps


def _mk_batches(spark, n, rows=20):
    return [
        spark.range(i * rows, (i + 1) * rows).withColumnRenamed("id", "v")
        for i in range(n)
    ]


class TestSendingQueue:
    def test_not_full_delivers_everything(self, spark, tmp_path):
        out = str(tmp_path / "out")
        q = SendingQueue(
            spark,
            parquet_sink(out),
            str(tmp_path / "q"),
            queue_size=100,
            retry=_FAST,
        )
        for i, b in enumerate(_mk_batches(spark, 5)):
            assert q.enqueue(b, i)
        stats = q.shutdown()
        assert stats.sent == 5 and stats.dropped_full == 0
        assert spark.read.parquet(out).count() == 100
        assert q.recover_staged() == []  # sent batches cleaned up

    def test_queue_full_drops_and_counts(self, spark, tmp_path):
        gate = threading.Event()

        def slow_sink(s, staged, bid):
            gate.wait(10)

        q = SendingQueue(
            spark,
            slow_sink,
            str(tmp_path / "q2"),
            queue_size=2,
            num_consumers=1,
            on_full="drop",
            retry=_FAST,
        )
        batches = _mk_batches(spark, 6)
        results = [q.enqueue(b, i) for i, b in enumerate(batches)]
        gate.set()
        stats = q.shutdown()
        # 1 in-flight + 2 queued deliver eventually; the overflow dropped
        assert results.count(False) == stats.dropped_full > 0
        assert stats.sent + stats.dropped_full == 6

    def test_block_applies_backpressure_and_loses_nothing(self, spark, tmp_path):
        out = str(tmp_path / "out3")
        release = threading.Event()

        def gated_sink(s, staged, bid):
            release.wait(10)
            parquet_sink(out)(s, staged, bid)

        q = SendingQueue(
            spark,
            gated_sink,
            str(tmp_path / "q3"),
            queue_size=1,
            num_consumers=1,
            on_full="block",
            retry=_FAST,
        )
        t0 = time.monotonic()
        threading.Timer(0.5, release.set).start()
        for i, b in enumerate(_mk_batches(spark, 4)):
            q.enqueue(b, i)
        blocked_for = time.monotonic() - t0
        stats = q.shutdown()
        assert stats.sent == 4 and stats.dropped_full == 0
        assert blocked_for >= 0.4  # producer actually stalled on the queue
        assert spark.read.parquet(out).count() == 80

    def test_transient_sink_failure_retries_then_lands(self, spark, tmp_path):
        out = str(tmp_path / "out4")
        fails = {"n": 0}

        def flaky_sink(s, staged, bid):
            if fails["n"] < 2:
                fails["n"] += 1
                raise RuntimeError("broker unavailable")
            parquet_sink(out)(s, staged, bid)

        q = SendingQueue(
            spark, flaky_sink, str(tmp_path / "q4"), retry=_FAST
        )
        q.enqueue(_mk_batches(spark, 1)[0], 0)
        stats = q.shutdown()
        assert stats.sent == 1 and stats.retries == 2
        assert spark.read.parquet(out).count() == 20

    def test_permanent_failure_keeps_staged_for_recovery(self, spark, tmp_path):
        def perm_sink(s, staged, bid):
            raise PermanentError("bad payload")

        q = SendingQueue(
            spark, perm_sink, str(tmp_path / "q5"), retry=_FAST
        )
        q.enqueue(_mk_batches(spark, 1)[0], 7)
        stats = q.shutdown()
        assert stats.dropped_permanent == 1 and stats.sent == 0
        staged = q.recover_staged()
        assert len(staged) == 1 and staged[0].endswith("batch-000000000007")
        # the persistent-queue restart surface: the batch is re-readable
        assert spark.read.parquet(staged[0]).count() == 20

    def test_streaming_foreach_batch_wiring(self, spark, tmp_path):
        inp = str(tmp_path / "in")
        out = str(tmp_path / "out6")
        spark.range(50).withColumnRenamed("id", "v").coalesce(1).write.mode(
            "append"
        ).parquet(inp)
        q = SendingQueue(
            spark, parquet_sink(out), str(tmp_path / "q6"), retry=_FAST
        )
        stream = spark.readStream.schema("v long").parquet(inp)
        sq = (
            stream.writeStream.foreachBatch(q.foreach_batch())
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        sq.awaitTermination()
        stats = q.shutdown()
        assert stats.sent >= 1 and stats.dropped_full == 0
        assert spark.read.parquet(out).count() == 50

    def test_bad_on_full_rejected(self, spark, tmp_path):
        with pytest.raises(ValueError, match="drop|block"):
            SendingQueue(
                spark, parquet_sink("x"), str(tmp_path / "q7"), on_full="nope"
            )
