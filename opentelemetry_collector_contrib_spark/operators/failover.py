"""failoverconnector — route every batch to the highest-priority healthy
pipeline, fail over on error, and periodically retry higher levels.

Reference: `connector/failoverconnector/` —

- ``ConsumeLogs`` tries the currently selected level; on error it walks
  down the priority list until a level accepts the data, reporting each
  outcome to the selector; when every level errors the batch is dropped
  with "All provided pipelines return errors" (`logs.go:31-57`);
- a level is a FAN-OUT of one or more consumers; if any consumer in the
  level fails, the level is unhealthy (`config.go:19-23`);
- selector state (`internal/state/pipeline_selector.go`): ``stable`` is
  the last level known good, ``current`` is what the next batch will
  try. An error at the stable level moves stable to the next level whose
  retry count hasn't exceeded ``max_retries`` (`:79-87`) and starts a
  retry cycle; an error at a non-stable (retry) level increments that
  level's retry count and returns current to stable (`:121-125`);
  success at a non-stable level makes it the new stable and resets its
  count (`:135-152`);
- the retry cycle: every ``retry_interval`` a pass starts; within a
  pass, every ``retry_gap`` the selector points ``current`` at the next
  non-exhausted level above stable (`:41-106`) — the pass merely
  REPOINTS current; the next arriving batch is what actually probes the
  level. Current persists at the last repointed level between passes
  (each new pass cancels the previous and restarts from level 0). The
  cycle stops when no level above stable has retries left (`:108-116`)
  or stable returns to 0. Config validation requires
  ``retry_interval > retry_gap × #levels`` (`config.go:38-46`).

The reference implements this with goroutines, tickers and channel
selects; wall-clock state the repo pins out of outputs. This rebuild is
the same state machine as a DETERMINISTIC closed-form replay over an
injectable clock: ``current(now)`` computes which tick of which pass
most recently repointed the selector, so given the same clock readings
the routing decisions replay exactly (unit tests drive a fake clock).

Spark shape: a driver-side wrapper around per-batch sink callables —
priority routing is control flow, not data flow, so it composes around
any ``foreachBatch`` sink (see ``failover_stream``) without touching
the executor plan. At-least-once caveat as in the reference fan-out:
when a level's fan-out partially succeeds, the successful sinks have
already consumed the batch before the level reports unhealthy.
"""

from __future__ import annotations

import time
from typing import Callable, Sequence

from pyspark.sql import DataFrame

__all__ = ["AllPipelinesFailed", "FailoverRouter", "failover_stream"]


class AllPipelinesFailed(RuntimeError):
    """`failover.go:27`: All provided pipelines return errors."""


class FailoverRouter:
    """Deterministic PipelineSelector + ConsumeLogs walk-down.

    ``levels`` is the priority list: each element is one sink callable
    or a sequence of them (a fan-out level). Sinks take
    ``(batch_df, batch_id)`` and signal failure by raising.
    """

    def __init__(
        self,
        levels: Sequence,
        *,
        retry_interval: float = 600.0,
        retry_gap: float = 30.0,
        max_retries: int = 10,
        clock: Callable[[], float] = time.monotonic,
    ):
        if not levels:
            raise ValueError("No pipelines are defined in the priority list")
        if retry_gap <= 0 or retry_interval <= 0 or retry_interval <= (
            retry_gap * len(levels)
        ):
            raise ValueError(
                "Retry interval must be positive, and retry_interval must be"
                " greater than retry_gap times the length of the priority list"
            )
        self._levels = [
            lv if isinstance(lv, (list, tuple)) else (lv,) for lv in levels
        ]
        self._interval = float(retry_interval)
        self._gap = float(retry_gap)
        self._max_retries = int(max_retries)
        self._clock = clock
        self._stable = 0
        self._counts = [0] * len(self._levels)
        self._retry_epoch: float | None = None  # retry cycle start, if any
        self._resume_at = float("-inf")  # failed probe pins current→stable
        #   until the first tick strictly after this instant

    # ---------------------------------------------------------- selector

    def _retryable(self) -> list[int]:
        """Levels above stable that still have retries left
        (`pipeline_selector.go:108-116`)."""
        hi = min(self._stable, len(self._levels))
        return [i for i in range(hi) if self._counts[i] < self._max_retries]

    def current(self, now: float | None = None) -> int:
        """The level the next batch will try — stable, unless a retry
        pass has repointed the selector since the last failed probe."""
        if self._retry_epoch is None:
            return self._stable
        levels = self._retryable()
        if not levels:
            self._retry_epoch = None  # checkContinueRetry → stop cycle
            return self._stable
        if now is None:
            now = self._clock()
        pass_no = int((now - self._retry_epoch) // self._interval)
        for p in (pass_no, pass_no - 1):
            if p < 1:
                continue
            pass_start = self._retry_epoch + p * self._interval
            if p == pass_no:
                ticks = int((now - pass_start) // self._gap)
            else:  # previous pass completed; current persists at its end
                ticks = len(levels)
            if ticks < 1:
                continue
            k = min(ticks, len(levels)) - 1
            tick_time = pass_start + (k + 1) * self._gap
            if tick_time <= self._resume_at:
                break  # no repoint since the last failed probe
            return levels[k]
        return self._stable

    def _on_error(self, idx: int, now: float) -> None:
        """handlePipelineError (`pipeline_selector.go:27-39,70-87,121-125`)."""
        if idx == self._stable:
            nxt = idx + 1
            while (
                self._max_retries > 0
                and nxt < len(self._levels)
                and self._counts[nxt] >= self._max_retries
            ):
                nxt += 1
            self._stable = nxt
            self._retry_epoch = now  # (re)start the retry cycle
            self._resume_at = float("-inf")
        else:
            self._counts[idx] += 1
            self._resume_at = now  # back to stable until the next tick

    def _on_success(self, idx: int) -> None:
        """reportStable (`pipeline_selector.go:135-152,168-174`)."""
        if idx != self._stable:
            self._counts[idx] = 0
            self._stable = idx
        if self._stable == 0 or not self._retryable():
            self._retry_epoch = None

    # ------------------------------------------------------------ consume

    def consume(self, batch_df: DataFrame, batch_id: int = 0) -> int:
        """ConsumeLogs + FailoverLogs (`logs.go:31-57`): try the current
        level, walk down on error; returns the level that accepted the
        batch, raises AllPipelinesFailed when none did."""
        while True:
            now = self._clock()
            idx = self.current(now)
            if idx >= len(self._levels):
                raise AllPipelinesFailed(
                    "All provided pipelines return errors"
                )
            try:
                for sink in self._levels[idx]:
                    sink(batch_df, batch_id)
            except AllPipelinesFailed:
                raise
            except Exception:
                self._on_error(idx, now)
                continue
            self._on_success(idx)
            return idx

    # ------------------------------------------------------- test surface

    @property
    def stable(self) -> int:
        return self._stable

    def retry_count(self, idx: int) -> int:
        return self._counts[idx]


def failover_stream(stream_df: DataFrame, router: FailoverRouter):
    """Wire a FailoverRouter into Structured Streaming: per micro-batch,
    the router picks the sink level. Returns the writeStream builder so
    callers add checkpoint/trigger options. Batches for which every
    level errors raise (the stream fails rather than silently dropping;
    the reference logs-and-drops — callers wanting that wrap consume)."""
    return stream_df.writeStream.foreachBatch(
        lambda df, bid: router.consume(df, bid)
    )
