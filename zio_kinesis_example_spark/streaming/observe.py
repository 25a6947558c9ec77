"""Library observability: correlation-id structured logging + a progress
metrics tap (reference op 26).

The reference correlates its log lines with a per-run correlation id via
the logback MDC pattern (``logback.xml:3-17``) and taps per-record progress
through its logging test utilities (``TestUtils.scala:25-38``). The Spark
equivalent of that tap is ``df.observe()`` aggregates delivered through a
:class:`~pyspark.sql.streaming.StreamingQueryListener` — metrics ride the
query's own progress events, so there is no second aggregation job and no
driver-side data path; the correlation id is the query's ``runId``.

Usage::

    with tapped(spark, "tap") as tap:
        observed = df.observe("tap", F.count(F.lit(1)).alias("n"))
        q = observed.writeStream...start()
        q.awaitTermination()
        tap.wait_for("n", target=100, timeout_s=20)

Every lifecycle/progress event is also emitted as one JSON line on the
``zke.streaming`` logger: ``{"evt": ..., "cid": <runId>, ...}`` — the
structured, correlation-id-stamped log surface the reference gets from
logback.
"""

from __future__ import annotations

import contextlib
import json
import logging
import threading
import time
from collections.abc import Iterator

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener

logger = logging.getLogger("zke.streaming")


def _log(evt: str, cid: str, **fields) -> None:
    logger.info("%s", json.dumps({"evt": evt, "cid": cid, **fields}))


class MetricsTap(StreamingQueryListener):
    """Accumulates a named ``df.observe()`` observation across micro-batches.

    Listener callbacks arrive on a background thread and *after* the batch
    commits, so totals are read through :meth:`total` / :meth:`wait_for`
    (which polls until the asynchronous events catch up) rather than
    immediately after ``awaitTermination``.
    """

    def __init__(self, observation_name: str = "tap",
                 run_id: str | None = None):
        self.name = observation_name
        self._lock = threading.Lock()
        self._totals: dict[str, float] = {}
        self.batches = 0
        self.input_rows = 0
        #: The tap binds to ONE query: either the ``run_id`` given here, or
        #: the first query that reports the named observation. Progress from
        #: any other query on the same session is logged but not counted —
        #: two concurrent queries would otherwise cross-pollute
        #: batches/input_rows.
        self._run_id: str | None = run_id
        #: Run ids whose onQueryTerminated has been processed. The listener
        #: bus is ordered, so once a run's termination event lands here its
        #: totals are final — the race-free signal wait_terminated uses.
        self._terminated: set[str] = set()

    # -- listener callbacks -------------------------------------------------
    def onQueryStarted(self, event) -> None:
        _log("started", str(event.runId), query_id=str(event.id))

    def onQueryProgress(self, event) -> None:
        p = event.progress
        row = p.observedMetrics.get(self.name)
        with self._lock:
            if self._run_id is None and row is not None:
                self._run_id = str(p.runId)
            mine = self._run_id is not None and str(p.runId) == self._run_id
            if mine:
                self.batches += 1
                self.input_rows += int(p.numInputRows or 0)
                if row is not None:
                    for key in row.__fields__:
                        v = row[key]
                        if isinstance(v, (int, float)) \
                           and not isinstance(v, bool):
                            self._totals[key] = self._totals.get(key, 0) + v
        _log(
            "progress", str(p.runId), batch=p.batchId,
            rows=int(p.numInputRows or 0),
            metrics=dict(row.asDict()) if row is not None else None,
        )

    def onQueryIdle(self, event) -> None:
        _log("idle", str(event.runId))

    def onQueryTerminated(self, event) -> None:
        with self._lock:
            self._terminated.add(str(event.runId))
        _log("terminated", str(event.runId),
             error=str(event.exception) if event.exception else None)

    # -- read side ----------------------------------------------------------
    def total(self, key: str) -> float:
        with self._lock:
            return self._totals.get(key, 0)

    def wait_for(self, key: str, target: float, timeout_s: float = 20.0,
                 poll_s: float = 0.1) -> float:
        """Block until ``total(key) >= target`` or timeout (progress events
        are asynchronous); returns the final total either way."""
        deadline = time.monotonic() + timeout_s
        while time.monotonic() < deadline:
            v = self.total(key)
            if v >= target:
                return v
            time.sleep(poll_s)
        return self.total(key)

    def wait_terminated(self, run_id: str, timeout_s: float = 20.0) -> bool:
        """Block until ``run_id``'s onQueryTerminated has been processed
        (or timeout). The listener bus delivers events in order, so a True
        return guarantees every progress event of that run is already
        folded into the totals — the race-free way to read final counts
        (a settle heuristic can return early when the whole bus lags)."""
        deadline = time.monotonic() + timeout_s
        while time.monotonic() < deadline:
            with self._lock:
                if run_id in self._terminated:
                    return True
            time.sleep(0.05)
        with self._lock:
            return run_id in self._terminated

    def wait_stable(self, key: str, settle_s: float = 1.0,
                    timeout_s: float = 20.0) -> float:
        """Block until ``total(key)`` stops changing for ``settle_s`` —
        drains in-flight events after a query terminates. Returns
        immediately once the bound run's termination event has been
        processed (totals are final then); the settle heuristic is the
        fallback when no run is bound. Prefer :meth:`wait_terminated`
        with an explicit run id where the caller has one."""
        deadline = time.monotonic() + timeout_s
        last, last_change = self.total(key), time.monotonic()
        while time.monotonic() < deadline:
            with self._lock:
                done = (self._run_id is not None
                        and self._run_id in self._terminated)
            if done:
                return self.total(key)
            time.sleep(0.1)
            v = self.total(key)
            if v != last:
                last, last_change = v, time.monotonic()
            elif time.monotonic() - last_change >= settle_s:
                break
        return last


@contextlib.contextmanager
def tapped(spark: SparkSession,
           observation_name: str = "tap") -> Iterator[MetricsTap]:
    """Attach a :class:`MetricsTap` for the duration of the block."""
    tap = MetricsTap(observation_name)
    spark.streams.addListener(tap)
    try:
        yield tap
    finally:
        spark.streams.removeListener(tap)
