"""withIdleness emulation for file-backed streaming sources
[FLINK-API: WatermarkStrategy#withIdleness].

Flink marks a source idle after `d` without data, EXCLUDING it from the
combined min-watermark so the active inputs drive event time. Spark has
no equivalent (divergences.md row 11): watermarks are DATA-driven, so a
union input that produces nothing keeps watermark 0 and the default
min policy never finalizes any window — append output starves.

Because Spark watermarks only move on data, the only faithful emulation
is to INJECT data: a heartbeat row whose event time is the injection
wall-clock, written into the idle source's directory. The idle input's
watermark then advances to ~now, which is >= any honest event time on
the active inputs — exactly the effect of Flink's idleness exclusion
(the active inputs become the binding minimum). Heartbeat rows carry a
sentinel key and are filtered out AFTER `withWatermark` (the watermark
is computed from the column before the filter, so the heartbeat moves
event time without ever reaching an aggregate).

Semantics shared with Flink, documented here because they surprise:
once a source has been idle and the combined watermark advanced past
its silence, REAL data arriving later with older event times is late —
in Flink because the combined watermark moved on without the idle
channel, here because the heartbeat moved the channel itself. The
failure profile is the same; the divergence is only WHERE the advanced
watermark lives.

Usage (the starvation test's twin, test_union_watermark.py)::

    hb = IdleSourceHeartbeat(idle_dir, idle_timeout_s=5.0,
                             fields={"user_id": -1}, ts_col="ts")
    hb.check_and_inject()          # one-shot (availableNow pipelines)
    # or hb.start(poll_s=1.0) ... hb.stop()   for processing-time runs

    union = active_src.union(idle_src)        # both withWatermark'd
    agg = strip_heartbeats(union).groupBy(window(...)).count()
"""
from __future__ import annotations

import glob
import os
import threading
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HEARTBEAT_SENTINEL = -1


class IdleSourceHeartbeat:
    """Watch a file-stream source directory; when its newest data file
    is older than `idle_timeout_s` (or the directory has never produced
    at all — Flink starts the idleness timer at stream start), write a
    single-row parquet heartbeat whose `ts_col` is the injection time.

    `fields` supplies every non-ts column of the source schema, and
    doubles as the sentinel the downstream `strip_heartbeats` filter
    removes (default: a key column pinned to -1). Arrow writes the file
    directly — no Spark session involved, so the monitor can run as an
    ops-side thread beside a processing-time query."""

    def __init__(self, path: str, idle_timeout_s: float,
                 fields: dict[str, object], ts_col: str = "ts"):
        self.path = path
        self.idle_timeout_s = idle_timeout_s
        self.fields = dict(fields)
        self.ts_col = ts_col
        self._n = 0
        self._thread: threading.Thread | None = None
        self._stop = threading.Event()

    # -- idleness detection -------------------------------------------
    def _newest_data_mtime(self) -> float | None:
        files = [f for f in glob.glob(
            os.path.join(self.path, "**", "*.parquet"), recursive=True)
            if os.path.isfile(f)]
        return max((os.path.getmtime(f) for f in files), default=None)

    def is_idle(self, now: float | None = None) -> bool:
        now = time.time() if now is None else now
        newest = self._newest_data_mtime()
        if newest is None:
            return True  # never produced — idle from stream start
        return now - newest > self.idle_timeout_s

    # -- injection -----------------------------------------------------
    def inject(self, now: float | None = None) -> str:
        """Write one heartbeat row with ts = now. Returns the file path."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        now = time.time() if now is None else now
        arrays = []
        names = []
        for k, v in self.fields.items():
            names.append(k)
            if isinstance(v, bool) or not isinstance(v, (int, float, str)):
                raise TypeError(f"unsupported heartbeat field {k}={v!r}")
            if isinstance(v, int):
                arrays.append(pa.array([v], pa.int64()))
            elif isinstance(v, float):
                arrays.append(pa.array([v], pa.float64()))
            else:
                arrays.append(pa.array([v], pa.string()))
        names.append(self.ts_col)
        arrays.append(pa.array([int(now * 1_000_000)],
                               pa.timestamp("us")))
        table = pa.table(dict(zip(names, arrays)))
        # NOT "_"-prefixed: Spark's file index hides _/. paths
        out_dir = os.path.join(self.path, "heartbeats")
        os.makedirs(out_dir, exist_ok=True)
        out = os.path.join(out_dir, f"hb-{self._n:06d}.parquet")
        self._n += 1
        tmp = out + ".tmp"
        pq.write_table(table, tmp)
        os.replace(tmp, out)  # readers never see a torn heartbeat
        return out

    def check_and_inject(self, now: float | None = None) -> bool:
        """One poll: inject iff idle. The one-shot form availableNow
        pipelines use (call before starting the drain)."""
        if self.is_idle(now):
            self.inject(now)
            return True
        return False

    # -- background monitor (processing-time triggers) ----------------
    def start(self, poll_s: float = 1.0) -> None:
        if self._thread is not None:
            raise RuntimeError("monitor already running")
        self._stop.clear()

        def loop() -> None:
            while not self._stop.wait(poll_s):
                try:
                    self.check_and_inject()
                except Exception:
                    pass  # a failed poll must not kill the monitor

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        if self._thread is not None:
            self._stop.set()
            self._thread.join(timeout=5)
            self._thread = None


def strip_heartbeats(df: DataFrame, key_col: str = "user_id",
                     sentinel: int = HEARTBEAT_SENTINEL,
                     ts_col: str = "ts") -> DataFrame:
    """Drop heartbeat rows AFTER watermark assignment, so the heartbeat
    advances event time but never reaches an aggregate.

    The predicate deliberately references `ts_col`: Catalyst pushes
    deterministic filters that do NOT mention the event-time attribute
    BELOW the EventTimeWatermark node and into the scan
    (PushPredicateThroughNonJoin's EventTimeWatermark case), which
    would filter the heartbeat at the source before the watermark
    operator ever saw it — silently re-starving the union (observed:
    a plain `key != sentinel` filter pushed into the parquet scan as
    PushedFilters). `... OR ts IS NULL` is a no-op for real rows (a
    null event time never reaches a watermark anyway) but pins the
    whole OR-predicate above the watermark assignment."""
    return df.filter((F.col(key_col) != F.lit(sentinel))
                     | F.col(ts_col).isNull())
