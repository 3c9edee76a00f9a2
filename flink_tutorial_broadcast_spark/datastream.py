"""A thin Flink-DataStream-style facade over DataFrame plans.

The reference's users write DataStream programs — env.from_collection()
.map().filter().key_by().window().reduce() chains and the broadcast-state
connect pattern [FLINK-API: StreamExecutionEnvironment / DataStream /
KeyedStream / BroadcastConnectedStream]. This module lets that PROGRAM
SHAPE run unchanged on the Spark engine: every fluent call appends to a
LOGICAL DataFrame plan, so Catalyst still sees one declarative query —
the facade never materializes between operators and never leaves the JVM.

Two argument styles per transform:
- SQL expression strings / dicts (the fast path — whole-stage codegen;
  `map({"doubled": "value * 2"})`, `filter("value > 10")`).
- Python callables (the Flink-lambda look) are ACCEPTED for `map` and
  `filter` but run as Arrow-batched pandas over `mapInPandas` — the
  documented slow path, for porting only; rewrite hot paths as
  expressions.

Scale posture is inherited, not reimplemented: `broadcast()` marks the
rule side exactly like the flagship's join, `key_by().window()` is a
groupBy over codegen'd time buckets, `reduce`-style aggs are partial-
aggregated — the plans the facade produces are the SAME plans the
operators/ modules ship (test-asserted against the oracle-backed keys).
"""
from __future__ import annotations

import os
import shutil
import tempfile
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


class OutputTag:
    """Flink's side-output handle [FLINK-API: o.a.f.util.OutputTag]: a
    named route a process step can emit to besides the main output."""

    def __init__(self, name: str):
        self.name = name


class StreamExecutionEnvironment:
    """Entry point mirroring Flink's StreamExecutionEnvironment."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    @staticmethod
    def get_execution_environment(
            spark: SparkSession) -> "StreamExecutionEnvironment":
        return StreamExecutionEnvironment(spark)

    def from_collection(self, data, schema: str) -> "DataStream":
        return DataStream(self.spark.createDataFrame(data, schema))

    def from_parquet(self, path: str) -> "DataStream":
        return DataStream(self.spark.read.parquet(path))

    def from_dataframe(self, df: DataFrame) -> "DataStream":
        return DataStream(df)


class DataStream:
    """Fluent plan builder; `df` is always the underlying logical plan."""

    def __init__(self, df: DataFrame):
        self.df = df

    # -- stateless transforms -------------------------------------------
    def map(self, fn, output_schema: str | None = None) -> "DataStream":
        """dict of {out_col: sql_expr} (fast, codegen) or a Python
        callable row→dict (slow path: Arrow-batched mapInPandas;
        requires output_schema)."""
        if isinstance(fn, dict):
            cols = [F.expr(e).alias(n) for n, e in fn.items()]
            return DataStream(self.df.select(*cols))
        if not callable(fn) or output_schema is None:
            raise TypeError("map() needs a {col: expr} dict, or a "
                            "callable plus output_schema")

        def run(batches: Iterator) -> Iterator:
            import pandas as pd
            for pdf in batches:
                yield pd.DataFrame(
                    [fn(row) for row in pdf.to_dict("records")])
        return DataStream(self.df.mapInPandas(run, output_schema))

    def filter(self, pred) -> "DataStream":
        """SQL predicate string (fast) or Python callable row→bool
        (slow path)."""
        if isinstance(pred, str):
            return DataStream(self.df.filter(pred))
        if not callable(pred):
            raise TypeError("filter() needs a SQL string or a callable")

        def run(batches: Iterator) -> Iterator:
            for pdf in batches:
                yield pdf[[bool(pred(r))
                           for r in pdf.to_dict("records")]]
        return DataStream(self.df.mapInPandas(run, self.df.schema))

    def map_async(self, fn: Callable, output_schema: str,
                  concurrency: int = 32, timeout: float | None = None,
                  ordered: bool = True, capacity: int | None = None,
                  on_timeout: "Callable | None" = None,
                  retries: int = 0, retry_delay: float = 0.0,
                  retry_on: "Callable | None" = None,
                  retry_on_result: "Callable | None" = None) -> "DataStream":
        """Flink async I/O [FLINK-API: AsyncDataStream.orderedWait /
        unorderedWait(stream, asyncFn, timeout, unit, capacity) +
        AsyncFunction.timeout()]: `fn(row_dict) -> dict` is an
        I/O-bound call (external lookup/enrichment); each Arrow batch
        dispatches its rows through a `concurrency`-wide thread pool,
        so total latency per batch is ~ceil(rows/concurrency)·RTT
        instead of rows·RTT. EXTERNAL-SERVICE latency only — pure
        computation belongs in expressions (codegen) or vectorized
        pandas, never here.

        - `ordered=True` (orderedWait): results keep row order within
          the batch. `ordered=False` (unorderedWait): results are
          emitted in COMPLETION order — lower latency-to-first-row,
          same multiset of rows.
        - `timeout` (seconds, per record, measured from dispatch): on
          expiry the record resolves through `on_timeout(row) -> dict`
          (Flink's AsyncFunction.timeout() override) or, when
          `on_timeout` is None, the batch FAILS with TimeoutError —
          Flink's default. Python threads cannot be interrupted, so a
          hung `fn` call's worker thread is abandoned (it no longer
          occupies a capacity slot, but the OS thread lives until the
          call returns) — exactly why a finite `timeout` should always
          accompany an unreliable external service.
        - `capacity` (default 2×concurrency): max in-flight requests
          per partition; submission blocks past it (Flink's
          backpressure semantics), bounding queue memory when the
          service is slower than the scan.
        - `retries` / `retry_delay` / `retry_on` / `retry_on_result`
          [FLINK-API: AsyncDataStream.orderedWaitWithRetry +
          AsyncRetryStrategies.FixedDelayRetryStrategyBuilder]: a
          fixed-delay retry strategy run INSIDE the record's worker
          slot. An attempt retries when it raises and `retry_on(exc)`
          is true (default: any exception), or when it returns a value
          `retry_on_result(result)` deems retryable (Flink's result
          predicate — e.g. empty lookups). Exhausted exception-retries
          re-raise the last exception (fails the batch, Flink's
          completeExceptionally); exhausted result-retries emit the
          last result (Flink's behavior). The per-record `timeout`
          spans ALL attempts — it is measured from first dispatch, so
          a retry storm cannot extend a record's deadline."""
        if capacity is None:
            capacity = 2 * concurrency
        if capacity < 1:
            raise ValueError("capacity must be >= 1")
        if retries < 0:
            raise ValueError("retries must be >= 0")
        if retries:
            inner_fn = fn

            def fn(row):  # noqa: F811 — deliberate wrap
                import time as _time
                attempt = 0
                while True:
                    try:
                        out = inner_fn(row)
                    except Exception as e:
                        if attempt >= retries or (
                                retry_on is not None
                                and not retry_on(e)):
                            raise
                    else:
                        if retry_on_result is None \
                                or not retry_on_result(out) \
                                or attempt >= retries:
                            return out
                    attempt += 1
                    if retry_delay:
                        _time.sleep(retry_delay)

        def run(batches: Iterator) -> Iterator:
            import time
            from concurrent.futures import (
                FIRST_COMPLETED, ThreadPoolExecutor, TimeoutError as FTimeout,
                wait,
            )

            import pandas as pd

            def resolve(fut, row, deadline) -> dict:
                try:
                    remaining = None if deadline is None else \
                        max(0.0, deadline - time.monotonic())
                    return fut.result(timeout=remaining)
                except FTimeout:
                    fut.cancel()
                    if on_timeout is None:
                        raise TimeoutError(
                            f"map_async record exceeded timeout={timeout}s "
                            f"(row={row!r}); pass on_timeout= to emit a "
                            "substitute record instead") from None
                    return on_timeout(row)

            # not a `with` block: __exit__ JOINS worker threads, so an
            # abandoned hung call would stall the batch end anyway —
            # shutdown(wait=False) lets emission proceed immediately
            ex = ThreadPoolExecutor(max_workers=concurrency)
            try:
                for pdf in batches:
                    rows = pdf.to_dict("records")
                    out: list[dict] = []
                    if ordered:
                        # sliding submission window of `capacity`;
                        # resolve FIFO so emission preserves row order
                        pending: list = []  # (future, row, deadline)
                        for row in rows:
                            if len(pending) == capacity:
                                out.append(resolve(*pending.pop(0)))
                            dl = None if timeout is None else \
                                time.monotonic() + timeout
                            pending.append((ex.submit(fn, row), row, dl))
                        while pending:
                            out.append(resolve(*pending.pop(0)))
                    else:
                        # unorderedWait: emit in completion order
                        it = iter(rows)
                        pending_map: dict = {}  # future -> (row, deadline)
                        exhausted = False
                        while pending_map or not exhausted:
                            while not exhausted and len(pending_map) < capacity:
                                row = next(it, None)
                                if row is None:
                                    exhausted = True
                                    break
                                dl = None if timeout is None else \
                                    time.monotonic() + timeout
                                pending_map[ex.submit(fn, row)] = (row, dl)
                            if not pending_map:
                                break
                            # earliest deadline bounds the wait
                            dls = [d for _, d in pending_map.values()
                                   if d is not None]
                            wto = None if not dls else \
                                max(0.0, min(dls) - time.monotonic())
                            done, _ = wait(pending_map, timeout=wto,
                                           return_when=FIRST_COMPLETED)
                            now = time.monotonic()
                            if not done:  # deadline expired on someone
                                expired = [f for f, (_, d)
                                           in pending_map.items()
                                           if d is not None and d <= now]
                                for f in expired:
                                    row, _ = pending_map.pop(f)
                                    f.cancel()
                                    if on_timeout is None:
                                        raise TimeoutError(
                                            "map_async record exceeded "
                                            f"timeout={timeout}s "
                                            f"(row={row!r})")
                                    out.append(on_timeout(row))
                                continue
                            for f in done:
                                pending_map.pop(f)
                                out.append(f.result())
                    yield pd.DataFrame(out)
            finally:
                ex.shutdown(wait=False, cancel_futures=True)
        return DataStream(self.df.mapInPandas(run, output_schema))

    def flat_map(self, out_col: str, array_expr: str) -> "DataStream":
        """Explode an array-valued SQL expression — the tokenizer shape
        (`flat_map("word", "split(text, ' ')")`)."""
        return DataStream(self.df.select(
            "*", F.explode(F.expr(array_expr)).alias(out_col)))

    def union(self, other: "DataStream") -> "DataStream":
        return DataStream(self.df.unionByName(other.df))

    def rebalance(self, n: int | None = None) -> "DataStream":
        """Round-robin redistribution [FLINK-API: DataStream.rebalance]:
        a full shuffle to `n` (or the session default) partitions —
        the skew-smoothing repartition before a hot stage."""
        return DataStream(self.df.repartition(n) if n else
                          self.df.repartition())

    def rescale(self, n: int) -> "DataStream":
        """Local fan-in [FLINK-API: DataStream.rescale]: coalesce to
        `n` partitions WITHOUT a shuffle — the cheap downstream-narrow
        repartitioning (e.g., before a file sink that wants few
        files)."""
        return DataStream(self.df.coalesce(n))

    def assign_timestamps_and_watermarks(
            self, time_col: str, delay: str) -> "DataStream":
        """Watermark assignment [FLINK-API:
        assignTimestampsAndWatermarks + BoundedOutOfOrderness]: marks
        `time_col` as event time with `delay` allowed lateness on a
        STREAMING plan (no-op semantics on batch, where all data has
        arrived — matching the engine's batch ≡ streaming premise)."""
        if not self.df.isStreaming:
            return self
        return DataStream(self.df.withWatermark(time_col, delay))

    # -- keying / windows / broadcast -----------------------------------
    def key_by(self, *cols: str) -> "KeyedStream":
        return KeyedStream(self.df, list(cols))

    def window_all_tumbling(self, time_col: str, unit: str) -> "KeyedStream":
        """Non-keyed tumbling window [FLINK-API: DataStream.windowAll
        (TumblingEventTimeWindows.of(...))]: in Flink windowAll is
        explicitly parallelism-1 (all records to one task); here the
        window bucket IS the grouping key, so it compiles to a normal
        partial-agg + tiny exchange — a strict upgrade with identical
        results. Follow with `.aggregate(...)`."""
        return KeyedStream(self.df, []).window_tumbling(time_col, unit)

    def window_all_sliding(self, time_col: str, size: str,
                           slide: str) -> "KeyedStream":
        """Non-keyed sliding window [FLINK-API: DataStream.windowAll
        (SlidingEventTimeWindows.of(size, slide))] — see
        window_all_tumbling for the parallelism note."""
        return KeyedStream(self.df, []).window_sliding(time_col, size,
                                                       slide)

    def window_all_session(self, time_col: str, gap: str) -> "KeyedStream":
        """Non-keyed session window [FLINK-API: DataStream.windowAll
        (EventTimeSessionWindows.withGap(...))]: one global session
        timeline (F.session_window with no keys)."""
        return KeyedStream(self.df, []).window_session(time_col, gap)

    def connect_broadcast(self, rules: DataFrame,
                          on: str) -> "DataStream":
        """The reference's broadcast-state pattern
        [FLINK-API: DataStream.connect(BroadcastStream) +
        KeyedBroadcastProcessFunction]: the rule side is broadcast to
        every task and joined by an arbitrary (theta) condition — the
        fact side never shuffles."""
        return DataStream(self.df.join(F.broadcast(rules), F.expr(on)))

    def connect(self, other: "DataStream") -> "ConnectedStreams":
        """Two-input NON-broadcast connect [FLINK-API:
        DataStream.connect(DataStream) + CoProcessFunction]: key both
        sides, then `process()` sees each key's rows from BOTH inputs."""
        return ConnectedStreams(self, other)

    def join(self, other: "DataStream") -> "JoinedStreams":
        """Windowed two-stream join [FLINK-API: DataStream.join(other)
        .where(kL).equalTo(kR).window(TumblingEventTimeWindows.of(...))
        .apply(fn)]: pairs of rows sharing the key AND the tumbling
        window. The facade chain is
        `a.join(b).where(...).equal_to(...).window_tumbling(time, unit)`
        — compiling to ONE equi-join on (key, window bucket), both
        sides bucketed in codegen (the C9 q_window_join layout at row
        grain); Flink's apply(fn) is a `.map()` on the result."""
        return JoinedStreams(self, other)

    def split(self, tags: dict[str, str],
              main_tag: str = "main") -> "SideOutputs":
        """Side outputs [FLINK-API: OutputTag + ctx.output]: ONE tagged
        pass over the input — each row gets the FIRST matching tag's
        name (order of `tags` wins ties), unmatched rows go to the main
        output. The filtered reads downstream share this single
        projection (N outputs without N source passes — the L113
        side_output_stream layout, here as a facade verb). The routing
        is materialized as a `__tag` column; an input already carrying
        `__tag` would be silently clobbered, so that is an error."""
        if "__tag" in self.df.columns:
            raise ValueError(
                "split() materializes its routing into a __tag column, "
                "but the input already has one — rename it first")
        tag = F.lit(main_tag)
        for name, pred in reversed(list(tags.items())):
            tag = F.when(F.expr(pred), F.lit(name)).otherwise(tag)
        return SideOutputs(self.df.withColumn("__tag", tag), main_tag)

    def iterate(self, step: Callable[[DataFrame], DataFrame],
                n_rounds: int,
                checkpoint_every: int = 1) -> "DataStream":
        """Bounded iteration [FLINK-API: DataStream.iterate()]: apply
        `step` (DataFrame → DataFrame) `n_rounds` times as a driver
        loop, truncating lineage with localCheckpoint every
        `checkpoint_every` rounds — the iterative.py pattern (plans
        otherwise grow exponentially and re-execute prior rounds).
        Flink's iterate() is a STREAMING feedback edge (records
        re-enter the operator); Spark has no cyclic dataflow, so the
        honest mapping is this bounded batch driver. For convergence
        loops, drive `step` yourself and test the residual between
        rounds (q_pagerank's shape)."""
        if n_rounds < 0:
            raise ValueError("iterate() needs n >= 0 rounds")
        cur = self.df
        for i in range(1, n_rounds + 1):
            cur = step(cur)
            if i % checkpoint_every == 0 or i == n_rounds:
                cur = cur.localCheckpoint()
        return DataStream(cur)

    # -- sinks / escape hatches -----------------------------------------
    def to_df(self) -> DataFrame:
        return self.df

    def print(self, n: int = 20) -> None:
        self.df.show(n, truncate=False)


class SideOutputs:
    """Result of `DataStream.split()`: the main stream plus named side
    outputs, all views over ONE tagged projection."""

    def __init__(self, tagged_df: DataFrame, main_tag: str):
        self._df = tagged_df
        self._main = main_tag

    def main(self) -> DataStream:
        return self.get_side_output(self._main)

    def get_side_output(self, tag: "OutputTag | str") -> DataStream:
        name = tag.name if isinstance(tag, OutputTag) else tag
        return DataStream(
            self._df.filter(F.col("__tag") == name).drop("__tag"))


class JoinedStreams:
    """Builder for `DataStream.join()` [FLINK-API: JoinedStreams]."""

    def __init__(self, left: DataStream, right: DataStream):
        self._left, self._right = left, right
        self._lk: list[str] | None = None
        self._rk: list[str] | None = None

    def where(self, *cols: str) -> "JoinedStreams":
        self._lk = list(cols)
        return self

    def equal_to(self, *cols: str) -> "JoinedStreams":
        self._rk = list(cols)
        return self

    def window_tumbling(self, time_col: str, unit: str,
                        right_time_col: str | None = None) -> DataStream:
        """Equi-join row pairs sharing the keys and the `unit` tumbling
        bucket of their event times. Colliding right-side column names
        (other than its keys, which equal the left's values anyway) come
        back suffixed `_r`. Adds `window_start`."""
        if self._lk is None or self._rk is None:
            raise ValueError("join() needs where(...) and equal_to(...) "
                             "before the window verb")
        if len(self._lk) != len(self._rk):
            raise ValueError("where()/equal_to() key counts differ")
        rt = right_time_col or time_col
        l = self._left.df.withColumn(
            "window_start", F.date_trunc(unit, F.col(time_col)))
        r = self._right.df.withColumn(
            "__w_r", F.date_trunc(unit, F.col(rt)))
        # right keys are join-redundant; suffix remaining collisions
        keep = [c for c in r.columns
                if c not in set(self._rk) and c != "__w_r"]
        renames = {c: f"{c}_r" for c in keep if c in l.columns}
        for old, new in renames.items():
            r = r.withColumnRenamed(old, new)
        rk = [f"__rk_{i}" for i in range(len(self._rk))]
        for tmp, orig in zip(rk, self._rk):
            r = r.withColumnRenamed(orig, tmp)
        cond = F.col("window_start") == F.col("__w_r")
        for lc, tmp in zip(self._lk, rk):
            cond = cond & (F.col(lc) == F.col(tmp))
        return DataStream(l.join(r, cond).drop("__w_r", *rk))


class ConnectedStreams:
    """Two keyed inputs awaiting a CoProcessFunction [FLINK-API:
    ConnectedStreams.keyBy(k1, k2).process(...)]."""

    def __init__(self, left: DataStream, right: DataStream):
        self._left = left
        self._right = right

    def key_by(self, left_keys: list[str] | str,
               right_keys: list[str] | str) -> "KeyedConnectedStreams":
        lk = [left_keys] if isinstance(left_keys, str) else list(left_keys)
        rk = [right_keys] if isinstance(right_keys, str) else list(right_keys)
        return KeyedConnectedStreams(self._left.df, lk, self._right.df, rk)


class KeyedConnectedStreams:
    def __init__(self, ldf: DataFrame, lkeys: list[str],
                 rdf: DataFrame, rkeys: list[str]):
        self._ldf, self._lkeys = ldf, lkeys
        self._rdf, self._rkeys = rdf, rkeys

    def process(self, fn: Callable, output_schema: str) -> DataStream:
        """CoProcessFunction analogue: `fn(key_tuple, left_pdf,
        right_pdf) -> pandas_df` runs once per key with BOTH sides'
        rows, Arrow-batched, via cogroup().applyInPandas — one shuffle
        per side on its key, no driver materialization (the L31
        two-input keyed operator, as a facade verb)."""
        return DataStream(
            self._ldf.groupBy(*self._lkeys)
            .cogroup(self._rdf.groupBy(*self._rkeys))
            .applyInPandas(fn, output_schema))


class KeyedStream:
    def __init__(self, df: DataFrame, keys: list[str], win=None):
        self.df = df
        self.keys = keys
        # optional (grouping Column, [output Columns]) from a window verb
        self._win = win

    def _no_pending_window(self, verb: str) -> None:
        if self._win is not None:
            raise ValueError(
                f"{verb}() cannot follow window_sliding()/window_session():"
                " those windows are grouping specs consumed by aggregate()."
                " Use aggregate(), or window via window_tumbling()/"
                "count_window() (which rewrite the keyed rows themselves).")

    def window_tumbling(self, time_col: str, unit: str) -> "KeyedStream":
        """Tumbling event-time window as an extra grouping column
        (`unit` per date_trunc: 'hour', 'day', ...) — EventTimeWindows
        parity for fully-arrived data; the streaming twins in
        streaming/jobs.py carry the watermark semantics."""
        self._no_pending_window("window_tumbling")
        bucket = F.date_trunc(unit, F.col(time_col)).alias("window_start")
        return KeyedStream(self.df.withColumn("window_start", bucket),
                           self.keys + ["window_start"])

    def window_sliding(self, time_col: str, size: str,
                       slide: str) -> "KeyedStream":
        """Sliding event-time window [FLINK-API:
        SlidingEventTimeWindows.of(size, slide)]: Spark's F.window
        assigns each row its size/slide epoch-aligned windows — the
        q_window_sliding plan, reachable from the fluent API."""
        self._no_pending_window("window_sliding")
        return KeyedStream(
            self.df, self.keys,
            win=(F.window(time_col, size, slide).alias("__w"),
                 [F.col("__w.start").alias("window_start")]))

    def window_session(self, time_col: str, gap: str) -> "KeyedStream":
        """Session window with gap [FLINK-API:
        EventTimeSessionWindows.withGap]: F.session_window merges
        per-key runs up to `gap` apart — the q_window_session plan."""
        self._no_pending_window("window_session")
        return KeyedStream(
            self.df, self.keys,
            win=(F.session_window(time_col, gap).alias("__w"),
                 [F.col("__w.start").alias("session_start")]))

    def count_window(self, size: int,
                     order_cols: tuple[str, ...] = ("ts", "event_id"),
                     ) -> "KeyedStream":
        """Count window [FLINK-API: KeyedStream.countWindow(size)]:
        deterministic batch form — per-key buckets of `size` rows in
        `order_cols` order (the q_window_count plan; the window is
        PARTITIONED by the keys, so no single-partition global sort).
        The streaming twin with true arrival-order state lives in
        streaming/jobs.count_window_stream."""
        self._no_pending_window("count_window")
        w = Window.partitionBy(*self.keys).orderBy(*order_cols)
        df = (self.df.withColumn("__rn", F.row_number().over(w))
              .withColumn("bucket", F.floor((F.col("__rn") - 1) / size)
                          .cast("bigint"))
              .drop("__rn"))
        return KeyedStream(df, self.keys + ["bucket"])

    def aggregate(self, **aggs: str) -> DataStream:
        """Named SQL aggregate expressions over the keyed (windowed)
        groups: `aggregate(n_matches="count(*)", sum_value="round(sum(value), 2)")`."""
        exprs = [F.expr(e).alias(n) for n, e in aggs.items()]
        if self._win is None:
            return DataStream(self.df.groupBy(*self.keys).agg(*exprs))
        wcol, wout = self._win
        out = self.df.groupBy(*[F.col(k) for k in self.keys], wcol).agg(*exprs)
        return DataStream(out.select(*self.keys, *wout, *list(aggs)))

    def reduce(self, fn: Callable,
               order_cols: tuple[str, ...] = ("ts", "event_id"),
               ) -> DataStream:
        """Flink `KeyedStream.reduce(ReduceFunction)` [FLINK-API]: an
        associative pairwise merge `fn(acc_row, row) -> row` with
        row-in ≡ row-out shape; the batch form emits each key's FINAL
        reduced record (the last value the incremental Flink reduce
        would emit), folding in deterministic `order_cols` order on the
        Arrow slow path. SQL-expressible reductions (sums, min/max,
        max_by) belong in `aggregate()` — this exists for ported
        ReduceFunctions whose merge logic resists relational rewrite.

        Scale shape: the shuffle groups on `xxhash64(keys) % B`
        BUCKETS (B = 2× the cluster's default parallelism), not raw
        keys — one Arrow round-trip per bucket instead of one per key.
        Grouped-map dispatch costs ~5 ms per GROUP warm (measured on
        this host), so a million-key reduce keyed raw would burn more
        than an hour of pure overhead while B buckets pay the same
        dispatch regardless of key count. Per-key semantics are
        reinstated inside the worker with one vectorized sort + pandas
        groupby; results are identical because bucketing partitions the
        key space. Measured 2.9 s → 1.3 s warm on the 1,500-key sf0.1
        fixture (the remainder is the irreducible per-row Python `fn`
        itself — the price of an arbitrary ReduceFunction)."""
        self._no_pending_window("reduce")
        import functools

        keys = list(self.keys)
        order = [c for c in order_cols]
        src = self.df
        n_buckets = 2 * src.sparkSession.sparkContext.defaultParallelism

        def fold(pdf):
            import pandas as pd
            pdf = pdf.drop(columns="__bucket")
            sort_by = keys + [c for c in order if c in pdf.columns]
            pdf = pdf.sort_values(sort_by, kind="mergesort")
            out = []
            # dropna=False: Spark groups null keys like any other group;
            # pandas' default would silently delete every null-keyed row.
            for _, g in pdf.groupby(keys, sort=False, dropna=False):
                out.append(functools.reduce(fn, g.to_dict("records")))
            return pd.DataFrame(out, columns=pdf.columns)

        bucket = (F.xxhash64(*[F.col(k) for k in keys])
                  % F.lit(n_buckets)).alias("__bucket")
        return DataStream(
            src.select("*", bucket)
            .groupBy("__bucket").applyInPandas(fold, src.schema))

    def interval_join(self, other: "KeyedStream",
                      lower: str, upper: str,
                      time_col: str = "ts",
                      other_time_col: str | None = None) -> DataStream:
        """Flink `KeyedStream.intervalJoin(other).between(lower, upper)`
        [FLINK-API: IntervalJoin]: row pairs sharing the key where the
        other side's event time lies in [this.ts + lower, this.ts +
        upper] — `interval_join(errors, "-5 minutes", "5 minutes")`.
        Compiles to one equi-join on the key with the range predicate
        filtered post-probe (the C7 q_interval_join layout); at horizon
        ≫ per-key density the bucketed rewrite (q_range_join_bucketed)
        applies unchanged. Colliding right columns come back suffixed
        `_r`."""
        self._no_pending_window("interval_join")
        if len(self.keys) != len(other.keys):
            raise ValueError("interval_join key counts differ")
        ot = other_time_col or time_col
        l = self.df
        r = other.df
        keep = [c for c in r.columns if c not in set(other.keys)]
        renames = {c: f"{c}_r" for c in keep if c in l.columns}
        for old, new in renames.items():
            r = r.withColumnRenamed(old, new)
        ot = renames.get(ot, ot)
        rk = [f"__rk_{i}" for i in range(len(other.keys))]
        for tmp, orig in zip(rk, other.keys):
            r = r.withColumnRenamed(orig, tmp)
        cond = (
            (F.col(ot) >= F.col(time_col) + F.expr(f"INTERVAL {lower}"))
            & (F.col(ot) <= F.col(time_col) + F.expr(f"INTERVAL {upper}")))
        for lc, tmp in zip(self.keys, rk):
            cond = cond & (F.col(lc) == F.col(tmp))
        return DataStream(l.join(r, cond).drop(*rk))

    def reduce_sum(self, col: str) -> DataStream:
        return self.aggregate(**{f"sum_{col}": f"sum({col})"})

    def count(self) -> DataStream:
        return self.aggregate(n="count(*)")

    def pattern(self, pat, time_col: str = "ts",
                tiebreak_col: str = "event_id",
                event_col: str = "event_type",
                chunked: bool = False,
                chunk_horizons: int = 4) -> DataStream:
        """CEP on the keyed stream [FLINK-API: o.a.f.cep.CEP.pattern
        (stream, pattern)]: compile a `cep.Pattern`
        (begin/next/followedBy/times/oneOrMore/notFollowedBy/within/
        noSkip) to this engine's oracle-backed sequence machines. On a
        BATCH input the pattern folds in codegen (one shuffle on the
        keys); on a STREAMING input it becomes the keyed-state NFA twin
        (applyInPandasWithState): update-mode running counts for the
        relaxed/mixed/strict families, timer-driven append rows for
        absence patterns (requires a withWatermark'd input). See cep.py
        for the supported families — uncompilable combinations raise
        NotImplementedError rather than answering wrong."""
        self._no_pending_window("pattern")
        from flink_tutorial_broadcast_spark.cep import (
            compile_pattern, compile_pattern_chunked,
            compile_pattern_stream,
        )
        if self.df.isStreaming:
            if chunked:
                raise ValueError("chunked=True is the BATCH escape "
                                 "hatch for huge per-key histories; "
                                 "streaming inputs already carry "
                                 "bounded state")
            return DataStream(compile_pattern_stream(
                pat, self.df, self.keys, time_col, tiebreak_col,
                event_col))
        if chunked:
            # exact horizon-aligned time-chunking (fork family only):
            # caps the fold buffer at per-(key, chunk) density instead
            # of the full per-key history — docs/scale.md §CEP
            return DataStream(compile_pattern_chunked(
                pat, self.df, self.keys, time_col, tiebreak_col,
                event_col, chunk_horizons=chunk_horizons))
        return DataStream(compile_pattern(
            pat, self.df, self.keys, time_col, tiebreak_col, event_col))

    def pattern_matches(self, pat, time_col: str = "ts",
                        tiebreak_col: str = "event_id",
                        event_col: str = "event_type") -> DataStream:
        """Match EXTRACTION [FLINK-API: PatternStream.select /
        MATCH_RECOGNIZE MEASURES]: one row per completed match with its
        bindings (per-key match number, anchoring and closing event
        ids, span in µs) instead of pattern()'s counts. Relaxed
        followed_by chains under skip-past-last (within() optional) AND
        under no_skip(), where one closing event may complete several
        overlapping matches. On a STREAMING input the keyed-state
        steppers carry the anchor bindings in state and APPEND one row
        per newly-completed match — the accumulated sink converges to
        the batch bindings even when a match spans micro-batches."""
        self._no_pending_window("pattern_matches")
        from flink_tutorial_broadcast_spark.cep import (
            compile_pattern_matches, compile_pattern_matches_stream,
        )
        if self.df.isStreaming:
            return DataStream(compile_pattern_matches_stream(
                pat, self.df, self.keys, time_col, tiebreak_col,
                event_col))
        return DataStream(compile_pattern_matches(
            pat, self.df, self.keys, time_col, tiebreak_col, event_col))

    def pattern_timeouts(self, pat, time_col: str = "ts",
                         tiebreak_col: str = "event_id",
                         event_col: str = "event_type") -> DataStream:
        """TIMED-OUT partial matches [FLINK-API: PatternStream.select(
        OutputTag, PatternTimeoutFunction, PatternSelectFunction) —
        the timeout side output] (r11): one row per partial match the
        within(d) horizon expired — (keys..., anchor_id,
        stages_matched, timeout_at_us). Batch emits every timed-out
        run (end-of-input partials included); a STREAMING input emits
        on event-observed expiry or watermark-passed deadlines
        (event-time timers — input must be withWatermark'd). Strict
        next() mismatches and mid-pattern not_followed_by vetoes
        discard silently, exactly Flink's NFA; only window expiry
        times out."""
        self._no_pending_window("pattern_timeouts")
        from flink_tutorial_broadcast_spark.cep import (
            compile_pattern_timeouts, compile_pattern_timeouts_stream,
        )
        if self.df.isStreaming:
            return DataStream(compile_pattern_timeouts_stream(
                pat, self.df, self.keys, time_col, tiebreak_col,
                event_col))
        return DataStream(compile_pattern_timeouts(
            pat, self.df, self.keys, time_col, tiebreak_col, event_col))

    def process(self, fn: Callable, output_schema: str) -> DataStream:
        """KeyedProcessFunction analogue: `fn(key_tuple, pandas_df) ->
        pandas_df` runs once per key group via applyInPandas — arbitrary
        per-key logic (custom folds, order-dependent state machines) on
        the Arrow slow path. Prefer `aggregate()` expressions when the
        logic is expressible; this exists for ports whose per-key code
        resists relational rewrite (the same rule udf_surface.py's
        grouped-map key documents: bucket hot keys if groups are tiny).
        """
        self._no_pending_window("process")
        return DataStream(
            self.df.groupBy(*self.keys).applyInPandas(fn, output_schema))

    def process_stateful(self, processor, output_schema: str,
                         output_mode: str = "Update",
                         time_mode: str = "None",
                         watermark: tuple[str, str] | None = None,
                         ) -> DataStream:
        """The FULL KeyedProcessFunction surface [FLINK-API:
        KeyedProcessFunction + ValueState/ListState/MapState + timers]:
        `processor` is a pyspark StatefulProcessor (getValueState /
        getMapState / registerTimer / handleExpiredTimer) run through
        the real `transformWithStateInPandas` on the RocksDB provider
        (the protoshim supplies the worker-side state protocol when the
        protobuf wheel is absent).

        On a STREAMING input: returns the transformed streaming
        DataStream — attach your own sink. On a BATCH input: the rows
        are replayed as one availableNow file stream and the converged
        emissions come back materialized (the streaming/jobs.py replay
        pattern), so one program body serves both modes.

        `time_mode`: "None" | "ProcessingTime" | "EventTime" — event
        time requires `watermark=(ts_col, delay)` so timers have a
        watermark to fire against.

        SESSION-WIDE CONF SIDE EFFECT (streaming inputs only):
        transformWithState runs only on the RocksDB state-store
        provider, and because the caller attaches the sink LATER the
        conf cannot be scoped to the query here — this method sets
        `spark.sql.streaming.stateStore.providerClass` session-wide
        and does NOT restore it (the batch path does). A later
        unrelated query in the same session resuming a checkpoint
        created under a different provider would fail on provider
        mismatch. The returned DataStream carries
        `restore_state_store_provider()` — call it once your query has
        STARTED (the conf is captured into the query at start) to put
        the previous session value back."""
        self._no_pending_window("process_stateful")
        from flink_tutorial_broadcast_spark.streaming.jobs import (
            _require_tws_protobuf, _run_to_memory,
        )
        spark = self.df.sparkSession
        _require_tws_protobuf(spark)

        def build(sdf: DataFrame) -> DataFrame:
            if watermark is not None:
                sdf = sdf.withWatermark(*watermark)
            return sdf.groupBy(*self.keys).transformWithStateInPandas(
                processor, outputStructType=output_schema,
                outputMode=output_mode, timeMode=time_mode,
            )

        if self.df.isStreaming:
            # transformWithState runs only on the RocksDB provider; the
            # caller's sink starts later, so the conf cannot be scoped
            # to the query here — set it session-wide at plan time (the
            # same provider every stateful job in this engine pins) and
            # hand the caller a restorer (see docstring)
            key_conf = "spark.sql.streaming.stateStore.providerClass"
            prev = spark.conf.get(key_conf, None)
            spark.conf.set(
                key_conf,
                "org.apache.spark.sql.execution.streaming.state."
                "RocksDBStateStoreProvider")
            out = DataStream(build(self.df))

            def restore() -> None:
                if prev is None:
                    spark.conf.unset(key_conf)
                else:
                    spark.conf.set(key_conf, prev)
            out.restore_state_store_provider = restore
            return out

        # batch input: replay through one bounded micro-batch stream
        tmp = tempfile.mkdtemp(prefix="ds_tws_")
        key_conf = "spark.sql.streaming.stateStore.providerClass"
        rocks = ("org.apache.spark.sql.execution.streaming.state."
                 "RocksDBStateStoreProvider")
        prev = spark.conf.get(key_conf, None)
        try:
            self.df.write.parquet(os.path.join(tmp, "replay"))
            sdf = (spark.readStream.schema(self.df.schema)
                   .parquet(os.path.join(tmp, "replay")))
            spark.conf.set(key_conf, rocks)
            # ProcessingTime mode must run Trigger.Once: availableNow
            # keeps scheduling empty batches indefinitely in that mode
            # (observed on Spark 4.1.2 — see jobs._run_to_memory)
            res = _run_to_memory(build(sdf), output_mode.lower(),
                                 once=(time_mode == "ProcessingTime"))
            res = res.cache()
            res.count()
            return DataStream(res)
        finally:
            if prev is None:
                spark.conf.unset(key_conf)
            else:
                spark.conf.set(key_conf, prev)
            shutil.rmtree(tmp, ignore_errors=True)
