"""DataStream-style fluent API over DataFrames (SURVEY.md §2.10).

Reference parity — flink-streaming-java DataStream.java /
KeyedStream.java surface, mapped onto the DataFrame API so every call
stays inside Catalyst (declarative, optimizable) instead of opaque
lambdas wherever possible:

- DataStream.java: map:597, flatMap:642, filter:733, process:683,
  keyBy:296, union:230, broadcast:441, shuffle:471, rebalance:491,
  rescale:514, global:526, partitionCustom:378, join:768, coGroup:760,
  print:978, writeAsText:1050, writeAsCsv:1093.
- KeyedStream.java: reduce:769, sum:794, min:823, max:866, minBy:915,
  maxBy:940, process:336, intervalJoin:458, window:750, countWindow:720.

Design notes:
- ``map``/``filter`` accept Column expressions (preferred — stays in
  codegen) or Python callables (escape hatch — Arrow-batched
  ``mapInPandas``, the documented slow path).
- Physical-partitioning calls (shuffle/rebalance/rescale/broadcast)
  translate to ``repartition``/broadcast hints; Spark's shuffle service
  owns the actual movement.
- ``iterate`` (DataStream.java:553) — Flink feeds records back to the
  iteration head until the feedback edge is quiet for maxWaitTime. The
  Spark mapping is a driver-coordinated superstep loop
  (``DataStream.iterate``): step_fn(stream) → (feedback, output);
  feedback re-enters the head, outputs accumulate, loop ends when
  feedback is empty (the batch analog of "no data received in the set
  time") or at max_iterations. Lineage is truncated per superstep via
  localCheckpoint so 100-iteration loops don't build 100-deep plans.
  Asynchronous per-record feedback (no superstep barrier) is the one
  part with no Spark equivalent — documented.
"""

from __future__ import annotations

from typing import Callable, Iterable

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class DataStream:
    def __init__(self, df: DataFrame):
        self.df = df

    # ---- transforms ----

    def map(self, fn, schema=None) -> "DataStream":
        """Column-expr dict → select (codegen'd); callable → mapInPandas."""
        if isinstance(fn, dict):
            return DataStream(self.df.select(*[c.alias(n) for n, c in fn.items()]))

        def gen(it: Iterable[pd.DataFrame]):
            for pdf in it:
                yield pd.DataFrame([fn(r) for r in pdf.to_dict("records")])

        return DataStream(self.df.mapInPandas(gen, schema))

    def flat_map(self, fn: Callable, schema) -> "DataStream":
        def gen(it: Iterable[pd.DataFrame]):
            for pdf in it:
                out = [o for r in pdf.to_dict("records") for o in fn(r)]
                yield pd.DataFrame(out)

        return DataStream(self.df.mapInPandas(gen, schema))

    def filter(self, pred) -> "DataStream":
        return DataStream(self.df.where(pred))

    def process(self, fn: Callable, schema) -> "DataStream":
        """ProcessFunction analog: per-partition iterator over rows,
        emitting any number of rows (mapInPandas, Arrow-batched)."""

        def gen(it: Iterable[pd.DataFrame]):
            for pdf in it:
                out = [o for r in pdf.to_dict("records") for o in fn(r)]
                yield pd.DataFrame(out)

        return DataStream(self.df.mapInPandas(gen, schema))

    def async_io(
        self,
        fn: Callable,
        schema,
        capacity: int = 16,
        ordered: bool = True,
        timeout_s: float | None = None,
    ) -> "DataStream":
        """AsyncDataStream.[un]orderedWait parity (DS/api/datastream/
        AsyncDataStream.java; AsyncWaitOperator.java:91): ``fn(row) ->
        result row dict`` runs on a thread pool of ``capacity`` workers
        per Arrow batch — the per-partition analog of the operator's
        in-flight-request capacity. ``ordered=True`` preserves row
        order within the batch (orderedWait); False yields completion
        order (unorderedWait). ``timeout_s`` times out each request
        relative to its submission; all of a batch's requests submit
        together, so this is a shared deadline ``timeout_s`` after batch
        submission — a request still pending then raises TimeoutError
        like the reference's TimeoutException default (AsyncWaitOperator
        arms its timer per element the same way; a hung ``fn`` thread
        cannot be killed and will still pin pool shutdown — CPython
        thread semantics).

        This is the documented Spark mapping for Flink async I/O
        (SURVEY.md: external calls are batched per partition, never one
        event loop per record): the thread pool amortizes I/O latency
        across the batch while the cluster-side parallelism story stays
        partition-count × capacity."""
        from concurrent.futures import ThreadPoolExecutor

        def gen(it: Iterable[pd.DataFrame]):
            with ThreadPoolExecutor(max_workers=capacity) as pool:
                for pdf in it:
                    rows = pdf.to_dict("records")
                    if ordered:
                        results = list(pool.map(fn, rows, timeout=timeout_s))
                    else:
                        from concurrent.futures import as_completed

                        futs = [pool.submit(fn, r) for r in rows]
                        # timeout on as_completed itself: futures it has
                        # already yielded are complete, so a per-future
                        # f.result(timeout) can never fire — the r2
                        # ADVICE hang was a pending future blocking
                        # as_completed with no deadline
                        results = [
                            f.result() for f in as_completed(futs, timeout=timeout_s)
                        ]
                    yield pd.DataFrame(results)

        return DataStream(self.df.mapInPandas(gen, schema))

    def key_by(self, *keys: str) -> "KeyedStream":
        return KeyedStream(self.df, list(keys))

    def connect(self, other: "DataStream") -> "ConnectedStreams":
        """connect (DataStream.java:257): pair two differently-typed
        streams for CoMap/CoFlatMap/CoProcess processing."""
        return ConnectedStreams(self, other)

    def connect_broadcast(
        self, control: "DataStream", fn: Callable, schema
    ) -> "DataStream":
        """Broadcast state pattern (CoBroadcastWithKeyedOperator.java:64):
        every task sees the full (small) control stream alongside its
        slice of the data stream. ``fn(pdf, control_pdf) -> pdf``.

        Spark mapping: the control side is collected and shipped as a
        broadcast variable into an Arrow-batched ``mapInPandas`` — the
        same full-replication Flink's broadcast state performs, so the
        control stream must be small by contract (rule/config streams).
        The data side is never collected and scales to any size.
        """
        spark = self.df.sparkSession
        control_rows = control.df.toPandas()
        bc = spark.sparkContext.broadcast(control_rows)

        def gen(it: Iterable[pd.DataFrame]):
            ctl = bc.value
            for pdf in it:
                out = fn(pdf, ctl)
                if out is not None and len(out):
                    yield out

        return DataStream(self.df.mapInPandas(gen, schema))

    def process_with_side_outputs(
        self, fn: Callable, schema, tags: list[str]
    ) -> dict[str, "DataStream"]:
        """Side outputs (OutputTag, ProcessFunction.Context#output):
        ``fn(row) -> iterable[(tag, row_dict)]`` routes each emitted row
        to one named output; returns ``{tag: DataStream}`` (plus
        ``"main"``). One shared pass produces a tagged frame (persisted
        so each output's filter does not recompute the pass), then each
        tag is a codegen'd filter — the Spark analog of Flink's
        side-output edges."""

        if isinstance(schema, str):
            tagged = f"__tag string, {schema}"
        else:
            from pyspark.sql.types import StringType, StructField, StructType

            tagged = StructType([StructField("__tag", StringType())] + list(schema.fields))

        def gen(it: Iterable[pd.DataFrame]):
            for pdf in it:
                rows = []
                for r in pdf.to_dict("records"):
                    for tag, out in fn(r):
                        rows.append({"__tag": tag, **out})
                if rows:
                    yield pd.DataFrame(rows)

        all_df = self.df.mapInPandas(gen, tagged).persist()
        return {
            t: DataStream(all_df.where(F.col("__tag") == t).drop("__tag"))
            for t in ["main", *tags]
        }

    def union(self, *others: "DataStream") -> "DataStream":
        out = self.df
        for o in others:
            out = out.unionByName(o.df)
        return DataStream(out)

    # ---- physical partitioning (DataStream.java:441-526) ----

    def broadcast(self) -> "DataStream":
        return DataStream(F.broadcast(self.df))

    def shuffle(self) -> "DataStream":
        return DataStream(self.df.repartition(self.df.sparkSession.sparkContext.defaultParallelism))

    def rebalance(self) -> "DataStream":
        return self.shuffle()  # round-robin redistribute ≈ repartition()

    def rescale(self) -> "DataStream":
        return DataStream(self.df.coalesce(self.df.rdd.getNumPartitions() or 1))

    def global_(self) -> "DataStream":
        return DataStream(self.df.coalesce(1))

    def partition_custom(self, *exprs) -> "DataStream":
        return DataStream(self.df.repartition(*exprs))

    # ---- joins ----

    def window_all(self, ts: str, size: str, slide: str | None = None) -> "WindowedKeyedStream":
        """windowAll (DataStream.java:871): non-keyed time windows —
        every row lands in the global per-window group. Flink warns
        this forces parallelism 1; the Spark plan has the same shape (a
        single group per window) but the partial aggregation still
        folds map-side, so only window-grain partials move."""
        return WindowedKeyedStream(self.df, [], F.window(ts, size, slide))

    def join(self, other: "DataStream", on, how: str = "inner") -> "DataStream":
        return DataStream(self.df.join(other.df, on, how))

    def co_group(
        self, other: "DataStream", left_keys: list[str], right_keys: list[str], fn, schema
    ) -> "DataStream":
        """coGroup (DataStream.java:760): full outer groups per key →
        ``cogroup.applyInPandas`` — both sides' rows for a key handed to
        one function, the exact CoGroupFunction contract."""

        def apply(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
            return fn(lpdf, rpdf)

        return DataStream(
            self.df.groupBy(*left_keys)
            .cogroup(other.df.groupBy(*right_keys))
            .applyInPandas(apply, schema)
        )

    # ---- sinks (DataStream.java:978-1093) ----

    def iterate(
        self,
        step: Callable[["DataStream"], tuple["DataStream", "DataStream"]],
        max_iterations: int = 100,
    ) -> "DataStream":
        """Bounded iteration — DataStream.iterate (DataStream.java:553)
        + IterativeStream.closeWith. ``step`` receives the current head
        and returns ``(feedback, output)``: feedback rows re-enter the
        head next superstep, output rows accumulate into the result.
        Terminates when feedback is empty (batch analog of the feedback
        edge going quiet, DataStream.java:582 maxWaitTimeMillis) or
        after ``max_iterations``.

        Scale: each superstep is a full distributed job; the feedback
        frame is localCheckpoint-ed so the plan stays O(1) deep and the
        emptiness probe doesn't recompute the whole loop history.
        """
        head = self.df
        outputs: list[DataFrame] = []
        for _ in range(max_iterations):
            fb, out = step(DataStream(head))
            outputs.append(out.df)
            head = fb.df.localCheckpoint(eager=True)
            if not head.take(1):
                break
        result = outputs[0]
        for o in outputs[1:]:
            result = result.unionByName(o)
        return DataStream(result)

    def print(self, n: int = 20) -> None:
        self.df.show(n)

    def write_as_text(self, path: str) -> None:
        self.df.select(F.to_json(F.struct(*self.df.columns)).alias("value")).write.mode(
            "overwrite"
        ).text(path)

    def write_as_csv(self, path: str) -> None:
        self.df.write.mode("overwrite").option("header", True).csv(path)


class ConnectedStreams:
    """CoMap/CoFlatMap/CoProcess over two connected streams
    (ConnectedStreams.java; operator CoProcessOperator). Spark mapping:
    tag each side, union by name with missing columns nulled, process
    the tagged frame — one shuffle-free pass; keyed variant groups both
    sides' rows per key into one call (CoGroup-style state sharing)."""

    def __init__(self, first: DataStream, second: DataStream):
        self.first, self.second = first, second

    def _tagged(self) -> DataFrame:
        l = self.first.df.withColumn("__side", F.lit(1))
        r = self.second.df.withColumn("__side", F.lit(2))
        return l.unionByName(r, allowMissingColumns=True)

    def co_map(self, fn1: Callable, fn2: Callable, schema) -> DataStream:
        def gen(it: Iterable[pd.DataFrame]):
            for pdf in it:
                out = [
                    (fn1 if r["__side"] == 1 else fn2)(r)
                    for r in pdf.to_dict("records")
                ]
                if out:
                    yield pd.DataFrame(out)

        return DataStream(self._tagged().mapInPandas(gen, schema))

    def co_flat_map(self, fn1: Callable, fn2: Callable, schema) -> DataStream:
        def gen(it: Iterable[pd.DataFrame]):
            for pdf in it:
                out = [
                    o
                    for r in pdf.to_dict("records")
                    for o in (fn1 if r["__side"] == 1 else fn2)(r)
                ]
                if out:
                    yield pd.DataFrame(out)

        return DataStream(self._tagged().mapInPandas(gen, schema))

    def keyed_co_process(
        self, keys: tuple[str, str], fn: Callable, schema
    ) -> DataStream:
        """CoProcessFunction with shared per-key state: ``fn(key_pdf1,
        key_pdf2) -> pdf`` receives both sides' rows for one key (the
        two keyed states Flink would hand the operator)."""
        k1, k2 = keys

        def apply(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
            return fn(lpdf, rpdf)

        return DataStream(
            self.first.df.groupBy(k1)
            .cogroup(self.second.df.groupBy(k2))
            .applyInPandas(apply, schema)
        )


class KeyedStream(DataStream):
    def __init__(self, df: DataFrame, keys: list[str]):
        super().__init__(df)
        self.keys = keys

    def reduce(self, fn: Callable, schema) -> "DataStream":
        """ReduceFunction (KeyedStream.java:769): left-fold rows per key."""

        def apply(pdf: pd.DataFrame) -> pd.DataFrame:
            rows = pdf.to_dict("records")
            acc = rows[0]
            for r in rows[1:]:
                acc = fn(acc, r)
            return pd.DataFrame([acc])

        return DataStream(self.df.groupBy(*self.keys).applyInPandas(apply, schema))

    def _agg(self, col: str, aggfn) -> "DataStream":
        others = [c for c in self.df.columns if c not in self.keys and c != col]
        return DataStream(
            self.df.groupBy(*self.keys).agg(
                aggfn(col).alias(col), *[F.first(c).alias(c) for c in others]
            )
        )

    def sum(self, col: str) -> "DataStream":
        return self._agg(col, F.sum)

    def min(self, col: str) -> "DataStream":
        return self._agg(col, F.min)

    def max(self, col: str) -> "DataStream":
        return self._agg(col, F.max)

    def _by(self, col: str, asc: bool) -> "DataStream":
        """minBy/maxBy (KeyedStream.java:915,940): whole row holding the
        extreme value — max_by/min_by keeps it one shuffle, no window."""
        fn = F.min_by if asc else F.max_by
        others = [c for c in self.df.columns if c not in self.keys]
        return DataStream(
            self.df.groupBy(*self.keys).agg(
                *[fn(c, F.col(col)).alias(c) for c in others]
            )
        )

    def min_by(self, col: str) -> "DataStream":
        return self._by(col, asc=True)

    def max_by(self, col: str) -> "DataStream":
        return self._by(col, asc=False)

    def flat_aggregate(
        self, create_acc: Callable, accumulate: Callable, emit_value: Callable, schema
    ) -> "DataStream":
        """TableAggregateFunction / flatAggregate parity
        (flink-table/flink-table-common/.../functions/
        TableAggregateFunction.java — accumulator-based aggregate that
        EMITS MULTIPLE ROWS per group, e.g. the canonical Top2):
        ``create_acc() -> acc``, ``accumulate(acc, row)``,
        ``emit_value(acc) -> iterable[row_dict]`` (without the key
        columns — they are prepended). One shuffle on the key,
        Arrow-batched per-key fold."""
        keys = self.keys

        def apply(pdf: pd.DataFrame) -> pd.DataFrame:
            acc = create_acc()
            for r in pdf.to_dict("records"):
                accumulate(acc, r)
            head = {k: pdf.iloc[0][k] for k in keys}
            return pd.DataFrame([{**head, **o} for o in emit_value(acc)])

        return DataStream(self.df.groupBy(*keys).applyInPandas(apply, schema))

    def window(self, ts: str, size: str, slide: str | None = None) -> "WindowedKeyedStream":
        return WindowedKeyedStream(self.df, self.keys, F.window(ts, size, slide))

    def count_window(self, size: int) -> "WindowedKeyedStream":
        """countWindow (KeyedStream.java:720): fixed-count tumbling per
        key — window id = row_number() div size (one extra window calc,
        still a single shuffle)."""
        from pyspark.sql import Window as W

        w = F.row_number().over(
            W.partitionBy(*self.keys).orderBy(F.monotonically_increasing_id())
        )
        df = self.df.withColumn("__win", ((w - 1) / size).cast("bigint"))
        return WindowedKeyedStream(df, self.keys, F.col("__win"))

    def interval_join(
        self, other: "KeyedStream", time_cols: tuple[str, str], lower: str, upper: str
    ) -> "DataStream":
        """intervalJoin (KeyedStream.java:458) — delegates to the
        streaming interval join (works identically on batch frames)."""
        from flink_1_16_0_src_spark.streaming.joins import interval_join as ij

        return DataStream(
            ij(self.df, other.df, (self.keys[0], other.keys[0]), time_cols, lower, upper)
        )

    def process(self, fn: Callable, schema) -> "DataStream":
        """KeyedProcessFunction analog: all rows of one key to one call
        (applyInPandas). For streaming state/timers use
        streaming.stateful ops instead."""

        def apply(pdf: pd.DataFrame) -> pd.DataFrame:
            return fn(pdf)

        return DataStream(self.df.groupBy(*self.keys).applyInPandas(apply, schema))


class WindowedKeyedStream:
    def __init__(self, df: DataFrame, keys: list[str], window_col: Column):
        self.df, self.keys, self.window_col = df, keys, window_col

    def aggregate(self, *aggs: Column) -> DataStream:
        return DataStream(
            self.df.groupBy(self.window_col.alias("window"), *self.keys).agg(*aggs)
        )

    def reduce(self, fn: Callable, schema) -> DataStream:
        def apply(pdf: pd.DataFrame) -> pd.DataFrame:
            rows = pdf.to_dict("records")
            acc = rows[0]
            for r in rows[1:]:
                acc = fn(acc, r)
            return pd.DataFrame([acc])

        return DataStream(
            self.df.withColumn("__w", self.window_col)
            .groupBy("__w", *self.keys)
            .applyInPandas(apply, schema)
        )
