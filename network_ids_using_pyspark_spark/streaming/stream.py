"""Structured Streaming layer (SURVEY.md §2.10).

The reference is purely batch; its only serving element is the Cassandra
dashboard sink.  Per the north star ("Structured Streaming + MLlib
classification") the engine adds the streaming path an IDS implies:
event-time watermarks, tumbling/sliding/session windows, stateful dedup,
and ``foreachBatch`` scoring into the predictions sink.

Testing approach (SURVEY.md §5.2 #5): streams are driven with
``trigger(availableNow=True)`` over the bounded ``events`` fixture and
compared to the *batch* expression of the same aggregation — which is
also what gives several streaming ops full DuckDB oracles.

Scale: all windowed aggs key their state by (window, group-key) — state
store size is O(open windows × keys), independent of input volume;
watermarks bound "open".  ``foreachBatch`` writes partition-parallel.
"""

from __future__ import annotations

import itertools
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MEMORY_SINK_IDS = itertools.count()

def _events_ts_encoding(sf_dir: str) -> tuple[T.DataType, "str | None"]:
    """Read the fixture's ``ts`` physical type from the parquet footer —
    the encodings have DRIFTED between driver rounds (TIMESTAMP(NANOS)
    vs TIMESTAMP(MICROS, utc=false); ADVICE r2 #3), and a streaming
    schema hardcoded to one of them breaks silently on the other.
    Returns (spark type for the stream schema, normalization tag)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    path = f"{sf_dir}/events.parquet"
    if os.path.isdir(path):
        path = next(
            os.path.join(path, f)
            for f in sorted(os.listdir(path))
            if f.endswith(".parquet")
        )
    ts_type = pq.read_schema(path).field("ts").type
    if not pa.types.is_timestamp(ts_type):
        raise ValueError(
            f"events.ts: expected a parquet timestamp, found {ts_type} — "
            "fixture encoding drifted further than the known variants"
        )
    # unit FIRST: the legacy nanosAsLong read surfaces TIMESTAMP(NANOS)
    # as long regardless of its tz annotation, so a tz-aware nanos
    # fixture must take the nanos path, not the tz one
    if ts_type.unit == "ns":
        return T.LongType(), "nanos"
    if ts_type.tz is not None:
        return T.TimestampType(), None
    return T.TimestampNTZType(), "ntz"


def events_stream_schema(ts_field: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_field),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


# Kafka wire timestamp format: micro-second precision, explicit on both
# the produce (to_json) and consume (from_json) sides so the round trip
# is value-exact — Spark's to_json default truncates to millis.
KAFKA_TS_FORMAT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def parse_kafka_events(raw: DataFrame) -> DataFrame:
    """Parse stage of the kafka seam, factored out so it can be
    integration-tested without a broker (VERDICT r5 ask #7): takes any
    frame with a Kafka-wire ``value`` column (binary or string JSON)
    and returns the events relation — shape-identical to the file
    path.  The real `format("kafka")` load and a file-backed twin
    (a text stream of the same wire messages) feed the IDENTICAL plan
    from here down; tests/test_streaming.py drives real rows through
    this stage and asserts byte-identical output vs the batch
    relation."""
    # ADVICE r6: external producers may emit ISO-8601 ('T'-separated)
    # timestamps instead of our micro-precision wire format; a single
    # from_json with a pinned timestampFormat silently NULLs those in
    # PERMISSIVE mode.  Parse the non-timestamp fields structurally,
    # then coalesce the pinned wire format with the SPECIFIC ISO-8601
    # variants being accepted.  ADVICE r7: the fallback is pinned, NOT
    # Spark's permissive default parse — a format-free try_to_timestamp
    # would accept date-only '2024-01-02' or region-ambiguous forms and
    # silently turn producer bugs into event times; anything outside
    # the two supported conventions NULLs and lands in the late/invalid
    # path instead of driving watermarks.
    wire_schema = events_stream_schema(T.StringType())
    parsed = raw.select(
        F.from_json(F.col("value").cast("string"), wire_schema).alias("e")
    ).select("e.*")
    ts = F.coalesce(
        F.try_to_timestamp(F.col("ts"), F.lit(KAFKA_TS_FORMAT)),
        # ISO-8601 with optional fractional seconds (millis or micros)
        F.try_to_timestamp(F.col("ts"), F.lit("yyyy-MM-dd'T'HH:mm:ss")),
        F.try_to_timestamp(F.col("ts"), F.lit("yyyy-MM-dd'T'HH:mm:ss.SSS")),
        F.try_to_timestamp(F.col("ts"), F.lit("yyyy-MM-dd'T'HH:mm:ss.SSSSSS")),
    )
    cols = [ts.alias("ts") if f == "ts" else f for f in parsed.columns]
    return parsed.select(*cols)


def _stream_table(reader, sf_dir: str, table: str) -> DataFrame:
    """File-stream a fixture table whether its parquet is laid out as a
    single FILE (the driver fixtures: ``sf_dir/events.parquet``) or a
    Spark-written DIRECTORY of part files (the 10x scale pair).  The
    old single code path — ``pathGlobFilter=events.parquet`` over
    ``sf_dir`` — matched leaf files only, so the directory layout
    silently streamed ZERO rows; pointing the source at the file
    directly instead fails ("Option 'basePath' must be a directory").
    Dispatch on the layout: directory → stream it as the path; file →
    the glob-filter form, which keeps basePath = sf_dir."""
    path = f"{sf_dir}/{table}.parquet"
    if os.path.isdir(path):
        return reader.parquet(path)
    return reader.option("pathGlobFilter", f"{table}.parquet").parquet(sf_dir)


def stream_events(
    spark: SparkSession,
    sf_dir: str,
    source: str = "files",
    kafka_options: dict[str, str] | None = None,
) -> DataFrame:
    """Engine op ``stream_flows``/``stream_events``: stream of the events
    relation, source-parameterized; every transformation downstream is
    source-agnostic.

    ``source='files'`` (default): file stream over the parquet fixture.
    The ``ts`` physical encoding is derived from the parquet footer
    (like the batch ``load_table``), then normalized to a UTC-instant
    TimestampType — session tz is pinned to UTC, so the cast is
    value-preserving; watermarks and ``window()`` require TimestampType.

    ``source='kafka'``: the production seam — ``format("kafka")`` with
    ``kafka_options`` (at minimum ``kafka.bootstrap.servers`` and
    ``subscribe``; defaults target topic ``events``), the JSON message
    value parsed through the SAME events schema, so the returned frame
    is shape-identical to the file path.  The kafka connector package
    is not in this sandbox, so the branch is dispatch-tested (Spark's
    source resolution is reached) but not integration-tested — same
    posture as the Cassandra sink format (sources/sinks.py)."""
    if source == "kafka":
        opts = {
            "kafka.bootstrap.servers": "localhost:9092",
            "subscribe": "events",
            "startingOffsets": "earliest",
            **(kafka_options or {}),
        }
        reader = spark.readStream.format("kafka")
        for k, v in opts.items():
            reader = reader.option(k, v)
        return parse_kafka_events(reader.load())
    if source != "files":
        raise ValueError(f"unknown stream source {source!r} (files|kafka)")
    ts_field, fix = _events_ts_encoding(sf_dir)
    if fix == "nanos":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = _stream_table(
        spark.readStream.schema(events_stream_schema(ts_field)), sf_dir, "events"
    )
    if fix == "nanos":
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    if fix == "ntz":
        return raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


DOCUMENTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def stream_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream of the documents fixture — the arriving-corpus
    shape of an incremental ingestion pipeline (each new crawl dump is a
    new file; the transformations are source-agnostic)."""
    return (
        _stream_table(
            spark.readStream.schema(DOCUMENTS_STREAM_SCHEMA), sf_dir, "documents"
        )
    )


_ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
_HASHMAP_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
)
_STATE_STORE_CONF = "spark.sql.streaming.stateStore.providerClass"


class _state_store_scope:
    """Scope the state-store provider to one stream's lifetime.

    ``state_store``: None/'' → leave the session default;
    ``"hashmap"`` → explicitly pin the in-memory HDFS-backed HashMap
    provider; ``"rocksdb"`` → Spark's bundled RocksDB provider, which
    keeps state off-heap and spills to local disk.  The 100 TB escalation rule (same ladder as the dedup
    ``storage_level``/``spill_path`` knobs): in-memory state is faster
    while keyspace × watermark-horizon fits the executor heaps; beyond
    that — measured at the r9 100× point, where 20 M dedup keys OOMed
    an 8 GB single-JVM heap — RocksDB is the provider that survives.
    Results are provider-independent (state-store choice is physical).
    Env override ``NIDS_STREAM_STATE_STORE=rocksdb`` flips every engine
    stream without touching query code (how the scaling harness runs)."""

    def __init__(self, spark: SparkSession, state_store: "str | None"):
        self.spark = spark
        requested = state_store or os.environ.get("NIDS_STREAM_STATE_STORE")
        # Reject unknown values instead of silently falling back to the
        # in-memory provider (ADVICE r9: a typo'd
        # NIDS_STREAM_STATE_STORE would let a scaling run believe it
        # exercised RocksDB while measuring the HashMap provider).
        if requested not in (None, "", "hashmap", "rocksdb"):
            raise ValueError(
                f"unknown state_store {requested!r}: expected 'rocksdb', "
                "'hashmap', or None/'' for the session default"
            )
        # An EXPLICIT 'hashmap' pins the HDFS-backed HashMap provider
        # class (ADVICE r10): mapping it to the session default would
        # silently measure whatever the session is configured with —
        # the same mislabeling class the r9 typo-rejection closed.
        # Only None/'' means "session default".
        if requested == "rocksdb":
            self.target: "str | None" = _ROCKSDB_PROVIDER
        elif requested == "hashmap":
            self.target = _HASHMAP_PROVIDER
        else:
            self.target = None
        self.prev: "str | None" = None

    def __enter__(self):
        if self.target is not None:
            try:
                self.prev = self.spark.conf.get(_STATE_STORE_CONF)
            except Exception:
                self.prev = None
            self.spark.conf.set(_STATE_STORE_CONF, self.target)
        return self

    def __exit__(self, *exc):
        if self.target is not None:
            if self.prev is None:
                self.spark.conf.unset(_STATE_STORE_CONF)
            else:
                self.spark.conf.set(_STATE_STORE_CONF, self.prev)
        return False


def run_to_memory(
    df: DataFrame,
    output_mode: str,
    prefix: str = "nids_stream",
    state_partitions: int = 8,
    state_store: "str | None" = None,
) -> DataFrame:
    """Drive a (bounded) streaming frame to completion into a memory sink
    with ``availableNow`` and return the result table.  Unique sink name
    per call so reruns in one session never collide.

    ``state_partitions`` scopes ``spark.sql.shuffle.partitions`` for the
    stream's lifetime: stateful operators keep one state store per
    shuffle partition, and store setup/commit is per-partition per-batch
    overhead — so state parallelism should track state *size*, not the
    batch session's scan parallelism.  (On a real cluster this is the
    knob you size to keyspace; results are partition-count-independent
    by the engine's determinism rules.)"""
    spark = df.sparkSession
    name = f"{prefix}_{next(_MEMORY_SINK_IDS)}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        with _state_store_scope(spark, state_store):
            q = (
                df.writeStream.format("memory")
                .queryName(name)
                .outputMode(output_mode)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return df.sparkSession.table(name)


def run_folded_agg(
    df: DataFrame,
    exprs: list,
    prefix: str = "nids_aggsink",
    state_partitions: int = 8,
    state_store: "str | None" = None,
) -> DataFrame:
    """Drive a bounded streaming frame to completion with ``availableNow``,
    folding sum-decomposable aggregates (COUNT / SUM) at the sink: each
    micro-batch computes its aggregate row cluster-side inside
    ``foreachBatch`` and only that k-scalar row reaches the driver, which
    folds rows by summation.  The streamed relation itself — e.g. a
    stream-stream join's pair set — is NEVER materialized on the driver.

    This replaces the memory-sink + post-agg pattern for unbounded-output
    operators: a memory sink collects every emitted row into driver
    memory, which at 100 TB (or under planted key skew, where the hot
    key's pair count grows quadratically with density) is the bottleneck
    long before the join itself.  Returns a 1-row DataFrame with the
    summed aggregates, NULL-batches ignored (an empty micro-batch
    contributes count 0 / sum NULL)."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    batch_rows: list = []
    schema_holder: list = []

    def _fold(batch: DataFrame, _batch_id: int) -> None:
        agg = batch.agg(*exprs)
        if not schema_holder:
            schema_holder.append(agg.schema)
        batch_rows.append(agg.first())

    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        with _state_store_scope(spark, state_store):
            q = (
                df.writeStream.foreachBatch(_fold)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    if not schema_holder:
        # zero micro-batches: derive the neutral element from an empty
        # batch-mode frame with the stream's schema
        empty = spark.createDataFrame([], df.schema).agg(*exprs)
        schema_holder.append(empty.schema)
        batch_rows.append(empty.first())
    schema = schema_holder[0]
    folded = []
    for name in schema.fieldNames():
        vals = [r[name] for r in batch_rows if r[name] is not None]
        folded.append(sum(vals) if vals else None)
    return spark.createDataFrame([tuple(folded)], schema)


class LateDataMetricsListener:
    """SURVEY.md §2.10 "late-data policy — metrics via
    StreamingQueryListener": accumulates the rows each stateful operator
    silently DISCARDED for arriving beyond the watermark
    (``numRowsDroppedByWatermark`` in every progress event).

    Discard behavior itself is tested separately; this is the
    *observability* half — at scale, a late-drop spike is the alarm for
    upstream clock skew or ingestion lag, and this listener is the hook
    a monitoring system polls.  Listener callbacks run on Spark's
    listener-bus thread and are delivered asynchronously — call
    :meth:`wait_for_progress` before reading totals.
    """

    def __init__(self) -> None:
        self.dropped_by_query: dict[str, int] = {}
        self.progress_events = 0

    # StreamingQueryListener interface ------------------------------
    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        dropped = 0
        for op in p.stateOperators:
            dropped += int(getattr(op, "numRowsDroppedByWatermark", 0) or 0)
        qid = str(p.id)
        self.dropped_by_query[qid] = self.dropped_by_query.get(qid, 0) + dropped
        self.progress_events += 1

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    # engine-facing surface -----------------------------------------
    def total_dropped(self) -> int:
        return sum(self.dropped_by_query.values())

    def wait_for_progress(self, n_events: int, timeout_sec: float = 30.0) -> bool:
        """Block until ≥ n_events progress events arrived (async bus)."""
        import time

        deadline = time.monotonic() + timeout_sec
        while time.monotonic() < deadline:
            if self.progress_events >= n_events:
                return True
            time.sleep(0.1)
        return self.progress_events >= n_events


def attach_late_data_metrics(spark: SparkSession) -> LateDataMetricsListener:
    """Register a :class:`LateDataMetricsListener` on the session's
    streaming listener bus and return it.  Caller owns removal
    (``spark.streams.removeListener``)."""
    from pyspark.sql.streaming import StreamingQueryListener

    # build the concrete subclass lazily so importing this module never
    # requires the streaming listener machinery (pure-batch users);
    # mixin FIRST so its concrete onQuery* resolve ahead of the ABC's
    # abstract declarations
    class _Listener(LateDataMetricsListener, StreamingQueryListener):
        def __init__(self) -> None:
            StreamingQueryListener.__init__(self)
            LateDataMetricsListener.__init__(self)

    listener = _Listener()
    spark.streams.addListener(listener)
    return listener


def cdc_latest_state(events: DataFrame) -> DataFrame:
    """Streaming CDC compaction: the changelog stream folds into
    current-state with a ``max_by`` aggregate keyed on the entity id —
    the state store holds exactly ONE struct per key (no window, no
    sort), so state size is O(distinct keys) regardless of stream
    volume.  'error' rows are tombstones: they win the argmax like any
    mutation, then drop out of the emitted state.  Complete-mode output
    IS the compacted table — bit-identical to the batch
    ``cdc_apply_latest`` compaction (same oracle certifies both)."""
    latest = events.groupBy("user_id").agg(
        F.max_by(
            F.struct("event_type", "value", "ts"),
            F.struct("ts", "event_id"),
        ).alias("last")
    )
    return latest.filter(F.col("last.event_type") != "error").select(
        "user_id",
        F.col("last.event_type").alias("last_event_type"),
        F.col("last.value").alias("last_value"),
        F.col("last.ts").alias("last_ts"),
    )


def tumbling_counts(events: DataFrame, duration: str = "1 hour") -> DataFrame:
    """Tumbling event-time window counts per event_type."""
    return (
        events.groupBy(F.window("ts", duration), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
        )
    )


def sliding_counts(
    events: DataFrame, duration: str = "2 hours", slide: str = "1 hour"
) -> DataFrame:
    """Sliding (overlapping) windows — each event lands in
    duration/slide windows."""
    return (
        events.groupBy(F.window("ts", duration, slide), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("window_start"), "event_type", "n")
    )


def session_stats(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Gap-based session windows per user — the streaming twin of
    ``operators.windowed.sessionize`` (same 30-min gap semantics)."""
    return (
        events.groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.min("ts").alias("t_start"))
        .select("user_id", F.col("session_window.start").alias("session_start"), "n_events")
    )


def stream_dedup(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Stateful streaming dedup on event_id within a watermark —
    ``dropDuplicatesWithinWatermark`` keeps state only ``watermark`` long,
    so state is bounded at any input volume."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def score_to_sink(
    events: DataFrame, model, sink_path: str, checkpoint: str
) -> "StreamingQuery":
    """Engine op replacing the reference's Cassandra serving loop
    (``spark_to_cassandra.py:24-30``): score each micro-batch with a
    fitted MLlib model and append to the predictions sink — executor-
    parallel, exactly-once via the checkpoint, no driver loop."""
    from ..sources.sinks import sink_predictions

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        preds = model.transform(batch_df)
        out = preds.select(
            F.col("event_id").alias("vals"),
            F.col("prediction").cast("int").alias("prediction"),
        )
        sink_predictions(out, sink_path, mode="append")

    return (
        events.writeStream.foreachBatch(_write)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
