"""Custom binary record-log format via the Python DataSource API
(Spark 4, ``pyspark.sql.datasource``).

LLM-scale corpora arrive in record-framed binary containers Spark has
no built-in reader for (WARC crawl dumps, TFRecord shards, custom
archive formats).  This module implements the pattern end to end on a
minimal framing — ``recordlog``: a file is a sequence of
``[8-byte big-endian length][payload]`` records — so the engine has a
first-class example of:

* a registered format (``spark.read.format("recordlog")``) with a
  fixed schema ``(file, record_idx, payload)``;
* partition planning = one input partition per shard file (the same
  unit real WARC/TFRecord readers parallelize on — records are not
  seekable mid-file, files are);
* executor-side record iteration (the reader yields tuples lazily —
  no file is ever materialized whole);
* an executor-parallel WRITER (``write_recordlog`` via
  ``foreachPartition``) producing one shard per partition.

At 100 TB: shard count ≫ executor count is the only tuning knob, same
as any file source; payload decoding composes with the multimodal
operators (``operators/multimodal.py``) which already treat content as
opaque binary + typed metadata.
"""

from __future__ import annotations

import glob as _glob
import os
import struct
from collections.abc import Iterator, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

_LEN = struct.Struct(">q")  # 8-byte big-endian record length


def write_records(path: str, payloads: Iterator[bytes]) -> int:
    """Write one record-log shard; returns the record count."""
    n = 0
    with open(path, "wb") as f:
        for p in payloads:
            f.write(_LEN.pack(len(p)))
            f.write(p)
            n += 1
    return n


def read_records(path: str) -> Iterator[bytes]:
    """Iterate one shard's payloads lazily (never whole-file)."""
    with open(path, "rb") as f:
        while True:
            head = f.read(_LEN.size)
            if not head:
                return
            (ln,) = _LEN.unpack(head)
            payload = f.read(ln)
            if len(payload) != ln:
                raise IOError(f"truncated record in {path}")
            yield payload


class _ShardPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class RecordLogReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("recordlog requires a path")

    def partitions(self) -> Sequence[InputPartition]:
        # one partition per shard — records are length-prefixed (not
        # seekable mid-file), so the file is the parallelism unit
        files = sorted(_glob.glob(os.path.join(self.path, "*.rec")))
        if not files:
            raise FileNotFoundError(f"no *.rec shards under {self.path}")
        return [_ShardPartition(p) for p in files]

    def read(self, partition: _ShardPartition):
        fname = os.path.basename(partition.path)
        for idx, payload in enumerate(read_records(partition.path)):
            yield (fname, idx, payload)


class RecordLogStreamReader(DataSourceStreamReader):
    """STREAMING reader for the same container (Spark 4 Python
    DataSource streaming API): the shard directory is treated as an
    append-only log (exactly how crawl dumps arrive), and the offset is
    simply the count of shards consumed from the sorted listing.

    Offsets are committed through the engine checkpoint, so a restarted
    query resumes at the first unconsumed shard — exactly-once per
    shard with no source-side state beyond the directory listing.
    Late-created files sort anywhere, so production shard names should
    be monotonic (timestamps/sequence ids), the standard contract for
    file-log ingestion."""

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("recordlog requires a path")

    def _files(self) -> list[str]:
        return sorted(_glob.glob(os.path.join(self.path, "*.rec")))

    def initialOffset(self) -> dict:
        return {"n": 0}

    def latestOffset(self) -> dict:
        return {"n": len(self._files())}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        return [_ShardPartition(p) for p in self._files()[start["n"]:end["n"]]]

    def read(self, partition: _ShardPartition):
        fname = os.path.basename(partition.path)
        for idx, payload in enumerate(read_records(partition.path)):
            yield (fname, idx, payload)

    def commit(self, end: dict) -> None:
        pass  # offsets live in the query checkpoint; nothing source-side


class _ShardCommit(WriterCommitMessage):
    def __init__(self, shard: str, n: int):
        self.shard = shard
        self.n = n


def _stage_shard(path: str, iterator) -> _ShardCommit:
    """Shared write-side staging for the batch AND streaming writers:
    records land in a dot-prefixed temp name (invisible to the *.rec
    globs) until the driver's commit renames them into visibility."""
    import uuid

    os.makedirs(path, exist_ok=True)
    staged = os.path.join(path, f".staged-{uuid.uuid4().hex[:12]}.tmp")
    n = write_records(staged, (row["payload"] for row in iterator))
    return _ShardCommit(staged, n)


def _remove_staged(messages) -> None:
    for m in messages:
        if m is not None and os.path.exists(m.shard):
            os.remove(m.shard)


class RecordLogWriter(DataSourceWriter):
    """Batch WRITER through the DataSource API (the fourth quadrant
    next to batch/stream read and the helper writer): one shard per
    DataFrame partition, written executor-side to a staging name, with
    the commit/abort protocol making the job atomic — ``commit``
    renames every staged shard into visibility (monotonic names, same
    contract the stream reader requires) and ``abort`` removes them, so
    readers never observe a half-written job.

    Input schema contract: any frame with a binary ``payload``
    column."""

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("recordlog requires a path")

    def write(self, iterator) -> _ShardCommit:
        return _stage_shard(self.path, iterator)

    def commit(self, messages) -> None:
        import time
        import uuid

        for m in messages:
            if m is None or m.n == 0:
                if m is not None:
                    os.remove(m.shard)
                continue
            final = os.path.join(
                self.path,
                f"part-{time.time_ns():020d}-{uuid.uuid4().hex[:8]}.rec",
            )
            os.rename(m.shard, final)

    def abort(self, messages) -> None:
        _remove_staged(messages)


class RecordLogStreamWriter(DataSourceStreamWriter):
    """STREAMING writer — the last quadrant of the custom-connector
    matrix (batch read / stream read / batch write are above).  Each
    micro-batch stages one shard per partition executor-side, and
    ``commit(messages, batchId)`` renames them into visibility under a
    ``batch-{batchId}-{seq}.rec`` name.

    Exactly-once: after a crash between sink-commit and checkpoint-
    commit, Structured Streaming REPLAYS the last batch with the same
    batchId — commit detects the already-visible ``batch-{batchId}-*``
    shards and discards the staged duplicates, so replays are no-ops.
    Batch ids are monotonically increasing, so the zero-padded prefix
    keeps shard names sorted in append order — the exact contract the
    stream READER's offset-into-sorted-listing requires; the written
    log is therefore itself streamable."""

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("recordlog requires a path")

    def write(self, iterator) -> _ShardCommit:
        return _stage_shard(self.path, iterator)

    def commit(self, messages, batchId: int) -> None:  # noqa: N803 (Spark API)
        for seq, m in enumerate(messages):
            if m is None:
                continue
            final = os.path.join(self.path, f"batch-{batchId:010d}-{seq:04d}.rec")
            # idempotency is PER SHARD, not per batch: a crash mid-commit
            # leaves some shards renamed and some staged — the replay
            # must skip exactly the renamed ones and land the rest
            if m.n == 0 or os.path.exists(final):
                os.remove(m.shard)
                continue
            os.rename(m.shard, final)

    def abort(self, messages, batchId: int) -> None:  # noqa: N803
        _remove_staged(messages)


class RecordLogDataSource(DataSource):
    """``spark.read.format("recordlog").option("path", dir)`` after
    ``spark.dataSource.register(RecordLogDataSource)``; streamable via
    ``spark.readStream`` (see :class:`RecordLogStreamReader`); writable
    via ``df.write.format("recordlog")`` (see :class:`RecordLogWriter`)."""

    @classmethod
    def name(cls) -> str:
        return "recordlog"

    def schema(self) -> str:
        return "file string, record_idx bigint, payload binary"

    def reader(self, schema) -> RecordLogReader:
        return RecordLogReader(self.options)

    def streamReader(self, schema) -> RecordLogStreamReader:
        return RecordLogStreamReader(self.options)

    def writer(self, schema, overwrite: bool) -> RecordLogWriter:
        if overwrite:
            raise ValueError(
                "recordlog is an append-only log (the stream reader's "
                "offset contract); use mode('append')"
            )
        return RecordLogWriter(self.options)

    def streamWriter(self, schema, overwrite: bool) -> RecordLogStreamWriter:  # noqa: N802
        return RecordLogStreamWriter(self.options)


def register_recordlog(spark: SparkSession) -> None:
    spark.dataSource.register(RecordLogDataSource)


def scan_recordlog(spark: SparkSession, path: str) -> DataFrame:
    """Engine op ``scan_recordlog``: partition-parallel scan of a
    record-log shard directory."""
    register_recordlog(spark)
    return spark.read.format("recordlog").option("path", path).load()


def stream_recordlog(spark: SparkSession, path: str) -> DataFrame:
    """Engine op ``stream_recordlog``: incremental (micro-batch) scan of
    an append-only shard directory — new shards become new batches."""
    register_recordlog(spark)
    return spark.readStream.format("recordlog").option("path", path).load()


def write_recordlog(df: DataFrame, payload_col: str, path: str) -> None:
    """Executor-parallel writer: each DataFrame partition writes one
    shard.  No driver round-trip — the write runs inside
    ``foreachPartition`` exactly where the data lives.

    Shard names are MONOTONIC (zero-padded nanosecond timestamp prefix
    + uuid suffix for same-tick uniqueness): the streaming reader's
    offset is an index into the sorted listing, so a later append must
    sort after every already-consumed shard — a random uuid name could
    sort BEFORE the committed offset and be silently skipped while an
    old shard got re-delivered."""
    os.makedirs(path, exist_ok=True)

    def _write(rows) -> None:
        first = next(rows, None)
        if first is None:
            return
        import itertools
        import time
        import uuid

        stamp = f"{time.time_ns():020d}"
        shard = os.path.join(
            path, f"part-{stamp}-{uuid.uuid4().hex[:8]}.rec"
        )
        write_records(
            shard, (r[payload_col] for r in itertools.chain([first], rows))
        )

    df.foreachPartition(_write)
