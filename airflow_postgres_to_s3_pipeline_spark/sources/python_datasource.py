"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API) — the
engine-extension path for sources Spark has no built-in connector for
(internal services, bespoke formats, synthetic load generators).

``SyntheticEventsDataSource`` is a deterministic event generator: every
partition derives its rows purely from (partition_id, row_index) hashes, so
the same options always produce the same table — usable both as a load
generator for scale tests and as a connector-API demonstration.  Reads are
partitioned: each ``InputPartition`` is generated independently on an
executor (the source scales horizontally like any file-based source; no
driver materialization).

Register + read:

    from airflow_postgres_to_s3_pipeline_spark.sources.python_datasource import (
        SyntheticEventsDataSource,
    )
    spark.dataSource.register(SyntheticEventsDataSource)
    df = (spark.read.format("synthetic_events")
          .option("partitions", "8").option("rows_per_partition", "1000")
          .load())
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

SCHEMA_DDL = (
    "event_id bigint, user_id bigint, event_type string, value double"
)

_EVENT_TYPES = ("view", "click", "signup", "purchase", "error")


def _h(partition: int, row: int, salt: str) -> int:
    """Deterministic 64-bit hash of (partition, row, salt)."""
    digest = hashlib.sha256(f"{partition}:{row}:{salt}".encode()).digest()
    return int.from_bytes(digest[:8], "big")


class _EventsPartition(InputPartition):
    def __init__(self, pid: int, n_rows: int):
        self.pid = pid
        self.n_rows = n_rows


class _EventsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_partitions = int(options.get("partitions", "4"))
        self.rows_per_partition = int(options.get("rows_per_partition", "100"))

    def partitions(self) -> Sequence[InputPartition]:
        return [
            _EventsPartition(p, self.rows_per_partition)
            for p in range(self.n_partitions)
        ]

    def read(self, partition: _EventsPartition) -> Iterator[tuple]:
        base = partition.pid * partition.n_rows
        for i in range(partition.n_rows):
            event_id = base + i
            user_id = _h(partition.pid, i, "user") % 1000
            event_type = _EVENT_TYPES[_h(partition.pid, i, "type") % len(_EVENT_TYPES)]
            value = (_h(partition.pid, i, "value") % 10_000) / 100.0
            yield (event_id, user_id, event_type, value)


class SyntheticEventsDataSource(DataSource):
    """spark.read.format("synthetic_events") — deterministic event table.

    Option ``with_ts=true`` (stream reader only) appends an event-time
    column: batch b's rows land in hour-bucket b at BASE_EPOCH, except a
    deterministic ~1/8 subset of rows in batches >= 3 which carry
    timestamps from hour b-3 — unambiguously LATE data (two hours sits on
    the asynchronous-watermark boundary; see the read() comment), used to
    demonstrate watermark late-row dropping with an exactly-regenerable
    oracle."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str | StructType:
        if self.options.get("with_ts", "false").lower() == "true":
            return SCHEMA_DDL + ", ts timestamp"
        return SCHEMA_DDL

    def reader(self, schema: StructType) -> DataSourceReader:
        # with_ts is a STREAM-reader tier (event time is keyed off the
        # micro-batch counter, which a batch scan doesn't have).  schema()
        # advertises the ts column whenever the option is set, so letting a
        # batch read proceed would crash every partition on a 4-tuple vs
        # 5-field schema mismatch — reject the combination up front instead.
        if self.options.get("with_ts", "false").lower() == "true":
            raise ValueError(
                "synthetic_events: with_ts=true is only supported for "
                "readStream (event time derives from the micro-batch "
                "counter); use spark.readStream or drop the option"
            )
        return _EventsReader(self.options)

    def streamReader(self, schema: StructType) -> "DataSourceStreamReader":
        return _EventsStreamReader(self.options)


# ---------------------------------------------------------------------------
# Streaming tier (Spark 4 DataSourceStreamReader): deterministic bounded
# micro-batch generator.  Each latestOffset() call advances one batch until
# max_batches, so processAllAvailable() drives exactly max_batches
# micro-batches and stops — bounded-source semantics over the custom
# connector API, with every row a pure function of (batch, partition, row).
# ---------------------------------------------------------------------------

def _hs(batch: int, partition: int, row: int, salt: str) -> int:
    """Deterministic 60-bit hash of (batch, partition, row, salt) — the
    streaming dual of ``_h`` (the extra batch coordinate keeps stream rows
    distinct from batch-reader rows, and the 60-bit width keeps the value
    SQL-mirrorable: DuckDB computes the identical value as
    ``('0x' || substring(sha256(key), 1, 15))::BIGINT``)."""
    key = f"{batch}:{partition}:{row}:{salt}"
    return int(hashlib.sha256(key.encode()).hexdigest()[:15], 16)


class _EventsStreamPartition(InputPartition):
    def __init__(self, batch: int, pid: int, n_rows: int, start: int):
        self.batch = batch
        self.pid = pid
        self.n_rows = n_rows
        self.start = start  # batch-local offset of this partition's first row


# Fixed UTC base for the with_ts tier — EXACTLY hour-aligned
# (472222 * 3600 = 2023-11-14 22:00:00 UTC), so batch b's on-time rows fall
# entirely inside one tumbling 1-hour window and the late-drop oracle needs
# no cross-window bookkeeping.
BASE_EPOCH = 1_699_999_200


class _EventsStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self.n_partitions = int(options.get("partitions", "4"))
        self.rows_per_batch = int(options.get("rows_per_batch", "100"))
        self.max_batches = int(options.get("max_batches", "4"))
        self.with_ts = options.get("with_ts", "false").lower() == "true"
        self._planned = 0

    # RESTART LIMITATION (documented, not a bug): this bounded generator's
    # batch counter lives in memory, and the DataSourceStreamReader API has
    # no offset-restore hook — after a checkpoint restart the fresh
    # reader's latestOffset restarts at 1 while the committed offset may
    # be higher, so the query idles instead of continuing.  A production
    # source derives latestOffset from the EXTERNAL system (log end
    # offset, file listing), which makes restart-continuation automatic.
    # This source is for single-run bounded drives (processAllAvailable),
    # where offsets commit monotonically 0..max_batches; for the genuine
    # offset-restore contract use SyntheticEventsRestartableDataSource
    # below (SimpleDataSourceStreamReader derives the batch counter from
    # the check-pointed offset — tests/test_streaming_recovery.py).
    def initialOffset(self) -> dict:
        return {"batch": 0}

    def latestOffset(self) -> dict:
        # Advance ONE source batch past the last batch the engine has
        # PLANNED (partitions() call).  The engine may poll latestOffset
        # any number of times per trigger (stream init, availability
        # checks); a counter that increments per CALL lets several source
        # batches merge into one micro-batch, which silently defeats
        # watermark advancement between hours (the late-drop tier depends
        # on it).  Keying off commit() instead races: commits land
        # asynchronously after the batch, so processAllAvailable can see
        # "no new data" before the commit registers and stop early.
        # partitions() is called synchronously when a batch is
        # constructed, so this is race-free AND one-batch-per-trigger.
        return {"batch": min(self._planned + 1, self.max_batches)}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        self._planned = max(self._planned, end["batch"])
        # Even split, remainder to the LAST partition, so the source emits
        # exactly rows_per_batch rows for ANY (rows, partitions) combination
        # (ADVICE r4: floor division silently dropped the remainder and
        # under-emitted vs the advertised row count).
        rows_per_part = self.rows_per_batch // self.n_partitions
        remainder = self.rows_per_batch % self.n_partitions
        return [
            _EventsStreamPartition(
                b,
                p,
                rows_per_part
                + (remainder if p == self.n_partitions - 1 else 0),
                p * rows_per_part,
            )
            for b in range(start["batch"], end["batch"])
            for p in range(self.n_partitions)
        ]

    def read(self, partition: _EventsStreamPartition) -> Iterator[tuple]:
        return _stream_slice_rows(
            partition.batch,
            partition.pid,
            partition.start,
            partition.n_rows,
            self.rows_per_batch,
            self.with_ts,
        )

    def commit(self, end: dict) -> None:
        pass


def _stream_slice_rows(b: int, p: int, start: int, n_rows: int,
                       rows_per_batch: int,
                       with_ts: bool) -> Iterator[tuple]:
    """Rows for one (batch, partition) slice — shared by the partitioned
    and the restartable simple reader so both tiers emit BIT-IDENTICAL
    data (one oracle covers either source)."""
    from datetime import datetime, timezone

    base = b * rows_per_batch + start
    for i in range(n_rows):
        event_id = base + i
        user_id = _hs(b, p, i, "user") % 1000
        event_type = _EVENT_TYPES[_hs(b, p, i, "type") % len(_EVENT_TYPES)]
        value = (_hs(b, p, i, "value") % 10_000) / 100.0
        if not with_ts:
            yield (event_id, user_id, event_type, value)
            continue
        # hour-bucket b, except a deterministic ~1/8 of rows in
        # batches >= 3 arriving THREE HOURS LATE (hour b-3) —
        # integer-second arithmetic so the SQL oracle regenerates it
        # exactly.  Three hours (not two): watermark propagation is
        # asynchronous, so the EFFECTIVE watermark during a trigger
        # can lag the reported one by a full batch — rows exactly two
        # batch-hours late sit on that boundary and are dropped or
        # kept depending on trigger pacing (both observed).  Three
        # hours puts the target window's end below the watermark
        # under EITHER schedule, so the drop is deterministic.
        hour = b
        if b >= 3 and _hs(b, p, i, "late") % 8 == 0:
            hour = b - 3
        epoch = BASE_EPOCH + hour * 3600 + _hs(b, p, i, "ts") % 3600
        ts = datetime.fromtimestamp(epoch, tz=timezone.utc).replace(
            tzinfo=None
        )
        yield (event_id, user_id, event_type, value, ts)


# ---------------------------------------------------------------------------
# Restartable tier (Spark 4 SimpleDataSourceStreamReader): the OFFSET-RESTORE
# contract the partitioned reader's API lacks.  After a checkpoint restart
# the engine hands `read(start)` the COMMITTED offset from the checkpoint
# log — the batch counter is derived from that argument, never from reader
# memory, so a restarted query resumes exactly where it stopped instead of
# idling (the r5 documented limitation of _EventsStreamReader), and
# `readBetweenOffsets` replays an in-flight batch deterministically during
# failure recovery.  The trade (per the API contract): rows are produced on
# the driver without partition planning, so this tier is for modest-rate
# sources; the partitioned reader remains the scale path.
# ---------------------------------------------------------------------------

from pyspark.sql.datasource import (  # noqa: E402
    SimpleDataSourceStreamReader,
)


class _EventsSimpleStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict):
        self.n_partitions = int(options.get("partitions", "4"))
        self.rows_per_batch = int(options.get("rows_per_batch", "100"))
        self.max_batches = int(options.get("max_batches", "4"))
        self.with_ts = options.get("with_ts", "false").lower() == "true"

    def initialOffset(self) -> dict:
        # only consulted on a FRESH query; a restarted query starts from
        # the check-pointed offset via read(start).  The row-layout
        # options are ENCODED INTO the offset so a failure replay
        # (readBetweenOffsets) regenerates the committed rows even if the
        # reader was restarted with different rows_per_batch/partitions —
        # replay fidelity must come from the checkpoint log, not from
        # whatever options the current process happens to hold.
        return {
            "batch": 0,
            "rows_per_batch": self.rows_per_batch,
            "partitions": self.n_partitions,
        }

    def _layout(self, offset: dict) -> tuple[int, int]:
        # prefer the layout recorded in the checkpointed offset; fall back
        # to current options only for pre-upgrade checkpoints that lack it
        return (
            int(offset.get("rows_per_batch", self.rows_per_batch)),
            int(offset.get("partitions", self.n_partitions)),
        )

    def _batch_rows(
        self, b: int, rows_per_batch: int, n_partitions: int
    ) -> Iterator[tuple]:
        # same even-split-with-remainder layout as
        # _EventsStreamReader.partitions, so rows match bit-for-bit
        rows_per_part = rows_per_batch // n_partitions
        remainder = rows_per_batch % n_partitions
        for p in range(n_partitions):
            n_rows = rows_per_part + (
                remainder if p == n_partitions - 1 else 0
            )
            yield from _stream_slice_rows(
                b, p, p * rows_per_part, n_rows,
                rows_per_batch, self.with_ts,
            )

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        b = start["batch"]
        rpb, parts = self._layout(start)
        if b >= self.max_batches:
            return iter(()), dict(start)
        # materialized list, not a generator: the engine's prefetch-cache
        # wrapper pickles the returned rows into the batch plan.  The end
        # offset carries forward the layout the rows were generated with.
        return (
            list(self._batch_rows(b, rpb, parts)),
            {"batch": b + 1, "rows_per_batch": rpb, "partitions": parts},
        )

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # failure replay of the committed span [start, end): regenerate
        # with the layout recorded in the END offset (written by the
        # read() call that produced the span), so the replay is
        # byte-identical regardless of current reader options.  MUST be a
        # genuine iterator: unlike read() (whose rows the prefetch cache
        # pickles, hence the list there), this runs inside the worker's
        # plan_data_source_read path, which REJECTS a list return
        # (DATA_SOURCE_INVALID_RETURN_TYPE — caught by the crash-replay
        # test in tests/test_streaming_recovery.py).
        rpb, parts = self._layout(end)
        return iter(
            [
                row
                for b in range(start["batch"], end["batch"])
                for row in self._batch_rows(b, rpb, parts)
            ]
        )


class SyntheticEventsRestartableDataSource(DataSource):
    """spark.readStream.format("synthetic_events_restartable") — the same
    deterministic event stream as ``synthetic_events``, served through
    SimpleDataSourceStreamReader so checkpoint restarts RESUME from the
    committed offset (see _EventsSimpleStreamReader)."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events_restartable"

    def schema(self) -> str | StructType:
        if self.options.get("with_ts", "false").lower() == "true":
            return SCHEMA_DDL + ", ts timestamp"
        return SCHEMA_DDL

    def simpleStreamReader(
        self, schema: StructType
    ) -> "SimpleDataSourceStreamReader":
        return _EventsSimpleStreamReader(self.options)


# ---------------------------------------------------------------------------
# Writer tier (Spark 4 DataSourceWriter / DataSourceStreamWriter): a
# two-phase-commit JSON-lines directory sink.  Executors stage each task's
# rows under <path>/_staging/<writer-or-task-uuid>/<uuid>.jsonl and return
# the staged dir + name as their WriterCommitMessage; the DRIVER's commit()
# promotes exactly the acknowledged files and writes a _SUCCESS manifest —
# so a failed/retried task can never leak half-written output into the
# committed set (the same protocol FileFormatWriter implements for parquet,
# with the uuid subdir playing its per-jobId role so concurrent writes to
# one path cannot see each other's staged files).  abort() discards only
# this write's staging dirs.  Local-FS paths here; on a cluster the path must be shared
# storage (s3a://, hdfs://) exactly as with any file sink.
# ---------------------------------------------------------------------------

import json as _json
import os as _os
import shutil as _shutil
import uuid as _uuid

from pyspark.sql.datasource import (  # noqa: E402
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)


class _StagedFile(WriterCommitMessage):
    def __init__(self, name: str, n_rows: int, staged_dir: str):
        self.name = name
        self.n_rows = n_rows
        # full staging dir, carried IN the commit message: the streaming
        # commit runs in a separate Python process that RE-INSTANTIATES the
        # writer (PythonStreamingSinkCommitRunner), so any id minted in
        # __init__ differs between the task side and the commit side — the
        # message is the only channel that survives the hop
        self.staged_dir = staged_dir


def _stage_rows(staging: str, iterator) -> "_StagedFile":
    _os.makedirs(staging, exist_ok=True)
    name = f"{_uuid.uuid4().hex}.jsonl"
    n = 0
    with open(_os.path.join(staging, name), "w") as f:
        for row in iterator:
            f.write(_json.dumps(row.asDict()) + "\n")
            n += 1
    return _StagedFile(name, n, staging)


def _cleanup_staging(staging: str) -> None:
    """Remove ONE writer's staging dir, then the shared _staging root if
    (and only if) no other writer still has files there."""
    _shutil.rmtree(staging, ignore_errors=True)
    try:
        _os.rmdir(_os.path.dirname(staging))  # fails non-empty: that's fine
    except OSError:
        pass


class _JsonDirWriter(DataSourceWriter):
    def __init__(self, options: dict):
        self.path = options["path"]
        self.fail_on_partition = int(options.get("fail_on_partition", "-1"))
        # Per-WRITER staging subdir (the uuid is minted on the driver and
        # rides the pickle to every task), exactly as FileFormatWriter
        # stages under a per-jobId directory: two concurrent writes to the
        # same path must not see — let alone rmtree — each other's staged
        # files.  With a shared <path>/_staging, writer A's commit
        # destroyed writer B's in-flight staged files (r10 review).
        self._staging = _os.path.join(
            options["path"], "_staging", _uuid.uuid4().hex
        )

    def write(self, iterator):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        if pid == self.fail_on_partition:  # test hook: simulated task crash
            raise RuntimeError(f"simulated failure on partition {pid}")
        return _stage_rows(self._staging, iterator)

    def commit(self, messages):
        names = []
        total = 0
        for m in messages:
            _os.rename(
                _os.path.join(self._staging, m.name),
                _os.path.join(self.path, m.name),
            )
            names.append(m.name)
            total += m.n_rows
        with open(_os.path.join(self.path, "_SUCCESS"), "w") as f:
            _json.dump({"files": sorted(names), "rows": total}, f)
        _cleanup_staging(self._staging)

    def abort(self, messages):
        _cleanup_staging(self._staging)


class _JsonDirStreamWriter(DataSourceStreamWriter):
    """Streaming tier: per-micro-batch commit into batch=<id>/ with a
    per-batch manifest — re-delivery of a batch (checkpoint replay)
    REPLACES the batch directory, which is what makes the sink
    effectively exactly-once downstream of Spark's at-least-once
    delivery (the batchId-idempotent pattern foreachBatch users hand-roll)."""

    def __init__(self, options: dict):
        self.path = options["path"]

    def write(self, iterator):
        # per-TASK uuid staging dir; the commit message carries the dir
        # (see _StagedFile.staged_dir — the streaming commit re-instantiates
        # this writer in another process, so writer state can't be shared
        # between write() and commit()).  Isolation from any concurrent
        # write to the same path comes for free: nothing touches a staging
        # dir it didn't stage.
        staging = _os.path.join(self.path, "_staging", _uuid.uuid4().hex)
        return _stage_rows(staging, iterator)

    def commit(self, messages, batchId: int) -> None:
        batch_dir = _os.path.join(self.path, f"batch={batchId}")
        if _os.path.isdir(batch_dir):  # replayed batch: replace, don't dup
            _shutil.rmtree(batch_dir)
        _os.makedirs(batch_dir)
        names = []
        total = 0
        for m in messages:
            _os.rename(
                _os.path.join(m.staged_dir, m.name),
                _os.path.join(batch_dir, m.name),
            )
            names.append(m.name)
            total += m.n_rows
        with open(_os.path.join(batch_dir, "_MANIFEST"), "w") as f:
            _json.dump({"files": sorted(names), "rows": total}, f)
        for m in messages:
            _cleanup_staging(m.staged_dir)

    def abort(self, messages, batchId: int) -> None:
        # only the acknowledged tasks' staging dirs: a crashed task's
        # orphan (bounded, underscore-hidden) beats rmtree-ing a dir a
        # concurrent writer to the same path may still be staging into
        for m in messages:
            if m is not None:
                _cleanup_staging(m.staged_dir)


class JsonDirSinkDataSource(DataSource):
    """df.write.format("json_dir_sink").option("path", d).save() — batch
    and streaming JSON-lines sink with a real two-phase commit."""

    @classmethod
    def name(cls) -> str:
        return "json_dir_sink"

    def writer(self, schema: StructType, overwrite: bool) -> DataSourceWriter:
        return _JsonDirWriter(self.options)

    def streamWriter(self, schema: StructType,
                     overwrite: bool) -> DataSourceStreamWriter:
        return _JsonDirStreamWriter(self.options)
