"""Custom Python DataSource (Spark 4 API): deterministic synthetic
events generator — ``spark.read.format("synthetic_events")``.

Why a real DataSource instead of ``spark.range().select(...)``:
- it demonstrates the engine's SOURCE extension point (SURVEY.md §2 H
  family): partition planning, per-partition generation on executors,
  schema declaration — the same surface a Kafka/warehouse/REST
  connector would implement;
- generation is partition-parallel and driver-free: each
  ``InputPartition`` carries only (start, end) row bounds, executors
  synthesize rows locally — scaling a 100 B-row test corpus costs no
  driver memory and no shuffle;
- rows are a pure function of ``event_id`` (split-mix style hashing),
  so any slice of the corpus is reproducible independently of
  partitioning — the property the scale ladder and fixtures rely on.

Register once per session, then read by format name:

    from post_modern_stack_spark.sources.synthetic import register
    register(spark)
    df = (spark.read.format("synthetic_events")
          .option("rows", 1_000_000).option("users", 1000).load())
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

SCHEMA_DDL = (
    "event_id bigint, ts_ns bigint, user_id bigint, "
    "event_type string, value double, props string"
)

_TYPES = ["view", "click", "purchase", "signup", "error"]
_BASE_NS = 1_700_000_000_000_000_000
_STEP_NS = 1_000_000  # 1 ms between events


def _mix(x: int, salt: int) -> int:
    """Split-mix-style 64-bit hash (deterministic, cheap, pure)."""
    x = (x + salt * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return x ^ (x >> 31)


class _Partition(InputPartition):
    def __init__(self, start: int, end: int, users: int):
        self.start, self.end, self.users = start, end, users


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 10_000))
        self.users = int(options.get("users", max(self.rows // 100, 1)))
        self.num_partitions = int(options.get("numpartitions", 32))

    def partitions(self):
        per = max(self.rows // self.num_partitions, 1)
        parts = []
        start = 0
        while start < self.rows:
            parts.append(_Partition(start, min(start + per, self.rows), self.users))
            start += per
        return parts

    def read(self, partition: _Partition):
        users = partition.users
        for i in range(partition.start, partition.end):
            yield (
                i,
                _BASE_NS + i * _STEP_NS,
                _mix(i, 1) % users,
                _TYPES[_mix(i, 2) % len(_TYPES)],
                (_mix(i, 3) % 10_000) / 100.0,
                '{"k": %d}' % (_mix(i, 4) % 100),
            )


class SyntheticEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema) -> SyntheticEventsReader:
        return SyntheticEventsReader(self.options)

    def simpleStreamReader(self, schema) -> "SyntheticEventsStreamReader":
        return SyntheticEventsStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(SyntheticEventsDataSource)


class SyntheticEventsStreamReader:
    """Simple streaming reader (Spark 4 ``SimpleDataSourceStreamReader``
    protocol): the offset IS the next ``event_id`` — a totally ordered,
    replayable position, so micro-batches are exactly-once across
    restarts (``readBetweenOffsets`` regenerates any committed span
    deterministically; rows are pure functions of event_id).
    """

    def __init__(self, options):
        self.users = int(options.get("users", 100))
        self.rows_per_batch = int(options.get("rowsperbatch", 1000))

    def initialOffset(self):
        return {"next": 0}

    def read(self, start):
        lo = start["next"]
        hi = lo + self.rows_per_batch
        # a LIST, not a generator: the runner's prefetch cache shallow-
        # copies the iterator for replay, which a generator can't survive
        return list(self._gen(lo, hi)), {"next": hi}

    def readBetweenOffsets(self, start, end):
        # the replay path requires an ITERATOR (a list fails type
        # validation there), while read() requires a copyable sequence
        # for the prefetch cache — hence the asymmetry
        return self._gen(start["next"], end["next"])

    def commit(self, end):
        pass  # nothing to clean up: generation is stateless

    def _gen(self, lo: int, hi: int):
        users = self.users
        for i in range(lo, hi):
            yield (
                i,
                _BASE_NS + i * _STEP_NS,
                _mix(i, 1) % users,
                _TYPES[_mix(i, 2) % len(_TYPES)],
                (_mix(i, 3) % 10_000) / 100.0,
                '{"k": %d}' % (_mix(i, 4) % 100),
            )


class JsonlGzSink(DataSource):
    """Custom Python DataSource WRITER (the sink half of the Spark 4
    Python DataSource API; the reader half is ``SyntheticEventsDataSource``):
    ``df.write.format("jsonl_gz").option("path", dir).save()`` writes
    gzip-compressed JSON-lines shards with a two-phase commit —
    executors write to task-scoped temp names (attempt-isolated, so a
    retried/zombie task never collides), the driver renames to final
    names only in ``commit()`` and deletes temps in ``abort()``:
    readers never observe a partial shard, same contract as Spark's
    file commit protocol."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_gz"

    def writer(self, schema, overwrite: bool):
        return _JsonlGzWriter(self.options["path"], schema, overwrite)


@dataclass
class _ShardCommit(WriterCommitMessage):
    tmp: str
    rows: int
    pid: int


class _JsonlGzWriter(DataSourceWriter):
    def __init__(self, path: str, schema, overwrite: bool):
        self.path = path
        self.fields = [f.name for f in schema.fields]
        self.overwrite = overwrite

    def write(self, iterator):
        """Executor-side: stream one partition to a temp shard."""
        import gzip
        import json
        import os
        import uuid

        from pyspark import TaskContext

        ctx = TaskContext.get()
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(
            self.path, f"_tmp-{ctx.partitionId()}-{uuid.uuid4().hex}.jsonl.gz"
        )
        n = 0
        with gzip.open(tmp, "wt") as f:
            for row in iterator:
                f.write(json.dumps(dict(zip(self.fields, row))) + "\n")
                n += 1
        return _ShardCommit(tmp=tmp, rows=n, pid=ctx.partitionId())

    def commit(self, messages):
        """Driver-side: atomically publish every shard."""
        import os

        for m in messages:
            final = os.path.join(
                self.path, f"part-{m.pid:05d}-{m.rows}.jsonl.gz"
            )
            os.replace(m.tmp, final)

    def abort(self, messages):
        import os

        for m in messages:
            if m is not None and os.path.exists(m.tmp):
                os.remove(m.tmp)


def register_sink(spark) -> None:
    spark.dataSource.register(JsonlGzSink)
