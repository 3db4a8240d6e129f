"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API):
a deterministic synthetic-events generator, registered as a real
`spark.read.format(...)` source.

Why it exists: the engine's other edges (CSV/Excel/XML/JSONL/parquet)
all read files; pipelines also need GENERATED relations — load tests,
fixture fabrication, simulator feeds — and the idiomatic Spark-4 way
is a DataSource subclass, not a driver-side createDataFrame loop. The
generator here is:

- **partitioned**: `numPartitions` InputPartitions, each produced
  independently on executors (a driver-side loop would serialize 100 M
  rows through one process; this scales with the cluster);
- **deterministic**: row i's content is a pure function of (seed, i)
  via the splitmix64 mixer (a public-domain PRNG finalizer — the same
  integer mixer java.util.SplittableRandom uses), so reruns, retries,
  and different partition counts all yield the SAME multiset of rows
  (layout-independence is regression-tested);
- **schema-fixed**: (event_id long, ts timestamp, user_id long,
  event_type string, value double) — the events table's shape, so
  every events-family operator can run against generated data.

Usage::

    spark.dataSource.register(SyntheticEvents)
    df = (spark.read.format("synthetic_events")
          .option("rows", 100000).option("numPartitions", 8)
          .option("seed", 42).load())
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

_EVENT_TYPES = ("view", "click", "signup", "purchase", "error")
_EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)
_MASK = (1 << 64) - 1


def _splitmix64(x: int) -> int:
    """Public splitmix64 finalizer: a bijective 64-bit mixer."""
    x = (x + 0x9E3779B97F4A7C15) & _MASK
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _MASK
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & _MASK
    return x ^ (x >> 31)


def _gen_rows(seed: int, start: int, end: int):
    """Rows [start, end) of the deterministic (seed, i) sequence —
    shared verbatim by the batch partitions and the stream batches so
    the two faces of the source can never diverge."""
    for i in range(start, end):
        h = _splitmix64((seed << 32) ^ i)
        ts = _EPOCH + timedelta(seconds=(h >> 16) % (30 * 86400))
        yield (
            i,
            ts.replace(tzinfo=None),
            (h >> 8) % 1000,
            _EVENT_TYPES[h % len(_EVENT_TYPES)],
            ((h >> 24) % 50000) / 100.0,
        )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int, seed: int):
        self.start, self.end, self.seed = start, end, seed


class _SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", 1000))
        self.num_partitions = max(1, int(options.get("numpartitions", 4)))
        self.seed = int(options.get("seed", 0))

    def partitions(self):
        if self.rows <= 0:  # empty relation: one empty partition
            return [_RangePartition(0, 0, self.seed)]
        step = -(-self.rows // self.num_partitions)
        return [
            _RangePartition(lo, min(lo + step, self.rows), self.seed)
            for lo in range(0, self.rows, step)
        ]

    def read(self, partition: _RangePartition):
        return _gen_rows(partition.seed, partition.start, partition.end)


class SyntheticEvents(DataSource):
    """spark.read.format("synthetic_events") — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> StructType:
        return StructType(
            [
                StructField("event_id", LongType()),
                StructField("ts", TimestampType()),
                StructField("user_id", LongType()),
                StructField("event_type", StringType()),
                StructField("value", DoubleType()),
            ]
        )

    def reader(self, schema: StructType) -> DataSourceReader:
        return _SyntheticEventsReader(self.options)

    def simpleStreamReader(self, schema: StructType):
        return _SyntheticEventsStreamReader(self.options)


class _SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Streaming face of the same generator: each micro-batch emits the
    next `rowsPerBatch` indices of the SAME deterministic (seed, i)
    sequence the batch reader produces, with the offset dict carrying
    the high-water index. `maxRows` (default unbounded) ends the
    stream for availableNow runs; replays re-read [start, end) and
    regenerate byte-identical rows, so the source is replay-safe by
    construction."""

    def __init__(self, options):
        self.rows_per_batch = int(options.get("rowsperbatch", 100))
        self.max_rows = int(options.get("maxrows", -1))
        self.seed = int(options.get("seed", 0))

    def initialOffset(self) -> dict:
        return {"i": 0}

    def read(self, start: dict):
        lo = int(start["i"])
        hi = lo + self.rows_per_batch
        if self.max_rows >= 0:
            hi = min(hi, self.max_rows)
        # iter(list(...)), not a bare generator or list: the runtime's
        # prefetch cache needs next() (empty-batch detection) AND
        # copy.copy (re-serving the cached batch), which list iterators
        # support via __reduce__ and generators do not;
        # rows_per_batch bounds the materialization
        return iter(list(_gen_rows(self.seed, lo, hi))), {"i": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(list(_gen_rows(self.seed, int(start["i"]), int(end["i"]))))

    def commit(self, end: dict) -> None:
        pass  # nothing to clean up: rows are regenerated, never stored
