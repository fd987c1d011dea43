"""`kafka_sim` — a custom Python DataSource emitting a deterministic
Kafka-envelope message log (Spark 4 DataSource API).

This is the modern re-expression of the reference's core extension
point: where `soid/kafka-hadoop-consumer` implemented a Hadoop
`KafkaInputFormat` (one InputSplit per topic-partition, a RecordReader
fetching an offset range [R? SURVEY.md §2A A1-A3]), this source
implements the same three contracts Spark-natively:

- ``partitions()`` → one ``InputPartition`` per simulated
  topic-partition (the `getSplits` analogue; Spark schedules one task
  per partition, no shuffle);
- ``read(partition)`` → the bounded offset-range scan per partition
  (the RecordReader fetch loop);
- ``pushFilters()`` → offset-range predicates are absorbed into the
  scan bounds (the `-o earliest|last` / committed-offset resume logic,
  generalized to arbitrary offset ranges).

Payloads are pure functions of (partition, offset), so the full scan is
DuckDB-oracle-checkable — a correctness gate most custom sources can't
have.
"""

from __future__ import annotations

import sys
from dataclasses import dataclass
from typing import Iterator, Sequence

from pyspark import cloudpickle
from pyspark.sql.datasource import (
    SimpleDataSourceStreamReader,
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)

# the reader ships to executor python workers, which do not inherit the
# driver's sys.path (see memory: worker imports) — serialize by value
cloudpickle.register_pickle_by_value(sys.modules[__name__])

TS_BASE_US = 1_700_000_000_000_000  # deterministic timestamp origin

SCHEMA = (
    "topic string, partition int, offset bigint, "
    "key string, value string, ts_us bigint"
)


def message(topic: str, p: int, o: int, payload: str = "text") -> tuple:
    """The deterministic payload for (partition, offset) — mirrored
    verbatim in the q_source_kafka_sim oracle SQL. ``payload="json"``
    emits a structured JSON value instead (the reference's A5 decode
    path for structured payloads)."""
    if payload == "json":
        value = f'{{"k": "k{o % 10}", "seq": {o}, "part": {p}}}'
    else:
        value = f"msg-{p}-{o}"
    return (topic, p, o, f"k{o % 10}", value, TS_BASE_US + o * 1_000_000 + p)


def _sim_options(options: dict) -> tuple[str, int, int, str]:
    """Shared (topic, n_partitions, n_messages, payload) parsing for the
    three reader views of ONE simulated topic (r9 review: the defaults
    were hand-copied per class, so a change applied to one copy would
    silently diverge the batch and stream views of the same broker)."""
    return (
        options.get("topic", "sim"),
        int(options.get("n_partitions", 4)),
        int(options.get("n_messages", 250)),
        options.get("payload", "text"),
    )


@dataclass(frozen=True)
class TopicPartitionRange(InputPartition):
    topic: str
    partition: int
    start: int          # inclusive
    end: int            # exclusive


class KafkaSimReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        (self.topic, self.n_partitions, self.n_messages,
         self.payload) = _sim_options(options)
        # offset-range state, tightened by pushFilters
        self.lo = int(options.get("starting_offset", 0))
        self.hi = self.n_messages

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Absorb offset-range predicates into the per-partition scan
        bounds; everything else is returned for Spark to evaluate."""
        for f in filters:
            if isinstance(f, (GreaterThanOrEqual, GreaterThan, LessThan,
                              LessThanOrEqual, EqualTo)) and f.attribute == ("offset",):
                v = int(f.value)
                if isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, v)
                elif isinstance(f, GreaterThan):
                    self.lo = max(self.lo, v + 1)
                elif isinstance(f, LessThan):
                    self.hi = min(self.hi, v)
                elif isinstance(f, LessThanOrEqual):
                    self.hi = min(self.hi, v + 1)
                else:  # EqualTo
                    self.lo = max(self.lo, v)
                    self.hi = min(self.hi, v + 1)
            else:
                yield f

    def partitions(self) -> Sequence[InputPartition]:
        return [
            TopicPartitionRange(self.topic, p, self.lo, self.hi)
            for p in range(self.n_partitions)
        ]

    def read(self, part: TopicPartitionRange) -> Iterator[tuple]:
        for o in range(part.start, part.end):
            yield message(part.topic, part.partition, o, self.payload)


class KafkaSimStreamReader(DataSourceStreamReader):
    """Micro-batch stream over the simulated log — the exact offset
    contract of the real Kafka source (SURVEY.md §2A A1-A3, A7):

    - ``initialOffset`` → all partitions at 0 (the `-o earliest` path;
      a checkpoint overrides it on restart, the committed-ZK-offset
      path);
    - ``latestOffset`` → the broker-side high watermark: the topic is
      filled to ``n_messages`` per partition. Raise ``n_messages``
      between bounded runs on the same checkpoint to simulate new
      arrivals — each rerun consumes exactly the delta (the reference's
      cron pattern);
    - ``partitions(start, end)`` → one offset-range split per
      topic-partition per micro-batch (`getSplits`);
    - ``commit`` → a no-op: the checkpoint WAL already made the batch
      durable (the upgrade over the reference's post-job ZK write).

    Offsets are ``{partition: next_offset}`` dicts, serialized into the
    checkpoint by Spark. The high watermark is a pure function of the
    options (never instance state): a restarted reader must not report
    an offset below the checkpoint's, or the source would "regress".
    Admission control (``max_per_trigger``) CANNOT live here — this
    API's ``latestOffset()`` takes no start offset, so a capped
    watermark computed from instance state would regress below the
    checkpoint after a restart; capped specs route to
    ``KafkaSimSimpleStreamReader`` instead, whose ``read(start)`` sees
    the committed offset.
    """

    def __init__(self, options: dict) -> None:
        (self.topic, self.n_partitions, self.n_messages,
         self.payload) = _sim_options(options)

    def initialOffset(self) -> dict:
        return {str(p): 0 for p in range(self.n_partitions)}

    def latestOffset(self) -> dict:
        return {str(p): self.n_messages for p in range(self.n_partitions)}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        missing = set(start) - set(end)
        if missing:
            # n_partitions lowered between runs on one checkpoint: the
            # committed partitions would silently vanish from every
            # later batch (and their unread data with them) — raise,
            # mirroring the real source's deleted-partition error
            raise ValueError(
                "checkpoint has partitions absent from the topic "
                f"(n_partitions lowered?): {sorted(missing)}"
            )
        return [
            TopicPartitionRange(self.topic, int(p), start.get(p, 0), end[p])
            for p in end
        ]

    def read(self, part: TopicPartitionRange) -> Iterator[tuple]:
        for o in range(part.start, part.end):
            yield message(part.topic, part.partition, o, self.payload)

    def commit(self, end: dict) -> None:
        pass  # durability lives in the checkpoint, not the source


class KafkaSimSimpleStreamReader(SimpleDataSourceStreamReader):
    """Capped (``max_per_trigger``) micro-batch reader — the reference
    `limit` flag / maxOffsetsPerTrigger analogue (§2A A4).

    Admission control needs the committed start offset, which only this
    simple-reader API provides (``read(start)``): each call admits at
    most max_per_trigger offsets per partition past ``start``, so a
    restart resumes capped reads from the checkpoint with no regression.
    ``readBetweenOffsets`` replays a planned range deterministically
    (the generator is a pure function of (topic, partition, offset)).
    Reads execute on the driver — fine for the offline simulator; the
    uncapped distributed path stays on KafkaSimStreamReader."""

    def __init__(self, options: dict) -> None:
        (self.topic, self.n_partitions, self.n_messages,
         self.payload) = _sim_options(options)
        self.cap = int(options["max_per_trigger"])
        if self.cap < 1:
            # a zero cap stalls the stream forever; a NEGATIVE cap is
            # worse — read(start) would commit end < start and walk the
            # checkpoint BACKWARD, violating the no-regression contract
            raise ValueError(
                f"max_per_trigger must be >= 1, got {self.cap}"
            )

    def initialOffset(self) -> dict:
        return {str(p): 0 for p in range(self.n_partitions)}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        end = {
            p: min(self.n_messages, start.get(p, 0) + self.cap)
            for p in (str(i) for i in range(self.n_partitions))
        }
        missing = set(start) - set(end)
        if missing:
            # see KafkaSimStreamReader.partitions: a lowered
            # n_partitions must fail loudly, not drop committed offsets
            raise ValueError(
                "checkpoint has partitions absent from the topic "
                f"(n_partitions lowered?): {sorted(missing)}"
            )
        # materialized, not a generator: the runner pickles the prefetch
        # cache entry, and the batch is cap-bounded anyway
        return iter(self.readBetweenOffsets(start, end)), end

    def readBetweenOffsets(self, start: dict, end: dict) -> list[tuple]:
        return [
            message(self.topic, int(p), o, self.payload)
            for p, hi in end.items()
            for o in range(start.get(p, 0), hi)
        ]

    def commit(self, end: dict) -> None:
        pass  # durability lives in the checkpoint, not the source


class KafkaSimDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "kafka_sim"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> KafkaSimReader:
        return KafkaSimReader(self.options)

    def streamReader(self, schema) -> KafkaSimStreamReader:
        if "max_per_trigger" in self.options:
            # routes Spark to simpleStreamReader(), whose read(start)
            # can enforce the cap without offset regression — the
            # fallback in pyspark's datasource_internal._streamReader
            # catches exactly PySparkNotImplementedError
            from pyspark.errors import PySparkNotImplementedError

            raise PySparkNotImplementedError(
                errorClass="NOT_IMPLEMENTED",
                messageParameters={
                    "feature": "streamReader with max_per_trigger "
                    "(capped reads use the simple reader)"
                },
            )
        return KafkaSimStreamReader(self.options)

    def simpleStreamReader(self, schema) -> KafkaSimSimpleStreamReader:
        return KafkaSimSimpleStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration (re-registering replaces the entry).

    Also pins the session defaults: pushFilters() requires
    spark.sql.python.filterPushdown.enabled, which an externally-built
    session (the driver's) only gets via load_table — a kafka_sim scan
    must not depend on some OTHER query having run first."""
    from kafka_hadoop_consumer_spark.session import ensure_session_defaults

    ensure_session_defaults(spark)
    spark.dataSource.register(KafkaSimDataSource)
