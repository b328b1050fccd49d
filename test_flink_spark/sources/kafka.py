"""Kafka sources (SURVEY.md §2.1 S1/S2/S4).

Reference:
    S1 topic-pattern consumer  HotMediaTrack.java:59-74
       (``Pattern.compile("log_track_\\S+")``, latest offsets, string values)
    S2 single-topic consumer   HotItemAnalysis.java:69-79
    S4 (topic, value) deserializer  TopicValueKafkaDeserializationSchema.java:13-28
       — unused in the reference and FREE in Spark: the Kafka source always
       exposes topic/partition/offset/key/value/timestamp columns.

Spark's Kafka connector partitions 1:1 with Kafka partitions and scales
linearly with executors; offsets are tracked in the checkpoint — no consumer
group state.  These builders only configure the reader; callers ``.load()``
(requires the spark-sql-kafka package on the cluster classpath — not present
in the local test container, hence builders are returned unloaded and the
pipelines accept any pre-built source DataFrame).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamReader


def java_pattern_to_kafka(pattern: str) -> str:
    """Translate the reference's Java topic regex to Kafka's (Java-regex
    compatible) ``subscribePattern`` with the one idiom change that matters:
    ``\\S+`` (HotMediaTrack.java:61) matches any non-space run, which for
    topic names — where whitespace is illegal — is exactly ``.+``."""
    return pattern.replace("\\S+", ".+").replace("\\S*", ".*")


def kafka_options(
    bootstrap_servers: str,
    *,
    topic: str | None = None,
    topic_pattern: str | None = None,
    starting_offsets: str = "latest",
    fail_on_data_loss: bool = False,
) -> dict[str, str]:
    """The full option map for the Kafka source — a pure function so the
    reader contract (subscription mode, offsets, data-loss policy) is
    testable without a broker.

    Exactly one of topic/topic_pattern must be given.  ``failOnDataLoss``
    defaults off: the reference consumes from ``latest`` with no reset
    handling, so expired offsets must not kill the job.
    """
    if (topic is None) == (topic_pattern is None):
        raise ValueError("exactly one of topic / topic_pattern required")
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": str(fail_on_data_loss).lower(),
    }
    if topic is not None:
        opts["subscribe"] = topic
    else:
        opts["subscribePattern"] = java_pattern_to_kafka(topic_pattern)
    return opts


def kafka_reader(
    spark: SparkSession,
    bootstrap_servers: str,
    *,
    topic: str | None = None,
    topic_pattern: str | None = None,
    starting_offsets: str = "latest",
    format_name: str = "kafka",
    extra_options: dict[str, str] | None = None,
) -> DataStreamReader:
    """Configured (unloaded) Kafka stream reader.

    ``topic_pattern`` maps the reference's regex subscription
    (``log_track_\\S+`` → ``subscribePattern=log_track_.+``); exactly one of
    topic/topic_pattern must be given.

    ``format_name`` exists for the one sanctioned substitution: the
    wire-compatible ``kafka_fake`` spool source (sources/kafka_fake.py)
    lets the SAME option map + downstream pipeline run end-to-end in
    broker-less environments (tests/test_kafka_e2e.py); production leaves
    the default.  ``extra_options`` passes source-specific extras (the
    fake's spool ``path``).
    """
    opts = kafka_options(
        bootstrap_servers,
        topic=topic,
        topic_pattern=topic_pattern,
        starting_offsets=starting_offsets,
    )
    if extra_options:
        opts.update(extra_options)
    return spark.readStream.format(format_name).options(**opts)


def with_topic_and_value(df: DataFrame) -> DataFrame:
    """S4 equivalent: project (topic, value-as-string) — built-in columns,
    nothing to deserialize (SURVEY.md §2.1 S4)."""
    return df.select(F.col("topic"), F.col("value").cast("string").alias("value"))


def string_values(df: DataFrame) -> DataFrame:
    """SimpleStringSchema equivalent: UTF-8 string values only."""
    return df.select(F.col("value").cast("string").alias("value"))
