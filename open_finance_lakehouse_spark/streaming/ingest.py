"""Structured Streaming ingest lane: JSONL file source → validated bronze
(good + dead-letter) → watermarked windowed silver.

Re-expresses the reference's streaming architecture (SURVEY.md §2.9) on our
table format:

- **Pinned wire schema, never inferred** — explicit DDL handed to
  ``from_json`` (/root/reference/ofl/streaming/schema.py:1-38: inference on
  streams is rejected as unsafe; PERMISSIVE null-struct marks bad rows).
- **Validity travels with the row** as ``_valid``/``_reason`` columns
  (/root/reference/ofl/streaming/bronze.py:109-142), then one filter splits
  good/dead-letter (P3/P4).
- **foreachBatch dual-sink**: one parse feeds two sinks advancing one
  checkpoint; the micro-batch is persisted so it is read once
  (/root/reference/ofl/streaming/bronze.py:237-264).
- **Idempotent replay**: a (txn_app_id, txn_id) marker commits INSIDE each
  sink's snapshot summary — atomic with the data, checked per sink, so a
  replayed micro-batch is a no-op across any crash window (Delta
  txnAppId/txnVersion equivalent,
  /root/reference/ofl/streaming/bronze.py:185-194).
- **Watermark + tumbling window + bounded-state dedup** on the silver hop
  (/root/reference/ofl/streaming/silver.py:103-121), aggregation algebra
  shared with the batch path (``build_minute_rollup`` runs on static frames
  too — the reference's reuse contract, silver.py:92-99).
- **Trigger modes**: processing-time or ``availableNow`` drain-and-exit
  sharing one checkpoint (/root/reference/ofl/streaming/bronze.py:88-106).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from open_finance_lakehouse_spark.format.table import LakeTable
from open_finance_lakehouse_spark.plans.ledger import CheckpointLedger

# case-sensitive single-letter wire fields, decimals as strings — the
# reference's trade-event shape (/root/reference/ofl/streaming/schema.py:24-38)
EVENT_WIRE_DDL = (
    "e STRING, E LONG, s STRING, t LONG, p STRING, q STRING, "
    "T LONG, m BOOLEAN"
)

BRONZE_DDL = (
    "event_key STRING, symbol STRING, trade_id LONG, price DOUBLE, "
    "qty DOUBLE, trade_time TIMESTAMP, is_maker BOOLEAN, raw STRING"
)

DEAD_LETTER_DDL = "raw STRING, _reason STRING"

ROLLUP_DDL = (
    "window_start TIMESTAMP, window_end TIMESTAMP, symbol STRING, "
    "n_trades BIGINT, volume DOUBLE, high DOUBLE, low DOUBLE, "
    "open DOUBLE, close DOUBLE"
)


def prepare_events(raw: DataFrame) -> DataFrame:
    """Parse + tag validity; valid/reason COLUMNS travel with the row so a
    single filter splits sinks (reference P3,
    /root/reference/ofl/streaming/bronze.py:109-142)."""
    evt = raw.withColumn(
        "evt", F.from_json(F.col("value"), EVENT_WIRE_DDL))
    required_null = (
        F.col("evt.s").isNull() | F.col("evt.t").isNull()
        | F.col("evt.p").isNull() | F.col("evt.q").isNull()
        | F.col("evt.T").isNull()
    )
    # PERMISSIVE from_json yields an all-null struct for garbage input —
    # the null-struct test IS the parse check (bronze.py:121-127)
    unparseable = (
        F.col("evt").isNull()
        | (F.col("evt.s").isNull() & F.col("evt.t").isNull()
           & F.col("evt.T").isNull() & F.col("evt.e").isNull())
    )
    tagged = evt.select(
        F.col("value").alias("raw"),
        F.concat_ws(":", F.col("evt.s"), F.col("evt.t")).alias("event_key"),
        F.col("evt.s").alias("symbol"),
        F.col("evt.t").alias("trade_id"),
        F.col("evt.p").try_cast("double").alias("price"),
        F.col("evt.q").try_cast("double").alias("qty"),
        (F.col("evt.T") / 1000).cast("timestamp").alias("trade_time"),
        F.col("evt.m").alias("is_maker"),
        F.when(unparseable, "unparseable_json")
        .when(required_null, "missing_required_field")
        .when(F.col("evt.p").try_cast("double").isNull()
              | F.col("evt.q").try_cast("double").isNull(), "bad_decimal")
        .alias("_reason"),
    )
    return tagged.withColumn("_valid", F.col("_reason").isNull())


def build_minute_rollup(events: DataFrame, window: str = "1 minute",
                        watermark: str = "2 minutes") -> DataFrame:
    """Watermarked tumbling OHLC-style rollup; pure DataFrame algebra usable
    on static frames too (the reference's batch/stream reuse contract,
    /root/reference/ofl/streaming/silver.py:92-99). Deterministic first/last
    via min_by/max_by over (trade_time, trade_id) — never first()/last()
    (/root/reference/ofl/streaming/silver.py:39-44,110-114)."""
    deduped = events
    if events.isStreaming:
        deduped = events.withWatermark("trade_time", watermark) \
            .dropDuplicatesWithinWatermark(["event_key"])
    else:
        # deterministic keeper — NOT dropDuplicates, whose pick varies
        # with shuffle delivery order: conflicting payloads under one key
        # would make batch recomputes disagree with each other (the
        # streaming path keeps the first ARRIVAL, which no batch recompute
        # can observe; a stable rule is the reproducible stand-in)
        from pyspark.sql import Window

        w = Window.partitionBy("event_key").orderBy("trade_time", "trade_id")
        deduped = (events.withColumn("__rn", F.row_number().over(w))
                   .filter(F.col("__rn") == 1).drop("__rn"))
    agg = (
        deduped.groupBy(F.window("trade_time", window).alias("w"), "symbol")
        .agg(
            F.count(F.lit(1)).alias("n_trades"),
            F.sum("qty").alias("volume"),
            F.max("price").alias("high"),
            F.min("price").alias("low"),
            F.expr("min_by(price, struct(trade_time, trade_id))").alias("open"),
            F.expr("max_by(price, struct(trade_time, trade_id))").alias("close"),
        )
    )
    return agg.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "symbol", "n_trades", "volume", "high", "low", "open", "close",
    )


class StreamingIngest:
    """Bronze micro-batch ingest with dual-sink + idempotent-replay ledger."""

    def __init__(self, spark: SparkSession, workdir: str,
                 query_id: str = "bronze-events"):
        if str(spark.conf.get("spark.sql.caseSensitive", "false")
               ).lower() != "true":
            # the wire schema's case-only field pairs (e/E, t/T) are
            # AMBIGUOUS under the default resolver — the first micro-batch
            # would die mid-stream with AMBIGUOUS_REFERENCE; fail fast at
            # construction instead (build_session pins the config)
            raise ValueError(
                "StreamingIngest requires spark.sql.caseSensitive=true "
                "(the trade wire schema has case-only field pairs)")
        self.spark = spark
        self.workdir = workdir
        self.query_id = query_id
        self.bronze = self._table("bronze_events", BRONZE_DDL)
        self.dead = self._table("dead_letter", DEAD_LETTER_DDL)
        self.ledger = CheckpointLedger(os.path.join(workdir, "ledger"))

    def _table(self, name: str, ddl: str) -> LakeTable:
        loc = os.path.join(self.workdir, name)
        if os.path.isdir(os.path.join(loc, "metadata")):
            return LakeTable.load(self.spark, loc)
        return LakeTable.create(self.spark, loc, name, ddl)

    # -- foreachBatch sink -------------------------------------------------

    def write_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """One parse, two sinks; replayed (query_id, batch_id) is a no-op.

        The idempotence marker is the ``(txn_app_id, txn_id)`` pair INSIDE
        each sink's snapshot summary — atomic with the data commit, checked
        per sink. A crash anywhere in this function leaves each sink either
        committed-with-marker or untouched, so the replay appends exactly
        the missing sinks (the Delta txnAppId/txnVersion contract the
        reference records atomically with the write,
        /root/reference/ofl/streaming/bronze.py:185-194; r1 ADVICE fixed the
        three-separate-commits crash window). The ledger record is derived
        run-metrics only — never the skip authority."""
        from open_finance_lakehouse_spark.plans.ledger import (
            STATUS_COMMITTED,
            CheckpointRecord,
        )

        part_id = f"batch={batch_id}"
        txn = {"txn_app_id": self.query_id, "txn_id": int(batch_id)}
        bronze_done = self.bronze.committed_txn(self.query_id, int(batch_id))
        dead_done = self.dead.committed_txn(self.query_id, int(batch_id))
        if bronze_done and dead_done:
            return  # replay: measured no-op
        prepared = prepare_events(batch_df)
        prepared.persist()  # one parse feeds two sinks + counts
        try:
            good = prepared.filter("_valid").select(
                "event_key", "symbol", "trade_id", "price", "qty",
                "trade_time", "is_maker", "raw")
            bad = prepared.filter("NOT _valid").select("raw", "_reason")
            n_good = 0 if bronze_done else good.count()
            n_bad = 0 if dead_done else bad.count()
            if n_good:
                self.bronze.append(good, summary=dict(txn))
            elif not bronze_done:
                # nothing to write: mark the txn with an empty commit so a
                # replay of this batch stays a metadata no-op
                self.bronze.commit_append([], summary=dict(txn))
            if n_bad:
                self.dead.append(bad, summary=dict(txn))
            elif not dead_done:
                self.dead.commit_append([], summary=dict(txn))
            self.ledger.upsert(CheckpointRecord(
                job_id=self.query_id, table="bronze_events",
                partition_id=part_id, file_set_hash=str(batch_id),
                status=STATUS_COMMITTED, rows=n_good + n_bad,
            ))
        finally:
            prepared.unpersist()

    # -- query lifecycles --------------------------------------------------

    def start_bronze(self, landing_dir: str, available_now: bool = True,
                     max_files_per_trigger: int = 64):
        """File-source stream with backpressure; availableNow drains and
        exits on the same checkpoint as a long-running trigger
        (/root/reference/ofl/streaming/bronze.py:88-106,228-232)."""
        raw = (
            self.spark.readStream.format("text")
            .option("maxFilesPerTrigger", str(max_files_per_trigger))
            .load(landing_dir)
        )
        writer = (
            raw.writeStream
            .foreachBatch(self.write_batch)
            .option("checkpointLocation",
                    os.path.join(self.workdir, "_checkpoints", self.query_id))
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def run_silver_rollup(self, window: str = "1 minute") -> DataFrame:
        """Silver hop on committed bronze state (batch recompute of the same
        algebra the streaming hop would maintain incrementally)."""
        return build_minute_rollup(self.bronze.scan(), window=window)


def write_jsonl_batch(path: str, events: list[dict]) -> None:
    """Atomic landing: stage + rename so the stream never reads a partial
    file (/root/reference/ofl/streaming/paths.py:16-19 discipline)."""
    d = os.path.dirname(path)
    if d:  # bare filename: dirname is '' and makedirs('') raises
        os.makedirs(d, exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")
    os.replace(tmp, path)
