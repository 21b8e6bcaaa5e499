"""Structured Streaming live mode: readStream → foreachBatch → sketch state.

The batch driver (driver.py) replays a seq-ordered table deterministically —
the reference's model. This wrapper runs the same linear-merge ingest against
a *live* file stream (new parquet files appearing in a directory, the
Spark-native stand-in for a Kafka topic): each micro-batch's updates fold
into the sketch state inside foreachBatch, and queries run against the
current state between (or during) triggers.

Because the sketch is a commutative, associative, invertible aggregate,
exactly-once vs at-least-once delivery is the only correctness concern —
foreachBatch + the streaming checkpoint gives exactly-once batch replay, and
our own snapshot store versions the state per batch for resumability.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from graphzeppelin_spark.operators.sketch_cc import SketchCC
from graphzeppelin_spark.sources.stream import STREAM_SCHEMA
from graphzeppelin_spark.streaming.checkpoint import CheckpointStore


class LiveGraphStream:
    def __init__(
        self,
        spark: SparkSession,
        source_dir: str,
        num_vertices: int,
        stream_checkpoint_dir: str,
        state_checkpoint_dir: str | None = None,
        seed: int = 42,
        variant: str = "cubesketch",
    ):
        self.spark = spark
        self.alg = SketchCC(spark, num_vertices, seed=seed, variant=variant)
        self.num_vertices = num_vertices
        self.state: DataFrame | None = None
        self.batches_seen = 0
        self.store = (
            CheckpointStore(spark, state_checkpoint_dir) if state_checkpoint_dir else None
        )
        import os

        os.makedirs(source_dir, exist_ok=True)
        self._source = (
            spark.readStream.schema(STREAM_SCHEMA).parquet(source_dir)
        )
        self._stream_ckpt = stream_checkpoint_dir
        self._seed = seed
        self._variant = variant

    def _fold_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        delta = self.alg.build_state(batch_df)
        new_state = (
            delta if self.state is None else self.alg.merge_states(self.state, delta)
        )
        new_state = new_state.localCheckpoint(eager=True)
        if self.store is not None:
            self.store.commit(
                new_state,
                {
                    "seed": self._seed,
                    "num_vertices": self.num_vertices,
                    "variant": self._variant,
                    "seq_watermark": -1,  # live mode: ordering comes from the source
                    "stream_batch_id": int(batch_id),
                },
            )
        if self.state is not None:
            self.state.unpersist()
        self.state = new_state.persist()
        self.batches_seen += 1

    def process_available(self) -> None:
        """Consume everything currently in the source directory and stop
        (Trigger.AvailableNow) — the streaming analog of process_stream_until."""
        q = (
            self._source.writeStream.foreachBatch(self._fold_batch)
            .option("checkpointLocation", self._stream_ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def connected_components(self) -> np.ndarray:
        if self.state is None:
            return np.arange(self.num_vertices, dtype=np.int64)
        labels, _ = self.alg.boruvka(self.state)
        return labels
