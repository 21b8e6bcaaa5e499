"""Physical-plan quality gates: pushdown, pruning, partial aggregation,
broadcast — the properties that keep these operators viable at 100 TB.
Asserting on explain() output pins them against regressions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphzeppelin_spark.functions.edges import live_edges_df
from graphzeppelin_spark.functions.text import text_profile


@pytest.fixture(scope="module")
def parquet_stream(spark, tmp_path_factory):
    from graphzeppelin_spark.sources.generators import multiples_graph_stream

    p = str(tmp_path_factory.mktemp("plans") / "stream.parquet")
    spark.createDataFrame(multiples_graph_stream(256)).write.parquet(p)
    return spark.read.parquet(p)


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_seq_filter_pushed_to_scan(spark, parquet_stream):
    plan = _plan(live_edges_df(parquet_stream, upto_seq=100))
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l][0]
    assert "LessThan(seq,100)" in pushed


def test_parity_agg_is_partial_then_final(spark, parquet_stream):
    plan = _plan(live_edges_df(parquet_stream))
    # map-side combine: partial_count before the exchange, count after
    assert plan.count("HashAggregate") >= 2
    assert "partial_count" in plan


def test_scan_prunes_unused_columns(spark, parquet_stream):
    plan = _plan(live_edges_df(parquet_stream))
    # live_edges_df needs only src/dst (+seq when filtered); type must be pruned
    assert "ReadSchema" in plan
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "type" not in read_schema


def test_text_profile_reads_only_needed_columns(spark, tmp_path_factory):
    import pandas as pd

    p = str(tmp_path_factory.mktemp("plans") / "docs.parquet")
    spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [1], "text": ["hello"], "lang": ["en"], "source": ["s"], "n_chars": [5]}
        )
    ).write.parquet(p)
    docs = spark.read.parquet(p)
    plan = _plan(text_profile(docs))
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "doc_id" in read_schema and "text" in read_schema
    assert "n_chars" not in read_schema and "source" not in read_schema


def test_boruvka_label_join_broadcasts(spark, parquet_stream):
    """The per-round labels join must be a broadcast, not a sort-merge —
    sketch rows are KB-sized; shuffling them on the join key would dominate."""
    import numpy as np
    import pandas as pd

    from graphzeppelin_spark.operators.sketch_cc import SketchCC

    alg = SketchCC(spark, num_vertices=256, seed=3)
    state = alg.build_state(parquet_stream)
    labels_df = F.broadcast(
        spark.createDataFrame(
            pd.DataFrame({"vertex": np.arange(256), "root": np.zeros(256, dtype=np.int64)})
        )
    )
    plan = _plan(state.join(labels_df, "vertex"))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
