"""Explicit skew-salting tools (north_rule): two-stage aggs and salted joins."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from graphzeppelin_spark.functions.skew import salted_agg, salted_degrees, salted_join


def test_salted_agg_hub_key(spark):
    """One hub key with 10k rows + a tail: the two-stage sum must equal the
    plain groupBy, and stage 1 must actually spread the hub (every salt
    bucket sees some of it). The salt is a DETERMINISTIC row-content hash
    (retry-safe shuffle key), so rows carry a distinct id."""
    n_hub = 10_000
    pdf = pd.DataFrame(
        {
            "k": ["hub"] * n_hub + [f"t{i}" for i in range(100)],
            "rid": np.arange(n_hub + 100, dtype=np.int64),
            "v": 1,
        }
    )
    df = spark.createDataFrame(pdf)
    out = salted_agg(
        df, ["k"], {"s": F.sum("v")}, {"total": F.sum("s")}, salt=8
    ).toPandas().set_index("k")
    assert out.loc["hub", "total"] == n_hub
    assert (out.drop("hub")["total"] == 1).all()
    # the hub's stage-1 groups actually span every salt bucket
    from graphzeppelin_spark.functions.skew import _row_salt

    salted = df.withColumn("_salt", _row_salt(df, 8, None))
    n_buckets = (
        salted.where(F.col("k") == "hub").select("_salt").distinct().count()
    )
    assert n_buckets == 8
    # and the salt is deterministic: recomputing yields the identical mapping
    a = salted.select("rid", "_salt").toPandas().sort_values("rid", ignore_index=True)
    b = salted.select("rid", "_salt").toPandas().sort_values("rid", ignore_index=True)
    pd.testing.assert_frame_equal(a, b)


def test_salted_join_matches_plain_join(spark):
    """salted_join must return exactly the plain join's rows, for inner and
    left, on a corpus with a planted hub key."""
    fact = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [0] * 5_000 + list(range(1, 200)),
                "x": np.arange(5_199, dtype=np.int64),
            }
        )
    )
    dim = spark.createDataFrame(
        pd.DataFrame({"k": list(range(0, 150)), "label": [f"L{i}" for i in range(150)]})
    )
    for how in ("inner", "left"):
        plain = fact.join(dim, "k", how).select("k", "x", "label").toPandas()
        salted = salted_join(fact, dim, "k", salt=8, how=how).select(
            "k", "x", "label"
        ).toPandas()
        key = ["k", "x", "label"]
        a = plain.fillna("∅").sort_values(key, ignore_index=True)
        b = salted.fillna("∅").sort_values(key, ignore_index=True)
        pd.testing.assert_frame_equal(a, b)


def test_salted_degrees(spark):
    edges = spark.createDataFrame(
        pd.DataFrame({"src": [0, 0, 0, 1], "dst": [1, 2, 3, 2]})
    )
    got = {r["v"]: r["degree"] for r in salted_degrees(edges, salt=4).collect()}
    assert got == {0: 3, 1: 2, 2: 2, 3: 1}
