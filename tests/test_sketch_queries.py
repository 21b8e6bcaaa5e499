"""Secondary sketch query types: k-spanning-forests, component sets."""

from __future__ import annotations

import numpy as np
import pytest

from graphzeppelin_spark import oracle
from graphzeppelin_spark.operators.sketch_cc import SketchCC
from tests.conftest import stream_df


def test_k_spanning_forests_disjoint_and_valid(spark):
    """K4 plus a pendant: two edge-disjoint spanning structures exist."""
    import pandas as pd

    n = 8
    edges = np.array([[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3], [3, 4]])
    s = pd.DataFrame(
        {
            "seq": np.arange(len(edges), dtype=np.int64),
            "type": np.zeros(len(edges), dtype=np.int32),
            "src": edges[:, 0],
            "dst": edges[:, 1],
        }
    )
    alg = SketchCC(spark, num_vertices=n, seed=5)
    state = alg.build_state(stream_df(spark, s))
    forests = alg.k_spanning_forests(state, 2)
    assert len(forests) == 2
    f1 = {tuple(e) for e in np.sort(forests[0], axis=1).tolist()}
    f2 = {tuple(e) for e in np.sort(forests[1], axis=1).tolist()}
    assert f1.isdisjoint(f2)
    assert oracle.spanning_forest_is_valid(forests[0], edges, n)
    # forest 1 spans {0,1,2,3,4}: 4 edges; forest 2 of the remaining graph
    # can still connect the K4 part (3 edges left there)
    assert len(f1) == 4
    assert len(f2) >= 2


def test_component_sets(spark):
    import pandas as pd

    n = 6
    edges = np.array([[0, 1], [1, 2], [4, 5]])
    s = pd.DataFrame(
        {
            "seq": np.arange(len(edges), dtype=np.int64),
            "type": np.zeros(len(edges), dtype=np.int32),
            "src": edges[:, 0],
            "dst": edges[:, 1],
        }
    )
    alg = SketchCC(spark, num_vertices=n, seed=7)
    state = alg.build_state(stream_df(spark, s))
    sets = {r["component"]: r["members"] for r in alg.component_sets(state).collect()}
    assert sets[0] == [0, 1, 2]
    assert sets[3] == [3]
    assert sets[4] == [4, 5]
