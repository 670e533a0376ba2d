"""Thirteenth-wave operators: skew-aware join, clustering coefficients."""

import numpy as np
import pandas as pd
import ray.data as rd

from decisions_knowledge_graph_data_ray.stages.graph import clustering_coefficients
from decisions_knowledge_graph_data_ray.stages.joins import skew_aware_join


def _sorted(df, keys):
    return df.sort_values(keys).reset_index(drop=True)


# --- skew_aware_join -------------------------------------------------------------


def _make_skewed():
    rng = np.random.default_rng(14)
    # key 7 is hot (500 rows), keys 0..19 cold (~25 each); key 99 has no parent
    keys = np.concatenate([np.full(500, 7), rng.integers(0, 20, 500), [99] * 3])
    left = pd.DataFrame({"event_id": np.arange(len(keys)), "k": keys})
    right = pd.DataFrame({"ck": np.arange(20), "name": [f"c{i}" for i in range(20)]})
    return left, right


def test_skew_join_row_identical_to_plain_merge(ray_session):
    left, right = _make_skewed()
    out = skew_aware_join(
        rd.from_pandas(left).repartition(5),
        rd.from_pandas(right).repartition(2),
        on="k", right_on="ck",
        output_columns=["event_id", "k", "name"],
        hot_threshold=100,
    ).to_pandas()
    exp = left.merge(right, left_on="k", right_on="ck")[["event_id", "k", "name"]]
    pd.testing.assert_frame_equal(
        _sorted(out, ["event_id"]), _sorted(exp, ["event_id"]), check_dtype=False
    )
    # the hot key actually rode the broadcast path (500 forced + the
    # random cold draws that also hit 7)
    assert (out["k"] == 7).sum() == (left["k"] == 7).sum() >= 500


def test_skew_join_no_hot_keys_falls_back(ray_session):
    left = pd.DataFrame({"event_id": [1, 2, 3], "k": [0, 1, 2]})
    right = pd.DataFrame({"ck": [0, 1], "name": ["a", "b"]})
    out = skew_aware_join(
        rd.from_pandas(left), rd.from_pandas(right),
        on="k", right_on="ck", output_columns=["event_id", "name"],
        hot_threshold=100,
    ).to_pandas()
    assert _sorted(out, ["event_id"])["name"].tolist() == ["a", "b"]


def test_skew_join_all_hot(ray_session):
    left = pd.DataFrame({"event_id": range(10), "k": [5] * 10})
    right = pd.DataFrame({"ck": [5], "name": ["x"]})
    out = skew_aware_join(
        rd.from_pandas(left).repartition(3), rd.from_pandas(right),
        on="k", right_on="ck", output_columns=["event_id", "k", "name"],
        hot_threshold=2,
    ).to_pandas()
    assert len(out) == 10 and set(out["name"]) == {"x"}


# --- clustering_coefficients -------------------------------------------------------


def test_clustering_known_graph(ray_session):
    # triangle a-b-c plus pendant d on a: coefficients
    #   a: d=3, T=1 -> 2/(3*2)=1/3 ; b,c: d=2, T=1 -> 1.0 ; d: degree 1 -> excluded
    pairs = pd.DataFrame(
        {"src": ["a", "a", "b", "a"], "dst": ["b", "c", "c", "d"]}
    )
    out = (
        clustering_coefficients(rd.from_pandas(pairs).materialize())
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    assert list(out["node"]) == ["a", "b", "c"]
    assert list(out["degree"]) == [3, 2, 2]
    assert list(out["n_triangles"]) == [1, 1, 1]
    assert out["coefficient"].tolist() == [(2.0 * 1) / (3.0 * 2.0), 1.0, 1.0]


def test_clustering_triangle_free_nodes_zero(ray_session):
    # path graph a-b-c: b has degree 2, zero triangles -> coefficient 0
    pairs = pd.DataFrame({"src": ["a", "b"], "dst": ["b", "c"]})
    out = clustering_coefficients(rd.from_pandas(pairs).materialize()).to_pandas()
    assert list(out["node"]) == ["b"]
    assert out.iloc[0]["n_triangles"] == 0 and out.iloc[0]["coefficient"] == 0.0
