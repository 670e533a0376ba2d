"""Fifteenth-wave operators: ABC/Pareto classification."""

import numpy as np
import pandas as pd
import ray.data as rd

from decisions_knowledge_graph_data_ray.stages.skew import abc_classification


def _run(df, **kw):
    return (
        abc_classification(rd.from_pandas(df).repartition(4), ["k"], "v", **kw)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )


def _reference(df, a_pct=80, b_pct=95):
    tot = df.groupby("k", as_index=False)["v"].sum()
    tot = tot.sort_values(["v", "k"], ascending=[False, True])
    cum = tot["v"].cumsum()
    grand = int(tot["v"].sum())
    cls = np.where(
        cum * 100 <= a_pct * grand, "A", np.where(cum * 100 <= b_pct * grand, "B", "C")
    )
    out = tot.copy()
    out["cum_value"] = cum
    out["abc_class"] = cls
    return out.sort_values("k").reset_index(drop=True)


def test_abc_matches_single_node_reference(ray_session):
    rng = np.random.default_rng(16)
    df = pd.DataFrame(
        {"k": rng.integers(0, 300, 5000), "v": rng.integers(1, 10_000, 5000)}
    )
    out = _run(df)
    ref = _reference(df)
    pd.testing.assert_frame_equal(
        out[["k", "v", "cum_value", "abc_class"]],
        ref[["k", "v", "cum_value", "abc_class"]].reset_index(drop=True),
        check_dtype=False,
    )
    # sanity: all three classes present and A-keys dominate the revenue
    assert set(out["abc_class"]) == {"A", "B", "C"}


def test_abc_value_ties_and_small_buckets(ray_session):
    # equal values land in one bucket; key ties break ascending
    df = pd.DataFrame({"k": [1, 2, 3, 4], "v": [100, 100, 100, 100]})
    out = _run(df, bucket_width=64)
    ref = _reference(df)
    pd.testing.assert_frame_equal(
        out[["k", "v", "cum_value", "abc_class"]],
        ref[["k", "v", "cum_value", "abc_class"]],
        check_dtype=False,
    )
    assert list(out["abc_class"]) == ["A", "A", "A", "C"]  # 25/50/75/100% cum


def test_abc_single_dominant_key(ray_session):
    df = pd.DataFrame({"k": [1, 2, 3], "v": [97, 2, 1]})
    out = _run(df)
    # inclusive-share convention: the 97% key exceeds a_pct -> 'C' for it?
    # no: cum(97)*100 = 9700 > 80*100 -> not A; > 95*100 -> 'C'
    assert out.set_index("k")["abc_class"].to_dict() == {1: "C", 2: "C", 3: "C"}
