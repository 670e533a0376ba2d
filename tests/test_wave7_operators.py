"""Seventh-wave operators: grouping sets, KMV sketches, constraint
validation, snapshot diff (CDC), rolling window frames, fuzzy term join."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from decisions_knowledge_graph_data_ray.stages.cardinality import (
    kmv_group_jaccard,
    kmv_registers,
)
from decisions_knowledge_graph_data_ray.stages.diagnostics import validate_constraints
from decisions_knowledge_graph_data_ray.stages.joins import snapshot_diff
from decisions_knowledge_graph_data_ray.stages.skew import grouping_sets_aggregate
from decisions_knowledge_graph_data_ray.stages.text_analysis import fuzzy_term_pairs
from decisions_knowledge_graph_data_ray.stages.windows import rolling_window_sum


# --- grouping_sets_aggregate ------------------------------------------------


def test_grouping_sets_rollup_matches_pandas(ray_session):
    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {
            "a": rng.integers(2000, 2003, 500),
            "b": rng.choice(["x", "y", "z"], 500),
            "v": rng.integers(0, 100, 500),
        }
    )
    out = (
        grouping_sets_aggregate(
            rd.from_pandas(df).repartition(7),
            sets=[["a", "b"], ["a"], []],
            specs={"n": ("count", None), "s": ("sum", "v")},
            sentinels={"a": -1, "b": "ALL"},
        )
        .to_pandas()
        .sort_values(["grouping_level", "a", "b"])
        .reset_index(drop=True)
    )
    fine = df.groupby(["a", "b"]).agg(n=("v", "size"), s=("v", "sum")).reset_index()
    mid = df.groupby(["a"]).agg(n=("v", "size"), s=("v", "sum")).reset_index()
    mid["b"] = "ALL"
    tot = pd.DataFrame({"a": [-1], "b": ["ALL"], "n": [len(df)], "s": [df["v"].sum()]})
    for lvl, exp in enumerate([fine, mid, tot]):
        got = out[out["grouping_level"] == lvl].reset_index(drop=True)
        exp = exp.sort_values(["a", "b"]).reset_index(drop=True)
        assert len(got) == len(exp)
        assert (got["n"].to_numpy() == exp["n"].to_numpy()).all()
        assert (got["s"].to_numpy() == exp["s"].to_numpy()).all()


def test_grouping_sets_missing_sentinel_raises(ray_session):
    ds = rd.from_items([{"a": 1, "v": 2}])
    with pytest.raises(ValueError, match="sentinel"):
        grouping_sets_aggregate(ds, [["a"], []], {"n": ("count", None)}, {})


# --- KMV --------------------------------------------------------------------


def test_kmv_registers_layout_invariant(ray_session):
    rows = [{"g": f"t{i % 3}", "k": i % 57} for i in range(1000)]
    a = kmv_registers(rd.from_items(rows).repartition(2), "k", "g", k=16).to_pandas()
    b = kmv_registers(rd.from_items(rows).repartition(13), "k", "g", k=16).to_pandas()
    a = a.sort_values(["g", "h"]).reset_index(drop=True)
    b = b.sort_values(["g", "h"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # sketch of a 19-distinct-key group with k=16 keeps exactly 16
    assert (a.groupby("g").size() == 16).all()


def test_kmv_jaccard_exact_on_identical_sets(ray_session):
    # two groups over the SAME key set -> union sketch == both sketches
    rows = [{"g": g, "k": i} for g in ("a", "b") for i in range(40)]
    out = kmv_group_jaccard(rd.from_items(rows), "k", "g", k=64)
    assert len(out) == 1
    r = out.iloc[0]
    assert r["n_union_sketch"] == 40 and r["n_common"] == 40
    assert r["est_jaccard"] == 1.0


def test_kmv_jaccard_disjoint_sets(ray_session):
    rows = [{"g": "a", "k": i} for i in range(50)] + [
        {"g": "b", "k": i + 1000} for i in range(50)
    ]
    out = kmv_group_jaccard(rd.from_items(rows), "k", "g", k=32)
    assert out.iloc[0]["n_common"] == 0 and out.iloc[0]["est_jaccard"] == 0.0


# --- validate_constraints -----------------------------------------------------


def test_validate_constraints_counts(ray_session):
    df = pd.DataFrame(
        {
            "id": [1, 2, 2, 3, 4],
            "s": ["A", "B", None, "C", "A"],
            "x": [0.5, -1.0, 2.5, 10.0, None],
            "code": ["a-1", "b-2", "zz", None, "c-3"],
        }
    )
    rules = [
        {"name": "s_not_null", "column": "s", "kind": "not_null"},
        {"name": "s_in", "column": "s", "kind": "in_set", "values": ["A", "B"]},
        {"name": "x_rng", "column": "x", "kind": "range", "lo": 0.0, "hi": 5.0},
        {"name": "code_re", "column": "code", "kind": "regex", "pattern": r"[a-z]-\d"},
        {"name": "id_uniq", "column": "id", "kind": "unique"},
    ]
    out = (
        validate_constraints(rd.from_pandas(df).repartition(3), rules)
        .to_pandas()
        .set_index("rule")
    )
    assert out.loc["s_not_null", "n_violations"] == 1
    assert out.loc["s_in", "n_violations"] == 1  # 'C' (null doesn't violate in_set)
    assert out.loc["x_rng", "n_violations"] == 2  # -1.0 and 10.0; null passes
    assert out.loc["code_re", "n_violations"] == 1  # 'zz'; null passes
    assert out.loc["id_uniq", "n_violations"] == 1  # one duplicated id
    assert out.loc["id_uniq", "n_checked"] == 5
    assert (out["n_checked"].drop("id_uniq") == 5).all()


def test_validate_constraints_unknown_kind(ray_session):
    with pytest.raises(ValueError, match="unknown"):
        validate_constraints(rd.from_items([{"a": 1}]), [{"name": "z", "column": "a", "kind": "nope"}])


# --- snapshot_diff ------------------------------------------------------------


def test_snapshot_diff_statuses(ray_session):
    old = pd.DataFrame({"k": [1, 2, 3, 4], "v": ["a", "b", "c", "d"], "w": [1, 2, 3, 4]})
    new = pd.DataFrame({"k": [2, 3, 4, 5], "v": ["b", "C", "d", "e"], "w": [2, 3, 9, 5]})
    out = (
        snapshot_diff(rd.from_pandas(old), rd.from_pandas(new), "k", ["v", "w"], num_buckets=4)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    got = dict(zip(out["k"], out["status"]))
    # 1 removed; 2 unchanged (absent); 3 changed (v); 4 changed (w); 5 added
    assert got == {1: "removed", 3: "changed", 4: "changed", 5: "added"}


def test_snapshot_diff_null_aware(ray_session):
    old = pd.DataFrame({"k": [1, 2], "v": [None, "x"]})
    new = pd.DataFrame({"k": [1, 2], "v": ["y", None]})
    out = snapshot_diff(
        rd.from_pandas(old), rd.from_pandas(new), "k", ["v"], num_buckets=2
    ).to_pandas()
    assert set(out["status"]) == {"changed"} and len(out) == 2


# --- rolling_window_sum ---------------------------------------------------------


def test_rolling_window_sum_matches_pandas(ray_session):
    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 10, 400),
            "event_id": np.arange(400, dtype=np.int64),
            "ts": pd.to_datetime("2024-01-01") + pd.to_timedelta(rng.integers(0, 10_000, 400), "s"),
            "v": rng.integers(-50, 50, 400),
        }
    )
    out = (
        rolling_window_sum(rd.from_pandas(df).repartition(5), "v", keys=("user_id",), window=3)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    exp = df.sort_values(["user_id", "ts", "event_id"]).copy()
    exp["rolling_sum"] = exp.groupby("user_id")["v"].transform(
        lambda s: s.rolling(3, min_periods=1).sum()
    )
    exp = exp.sort_values("event_id").reset_index(drop=True)
    assert (out["rolling_sum"].to_numpy() == exp["rolling_sum"].to_numpy()).all()


# --- fuzzy_term_pairs ------------------------------------------------------------


def test_fuzzy_term_pairs_finds_distance1_only(ray_session):
    docs = rd.from_items(
        [
            {"text": "alpha bravo charlie delta"},
            {"text": "alpht bravoo charlie delto"},  # alpha~alpht, bravo~bravoo, delta~delto
            {"text": "omega"},  # no neighbor
        ]
    )
    out = fuzzy_term_pairs(docs, min_len=4).to_pandas()
    pairs = set(zip(out["term_a"], out["term_b"]))
    assert ("alpha", "alpht") in pairs
    assert ("bravo", "bravoo") in pairs
    assert ("delta", "delto") in pairs
    assert all(a < b for a, b in pairs)
    assert (out["dist"] == 1).all()
    # distance-2 candidate sharing a deletion must be rejected by the verify
    docs2 = rd.from_items([{"text": "abcd bacd"}])  # share deletion 'acd'? no: bcd/acd
    out2 = fuzzy_term_pairs(docs2, min_len=4).to_pandas()
    assert len(out2) == 0


def test_fuzzy_term_pairs_transposition_is_distance_2(ray_session):
    # 'abxy' vs 'baxy' share the delete-1 variant 'axy' but levenshtein == 2
    docs = rd.from_items([{"text": "abxy baxy"}])
    out = fuzzy_term_pairs(docs, min_len=4).to_pandas()
    assert len(out) == 0
