"""Eighth-wave operators: bipartite k-core peeling, character entropy,
referential-integrity audit, incremental aggregate-state maintenance."""

import math

import pandas as pd
import pytest
import ray.data as rd

from decisions_knowledge_graph_data_ray.stages.diagnostics import referential_integrity
from decisions_knowledge_graph_data_ray.stages.graph import k_core
from decisions_knowledge_graph_data_ray.stages.skew import (
    aggregate_state,
    combiner_aggregate,
    merge_aggregate_states,
)
from decisions_knowledge_graph_data_ray.stages.text_analysis import char_entropy


# --- k_core -------------------------------------------------------------------


def _kcore_pandas(df: pd.DataFrame, k: int) -> pd.DataFrame:
    """Reference peeling: iterate until fixpoint."""
    cur = df.copy()
    while True:
        sd = cur.groupby("conv_id")["ecli"].size()
        dd = cur.groupby("ecli")["conv_id"].size()
        nxt = cur[
            cur["conv_id"].isin(sd[sd >= k].index) & cur["ecli"].isin(dd[dd >= k].index)
        ]
        if len(nxt) == len(cur):
            return cur.sort_values(["conv_id", "ecli"]).reset_index(drop=True)
        cur = nxt


def test_k_core_cascading_peel(ray_session):
    # d4 hangs off e9 only; removing d4 drops e9's degree support chain:
    # the peel must cascade over multiple rounds, not just one pass.
    edges = [
        ("d1", "e1"), ("d1", "e2"), ("d2", "e1"), ("d2", "e2"),
        ("d3", "e1"), ("d3", "e2"), ("d3", "e9"),
        ("d4", "e9"),            # degree-1 doc -> peeled round 1
        ("d5", "e7"), ("d5", "e8"),  # e7/e8 degree-1 -> d5 cascades
    ]
    df = pd.DataFrame(edges, columns=["conv_id", "ecli"])
    out = (
        k_core(rd.from_pandas(df).repartition(3), k=2)
        .to_pandas()
        .sort_values(["conv_id", "ecli"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, _kcore_pandas(df, 2))
    # the surviving core is exactly the d1-d3 x e1-e2 biclique
    assert set(out["conv_id"]) == {"d1", "d2", "d3"}
    assert set(out["ecli"]) == {"e1", "e2"}


def test_k_core_empty_result(ray_session):
    df = pd.DataFrame({"conv_id": ["a", "b"], "ecli": ["x", "y"]})
    out = k_core(rd.from_pandas(df), k=2).to_pandas()
    assert len(out) == 0


def test_k_core_fixpoint_early_exit_matches_long_unroll(ray_session):
    df = pd.DataFrame(
        [(f"d{i}", f"e{j}") for i in range(6) for j in range(6) if (i + j) % 2 == 0]
        + [("lone", "e0")],
        columns=["conv_id", "ecli"],
    )
    a = k_core(rd.from_pandas(df), k=3, iters=4).to_pandas()
    b = k_core(rd.from_pandas(df), k=3, iters=20).to_pandas()
    key = ["conv_id", "ecli"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True),
    )


# --- char_entropy ---------------------------------------------------------------


def test_char_entropy_known_values(ray_session):
    docs = rd.from_items(
        [
            {"doc_id": "a", "text": "aaaa"},       # single symbol -> 0
            {"doc_id": "b", "text": "abab"},       # uniform 2 -> ln 2
            {"doc_id": "c", "text": "aabb" * 5},   # still ln 2
            {"doc_id": "d", "text": ""},           # empty -> 0 by contract
            {"doc_id": "e", "text": "abcd"},       # uniform 4 -> ln 4
        ]
    )
    out = char_entropy(docs).to_pandas().set_index("doc_id")
    assert out.loc["a", "char_entropy"] == 0.0
    assert out.loc["b", "char_entropy"] == pytest.approx(math.log(2), abs=1e-12)
    assert out.loc["c", "char_entropy"] == pytest.approx(math.log(2), abs=1e-12)
    assert out.loc["d", "char_entropy"] == 0.0 and out.loc["d", "n_chars_text"] == 0
    assert out.loc["e", "char_entropy"] == pytest.approx(math.log(4), abs=1e-12)
    assert out.loc["c", "n_chars_text"] == 20


def test_char_entropy_null_text(ray_session):
    out = char_entropy(rd.from_items([{"doc_id": "n", "text": None}])).to_pandas()
    assert out.iloc[0]["char_entropy"] == 0.0 and out.iloc[0]["n_chars_text"] == 0


# --- referential_integrity ------------------------------------------------------


def test_referential_integrity_counts(ray_session):
    child = rd.from_items(
        [{"fk": 1}, {"fk": 1}, {"fk": 2}, {"fk": 99}, {"fk": 98}]
    ).repartition(2)
    parent = rd.from_items([{"pk": 1}, {"pk": 2}, {"pk": 3}]).repartition(2)
    out = referential_integrity(
        [{"name": "c_fk", "child": child, "child_key": "fk",
          "parent": parent, "parent_key": "pk"}]
    ).to_pandas()
    r = out.iloc[0]
    assert r["rule"] == "c_fk"
    assert r["n_child"] == 5 and r["n_orphans"] == 2          # 99, 98
    assert r["n_parents"] == 3 and r["n_unreferenced"] == 1   # 3


def test_referential_integrity_clean(ray_session):
    child = rd.from_items([{"fk": 1}, {"fk": 2}])
    parent = rd.from_items([{"pk": 1}, {"pk": 2}])
    out = referential_integrity(
        [{"name": "ok", "child": child, "child_key": "fk",
          "parent": parent, "parent_key": "pk"}]
    ).to_pandas()
    assert out.iloc[0]["n_orphans"] == 0 and out.iloc[0]["n_unreferenced"] == 0


# --- aggregate_state / merge_aggregate_states -----------------------------------


def test_aggregate_state_merge_equals_recompute(ray_session):
    import numpy as np

    rng = np.random.default_rng(8)
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c"], 400),
            "v": rng.integers(-50, 50, 400),
        }
    )
    specs = {
        "n": ("count", None),
        "s": ("sum", "v"),
        "lo": ("min", "v"),
        "hi": ("max", "v"),
    }
    base, delta1, delta2 = df.iloc[:150], df.iloc[150:300], df.iloc[300:]
    merged = (
        merge_aggregate_states(
            [
                aggregate_state(rd.from_pandas(p).repartition(3), ["g"], specs)
                for p in (base, delta1, delta2)
            ],
            ["g"],
            specs,
        )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    full = (
        combiner_aggregate(rd.from_pandas(df), ["g"], specs)
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(merged, full, check_dtype=False)


def test_aggregate_state_disjoint_keys_union(ray_session):
    specs = {"n": ("count", None), "s": ("sum", "v")}
    a = aggregate_state(rd.from_items([{"g": "x", "v": 1}]), ["g"], specs)
    b = aggregate_state(rd.from_items([{"g": "y", "v": 5}]), ["g"], specs)
    out = (
        merge_aggregate_states([a, b], ["g"], specs)
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    assert list(out["g"]) == ["x", "y"]
    assert list(out["s"]) == [1, 5]


def test_aggregate_state_rejects_mean(ray_session):
    with pytest.raises(ValueError, match="mergeable"):
        aggregate_state(rd.from_items([{"g": 1, "v": 2}]), ["g"], {"m": ("mean", "v")})
