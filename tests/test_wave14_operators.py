"""Fourteenth-wave operators: SCD-2 interval builder, co-purchase pair mining."""

import numpy as np
import pandas as pd
import ray.data as rd

from decisions_knowledge_graph_data_ray.stages.graph import cocitation_pairs
from decisions_knowledge_graph_data_ray.stages.windows import scd2_intervals


def _ts(s):
    return pd.Timestamp(s)


def test_scd2_compresses_runs(ray_session):
    df = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4, 5],
            "user_id": [1] * 5,
            "ts": pd.date_range("2024-01-01", periods=5, freq="h"),
            "event_type": ["a", "a", "b", "b", "a"],
        }
    )
    out = (
        scd2_intervals(rd.from_pandas(df), value_col="event_type")
        .to_pandas()
        .sort_values("valid_from")
        .reset_index(drop=True)
    )
    assert list(out["event_type"]) == ["a", "b", "a"]
    assert list(out["start_event_id"]) == [1, 3, 5]
    # each run's valid_to == the next run's valid_from; last is open
    assert list(out["valid_to"][:-1]) == list(out["valid_from"][1:])
    assert pd.isna(out["valid_to"].iloc[-1])


def test_scd2_single_run_per_key(ray_session):
    df = pd.DataFrame(
        {
            "event_id": [1, 2],
            "user_id": [1, 2],
            "ts": [_ts("2024-01-01"), _ts("2024-01-02")],
            "event_type": ["x", "y"],
        }
    )
    out = scd2_intervals(rd.from_pandas(df).repartition(2), value_col="event_type").to_pandas()
    assert len(out) == 2 and out["valid_to"].isna().all()


def test_scd2_matches_pandas_reference(ray_session):
    rng = np.random.default_rng(15)
    df = pd.DataFrame(
        {
            "event_id": np.arange(2000),
            "user_id": rng.integers(0, 10, 2000),
            "ts": pd.date_range("2024-01-01", periods=2000, freq="3min"),
            "event_type": rng.choice(["a", "b"], 2000),
        }
    )
    out = (
        scd2_intervals(rd.from_pandas(df).repartition(5), value_col="event_type")
        .to_pandas()
        .sort_values(["user_id", "valid_from"])
        .reset_index(drop=True)
    )
    ref_rows = []
    for uid, g in df.sort_values(["ts", "event_id"]).groupby("user_id"):
        runs = g[g["event_type"].ne(g["event_type"].shift())]
        starts = runs["ts"].tolist()
        for i, (_, r) in enumerate(runs.iterrows()):
            ref_rows.append(
                {
                    "user_id": uid,
                    "event_type": r["event_type"],
                    "start_event_id": r["event_id"],
                    "valid_from": r["ts"],
                    "valid_to": starts[i + 1] if i + 1 < len(starts) else pd.NaT,
                }
            )
    ref = pd.DataFrame(ref_rows).sort_values(["user_id", "valid_from"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, ref[out.columns], check_dtype=False)


def test_copurchase_counts_via_cocitation(ray_session):
    # baskets: {A,B,C}, {A,B}, {C}
    rows = [
        {"o": 1, "t": "A"}, {"o": 1, "t": "B"}, {"o": 1, "t": "C"},
        {"o": 2, "t": "A"}, {"o": 2, "t": "B"}, {"o": 2, "t": "A"},  # dup row
        {"o": 3, "t": "C"},
    ]
    out = (
        cocitation_pairs(rd.from_items(rows).repartition(3), group_col="o", node_col="t")
        .to_pandas()
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    got = {(r.src, r.dst): r.n_groups for r in out.itertuples()}
    assert got == {("A", "B"): 2, ("A", "C"): 1, ("B", "C"): 1}
