"""Ninth-wave operators: EWMA recurrence, grid resample with forward fill,
2-D Pareto skyline, histogram-sketch quantiles."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from decisions_knowledge_graph_data_ray.stages.cardinality import (
    histogram_quantiles,
    histogram_registers,
)
from decisions_knowledge_graph_data_ray.stages.selection import skyline_2d
from decisions_knowledge_graph_data_ray.stages.windows import ewma, resample_ffill


def _ts(s):
    return pd.Timestamp(s)


# --- ewma ----------------------------------------------------------------------


def test_ewma_matches_pandas_ewm(ray_session):
    rng = np.random.default_rng(9)
    df = pd.DataFrame(
        {
            "event_id": np.arange(300),
            "user_id": rng.integers(0, 5, 300),
            "ts": pd.date_range("2024-01-01", periods=300, freq="7min"),
            "value": rng.uniform(0, 100, 300),
        }
    )
    out = (
        ewma(rd.from_pandas(df).repartition(4), alpha=0.3)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    exp = df.sort_values(["user_id", "ts", "event_id"]).copy()
    exp["ewma"] = exp.groupby("user_id")["value"].transform(
        lambda s: s.ewm(alpha=0.3, adjust=False).mean()
    )
    exp = exp.sort_values("event_id").reset_index(drop=True)
    np.testing.assert_allclose(out["ewma"], exp["ewma"], rtol=1e-12)
    assert list(out["event_id"]) == list(exp["event_id"])


def test_ewma_single_event_is_identity(ray_session):
    df = pd.DataFrame(
        {"event_id": [1], "user_id": [7], "ts": [_ts("2024-01-01")], "value": [42.5]}
    )
    out = ewma(rd.from_pandas(df), alpha=0.3).to_pandas()
    assert out.iloc[0]["ewma"] == 42.5


# --- resample_ffill --------------------------------------------------------------


def test_resample_ffill_grid_and_gaps(ray_session):
    df = pd.DataFrame(
        {
            "event_id": [1, 2, 3],
            "user_id": [1, 1, 1],
            "ts": [_ts("2024-01-01 00:30"), _ts("2024-01-01 00:45"),
                   _ts("2024-01-01 03:10")],
            "event_type": ["a", "b", "c"],
            "value": [1.0, 2.0, 3.0],
        }
    )
    out = (
        resample_ffill(rd.from_pandas(df), freq_s=3600)
        .to_pandas()
        .sort_values("slot_ts")
        .reset_index(drop=True)
    )
    # slots 00:00..03:00; slot 00 carries the LAST event inside [00,01) = b;
    # gap hours forward-fill b; slot 03 carries c
    assert list(out["slot_ts"]) == list(pd.date_range("2024-01-01", periods=4, freq="h"))
    assert list(out["event_type"]) == ["b", "b", "b", "c"]
    assert list(out["value"]) == [2.0, 2.0, 2.0, 3.0]


def test_resample_ffill_duplicate_ts_latest_write_wins(ray_session):
    t = _ts("2024-01-01 05:20")
    df = pd.DataFrame(
        {
            "event_id": [10, 11],
            "user_id": [2, 2],
            "ts": [t, t],
            "event_type": ["old", "new"],
            "value": [1.0, 2.0],
        }
    )
    out = resample_ffill(rd.from_pandas(df), freq_s=3600).to_pandas()
    assert len(out) == 1
    assert out.iloc[0]["event_type"] == "new" and out.iloc[0]["value"] == 2.0


def test_resample_ffill_per_key_span(ray_session):
    df = pd.DataFrame(
        {
            "event_id": [1, 2],
            "user_id": [1, 2],
            "ts": [_ts("2024-01-01 00:10"), _ts("2024-01-05 09:10")],
            "event_type": ["a", "b"],
            "value": [1.0, 2.0],
        }
    )
    out = resample_ffill(rd.from_pandas(df), freq_s=3600).to_pandas()
    # one single-slot grid per user — never the global span
    assert len(out) == 2


# --- skyline_2d ------------------------------------------------------------------


def test_skyline_known_frontier(ray_session):
    df = pd.DataFrame(
        {
            "id": [1, 2, 3, 4, 5, 6],
            "price": [10.0, 10.0, 12.0, 8.0, 15.0, 8.0],
            "size": [5, 3, 6, 4, 6, 4],
        }
    )
    # frontier: (8,4) x2 (duplicates both survive), (10,5), (12,6)
    # dominated: (10,3) by (10,5); (15,6) by (12,6)
    out = (
        skyline_2d(rd.from_pandas(df).repartition(3), min_col="price", max_col="size")
        .to_pandas()
        .sort_values("id")
    )
    assert list(out["id"]) == [1, 3, 4, 6]


def test_skyline_matches_bruteforce(ray_session):
    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {
            "id": np.arange(400),
            "price": rng.uniform(0, 100, 400).round(1),
            "size": rng.integers(0, 50, 400),
        }
    )
    out = skyline_2d(
        rd.from_pandas(df).repartition(7), min_col="price", max_col="size"
    ).to_pandas()
    p = df["price"].to_numpy()[:, None]
    s = df["size"].to_numpy()[:, None]
    dominated = (
        (p.T <= p) & (s.T >= s) & ((p.T < p) | (s.T > s))
    ).any(axis=1)
    exp = df[~dominated]
    assert sorted(out["id"]) == sorted(exp["id"])


# --- histogram sketch -------------------------------------------------------------


def test_histogram_registers_partition_invariant(ray_session):
    rng = np.random.default_rng(5)
    df = pd.DataFrame(
        {"g": rng.choice(["x", "y"], 2000), "v": rng.uniform(0, 100, 2000)}
    )
    a = histogram_registers(rd.from_pandas(df).repartition(2), "v", "g", 0.0, 2.0, 64)
    b = histogram_registers(rd.from_pandas(df).repartition(17), "v", "g", 0.0, 2.0, 64)
    key = ["g", "bin"]
    pd.testing.assert_frame_equal(
        a.to_pandas().sort_values(key).reset_index(drop=True),
        b.to_pandas().sort_values(key).reset_index(drop=True),
    )
    # counts conserve rows
    assert a.to_pandas()["n"].sum() == 2000


def test_histogram_registers_clamps_out_of_range(ray_session):
    df = pd.DataFrame({"g": ["a", "a"], "v": [-5.0, 1e9]})
    out = histogram_registers(rd.from_pandas(df), "v", "g", 0.0, 1.0, 8).to_pandas()
    assert sorted(out["bin"]) == [0, 7]


def test_histogram_quantiles_within_one_bin_of_exact(ray_session):
    rng = np.random.default_rng(6)
    vals = rng.uniform(0, 100, 5000)
    df = pd.DataFrame({"g": "all", "v": vals})
    width = 1.0
    out = histogram_quantiles(
        rd.from_pandas(df).repartition(5), "v", "g", 0.0, width, 128,
        quantiles=[(1, 2), (9, 10), (99, 100)],
    ).to_pandas().set_index(["q_num", "q_den"])
    for (num, den) in [(1, 2), (9, 10), (99, 100)]:
        exact = np.sort(vals)[int(np.ceil(num * len(vals) / den)) - 1]
        est = out.loc[(num, den), "est_value"]
        assert abs(est - exact) <= width + 1e-9
        assert out.loc[(num, den), "n"] == 5000
