"""Eleventh-wave operators: deterministic mode, PSI distribution drift,
exact-moment z-score outlier flags."""

import math

import numpy as np
import pandas as pd
import ray.data as rd

from decisions_knowledge_graph_data_ray.stages.diagnostics import (
    distribution_drift_psi,
    zscore_outliers,
)
from decisions_knowledge_graph_data_ray.stages.skew import group_mode


# --- group_mode -----------------------------------------------------------------


def test_group_mode_counts_and_tiebreak(ray_session):
    rows = (
        [{"k": 1, "v": "a"}] * 3 + [{"k": 1, "v": "b"}] * 5
        + [{"k": 2, "v": "z"}] * 2 + [{"k": 2, "v": "y"}] * 2  # tie -> min value
    )
    out = (
        group_mode(rd.from_items(rows).repartition(3), ["k"], "v")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert list(out["mode_value"]) == ["b", "y"]
    assert list(out["n_mode"]) == [5, 2]
    assert list(out["n_rows"]) == [8, 4]


def test_group_mode_partition_invariant(ray_session):
    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {"k": rng.integers(0, 20, 1000), "v": rng.choice(list("abcde"), 1000)}
    )
    a = group_mode(rd.from_pandas(df).repartition(2), ["k"], "v").to_pandas()
    b = group_mode(rd.from_pandas(df).repartition(19), ["k"], "v").to_pandas()
    key = ["k"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True),
    )


# --- distribution_drift_psi --------------------------------------------------------


def test_psi_identical_distributions_near_zero(ray_session):
    rng = np.random.default_rng(7)
    v = rng.uniform(0, 100, 4000)
    df = pd.DataFrame({"g": "all", "v": v})
    out = distribution_drift_psi(
        rd.from_pandas(df), rd.from_pandas(df.copy()),
        value_col="v", group_col="g", vmin=0.0, width=10.0, nbins=10,
    ).to_pandas()
    assert out.iloc[0]["psi"] == 0.0  # same counts both sides -> every term 0
    assert out.iloc[0]["n_base"] == 4000 and out.iloc[0]["n_current"] == 4000


def test_psi_shifted_distribution_positive(ray_session):
    rng = np.random.default_rng(8)
    base = pd.DataFrame({"g": "all", "v": rng.uniform(0, 50, 3000)})
    cur = pd.DataFrame({"g": "all", "v": rng.uniform(50, 100, 3000)})
    out = distribution_drift_psi(
        rd.from_pandas(base), rd.from_pandas(cur),
        value_col="v", group_col="g", vmin=0.0, width=10.0, nbins=10,
    ).to_pandas()
    assert out.iloc[0]["psi"] > 1.0  # disjoint supports -> severe drift


def test_psi_matches_reference_fold(ray_session):
    base = pd.DataFrame({"g": "x", "v": [1.0, 1.0, 25.0]})
    cur = pd.DataFrame({"g": "x", "v": [1.0, 25.0, 25.0, 45.0]})
    out = distribution_drift_psi(
        rd.from_pandas(base), rd.from_pandas(cur),
        value_col="v", group_col="g", vmin=0.0, width=10.0, nbins=5,
    ).to_pandas()
    # bins: base {0:2, 2:1}, cur {0:1, 2:2, 4:1}; union bins 0,2,4
    nb, nc = 3, 4
    exp = 0.0
    for b_n, c_n in [(2, 1), (1, 2), (1, 1)]:  # bin 4: base floored to 1
        p, q = float(max(b_n, 1)) / nb, float(max(c_n, 1)) / nc
        exp = exp + (p - q) * math.log(p / q)
    assert out.iloc[0]["psi"] == exp


# --- zscore_outliers ---------------------------------------------------------------


def test_zscore_flags_injected_outlier(ray_session):
    rng = np.random.default_rng(9)
    vals = np.concatenate([rng.normal(50, 2, 999), [500.0]])
    df = pd.DataFrame({"id": np.arange(1000), "g": "a", "v": vals})
    out = (
        zscore_outliers(
            rd.from_pandas(df).repartition(4), value_col="v", group_col="g",
            id_col="id",
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert bool(out.iloc[999]["is_outlier"])
    # the bulk of a tight normal is not flagged
    assert out["is_outlier"].sum() < 20


def test_zscore_matches_float_reference(ray_session):
    rng = np.random.default_rng(10)
    df = pd.DataFrame(
        {
            "id": np.arange(2000),
            "g": rng.choice(["a", "b"], 2000),
            "v": rng.uniform(0, 100, 2000),
        }
    )
    out = (
        zscore_outliers(
            rd.from_pandas(df).repartition(5), value_col="v", group_col="g",
            id_col="id", n_sigma=2.0,
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    # reference on the QUANTIZED values (population sigma)
    q = np.floor(df["v"].to_numpy() * 100.0 + 0.5)
    ref = np.zeros(len(df), dtype=bool)
    for g in ("a", "b"):
        m = (df["g"] == g).to_numpy()
        mu, sig = q[m].mean(), q[m].std()
        ref[m] = np.abs(q[m] - mu) > 2.0 * sig
    got = out["is_outlier"].to_numpy()
    # boundary rows can differ by float association; require near-identity
    assert (got == ref).mean() > 0.999
