"""Profiling + skew diagnostics (stages/diagnostics.py)."""

from __future__ import annotations

import hashlib

import pandas as pd
import ray.data as rd

from decisions_knowledge_graph_data_ray.stages.diagnostics import (
    key_skew_histogram,
    profile_columns,
)


def _hll_digest(values) -> tuple[int, int, int]:
    regs: dict[int, int] = {}
    for v in values:
        u = int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16)
        rem = u & ((1 << 26) - 1)
        rho = 26 - rem.bit_length() + 1
        b = u >> 26
        regs[b] = max(regs.get(b, 0), rho)
    return len(regs), sum(regs.values()), max(regs.values()) if regs else 0


def test_profile_columns_stats_and_hll(ray_session):
    rows = [
        {"id": i, "name": None if i % 5 == 0 else f"n{i % 7:02d}"}
        for i in range(200)
    ]
    out = profile_columns(rd.from_items(rows), ["id", "name"]).set_index("column")

    assert out.loc["id", "n_rows"] == 200 and out.loc["id", "n_nulls"] == 0
    # native int ordering: min is "0", max is "199" (string min would be "0"/"99")
    assert out.loc["id", "min_value"] == "0" and out.loc["id", "max_value"] == "199"
    assert out.loc["name", "n_nulls"] == 40
    assert out.loc["name", "min_value"] == "n00" and out.loc["name", "max_value"] == "n06"

    nz, sr, mx = _hll_digest(range(200))
    assert (
        out.loc["id", ["hll_nonzero", "hll_sum_rho", "hll_max_rho"]].tolist()
        == [nz, sr, mx]
    )
    names = [r["name"] for r in rows if r["name"] is not None]
    nz, sr, mx = _hll_digest(names)
    assert (
        out.loc["name", ["hll_nonzero", "hll_sum_rho", "hll_max_rho"]].tolist()
        == [nz, sr, mx]
    )


def test_rank_transform_matches_pandas_rank(ray_session):
    from decisions_knowledge_graph_data_ray.stages.diagnostics import rank_transform

    rows = [{"doc_id": i, "v": (i * 13) % 17} for i in range(150)]  # heavy ties
    ds = rd.from_items(rows)
    out = (
        rank_transform(ds, "v")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    df = pd.DataFrame(rows)
    want_lt = df["v"].rank(method="min").astype("int64") - 1
    want_eq = df.groupby("v")["v"].transform("size").astype("int64")
    assert out["rank_lt"].tolist() == want_lt.tolist()
    assert out["rank_eq"].tolist() == want_eq.tolist()
    # partition-invariant
    out2 = (
        rank_transform(ds.repartition(8), "v")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, out2)


def test_key_skew_histogram_matches_pandas(ray_session):
    # user u appears u+1 times for u in 0..19 → every count 1..20 once
    rows = [{"u": u} for u in range(20) for _ in range(u + 1)]
    ds = rd.from_items(rows)
    out = (
        key_skew_histogram(ds, "u")
        .to_pandas()
        .sort_values("key_count")
        .reset_index(drop=True)
    )
    assert out["key_count"].tolist() == list(range(1, 21))
    assert (out["n_keys"] == 1).all()

    # partition-invariant (combiner totals must be exact, not per-block)
    out2 = (
        key_skew_histogram(ds.repartition(9), "u")
        .to_pandas()
        .sort_values("key_count")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, out2)


def test_group_quantiles_matches_numpy(ray_session):
    import numpy as np

    from decisions_knowledge_graph_data_ray.stages.diagnostics import group_quantiles

    rows = [
        {"g": f"g{i % 3}", "v": (i * 7) % 23}  # ties + uneven group sizes
        for i in range(101)
    ]
    ds = rd.from_items(rows)
    out = (
        group_quantiles(ds, value_col="v", group_col="g", qs=(0.25, 0.5, 0.75, 0.9))
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    df = pd.DataFrame(rows)
    for _, r in out.iterrows():
        vals = np.sort(df.loc[df["g"] == r["g"], "v"].to_numpy())
        n = len(vals)
        assert r["n"] == n
        for q, col in [(0.25, "q25"), (0.5, "q50"), (0.75, "q75"), (0.9, "q90")]:
            # percentile_disc: 1-indexed ceil(q*n)-th sorted value
            idx = -((-int(q * 100) * n) // 100)
            assert r[col] == vals[idx - 1], (r["g"], col)
    # partition-invariant
    out2 = (
        group_quantiles(ds.repartition(8), value_col="v", group_col="g")
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, out2)


def test_bucket_by_group_quantiles(ray_session):
    from decisions_knowledge_graph_data_ray.stages.diagnostics import (
        bucket_by_group_quantiles,
    )

    # group g0: values 1..8 -> q25=2, q50=4, q75=6 (percentile_disc)
    rows = [{"id": i, "g": "g0", "v": i + 1} for i in range(8)]
    rows += [{"id": 100 + i, "g": "g1", "v": 10 * (i + 1)} for i in range(4)]
    ds = rd.from_items(rows)
    out = (
        bucket_by_group_quantiles(ds, value_col="v", group_col="g", id_col="id")
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    g0 = out[out["g"] == "g0"]
    assert g0["bucket"].tolist() == ["q1", "q1", "q2", "q2", "q3", "q3", "q4", "q4"]
    g1 = out[out["g"] == "g1"]  # 10,20,30,40 -> q25=10,q50=20,q75=30
    assert g1["bucket"].tolist() == ["q1", "q2", "q3", "q4"]
    # partition-invariant
    out2 = (
        bucket_by_group_quantiles(
            ds.repartition(5), value_col="v", group_col="g", id_col="id"
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, out2)
