"""Wave-38: LOO target encoding, exact Gini coefficient."""

import numpy as np
import ray.data as rd


def test_target_encode_loo_excludes_self(ray_session):
    from decisions_knowledge_graph_data_ray.stages.diagnostics import (
        target_encode_loo,
    )

    rows = [
        {"i": 1, "cat": "a", "y": 1.0},
        {"i": 2, "cat": "a", "y": 2.0},
        {"i": 3, "cat": "a", "y": 3.0},
        {"i": 4, "cat": "b", "y": 10.0},  # singleton → global LOO fallback
    ]
    out = (
        target_encode_loo(rd.from_items(rows).repartition(2), "cat", "y", "i")
        .to_pandas()
        .set_index("i")
        .sort_index()
    )
    # cat a sums (cents): 100+200+300=600; LOO of row1 = (600-100)/2 = 250
    assert out.loc[1, "loo_enc"] == 250.0
    assert out.loc[2, "loo_enc"] == 200.0
    assert out.loc[3, "loo_enc"] == 150.0
    # singleton b: global (1600-1000)/3 = 200
    assert out.loc[4, "loo_enc"] == 200.0


def test_gini_extremes_and_reference(ray_session):
    from decisions_knowledge_graph_data_ray.stages.diagnostics import (
        gini_coefficient,
    )

    # perfectly equal → 0
    eq = rd.from_items([{"v": 5.0}] * 8)
    assert gini_coefficient(eq, "v")["gini"].iloc[0] == 0.0
    # one owner takes all: G = (n-1)/n
    conc = rd.from_items([{"v": 0.0}] * 7 + [{"v": 100.0}])
    assert abs(gini_coefficient(conc, "v")["gini"].iloc[0] - 7 / 8) < 1e-12
    # reference formula on random integers
    rng = np.random.default_rng(4)
    vals = rng.integers(1, 1000, size=200)
    ds = rd.from_items([{"v": float(v)} for v in vals]).repartition(5)
    got = gini_coefficient(ds, "v", quantize_scale=1.0)["gini"].iloc[0]
    x = np.sort(vals)
    n = len(x)
    want = (2 * np.sum((np.arange(1, n + 1)) * x) - (n + 1) * x.sum()) / (
        n * x.sum()
    )
    assert abs(got - want) < 1e-12
