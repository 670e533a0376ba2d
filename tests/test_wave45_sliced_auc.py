"""Wave-45: sliced AUC per group."""

import ray.data as rd


def test_sliced_auc_per_group_and_degenerate(ray_session):
    from decisions_knowledge_graph_data_ray.stages.diagnostics import (
        roc_auc_by_group,
    )

    rows = []
    # slice A: perfectly separated → auc 1.0
    for i, (s, l) in enumerate([(1, 0), (2, 0), (9, 1), (10, 1)]):
        rows.append({"g": "A", "score": float(s), "label": bool(l)})
    # slice B: anti-separated → auc 0.0
    for i, (s, l) in enumerate([(9, 0), (10, 0), (1, 1), (2, 1)]):
        rows.append({"g": "B", "score": float(s), "label": bool(l)})
    # slice C: one class only → degenerate 0.0
    rows.append({"g": "C", "score": 5.0, "label": True})
    out = (
        roc_auc_by_group(rd.from_items(rows).repartition(3), "score", "label", "g")
        .to_pandas()
        .set_index("g")
        .sort_index()
    )
    assert out.loc["A", "auc"] == 1.0
    assert out.loc["B", "auc"] == 0.0
    assert out.loc["C", "auc"] == 0.0 and out.loc["C", "n_neg"] == 0


def test_sliced_auc_matches_global_when_one_group(ray_session):
    import numpy as np

    from decisions_knowledge_graph_data_ray.stages.diagnostics import (
        roc_auc,
        roc_auc_by_group,
    )

    rng = np.random.default_rng(17)
    rows = [
        {
            "g": "only",
            "score": float(np.round(rng.normal(loc=l), 1)),
            "label": bool(l),
        }
        for l in (rng.random(150) < 0.4)
    ]
    a = roc_auc(rd.from_items(rows), "score", "label")["auc"].iloc[0]
    b = (
        roc_auc_by_group(rd.from_items(rows), "score", "label", "g")
        .to_pandas()["auc"]
        .iloc[0]
    )
    assert a == b
