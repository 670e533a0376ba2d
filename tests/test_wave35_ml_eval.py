"""Wave-35 operator tests: exact ROC-AUC (midranks), decile lift table."""

import numpy as np
import ray.data as rd


def _rows(scores, labels):
    return [
        {"i": i, "score": float(s), "label": bool(l)}
        for i, (s, l) in enumerate(zip(scores, labels))
    ]


def test_auc_matches_sklearn_free_reference(ray_session):
    from decisions_knowledge_graph_data_ray.stages.diagnostics import roc_auc

    rng = np.random.default_rng(9)
    n = 300
    labels = rng.random(n) < 0.3
    # positives score higher on average; quantized ties abound
    scores = np.round(rng.normal(loc=labels * 1.0, scale=1.0), 1)
    out = roc_auc(
        rd.from_items(_rows(scores, labels)).repartition(4), "score", "label"
    )
    # reference midrank AUC computed directly
    vq = np.floor(scores * 100 + 0.5).astype(np.int64)
    order = np.argsort(vq, kind="stable")
    ranks = np.empty(n, dtype=np.float64)
    sv = vq[order]
    i = 0
    pos_rank = 1
    while i < n:
        j = i
        while j < n and sv[j] == sv[i]:
            j += 1
        ranks[order[i:j]] = (pos_rank + (pos_rank + (j - i) - 1)) / 2.0
        pos_rank += j - i
        i = j
    n1 = int(labels.sum())
    n0 = n - n1
    want = (ranks[labels].sum() - n1 * (n1 + 1) / 2) / (n1 * n0)
    assert abs(out["auc"].iloc[0] - want) < 1e-12
    assert out["n_pos"].iloc[0] == n1 and out["n_neg"].iloc[0] == n0
    assert out["auc"].iloc[0] > 0.6  # separable by construction


def test_auc_perfect_and_random(ray_session):
    from decisions_knowledge_graph_data_ray.stages.diagnostics import roc_auc

    # perfectly separated
    out = roc_auc(
        rd.from_items(_rows([1, 2, 3, 10, 11, 12], [0, 0, 0, 1, 1, 1])),
        "score",
        "label",
    )
    assert out["auc"].iloc[0] == 1.0
    # all scores tied → midrank AUC is exactly 0.5
    out2 = roc_auc(
        rd.from_items(_rows([5, 5, 5, 5], [0, 1, 0, 1])), "score", "label"
    )
    assert out2["auc"].iloc[0] == 0.5


def test_lift_table_buckets_and_rates(ray_session):
    from decisions_knowledge_graph_data_ray.stages.diagnostics import lift_table

    # 100 rows, scores 0..99, positives iff score >= 80 → top-2 deciles pure
    scores = list(range(100))
    labels = [s >= 80 for s in scores]
    out = (
        lift_table(
            rd.from_items(_rows(scores, labels)).repartition(3),
            "score",
            "label",
            n_buckets=10,
        )
        .to_pandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    assert out["n"].tolist() == [10] * 10
    assert out["pos_rate"].tolist()[:8] == [0.0] * 8
    assert out["pos_rate"].tolist()[8:] == [1.0, 1.0]
