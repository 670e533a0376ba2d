"""Wave-42: Efraimidis–Spirakis weighted WOR sampling."""

import numpy as np
import ray.data as rd


def test_weighted_topk_partition_invariant(ray_session):
    from decisions_knowledge_graph_data_ray.stages.prep import weighted_topk_sample

    rows = [{"doc_id": i, "w": float(1 + i % 7)} for i in range(200)]
    a = weighted_topk_sample(rd.from_items(rows), "w", k=15)
    b = weighted_topk_sample(rd.from_items(rows).repartition(9), "w", k=15)
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    assert len(a) == 15
    # keys are sorted descending (the ES winners)
    assert (np.diff(a["es_key"].to_numpy()) <= 1e-12).all()


def test_weighted_topk_prefers_heavy_rows(ray_session):
    """Inclusion probability rises with weight: with a 1000x weight gap,
    heavy rows dominate the sample."""
    from decisions_knowledge_graph_data_ray.stages.prep import weighted_topk_sample

    rows = [{"doc_id": i, "w": 1000.0 if i < 30 else 1.0} for i in range(300)]
    out = weighted_topk_sample(rd.from_items(rows), "w", k=20)
    heavy = (out["doc_id"] < 30).sum()
    assert heavy >= 15  # overwhelming majority from the heavy block


def test_weighted_topk_seed_changes_sample(ray_session):
    from decisions_knowledge_graph_data_ray.stages.prep import weighted_topk_sample

    rows = [{"doc_id": i, "w": 1.0} for i in range(100)]
    a = weighted_topk_sample(rd.from_items(rows), "w", k=10, seed="s1")
    b = weighted_topk_sample(rd.from_items(rows), "w", k=10, seed="s2")
    assert a["doc_id"].tolist() != b["doc_id"].tolist()
