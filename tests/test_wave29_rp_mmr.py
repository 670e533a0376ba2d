"""Wave-29 operator tests: random projection (JL), MMR diversified top-k."""

import numpy as np
import ray.data as rd


def _emb_rows(vecs):
    return [
        {"vec_id": i, "embedding": [float(x) for x in v]} for i, v in enumerate(vecs)
    ]


def test_rp_matrix_deterministic_and_scaled():
    from decisions_knowledge_graph_data_ray.stages.similarity import rp_matrix

    a = rp_matrix(16, 4)
    b = rp_matrix(16, 4)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (16, 4)
    # entries are uniform[-1,1)/sqrt(out_dim)
    assert np.abs(a).max() <= 1.0 / np.sqrt(4) + 1e-12
    assert not np.array_equal(rp_matrix(16, 4, seed=8), a)


def test_random_project_matches_numpy(ray_session):
    from decisions_knowledge_graph_data_ray.stages.similarity import (
        random_project,
        rp_matrix,
    )

    rng = np.random.default_rng(3)
    # float32 inputs: the real embeddings schema is list<float>, and the
    # engine's _as_matrix ingests through float32 (lossless there)
    vecs = rng.normal(size=(40, 16)).astype(np.float32).astype(np.float64)
    ds = rd.from_items(_emb_rows(vecs)).repartition(4)
    out = (
        random_project(ds, out_dim=4, seed=7)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    want = np.round(vecs @ rp_matrix(16, 4, seed=7), 6)
    got = out[[f"p{j}" for j in range(4)]].to_numpy()
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-9)
    assert list(out.columns) == ["vec_id", "p0", "p1", "p2", "p3"]


def test_mmr_prefers_diverse_over_redundant(ray_session):
    from decisions_knowledge_graph_data_ray.stages.similarity import mmr_topk

    # q = e0; a and b nearly identical and most relevant; c diverse but
    # moderately relevant. Pure relevance ranks (a, b, c); MMR must pick
    # (a, c) for k=2 because b's redundancy penalty dominates.
    # scores with integer weights 7/3: step-2 mmr(b) = 7·0.94 − 3·sim(a,b)
    # ≈ 3.581, mmr(c) = 7·0.90 − 3·(0.9·0.95) = 3.735 → c wins despite
    # lower relevance.
    q = [1.0, 0.0, 0.0, 0.0]
    a = [0.95, 0.31224989991992, 0.0, 0.0]
    b = [0.94, 0.34117444218463, 0.0, 0.0]
    c = [0.90, 0.0, 0.43588989435407, 0.0]
    ds = rd.from_items(_emb_rows([q, a, b, c]))
    out = mmr_topk(ds, query_id=0, k=2, n_candidates=3)
    assert out["rank"].tolist() == [1, 2]
    assert out["vec_id"].tolist() == [1, 3]
    # relevance column carries the plain cosine of the picked vectors
    assert out["relevance"].iloc[0] == round(0.95, 6) or out["relevance"].iloc[0] > 0.9


def test_mmr_k_capped_by_candidates(ray_session):
    from decisions_knowledge_graph_data_ray.stages.similarity import mmr_topk

    vecs = np.eye(4)
    ds = rd.from_items(_emb_rows(vecs))
    out = mmr_topk(ds, query_id=0, k=10, n_candidates=3)
    assert len(out) == 3
    assert out["rank"].tolist() == [1, 2, 3]
