"""Wave-31 operator tests: PCA top component (Gram + power iteration)."""

import numpy as np
import ray.data as rd


def _emb_rows(vecs):
    return [
        {"vec_id": i, "embedding": [float(x) for x in v]} for i, v in enumerate(vecs)
    ]


def test_pca_finds_dominant_direction(ray_session):
    from decisions_knowledge_graph_data_ray.stages.similarity import (
        pca_top_component,
    )

    rng = np.random.default_rng(11)
    # variance 25 along axis 0, 1 elsewhere → PC1 ≈ e0
    base = rng.normal(size=(200, 8)).astype(np.float32)
    base[:, 0] *= 5.0
    ds = rd.from_items(_emb_rows(base)).repartition(4)
    scores, vec = pca_top_component(ds, iters=20)
    assert abs(abs(vec[0]) - 1.0) < 0.05  # dominated by axis 0
    assert vec[0] >= 0  # sign convention: first component non-negative
    out = scores.to_pandas().sort_values("vec_id").reset_index(drop=True)
    # scores ≈ projection onto e0 = the first coordinate (up to small mix)
    got = out["pc1"].to_numpy()
    corr = np.corrcoef(got, base[:, 0].astype(np.float64))[0, 1]
    assert corr > 0.99


def test_pca_partition_invariant(ray_session):
    from decisions_knowledge_graph_data_ray.stages.similarity import (
        pca_top_component,
    )

    rng = np.random.default_rng(5)
    vecs = rng.normal(size=(60, 6)).astype(np.float32)
    a_scores, a_vec = pca_top_component(rd.from_items(_emb_rows(vecs)), iters=10)
    b_scores, b_vec = pca_top_component(
        rd.from_items(_emb_rows(vecs)).repartition(7), iters=10
    )
    np.testing.assert_array_equal(a_vec, b_vec)  # int64 Gram → bit-identical
    a = a_scores.to_pandas().sort_values("vec_id").reset_index(drop=True)
    b = b_scores.to_pandas().sort_values("vec_id").reset_index(drop=True)
    np.testing.assert_array_equal(a["pc1"].to_numpy(), b["pc1"].to_numpy())
