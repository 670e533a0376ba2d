"""Tenth-wave operators: distributed Gram matrix, PMI collocations,
per-group winsorization."""

import math

import numpy as np
import pandas as pd
import ray.data as rd

from decisions_knowledge_graph_data_ray.stages.diagnostics import winsorize_by_group
from decisions_knowledge_graph_data_ray.stages.similarity import gram_matrix
from decisions_knowledge_graph_data_ray.stages.text_analysis import pmi_collocations


# --- gram_matrix ----------------------------------------------------------------


def _gram_df(ds):
    return ds.to_pandas().sort_values(["i", "j"]).reset_index(drop=True)


def test_gram_matrix_matches_numpy(ray_session):
    rng = np.random.default_rng(10)
    x = rng.uniform(-1, 1, (200, 8)).astype(np.float32)
    df = pd.DataFrame({"embedding": list(map(list, x))})
    out = _gram_df(gram_matrix(rd.from_pandas(df).repartition(5), scale=1000.0))
    q = np.floor(x.astype(np.float64) * 1000.0 + 0.5).astype(np.int64)
    g = q.T @ q
    iu, ju = np.triu_indices(8)
    exp = pd.DataFrame({"i": iu + 1, "j": ju + 1, "s": g[iu, ju]})
    pd.testing.assert_frame_equal(out, exp.sort_values(["i", "j"]).reset_index(drop=True))


def test_gram_matrix_partition_invariant(ray_session):
    rng = np.random.default_rng(12)
    x = rng.uniform(-1, 1, (300, 6)).astype(np.float32)
    df = pd.DataFrame({"embedding": list(map(list, x))})
    a = _gram_df(gram_matrix(rd.from_pandas(df).repartition(2)))
    b = _gram_df(gram_matrix(rd.from_pandas(df).repartition(23)))
    pd.testing.assert_frame_equal(a, b)


# --- pmi_collocations -----------------------------------------------------------


def test_pmi_known_corpus(ray_session):
    # "new york" always adjacent (strong collocation); "the" ubiquitous
    docs = [{"text": "the new york times reported the news in new york"}] * 10
    out = pmi_collocations(
        rd.from_items(docs).repartition(3), min_count=5, top_k=10
    ).to_pandas()
    # exact PMI for (new, york): c_ab=20, N=100, M=90, c_a=c_b=20
    ny = out[(out["tok_a"] == "new") & (out["tok_b"] == "york")].iloc[0]
    assert ny["pmi"] == math.log(((20.0 * 100.0) * 100.0) / ((90.0 * 20.0) * 20.0))
    assert ny["n_pair"] == 20 and ny["n_a"] == 20 and ny["n_b"] == 20
    # top: the unique-unigram pairs (c=10, c_a=c_b=10) tie at the max PMI;
    # deterministic (pmi desc, tok_a asc) order puts (news, in) first
    top = out.iloc[0]
    assert (top["tok_a"], top["tok_b"]) == ("news", "in")
    assert top["pmi"] == math.log(((10.0 * 100.0) * 100.0) / ((90.0 * 10.0) * 10.0))
    assert (out["n_pair"] >= 5).all()


def test_pmi_min_count_filters(ray_session):
    docs = [{"text": "alpha beta"}] * 3 + [{"text": "gamma delta"}] * 7
    out = pmi_collocations(rd.from_items(docs), min_count=5, top_k=10).to_pandas()
    assert set(zip(out["tok_a"], out["tok_b"])) == {("gamma", "delta")}


def test_pmi_empty_corpus(ray_session):
    out = pmi_collocations(
        rd.from_items([{"text": ""}, {"text": None}]), min_count=1
    ).to_pandas()
    assert len(out) == 0


# --- winsorize_by_group ---------------------------------------------------------


def test_winsorize_clips_to_group_percentiles(ray_session):
    rng = np.random.default_rng(4)
    df = pd.DataFrame(
        {
            "id": np.arange(400),
            "g": np.repeat(["a", "b"], 200),
            "v": np.concatenate(
                [rng.integers(0, 1000, 200), rng.integers(5000, 9000, 200)]
            ),
        }
    )
    out = (
        winsorize_by_group(
            rd.from_pandas(df).repartition(4), value_col="v", group_col="g",
            id_col="id",
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    for g, sub in df.groupby("g"):
        vals = np.sort(sub["v"].to_numpy())
        n = len(vals)
        lo = vals[-((-5 * n) // 100) - 1]   # 1-indexed ceil(0.05 n)
        hi = vals[-((-95 * n) // 100) - 1]
        got = out[out["g"] == g]
        exp = np.clip(sub.sort_values("id")["v"].to_numpy(), lo, hi)
        assert (got["v_winsorized"].to_numpy() == exp).all()
    # original values untouched
    assert (out["v"].to_numpy() == df.sort_values("id")["v"].to_numpy()).all()
