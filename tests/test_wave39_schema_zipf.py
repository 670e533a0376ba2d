"""Wave-39: KG schema profile, Zipf fit."""

import math

import ray.data as rd


def test_schema_profile_distinct_counts(ray_session):
    """Distinct subj/obj per pred via the distinct_pairs path."""
    from ray.data.aggregate import Count

    from decisions_knowledge_graph_data_ray.stages.graph import distinct_pairs

    rows = [
        {"pred": "p", "subj": "a", "obj": "x"},
        {"pred": "p", "subj": "a", "obj": "y"},
        {"pred": "p", "subj": "b", "obj": "x"},
        {"pred": "q", "subj": "a", "obj": "x"},
    ]
    ds = rd.from_items(rows).repartition(2)
    n_subj = (
        distinct_pairs(ds.select_columns(["pred", "subj"]), ["pred", "subj"])
        .groupby("pred")
        .aggregate(Count(alias_name="n_subj"))
        .to_pandas()
        .set_index("pred")
    )
    assert n_subj.loc["p", "n_subj"] == 2
    assert n_subj.loc["q", "n_subj"] == 1


def test_zipf_slope_on_synthetic_power_law(ray_session):
    """A corpus whose term counts follow count = C / rank must fit ≈ −1."""
    from decisions_knowledge_graph_data_ray.stages.text_analysis import zipf_fit

    # token t_r appears floor(1000/r) times, split across several docs so
    # the combiner + groupby path actually merges partial counts
    words = []
    for r in range(1, 51):
        words.extend([f"tok{r:03d}"] * (1000 // r))
    docs = [
        {"text": " ".join(words[i::7])} for i in range(7)
    ]  # 7 interleaved shards
    out = zipf_fit(rd.from_items(docs).repartition(3), k=100)
    assert out["k"].iloc[0] == 50
    assert abs(out["slope"].iloc[0] - (-1.0)) < 0.05
    # intercept ≈ ln(1000)
    assert abs(out["intercept"].iloc[0] - math.log(1000)) < 0.1
