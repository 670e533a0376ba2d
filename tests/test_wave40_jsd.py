"""Wave-40: per-group token-distribution JSD drift."""

import math

import ray.data as rd


def test_jsd_zero_for_identical_distribution(ray_session):
    from decisions_knowledge_graph_data_ray.stages.text_analysis import (
        token_jsd_by_group,
    )

    # both groups have the same token distribution == global → JSD 0
    ds = rd.from_items(
        [
            {"g": "a", "text": "x x y"},
            {"g": "b", "text": "x x y"},
        ]
    )
    out = token_jsd_by_group(ds, "g").set_index("g")
    assert out.loc["a", "jsd"] == 0.0
    assert out.loc["b", "jsd"] == 0.0
    assert out.loc["a", "n_tokens"] == 3


def test_jsd_detects_disjoint_vocab(ray_session):
    from decisions_knowledge_graph_data_ray.stages.text_analysis import (
        token_jsd_by_group,
    )

    # disjoint vocabularies, equal mass: each group's JSD vs the 50/50
    # global mix is analytically 0.5*ln(2) + 0.5*(0.5*ln(2)+0.5*0... )
    ds = rd.from_items(
        [
            {"g": "a", "text": "x x x x"},
            {"g": "b", "text": "y y y y"},
        ]
    ).repartition(2)
    out = token_jsd_by_group(ds, "g").set_index("g")
    # P=(1,0), Q=(0.5,0.5): JSD = 0.5*[1*ln(1/0.75)] +
    #   0.5*[0.5*ln(0.5/0.75) + 0.5*ln(0.5/0.25)]
    want = 0.5 * math.log(1 / 0.75) + 0.5 * (
        0.5 * math.log(0.5 / 0.75) + 0.5 * math.log(0.5 / 0.25)
    )
    assert abs(out.loc["a", "jsd"] - round(want, 6)) < 1e-9
    assert out.loc["a", "jsd"] == out.loc["b", "jsd"]  # symmetric setup
    assert out.loc["a", "jsd"] > 0.1
