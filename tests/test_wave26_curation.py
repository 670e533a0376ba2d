"""Wave-26 capstone test: the sequential curation pipeline."""

import pandas as pd
import ray.data as rd


def test_curation_pipeline_stages(ray_session):
    from decisions_knowledge_graph_data_ray.stages.prep import curation_pipeline, split_of

    good = (
        "the quick brown fox jumps over the lazy dog and keeps running "
        "through fields of green grass while birds sing songs above "
        "clouds drift slowly past mountains rivers flow toward distant "
        "oceans carrying stories of ancient forests and quiet valleys "
    )
    rows = [
        # 0: kept (long, varied)
        {"doc_id": 0, "text": good + "unique ending zero alpha beta gamma"},
        # 1: exact duplicate of 2 (same text, min id 1 kept, 2 dropped)
        {"doc_id": 1, "text": good + "twin text identical both"},
        {"doc_id": 2, "text": good + "twin text identical both"},
        # 3: quality drop (too few words)
        {"doc_id": 3, "text": "too short"},
        # 4: near duplicate of 0 (tiny suffix change)
        {"doc_id": 4, "text": good + "unique ending zero alpha beta delta"},
        # 5: benchmark doc (also in corpus; flags itself contaminated) --
        # text disjoint from `good` so near-dup can't claim it first
        {
            "doc_id": 5,
            "text": (
                "completely different benchmark material about orbital "
                "mechanics gravity assists and transfer windows between "
                "planets with delta vee budgets and launch opportunities "
                "computed from ephemeris tables over many synodic periods "
                "across decades of mission planning studies and archives"
            ),
        },
    ]
    docs = rd.from_items(rows).repartition(3)
    bench = rd.from_items([rows[5]])
    out = (
        curation_pipeline(docs, bench, jaccard_threshold=0.7)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    by_id = {r["doc_id"]: (r["status"], r["reason"]) for _, r in out.iterrows()}
    assert len(out) == 6  # one verdict per input doc
    assert by_id[3] == ("dropped", "word_count")
    assert by_id[1] == ("kept", "ok") or by_id[1][1] == "near_duplicate"
    assert by_id[2] == ("dropped", "exact_duplicate")
    assert by_id[4] == ("dropped", "near_duplicate")
    assert by_id[5] == ("dropped", "contaminated")
    assert by_id[0][0] == "kept"
    kept = out[out["status"] == "kept"]
    assert all(kept["split"] == [split_of(i) for i in kept["doc_id"]])
    assert all(out[out["status"] == "dropped"]["split"] == "")


def test_curation_partition_invariance(ray_session):
    from decisions_knowledge_graph_data_ray.stages.prep import curation_pipeline

    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda "
        "mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega one "
        "two three four five six seven eight nine ten eleven twelve "
    )
    rows = [{"doc_id": i, "text": base + f"suffix {i} " + base} for i in range(12)]
    bench = rd.from_items([{"doc_id": 99, "text": "nothing overlapping here at all"}])
    outs = []
    for nb in (1, 5):
        outs.append(
            curation_pipeline(rd.from_items(rows).repartition(nb), bench)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])
