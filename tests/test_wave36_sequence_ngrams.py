"""Wave-36: per-key ordered sequence n-grams."""

import ray.data as rd


def test_sequence_ngrams_trigrams(ray_session):
    from decisions_knowledge_graph_data_ray.stages.windows import sequence_ngrams

    rows = [
        # user 1: a b a b  (out of order on purpose — ts sorts it)
        {"user_id": 1, "event_type": "b", "ts": 2, "event_id": 12},
        {"user_id": 1, "event_type": "a", "ts": 1, "event_id": 11},
        {"user_id": 1, "event_type": "b", "ts": 4, "event_id": 14},
        {"user_id": 1, "event_type": "a", "ts": 3, "event_id": 13},
        # user 2: a b a  → one trigram
        {"user_id": 2, "event_type": "a", "ts": 1, "event_id": 21},
        {"user_id": 2, "event_type": "b", "ts": 2, "event_id": 22},
        {"user_id": 2, "event_type": "a", "ts": 3, "event_id": 23},
        # user 3: too short → nothing
        {"user_id": 3, "event_type": "a", "ts": 1, "event_id": 31},
        {"user_id": 3, "event_type": "b", "ts": 2, "event_id": 32},
    ]
    out = (
        sequence_ngrams(rd.from_items(rows).repartition(3), n=3)
        .to_pandas()
        .sort_values(["t1", "t2", "t3"])
        .reset_index(drop=True)
    )
    got = {(r.t1, r.t2, r.t3): r.n for r in out.itertuples()}
    # user1: (a,b,a), (b,a,b); user2: (a,b,a)
    assert got == {("a", "b", "a"): 2, ("b", "a", "b"): 1}


def test_sequence_ngrams_ties_break_on_order_col(ray_session):
    from decisions_knowledge_graph_data_ray.stages.windows import sequence_ngrams

    rows = [  # same ts — event_id decides the order: a, b, c
        {"user_id": 1, "event_type": "c", "ts": 1, "event_id": 3},
        {"user_id": 1, "event_type": "a", "ts": 1, "event_id": 1},
        {"user_id": 1, "event_type": "b", "ts": 1, "event_id": 2},
    ]
    out = sequence_ngrams(rd.from_items(rows), n=3).to_pandas()
    assert len(out) == 1
    assert (out.iloc[0][["t1", "t2", "t3"]] == ["a", "b", "c"]).all()
