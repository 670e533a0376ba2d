"""Wave-17 operator tests: RAKE keyphrase extraction."""

import pandas as pd
import ray.data as rd


def test_rake_hand_computed(ray_session):
    # doc1: [red apple] [green apple]; doc2: [red apple]
    # freq: red 2, apple 3, green 1; deg: red 4, apple 6, green 2
    # word scores: red 2.0, apple 2.0, green 2.0
    # phrase scores: "red apple" 4.0 (n_occ 2), "green apple" 4.0 (n_occ 1)
    from decisions_knowledge_graph_data_ray.stages.text_analysis import rake_keyphrases

    docs = rd.from_items(
        [
            {"doc_id": 1, "text": "red apple and green apple"},
            {"doc_id": 2, "text": "the red apple"},
        ]
    )
    out = rake_keyphrases(docs, top_k=10)
    want = pd.DataFrame(
        {
            "phrase": ["green apple", "red apple"],
            "n_words": [2, 2],
            "n_occ": [1, 2],
            "score": [4.0, 4.0],
        }
    )
    pd.testing.assert_frame_equal(out, want, check_dtype=False)


def test_rake_stopword_only_and_empty_docs(ray_session):
    from decisions_knowledge_graph_data_ray.stages.text_analysis import rake_keyphrases

    docs = rd.from_items(
        [
            {"doc_id": 1, "text": "the a and of"},
            {"doc_id": 2, "text": ""},
            {"doc_id": 3, "text": "solo"},
        ]
    )
    out = rake_keyphrases(docs, top_k=5)
    assert list(out["phrase"]) == ["solo"]
    assert list(out["score"]) == [1.0]  # deg 1 / freq 1


def test_rake_fold_order_matches_python_sum(ray_session):
    # longer mixed corpus: score must equal the left fold of word scores
    from decisions_knowledge_graph_data_ray.stages.text_analysis import (
        RAKE_STOPWORDS,
        rake_keyphrases,
    )

    texts = [
        "fast scan and slow merge of big table",
        "slow merge in fast scan the fast scan",
        "big table for slow merge and fast scan of value",
    ]
    docs = rd.from_items([{"doc_id": i, "text": t} for i, t in enumerate(texts)])
    out = rake_keyphrases(docs, top_k=50)

    # reference RAKE in plain python
    stop = set(RAKE_STOPWORDS)
    import re

    phrases = []
    for t in texts:
        cur = []
        for w in re.findall(r"[a-z0-9]+", t.lower()):
            if w in stop:
                if cur:
                    phrases.append(cur)
                cur = []
            else:
                cur.append(w)
        if cur:
            phrases.append(cur)
    freq, deg = {}, {}
    for ph in phrases:
        for w in ph:
            freq[w] = freq.get(w, 0) + 1
            deg[w] = deg.get(w, 0) + len(ph)
    expect = {}
    occ = {}
    for ph in phrases:
        key = " ".join(ph)
        occ[key] = occ.get(key, 0) + 1
        s = 0.0
        for w in ph:
            s = s + deg[w] / freq[w]
        expect[key] = s
    got = dict(zip(out["phrase"], out["score"]))
    assert got == {k: expect[k] for k in got}
    assert dict(zip(out["phrase"], out["n_occ"])) == {k: occ[k] for k in got}


def test_textrank_matches_numpy_power_iteration(ray_session):
    # window=1 path graph aa-bb-cc-dd; replicate the exact iteration in numpy
    import numpy as np

    from decisions_knowledge_graph_data_ray.stages.text_analysis import textrank_words

    docs = rd.from_items([{"doc_id": 1, "text": "aa bb cc dd"}])
    out = textrank_words(docs, window=1, iterations=10)
    words = list(out["node"])
    assert words == ["aa", "bb", "cc", "dd"]

    adj = {"aa": ["bb"], "bb": ["aa", "cc"], "cc": ["bb", "dd"], "dd": ["cc"]}
    deg = {w: len(ns) for w, ns in adj.items()}
    n = 4
    score = {w: 1.0 / n for w in words}
    for _ in range(10):
        score = {
            w: (1.0 - 0.85) / n + 0.85 * sum(score[u] / deg[u] for u in adj[w])
            for w in words
        }
    got = dict(zip(out["node"], out["score"]))
    for w in words:
        assert abs(got[w] - score[w]) < 1e-12, w


def test_textrank_window_skips_stopwords(ray_session):
    # "red the green": the filtered sequence is adjacent, so the edge exists
    from decisions_knowledge_graph_data_ray.stages.text_analysis import textrank_words

    docs = rd.from_items([{"doc_id": 1, "text": "red the green"}])
    out = textrank_words(docs, window=1, iterations=10)
    assert list(out["node"]) == ["green", "red"]
    # 2-node symmetric graph: equal scores
    assert abs(out["score"].iloc[0] - out["score"].iloc[1]) < 1e-15
