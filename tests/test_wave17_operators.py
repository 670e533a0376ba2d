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


def test_chi2_hand_computed(ray_session):
    # 2x2: O = [[10, 20], [20, 10]]; E = 15 everywhere
    # chi2 = 4 * 25/15 = 100/15; V = sqrt((100/15)/60) = 1/3
    from decisions_knowledge_graph_data_ray.stages.diagnostics import (
        chi_square_independence,
    )

    items = (
        [{"a": "a1", "b": 1}] * 10
        + [{"a": "a1", "b": 2}] * 20
        + [{"a": "a2", "b": 1}] * 20
        + [{"a": "a2", "b": 2}] * 10
    )
    out = chi_square_independence(rd.from_items(items), "a", "b")
    r = out.iloc[0]
    assert r["n"] == 60 and r["dof"] == 1
    assert abs(r["chi2"] - 100.0 / 15.0) < 1e-12
    assert abs(r["cramers_v"] - 1.0 / 3.0) < 1e-12


def test_chi2_zero_cells_included(ray_session):
    # a2 never occurs with b2: the zero cell still contributes E
    from decisions_knowledge_graph_data_ray.stages.diagnostics import (
        chi_square_independence,
    )

    items = (
        [{"a": "a1", "b": 1}] * 5
        + [{"a": "a1", "b": 2}] * 5
        + [{"a": "a2", "b": 1}] * 5
    )
    out = chi_square_independence(rd.from_items(items), "a", "b")
    r = out.iloc[0]
    # hand fold: rt a1=10 a2=5; ct b1=10 b2=5; n=15
    exp = 0.0
    obs = {("a1", 1): 5, ("a1", 2): 5, ("a2", 1): 5}
    rt = {"a1": 10, "a2": 5}
    ct = {1: 10, 2: 5}
    for a in ["a1", "a2"]:
        for b in [1, 2]:
            e = rt[a] * ct[b] / 15.0
            t = obs.get((a, b), 0) - e
            exp = exp + t * t / e
    assert abs(r["chi2"] - exp) < 1e-12


def _cdc_md5s(texts):
    from decisions_knowledge_graph_data_ray.stages.prep import cdc_chunks

    docs = rd.from_items([{"doc_id": i, "text": t} for i, t in enumerate(texts)])
    df = cdc_chunks(docs).to_pandas()
    return {
        i: list(g.sort_values("chunk_idx")["chunk_md5"])
        for i, g in df.groupby("doc_id")
    }


def test_cdc_boundary_locality(ray_session):
    # THE content-defined property: a prefix insertion disturbs only the
    # first chunk(s); later boundaries re-synchronize
    import hashlib

    base = "".join(
        hashlib.md5(f"cdc-{i}".encode()).hexdigest() for i in range(80)
    )  # 2560 deterministic chars
    shifted = "PREFIX-INSERTION!" + base
    md5s = _cdc_md5s([base, shifted])
    common = set(md5s[0]) & set(md5s[1])
    assert len(md5s[0]) > 10  # enough chunks for the property to bite
    assert len(common) >= len(md5s[0]) - 3


def test_cdc_short_and_exact_cover(ray_session):
    from decisions_knowledge_graph_data_ray.stages.prep import cdc_chunks

    docs = rd.from_items([{"doc_id": 1, "text": "short"}, {"doc_id": 2, "text": "x" * 400}])
    df = cdc_chunks(docs).to_pandas()
    one = df[df["doc_id"] == 1]
    assert len(one) == 1 and one.iloc[0]["start"] == 1 and one.iloc[0]["length"] == 5
    # chunks exactly tile each document
    for _, g in df.groupby("doc_id"):
        g = g.sort_values("chunk_idx")
        expect_start = 1
        for _, r in g.iterrows():
            assert r["start"] == expect_start
            expect_start = r["start"] + r["length"]


def test_largest_remainder_hand_and_invariant(ray_session):
    from decisions_knowledge_graph_data_ray.stages.skew import (
        largest_remainder_allocate,
    )

    # T=100 over weights 1,1,1 → base 33 each, R=1 → first line gets 34
    ds = rd.from_items(
        [{"k": 1, "pos": i, "w": 1, "t": 100} for i in (1, 2, 3)]
        + [{"k": 2, "pos": 1, "w": 3, "t": 10}, {"k": 2, "pos": 2, "w": 7, "t": 10}]
    )
    out = largest_remainder_allocate(ds, "k", "pos", "w", "t").to_pandas()
    out = out.sort_values(["k", "pos"]).reset_index(drop=True)
    assert list(out[out["k"] == 1]["alloc"]) == [34, 33, 33]
    assert list(out[out["k"] == 2]["alloc"]) == [3, 7]
    # exactness invariant
    assert out.groupby("k")["alloc"].sum().to_dict() == {1: 100, 2: 10}


def test_largest_remainder_zero_weights(ray_session):
    from decisions_knowledge_graph_data_ray.stages.skew import (
        largest_remainder_allocate,
    )

    ds = rd.from_items(
        [{"k": 9, "pos": 2, "w": 0, "t": 7}, {"k": 9, "pos": 1, "w": 0, "t": 7}]
    )
    out = largest_remainder_allocate(ds, "k", "pos", "w", "t").to_pandas()
    out = out.sort_values("pos")
    assert list(out["alloc"]) == [7, 0]  # whole total to first row by pos


def test_benford_hand_computed(ray_session):
    import math

    from decisions_knowledge_graph_data_ray.stages.diagnostics import (
        benford_first_digit,
    )

    # values 1.00, 1.50, 2.00, 9.99 → first digits of cents 100,150,200,999
    ds = rd.from_items([{"v": 1.00}, {"v": 1.50}, {"v": 2.00}, {"v": 9.99}])
    out = benford_first_digit(ds, "v")
    assert len(out) == 9
    got = dict(zip(out["digit"], out["n"]))
    assert got == {1: 2, 2: 1, 3: 0, 4: 0, 5: 0, 6: 0, 7: 0, 8: 0, 9: 1}
    r1 = out[out["digit"] == 1].iloc[0]
    assert abs(r1["obs_share"] - 0.5) < 1e-15
    assert abs(r1["benford_share"] - math.log10(2.0)) < 1e-15


def test_personalized_pagerank_matches_reference(ray_session):
    from decisions_knowledge_graph_data_ray.stages.graph import (
        personalized_pagerank,
        symmetrize,
    )

    # path A - B - C - D, seed A; replicate the sparse-start iteration
    pairs = [("A", "B"), ("B", "C"), ("C", "D")]
    edges = symmetrize(rd.from_items([{"src": a, "dst": b} for a, b in pairs])).materialize()
    out = personalized_pagerank(edges, "A", iterations=10).to_pandas()

    adj = {"A": ["B"], "B": ["A", "C"], "C": ["B", "D"], "D": ["C"]}
    deg = {w: len(v) for w, v in adj.items()}
    score = {"A": 1.0}
    for _ in range(10):
        new = {}
        for u, s in score.items():
            for v in adj[u]:
                new[v] = new.get(v, 0.0) + s / deg[u]
        score = {v: 0.85 * c for v, c in new.items()}
        score["A"] = (1.0 - 0.85) + score.get("A", 0.0)
    got = dict(zip(out["node"], out["score"]))
    assert set(got) == set(score)
    for n in score:
        assert abs(got[n] - score[n]) < 1e-12, n
    # seed keeps the largest score in a personalized walk on a path
    assert out.sort_values("score", ascending=False).iloc[0]["node"] == "A"


def test_personalized_pagerank_disconnected_component_unreached(ray_session):
    from decisions_knowledge_graph_data_ray.stages.graph import (
        personalized_pagerank,
        symmetrize,
    )

    pairs = [("A", "B"), ("X", "Y")]
    edges = symmetrize(rd.from_items([{"src": a, "dst": b} for a, b in pairs])).materialize()
    out = personalized_pagerank(edges, "A", iterations=5).to_pandas()
    assert set(out["node"]) == {"A", "B"}  # X/Y never materialize


def test_representative_keep_longest_vs_keep_min(ray_session):
    from decisions_knowledge_graph_data_ray.stages.dedup import (
        representative_ids_from_pairs,
    )

    # component {1, 2, 3}: doc 2 is longest → keep 2 (keep-min would keep 1);
    # doc 9 never paired → kept
    members = rd.from_items(
        [
            {"doc_id": 1, "n_chars": 10},
            {"doc_id": 2, "n_chars": 99},
            {"doc_id": 3, "n_chars": 50},
            {"doc_id": 9, "n_chars": 1},
        ]
    )
    pairs = rd.from_items([{"src_id": 1, "dst_id": 2}, {"src_id": 2, "dst_id": 3}])
    out = representative_ids_from_pairs(members, pairs).to_pandas()
    assert sorted(out["doc_id"]) == [2, 9]


def test_representative_rank_tie_breaks_by_id(ray_session):
    from decisions_knowledge_graph_data_ray.stages.dedup import (
        representative_ids_from_pairs,
    )

    members = rd.from_items(
        [{"doc_id": 7, "n_chars": 5}, {"doc_id": 4, "n_chars": 5}]
    )
    pairs = rd.from_items([{"src_id": 4, "dst_id": 7}])
    out = representative_ids_from_pairs(members, pairs).to_pandas()
    assert sorted(out["doc_id"]) == [4]
