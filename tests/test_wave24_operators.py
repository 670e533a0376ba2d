"""Wave-24 operator tests: Flesch readability, k-anonymity audit."""

import re

import pandas as pd
import ray.data as rd


def test_readability_hand_computed(ray_session):
    from decisions_knowledge_graph_data_ray.stages.text_analysis import readability

    docs = rd.from_items(
        [
            # 2 sentences, 4 words, syllables: the=1, cat=1, sat=1, down=1
            {"doc_id": 1, "text": "The cat sat. Down!"},
            # no sentence punctuation -> n_sentences floors to 1
            {"doc_id": 2, "text": "beautiful education"},
            # no alphabetic words -> dropped
            {"doc_id": 3, "text": "123 456 ..."},
            {"doc_id": 4, "text": ""},
        ]
    )
    out = readability(docs).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(out["doc_id"]) == [1, 2]
    r1 = out.iloc[0]
    assert (r1["n_sentences"], r1["n_words"], r1["n_syllables"]) == (2, 4, 4)
    assert abs(r1["flesch"] - (206.835 - 1.015 * (4 / 2) - 84.6 * (4 / 4))) < 1e-12
    r2 = out.iloc[1]
    # beau-ti-ful: vowel groups eau,i,u = 3; e-du-ca-tion: e,u,a,io = 4
    assert (r2["n_sentences"], r2["n_words"], r2["n_syllables"]) == (1, 2, 7)


def test_readability_matches_brute_force(ray_session):
    from decisions_knowledge_graph_data_ray.stages.text_analysis import readability

    texts = [
        "A quick brown fox jumps over the lazy dog. Again! And again?",
        "Syllable counting uses vowel groups; queueing is one weird word.",
        "One.",
    ]
    docs = rd.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    ).repartition(2)
    out = readability(docs).to_pandas().sort_values("doc_id").reset_index(drop=True)
    for i, t in enumerate(texts):
        toks = re.findall(r"[a-z]+", t.lower())
        n_sent = max(1, len(re.findall(r"[.!?]+", t)))
        n_syll = sum(max(1, len(re.findall(r"[aeiouy]+", w))) for w in toks)
        row = out[out["doc_id"] == i].iloc[0]
        assert row["n_sentences"] == n_sent
        assert row["n_words"] == len(toks)
        assert row["n_syllables"] == n_syll
        want = 206.835 - 1.015 * (len(toks) / n_sent) - 84.6 * (n_syll / len(toks))
        assert row["flesch"] == want


def test_k_anonymity_flags(ray_session):
    from decisions_knowledge_graph_data_ray.stages.diagnostics import k_anonymity

    rows = (
        [{"zip": "10", "age": "30"}] * 5
        + [{"zip": "10", "age": "40"}] * 2
        + [{"zip": "20", "age": "30"}] * 3
    )
    out = (
        k_anonymity(rd.from_items(rows).repartition(3), ["zip", "age"], k=3)
        .to_pandas()
        .sort_values(["zip", "age"])
        .reset_index(drop=True)
    )
    want = pd.DataFrame(
        {
            "zip": ["10", "10", "20"],
            "age": ["30", "40", "30"],
            "class_n": [5, 2, 3],
            "anonymous": [True, False, True],
        }
    )
    pd.testing.assert_frame_equal(out, want, check_dtype=False)
