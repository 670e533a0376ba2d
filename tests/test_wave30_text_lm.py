"""Wave-30 operator tests: bigram LM surprisal, lexical diversity."""

import math

import ray.data as rd


def test_bigram_surprisal_known_corpus(ray_session):
    from decisions_knowledge_graph_data_ray.stages.text_analysis import (
        bigram_surprisal,
    )

    # corpus: "a b a b" + "a c" → uni: a=3 b=2 c=1 (V=3)
    # bigrams: (a,b)=2 (b,a)=1 (a,c)=1
    ds = rd.from_items(
        [{"doc_id": 1, "text": "a b a b"}, {"doc_id": 2, "text": "a c"}]
    ).repartition(2)
    out = bigram_surprisal(ds).to_pandas().set_index("doc_id").sort_index()
    # doc 1: ln p(b|a)=ln(3/6), ln p(a|b)=ln(2/5), ln p(b|a)=ln(3/6)
    s1 = math.log(3 / 6) + math.log(2 / 5) + math.log(3 / 6)
    assert out.loc[1, "n_bigrams"] == 3
    assert abs(out.loc[1, "avg_surprisal"] - (-(s1 / 3))) < 1e-12
    # doc 2: ln p(c|a) = ln((1+1)/(3+3))
    assert out.loc[2, "n_bigrams"] == 1
    assert abs(out.loc[2, "avg_surprisal"] - (-math.log(2 / 6))) < 1e-12


def test_bigram_surprisal_short_doc_zero(ray_session):
    from decisions_knowledge_graph_data_ray.stages.text_analysis import (
        bigram_surprisal,
    )

    ds = rd.from_items([{"doc_id": 1, "text": "solo"}, {"doc_id": 2, "text": ""}])
    out = bigram_surprisal(ds).to_pandas().set_index("doc_id").sort_index()
    assert (out["n_bigrams"] == 0).all()
    assert (out["avg_surprisal"] == 0.0).all()


def test_lexical_diversity(ray_session):
    from decisions_knowledge_graph_data_ray.stages.text_analysis import (
        lexical_diversity,
    )

    ds = rd.from_items(
        [
            {"doc_id": 1, "text": "the cat and the hat"},  # 5 toks, 4 types, 3 hapax
            {"doc_id": 2, "text": ""},
        ]
    )
    out = lexical_diversity(ds).to_pandas().set_index("doc_id").sort_index()
    assert out.loc[1, "n_tokens"] == 5
    assert out.loc[1, "n_types"] == 4
    assert out.loc[1, "n_hapax"] == 3
    assert out.loc[1, "ttr"] == 4 / 5
    assert out.loc[2, "n_tokens"] == 0 and out.loc[2, "ttr"] == 0.0
