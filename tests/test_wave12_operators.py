"""Twelfth-wave operators: BPE merge training, degree distribution shape."""

import numpy as np
import pandas as pd
import ray.data as rd

from decisions_knowledge_graph_data_ray.stages.prep import bpe_train_merges


def test_bpe_first_merge_is_most_frequent_pair(ray_session):
    # "ab" adjacency dominates: 'abab' x10 -> pair (a,b) appears via
    # non-overlapping count 2 per word occurrence... freq-weighted
    docs = [{"text": "abab xy"}] * 10 + [{"text": "xy"}] * 2
    merges = bpe_train_merges(rd.from_items(docs).repartition(3), n_merges=2)
    first = merges[0]
    # counts: 'abab' spaced ' a b a b ': count(' a b ')=1 (consuming scan),
    # (b,a)=1; 'xy': (x,y)=1. freqs: abab=10, xy=12
    assert (first["left"], first["right"]) == ("x", "y")
    assert first["n"] == 12 and first["rank"] == 1
    # after merging xy, the top remaining pair is (a,b) or (b,a) with 10;
    # tie broken by left asc
    second = merges[1]
    assert (second["left"], second["right"]) == ("a", "b")
    assert second["n"] == 10


def test_bpe_merged_token_participates_in_later_merges(ray_session):
    docs = [{"text": "the the the thee"}] * 5
    merges = bpe_train_merges(rd.from_items(docs), n_merges=3)
    pairs = [(m["left"], m["right"]) for m in merges]
    # (t,h) and (h,e) tie at 20; left-asc tiebreak picks (h,e), then the
    # merged unit 'he' participates as the RIGHT side of round 2
    assert pairs[0] == ("h", "e")
    assert pairs[1] == ("t", "he")
    assert pairs[2] == ("the", "e")
    assert [m["n"] for m in merges] == [20, 20, 5]


def test_bpe_partition_invariant(ray_session):
    rng = np.random.default_rng(13)
    words = ["".join(rng.choice(list("abcdef"), rng.integers(2, 8))) for _ in range(200)]
    docs = [{"text": " ".join(rng.choice(words, 30))} for _ in range(40)]
    a = bpe_train_merges(rd.from_items(docs).repartition(2), n_merges=5)
    b = bpe_train_merges(rd.from_items(docs).repartition(13), n_merges=5)
    assert a == b


def test_bpe_exhausted_corpus_stops_early(ray_session):
    # single-char words have no pairs -> zero merges
    merges = bpe_train_merges(rd.from_items([{"text": "a b c"}]), n_merges=4)
    assert merges == []
