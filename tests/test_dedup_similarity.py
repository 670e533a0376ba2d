"""Tests for dedup sketches/stages and similarity search."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from decisions_knowledge_graph_data_ray.functions import sketches as S


def test_content_hash_is_md5():
    import hashlib

    assert S.content_hash("abc") == hashlib.md5(b"abc").hexdigest()


def test_word_shingles():
    assert S.word_shingles("a b c d", k=3) == {"a b c", "b c d"}
    assert S.word_shingles("one two", k=3) == {"one two"}
    assert S.word_shingles("", k=3) == set()


def test_minhash_similarity_estimates_jaccard():
    a = "the quick brown fox jumps over the lazy dog " * 5
    b = "the quick brown fox jumps over the lazy cat " * 5
    c = "completely different text about something else entirely " * 5
    sa, sb, sc = (S.minhash_signature(t) for t in (a, b, c))
    ab = S.estimated_jaccard(sa, sb)
    ac = S.estimated_jaccard(sa, sc)
    true_ab = S.ngram_jaccard(a, b)
    assert ab > ac
    assert abs(ab - true_ab) < 0.25
    # deterministic across calls
    assert np.array_equal(sa, S.minhash_signature(a))


def test_simhash_hamming_orders_similarity():
    a = "the quick brown fox jumps over the lazy dog " * 5
    b = a.replace("dog", "cat")
    c = "totally unrelated words " * 10
    ha, hb, hc = S.simhash(a), S.simhash(b), S.simhash(c)
    assert S.hamming64(ha, hb) < S.hamming64(ha, hc)
    assert S.simhash(a) == ha  # deterministic


def _docs_ds():
    base = "the quick brown fox jumps over the lazy dog and runs far away today "
    rows = [
        {"doc_id": 0, "text": base * 4},
        {"doc_id": 1, "text": base * 4},  # exact dup of 0
        {"doc_id": 2, "text": (base * 4).replace("dog", "cat")},  # near dup
        {"doc_id": 3, "text": "an entirely different document about databases and queries " * 4},
        {"doc_id": 4, "text": "yet another unrelated text mentioning compilers and parsers " * 4},
    ]
    return rd.from_arrow(pa.Table.from_pylist(rows))


def test_exact_dedup(ray_session):
    from decisions_knowledge_graph_data_ray.stages.dedup import exact_dedup

    out = exact_dedup(_docs_ds()).to_pandas()
    assert len(out) == 4  # doc 1 collapsed into doc 0
    assert 0 in set(out["doc_id"]) and 1 not in set(out["doc_id"])


def test_minhash_lsh_pairs(ray_session):
    from decisions_knowledge_graph_data_ray.stages.dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(_docs_ds(), threshold=0.5).to_pandas()
    got = {(r.src_id, r.dst_id) for r in pairs.itertuples()}
    assert (0, 1) in got  # exact dup always found
    assert all(p in {(0, 1), (0, 2), (1, 2)} for p in got)


def test_near_dedup_keep_ids(ray_session):
    from decisions_knowledge_graph_data_ray.stages.dedup import near_dedup_keep_ids

    kept = set(near_dedup_keep_ids(_docs_ds(), threshold=0.5).to_pandas()["doc_id"])
    assert 0 in kept and 1 not in kept
    assert {3, 4} <= kept


def test_simhash_pairs(ray_session):
    from decisions_knowledge_graph_data_ray.stages.dedup import simhash_pairs

    pairs = simhash_pairs(_docs_ds(), max_hamming=6).to_pandas()
    got = {(r.src_id, r.dst_id) for r in pairs.itertuples()}
    assert (0, 1) in got
    assert (0, 3) not in got and (3, 4) not in got


def test_ngram_jaccard_verify(ray_session):
    from decisions_knowledge_graph_data_ray.stages.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_verify,
    )

    docs = _docs_ds()
    pairs = minhash_lsh_pairs(docs, threshold=0.5)
    verified = ngram_jaccard_verify(pairs, docs, threshold=0.9).to_pandas()
    got = {(r.src_id, r.dst_id) for r in verified.itertuples()}
    assert (0, 1) in got  # exact dup: jaccard 1.0


def _emb_ds(n=64, d=16):
    rows = []
    for i in range(n):
        # deterministic vectors; vec 1 = vec 0 scaled (cosine 1)
        v = [((i * 31 + j * 7) % 13) - 6.0 for j in range(d)]
        if i == 1:
            v = [2.0 * (((0 * 31 + j * 7) % 13) - 6.0) for j in range(d)]
        rows.append({"vec_id": i, "embedding": v})
    return rd.from_arrow(pa.Table.from_pylist(rows))


def test_brute_force_topk(ray_session):
    import ray

    from decisions_knowledge_graph_data_ray.stages.similarity import (
        brute_force_topk,
        make_queries_ref,
    )

    ds = _emb_ds()
    q = np.array([[((0 * 31 + j * 7) % 13) - 6.0 for j in range(16)]], dtype=np.float32)
    ref = make_queries_ref(q, query_ids=[0])
    out = brute_force_topk(ds, ref, k=3).to_pandas().sort_values("rank")
    assert len(out) == 3
    # vec 0 and its scaled copy vec 1 are both cosine 1.0 → top-2
    assert set(out.head(2)["vec_id"]) == {0, 1}
    assert out.iloc[0]["cosine"] == pytest.approx(1.0, abs=1e-5)


def test_embedding_dup_pairs(ray_session):
    from decisions_knowledge_graph_data_ray.stages.similarity import embedding_dup_pairs

    out = embedding_dup_pairs(_emb_ds(), threshold=0.999).to_pandas()
    got = {(r.src_id, r.dst_id) for r in out.itertuples()}
    assert (0, 1) in got


def test_embedding_dup_pairs_degenerate_bucket(ray_session):
    """A hot bucket (every vector a near-duplicate of one base vector) must
    emit all O(n^2) pairs correctly — and via the vectorized np.nonzero
    path, not a Python double loop (500 rows → 124,750 pairs in well under
    the old per-pair-loop time)."""
    import time as _time

    from decisions_knowledge_graph_data_ray.stages.similarity import embedding_dup_pairs

    n, d = 500, 16
    base = [float((j * 7) % 13 - 6) for j in range(d)]
    rows = [
        {"vec_id": i, "embedding": [x * (1.0 + 1e-6 * i) for x in base]}
        for i in range(n)
    ]
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    t0 = _time.perf_counter()
    out = embedding_dup_pairs(ds, threshold=0.999).to_pandas()
    dt = _time.perf_counter() - t0
    assert len(out) == n * (n - 1) // 2
    assert (out["src_id"] < out["dst_id"]).all()
    assert (out["cosine"] > 0.999).all()
    # generous bound: the vectorized path takes <1s of compute; the old
    # Python double loop took tens of seconds at this size
    assert dt < 30


def test_lsh_bucketed_topk_contains_exact_match(ray_session):
    import ray

    from decisions_knowledge_graph_data_ray.stages.similarity import (
        lsh_bucketed_topk,
        make_queries_ref,
    )

    ds = _emb_ds()
    q = np.array([[((0 * 31 + j * 7) % 13) - 6.0 for j in range(16)]], dtype=np.float32)
    ref = make_queries_ref(q, query_ids=[0])
    out = lsh_bucketed_topk(ds, ref, k=3).to_pandas()
    # the identical vector shares every hyperplane sign → always same bucket
    assert 0 in set(out["vec_id"])


def test_ivf_topk_full_probe_equals_bruteforce(ray_session):
    from decisions_knowledge_graph_data_ray.stages.similarity import (
        brute_force_topk,
        ivf_topk,
        make_queries_ref,
    )

    # tie-free corpus (distinct pseudo-random directions) so the exact
    # comparison is not float-noise-sensitive
    rng = np.random.RandomState(5)
    m = rng.rand(80, 16).astype(np.float32) - 0.5
    rows = [{"vec_id": i, "embedding": [float(x) for x in m[i]]} for i in range(len(m))]
    ds = rd.from_arrow(pa.Table.from_pylist(rows))
    ref = make_queries_ref(m[:2], query_ids=[0, 1])
    # nprobe == nlist → every cell probed → exact
    got = ivf_topk(ds, ref, k=3, nlist=8, nprobe=8).to_pandas().sort_values(
        ["query_id", "rank"]
    )
    want = brute_force_topk(ds, ref, k=3).to_pandas().sort_values(["query_id", "rank"])
    assert list(got["vec_id"]) == list(want["vec_id"])
    np.testing.assert_allclose(got["cosine"].to_numpy(), want["cosine"].to_numpy(), atol=1e-5)


def test_ivf_topk_partial_probe_finds_own_cell(ray_session):
    from decisions_knowledge_graph_data_ray.stages.similarity import (
        ivf_topk,
        make_queries_ref,
    )

    ds = _emb_ds()
    q = np.array([[((0 * 31 + j * 7) % 13) - 6.0 for j in range(16)]], dtype=np.float32)
    ref = make_queries_ref(q, query_ids=[0])
    out = ivf_topk(ds, ref, k=3, nlist=8, nprobe=2).to_pandas()
    # query equals vec 0; its identical-direction vectors live in the
    # query's own (first-probed) cell
    assert 0 in set(out["vec_id"])
    assert out["rank"].max() <= 3


def test_kmeans_centroids_deterministic():
    from decisions_knowledge_graph_data_ray.stages.similarity import kmeans_centroids

    m = np.array([[((i * 31 + j * 7) % 13) - 6.0 for j in range(16)] for i in range(64)],
                 dtype=np.float32)
    c1 = kmeans_centroids(m, nlist=8)
    c2 = kmeans_centroids(m, nlist=8)
    np.testing.assert_array_equal(c1, c2)
    assert c1.shape == (8, 16)
    np.testing.assert_allclose(np.linalg.norm(c1, axis=1), 1.0, atol=1e-5)


def test_ivf_topk_layout_independent(ray_session):
    """The IVF quantizer's trainer sample is hash-keyed on vec_id, so the
    SAME results come out at any block layout / cluster shape — the
    round-4 fix for random_sample(seed=...), whose draw depends on block
    boundaries."""
    import numpy as np

    import ray
    import ray.data as rd

    from decisions_knowledge_graph_data_ray.stages.similarity import ivf_topk

    rng = np.random.default_rng(11)
    n = 400
    emb = [{"vec_id": i, "embedding": rng.normal(size=12).tolist()} for i in range(n)]
    q = {"query_id": [0, 1], "matrix": np.asarray([emb[0]["embedding"], emb[1]["embedding"]], dtype=np.float32)}
    ref = ray.put(q)

    def run(blocks):
        ds = rd.from_items(emb).repartition(blocks)
        df = ivf_topk(ds, ref, k=5, nlist=8, nprobe=2, train_sample=100).to_pandas()
        return df.sort_values(["query_id", "rank"]).reset_index(drop=True)

    a, b = run(2), run(17)
    assert a[["query_id", "vec_id", "rank"]].values.tolist() == b[["query_id", "vec_id", "rank"]].values.tolist()


def test_kmeans_assign_layout_independent(ray_session):
    from decisions_knowledge_graph_data_ray.stages.similarity import (
        kmeans_assign,
        train_quantizer,
    )

    ds = _emb_ds(n=80)
    out = kmeans_assign(ds, nlist=4).to_pandas().sort_values("vec_id").reset_index(drop=True)
    assert len(out) == 80
    assert out["cluster"].between(0, 3).all()
    assert out["cluster"].nunique() > 1  # nondegenerate on spread-out data
    # same doc -> same cluster under a different block layout
    out2 = (
        kmeans_assign(ds.repartition(7), nlist=4)
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    assert out.equals(out2)
    # identical-direction vectors land in the same cluster
    by_id = out.set_index("vec_id")["cluster"]
    assert by_id[0] == by_id[1]
    # assignment IS nearest-centroid: recompute on the driver
    C = train_quantizer(ds, 4)
    emb = ds.to_pandas().sort_values("vec_id")
    m = np.asarray(emb["embedding"].tolist(), dtype=np.float32)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    assert (np.argmax(m @ C.T, axis=1) == out["cluster"].to_numpy()).all()


def test_duplicate_spans(ray_session):
    from decisions_knowledge_graph_data_ray.stages.dedup import duplicate_spans

    boiler = "all rights reserved see license file for details"  # 8 words
    docs = rd.from_items(
        [
            {"doc_id": 1, "text": f"alpha beta {boiler} gamma"},
            {"doc_id": 2, "text": f"{boiler} and unrelated tail content here"},
            {"doc_id": 3, "text": f"prefix words {boiler} {boiler}"},
            {"doc_id": 4, "text": "completely different text with no shared span at all"},
        ]
    )
    out = duplicate_spans(docs, window=8, top_k=10).to_pandas()
    assert list(out.columns) == ["span", "n_docs", "n_occurrences"]
    top = out.iloc[0]
    assert top["span"] == boiler and top["n_docs"] == 3 and top["n_occurrences"] == 4
    # within-one-doc repeats don't qualify (n_docs >= 2 filter)
    solo = rd.from_items([{"doc_id": 1, "text": f"{boiler} x {boiler}"}])
    assert duplicate_spans(solo, window=8).count() == 0
    # layout independence: same result under a different block layout
    out2 = duplicate_spans(docs.repartition(3), window=8, top_k=10).to_pandas()
    assert out.equals(out2)


def test_semantic_dedup_keep_ids(ray_session):
    """_emb_ds vectors repeat with period 13 in vec_id (exact duplicate
    classes; vec 1 is a scaled copy of vec 0 → same direction class), so
    the keep-set is exactly one survivor per direction class — the
    component STRING-min id (the keep_ids_from_pairs/connected_components
    label rule)."""
    import numpy as np

    from decisions_knowledge_graph_data_ray.stages.similarity import (
        semantic_dedup_keep_ids,
    )

    df = _emb_ds().to_pandas()
    classes: dict[tuple, list[int]] = {}
    for _, r in df.iterrows():
        v = np.asarray(r["embedding"], dtype=np.float64)
        key = tuple(np.round(v / np.linalg.norm(v), 9))
        classes.setdefault(key, []).append(int(r["vec_id"]))
    expected = {min(ids, key=str) for ids in classes.values()}

    kept = set(
        semantic_dedup_keep_ids(_emb_ds(), threshold=0.999).to_pandas()["vec_id"]
    )
    assert kept == expected
    assert 0 in kept and 1 not in kept


def test_remove_duplicate_spans(ray_session):
    import pandas as pd

    from decisions_knowledge_graph_data_ray.stages.dedup import remove_duplicate_spans

    boiler = "this license text is shared by every document here ok"  # 10 words
    rows = [
        {"doc_id": i, "text": f"unique{i} opening words. {boiler} And unique{i} tail."}
        for i in range(6)
    ]
    ds = rd.from_items(rows)
    out = (
        remove_duplicate_spans(ds, window=8, top_k=50)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # the shared block is gone from every clean_text
    assert not out["clean_text"].str.contains("license text is shared").any()
    assert (out["n_removed_chars"] > 0).all()
    # unique content survives
    for i in range(6):
        assert f"unique{i} opening words" in out.loc[i, "clean_text"]
    # partition-invariant
    out2 = (
        remove_duplicate_spans(ds.repartition(4), window=8, top_k=50)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, out2)


def test_rrf_fuse(ray_session):
    import pandas as pd

    from decisions_knowledge_graph_data_ray.stages.similarity import rrf_fuse

    lex = rd.from_items([{"doc_id": d, "rank": r} for r, d in enumerate([5, 3, 9], 1)])
    sem = rd.from_items([{"doc_id": d, "rank": r} for r, d in enumerate([3, 7], 1)])
    out = (
        rrf_fuse(lex, sem, id_col="doc_id", k=60)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    got = {int(r.doc_id): r.rrf for r in out.itertuples()}
    assert got[3] == 1.0 / 62 + 1.0 / 61  # both sides
    assert got[5] == 1.0 / 61             # lexical only
    assert got[7] == 1.0 / 62             # semantic only
    assert got[9] == 1.0 / 63
    # null ranks survive on the missing side
    row7 = out[out["doc_id"] == 7].iloc[0]
    assert pd.isna(row7["lex_rank"]) and row7["sem_rank"] == 2
