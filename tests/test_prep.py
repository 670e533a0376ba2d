"""Training-data prep operators (stages/prep.py)."""

from __future__ import annotations

import re

import pandas as pd
import pytest
import ray.data as rd

from decisions_knowledge_graph_data_ray.stages.prep import (
    chunk_documents,
    contamination_flags,
    redact_numbers,
    split_of,
    train_val_test_split,
    vocabulary,
)


def _docs(n=60):
    rows = []
    for i in range(n):
        words = " ".join(f"w{(i * 7 + j) % 23}" for j in range(40))
        rows.append({"doc_id": i, "text": f"case 12345 of {words} ref 9876543"})
    return rd.from_items(rows)


def test_split_deterministic_and_proportional(ray_session):
    out = train_val_test_split(_docs(300)).to_pandas()
    again = train_val_test_split(_docs(300)).to_pandas()
    pd.testing.assert_frame_equal(
        out.sort_values("doc_id").reset_index(drop=True),
        again.sort_values("doc_id").reset_index(drop=True),
    )
    frac = out["split"].value_counts(normalize=True)
    assert 0.7 < frac["train"] < 0.9
    assert set(out["split"]) <= {"train", "val", "test"}
    # pure function parity
    assert all(split_of(i) == s for i, s in zip(out["doc_id"], out["split"]))


def test_contamination_flags_benchmark_overlap(ray_session):
    docs = rd.from_items(
        [
            {"doc_id": 0, "text": "a b c d e f g h i j"},          # benchmark
            {"doc_id": 1, "text": "a b c d e f g h x y"},          # shares 1 8-gram
            {"doc_id": 2, "text": "q r s t u v w z aa bb"},        # clean
        ]
    )
    bench = docs.filter(expr="doc_id < 1")
    out = (
        contamination_flags(docs, bench, n=8)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert bool(out.loc[0, "contaminated"])  # benchmark self-matches
    assert bool(out.loc[1, "contaminated"]) and out.loc[1, "n_contaminated_ngrams"] == 1
    assert not bool(out.loc[2, "contaminated"])


def test_vocabulary_matches_pandas_recount(ray_session):
    docs = _docs(40)
    out = vocabulary(docs, top_k=10).to_pandas()
    texts = docs.to_pandas()["text"]
    tok = re.compile(r"[a-z0-9]+")
    counts: dict[str, int] = {}
    dfs: dict[str, int] = {}
    for t in texts:
        ws = tok.findall(t.lower())
        for w in ws:
            counts[w] = counts.get(w, 0) + 1
        for w in set(ws):
            dfs[w] = dfs.get(w, 0) + 1
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert list(zip(out["token"], out["count"])) == want
    assert all(out.loc[i, "doc_freq"] == dfs[out.loc[i, "token"]] for i in range(len(out)))


def test_redact_numbers(ray_session):
    out = redact_numbers(_docs(5)).to_pandas().sort_values("doc_id")
    assert (out["n_redactions"] == 2).all()  # 12345 and 9876543
    src = _docs(5).to_pandas().sort_values("doc_id")
    want = src["text"].str.replace(r"\d{4,}", "[NUM]", regex=True).str.len()
    assert out["redacted_len"].tolist() == want.tolist()


def test_chunk_documents_roundtrip(ray_session):
    docs = _docs(8)
    chunks = (
        chunk_documents(docs, chunk_tokens=16)
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
    )
    src = docs.to_pandas().set_index("doc_id")["text"]
    for doc_id, g in chunks.groupby("doc_id"):
        toks = [t for c in g["chunk_text"] for t in c.split(" ") if t]
        assert toks == src[doc_id].split()
        assert (g["n_tokens"].iloc[:-1] == 16).all()  # full windows except last
        assert g["chunk_idx"].tolist() == list(range(len(g)))


def test_semantic_contamination_flags(ray_session):
    import numpy as np
    import ray.data as rd

    from decisions_knowledge_graph_data_ray.stages.prep import semantic_contamination_flags

    # corpus vec 10 IS benchmark vec 0 scaled (cosine 1); vec 11 orthogonal
    bench = rd.from_items([{"vec_id": 0, "embedding": [1.0, 0.0, 0.0]}])
    corpus = rd.from_items(
        [
            {"vec_id": 10, "embedding": [2.0, 0.0, 0.0]},
            {"vec_id": 11, "embedding": [0.0, 3.0, 0.0]},
            {"vec_id": 12, "embedding": [1.0, 1.0, 0.0]},  # cos ~0.707
        ]
    )
    df = (
        semantic_contamination_flags(corpus, bench, threshold=0.8)
        .to_pandas().set_index("vec_id")
    )
    assert bool(df.loc[10, "contaminated"]) and df.loc[10, "max_cosine"] == 1.0
    assert not bool(df.loc[11, "contaminated"]) and df.loc[11, "max_cosine"] == 0.0
    assert not bool(df.loc[12, "contaminated"])
    assert np.isclose(df.loc[12, "max_cosine"], 1 / np.sqrt(2), atol=1e-6)

    # empty benchmark: nothing flagged, max_cosine 0.0
    empty = rd.from_items([{"vec_id": 0, "embedding": [1.0, 0.0, 0.0]}]).filter(
        lambda r: False
    )
    df2 = semantic_contamination_flags(corpus, empty, threshold=0.5).to_pandas()
    assert not df2["contaminated"].any() and (df2["max_cosine"] == 0.0).all()


def test_pack_sequences_matches_serial_and_partition_invariant(ray_session):
    from decisions_knowledge_graph_data_ray.stages.prep import pack_sequences

    chunks = chunk_documents(_docs(50), chunk_tokens=16)
    # bucket_span=8 → 7 buckets at 50 docs: multi-bucket carries exercised
    out = (
        pack_sequences(chunks, capacity=48, bucket_span=8)
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )

    # serial reference: global exclusive prefix sum in (doc_id, chunk_idx) order
    ref = (
        chunks.select_columns(["doc_id", "chunk_idx", "n_tokens"])
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    ref["start_offset"] = ref["n_tokens"].cumsum().shift(fill_value=0).astype("int64")
    ref["seq_id"] = (ref["start_offset"] // 48).astype("int64")
    pd.testing.assert_frame_equal(out[ref.columns.tolist()], ref)

    # seq ids are contiguous from 0 and every bin except possibly the last
    # reaches capacity once its straddling chunk lands
    assert out["seq_id"].min() == 0
    assert sorted(out["seq_id"].unique()) == list(range(out["seq_id"].max() + 1))

    # partitioning must not change the assignment (pure function of corpus)
    out2 = (
        pack_sequences(chunks.repartition(7), capacity=48, bucket_span=8)
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, out2)


def test_mixture_sample_rates_and_determinism(ray_session):
    import hashlib

    from decisions_knowledge_graph_data_ray.stages.prep import mixture_sample

    rows = [
        {"doc_id": i, "lang": ["en", "fr", "zh"][i % 3]} for i in range(300)
    ]
    docs = rd.from_items(rows)
    out = (
        mixture_sample(docs, {"fr": 1.0, "en": 0.5}, default_rate=0.0, seed="mix")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # rate 1.0 keeps every fr row; default 0.0 drops every zh row
    assert (out["lang"] != "zh").all()
    assert (out["lang"] == "fr").sum() == 100
    # en kept iff md5-u32 below floor(0.5 * 2^32) — exact per-row recompute
    kept_en = set(out.loc[out["lang"] == "en", "doc_id"])
    for i in range(0, 300, 3):
        u = int(hashlib.md5(f"mix:{i}".encode()).hexdigest()[:8], 16)
        assert (i in kept_en) == (u < 2147483648)
    # deterministic across runs
    again = (
        mixture_sample(docs, {"fr": 1.0, "en": 0.5}, default_rate=0.0, seed="mix")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, again)


def test_uniform_sample_bottomk_equals_sorted_limit(ray_session):
    import hashlib

    from decisions_knowledge_graph_data_ray.stages.prep import uniform_sample

    docs = rd.from_items([{"doc_id": i, "lang": "en"} for i in range(200)])
    out = uniform_sample(docs, k=7, seed="s").to_pandas()
    want = sorted(range(200), key=lambda i: hashlib.md5(f"s:{i}".encode()).hexdigest())[:7]
    assert out["doc_id"].tolist() == want
    assert out["sample_key"].is_monotonic_increasing
    # partition-invariant (combiner merge must not depend on block layout)
    out2 = uniform_sample(docs.repartition(13), k=7, seed="s").to_pandas()
    pd.testing.assert_frame_equal(out, out2)


def test_hll_registers_and_estimate(ray_session):
    import hashlib

    from decisions_knowledge_graph_data_ray.stages.cardinality import (
        hll_distinct,
        hll_registers,
    )

    rows = [
        {"k": f"user{i % 700}", "g": "a" if i % 2 else "b"} for i in range(5000)
    ]
    ds = rd.from_items(rows)
    regs = (
        hll_registers(ds, key_col="k", group_col="g", b=6)
        .to_pandas()
        .sort_values(["g", "bucket"])
        .reset_index(drop=True)
    )

    # serial recompute over the distinct key set
    want: dict[tuple, int] = {}
    for r in rows:
        u = int(hashlib.md5(r["k"].encode()).hexdigest()[:8], 16)
        rem = u & ((1 << 26) - 1)
        rho = 26 - rem.bit_length() + 1
        key = (r["g"], u >> 26)
        want[key] = max(want.get(key, 0), rho)
    got = {(g, b): r for g, b, r in zip(regs["g"], regs["bucket"], regs["rho"])}
    assert got == want

    # registers merge by max: block layout must not matter
    regs2 = (
        hll_registers(ds.repartition(11), key_col="k", group_col="g", b=6)
        .to_pandas()
        .sort_values(["g", "bucket"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(regs, regs2)

    # estimator: both groups see 350 distinct users (i%2 fixes user parity);
    # standard-HLL error at m=64 is ~13%, gate at 3 sigma
    est = hll_distinct(ds, key_col="k", group_col="g", b=6).to_pandas().set_index("g")
    for g in ("a", "b"):
        assert abs(est.loc[g, "hll_estimate"] - 350) / 350 < 0.4
        assert est.loc[g, "m"] == 64
        assert 0 < est.loc[g, "n_nonzero"] <= 64


def test_balanced_sample_equalizes_groups(ray_session):
    import hashlib

    from decisions_knowledge_graph_data_ray.stages.prep import balanced_sample

    # groups of size 600 / 300 / 60 — keep rates 0.1 / 0.2 / 1.0
    rows = (
        [{"doc_id": i, "lang": "a"} for i in range(600)]
        + [{"doc_id": 1000 + i, "lang": "b"} for i in range(300)]
        + [{"doc_id": 2000 + i, "lang": "c"} for i in range(60)]
    )
    out = (
        balanced_sample(rd.from_items(rows), group_col="lang", seed="bal")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    sizes = out["lang"].value_counts()
    # smallest group kept whole; others land near 60 (hash-Bernoulli)
    assert sizes["c"] == 60
    assert 30 <= sizes["a"] <= 100 and 30 <= sizes["b"] <= 100
    # exact keep rule: u32 < floor(2^32 * 60 / c_g)
    kept = set(out["doc_id"])
    for r in rows:
        g = r["lang"]
        thr = (4294967296 * 60) // {"a": 600, "b": 300, "c": 60}[g]
        u = int(hashlib.md5(f"bal:{r['doc_id']}".encode()).hexdigest()[:8], 16)
        assert (r["doc_id"] in kept) == (u < thr)


def test_deterministic_shuffle_is_md5_order(ray_session):
    import hashlib

    from decisions_knowledge_graph_data_ray.stages.prep import deterministic_shuffle

    docs = rd.from_items([{"doc_id": i} for i in range(100)])
    got = deterministic_shuffle(docs, seed="e1").to_pandas()["doc_id"].tolist()
    want = sorted(range(100), key=lambda i: hashlib.md5(f"e1:{i}".encode()).hexdigest())
    assert got == want
    # a different seed yields a different permutation of the same ids
    got2 = deterministic_shuffle(docs, seed="e2").to_pandas()["doc_id"].tolist()
    assert sorted(got2) == list(range(100)) and got2 != got


def test_weighted_sample_thresholds_and_expectation(ray_session):
    import hashlib

    from decisions_knowledge_graph_data_ray.stages.prep import weighted_sample

    rows = [{"doc_id": i, "w": (i % 10) + 1} for i in range(500)]
    docs = rd.from_items(rows)
    out = weighted_sample(docs, k=60, weight_col="w", seed="ws").to_pandas()
    # exact per-row recompute of the integer threshold rule
    sw = sum(r["w"] for r in rows)
    c = (60 << 32) // sw
    kept = set(out["doc_id"])
    for r in rows:
        u = int(hashlib.md5(f"ws:{r['doc_id']}".encode()).hexdigest()[:8], 16)
        assert (r["doc_id"] in kept) == (u < min(1 << 32, c * r["w"]))
    # expectation lands near k (Bernoulli, not exact-k)
    assert 30 <= len(out) <= 100
    # heavier rows are proportionally likelier: mean kept weight > corpus mean
    assert out["w"].mean() > 5.5
    # partition-invariant
    out2 = (
        weighted_sample(docs.repartition(11), k=60, weight_col="w", seed="ws")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        out.sort_values("doc_id").reset_index(drop=True), out2
    )


def test_weighted_sample_guards(ray_session):
    import pytest

    from decisions_knowledge_graph_data_ray.stages.prep import weighted_sample

    docs = rd.from_items([{"doc_id": 1, "w": 0}])
    with pytest.raises(ValueError):
        weighted_sample(docs, k=0, weight_col="w")
    # all-zero weights → empty sample, not a crash
    assert weighted_sample(docs, k=5, weight_col="w").count() == 0


def test_cms_sketch_and_heavy_hitters(ray_session):
    import hashlib
    from collections import Counter

    from decisions_knowledge_graph_data_ray.stages.cardinality import (
        cms_heavy_hitters,
        cms_table,
    )

    # zipf-ish: key i appears 201-2i times
    rows = [{"k": f"u{i}"} for i in range(100) for _ in range(201 - 2 * i)]
    ds = rd.from_items(rows).repartition(9)
    d, w = 4, 64

    sketch = cms_table(ds, "k", d=d, w=w, seed="t").to_pandas()
    # additivity: every counter equals the sum of exact counts hashing there
    exact = Counter(r["k"] for r in rows)
    want: dict = {}
    for key, n in exact.items():
        for j in range(d):
            u = int(hashlib.md5(f"t:{j}:{key}".encode()).hexdigest()[:8], 16)
            cell = u % w
            want[(j, cell)] = want.get((j, cell), 0) + n
    got = {(r.j, r.cell): r.n for r in sketch.itertuples()}
    assert got == want
    # total mass per hash row equals the stream length
    assert sketch.groupby("j")["n"].sum().eq(len(rows)).all()

    hh = (
        cms_heavy_hitters(ds, "k", threshold=150, d=d, w=w, seed="t")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    # one-sided: estimates never undercount, so every true >=150 key is present
    assert (hh["n_est"] >= hh["n_exact"]).all()
    true_heavy = {k for k, n in exact.items() if n >= 150}
    assert true_heavy <= set(hh["k"])
    for r in hh.itertuples():
        assert r.n_exact == exact[r.k]


def test_bloom_contamination_supersets_exact(ray_session):
    from decisions_knowledge_graph_data_ray.stages.prep import (
        bloom_contamination_flags,
        contamination_flags,
    )

    base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
    rows = [
        {"doc_id": i, "text": f"{base} doc{i} " + " ".join(f"w{i}x{j}" for j in range(10))}
        for i in range(40)
    ]
    docs = rd.from_items(rows)
    bench = docs.filter(expr="doc_id < 4")

    exact = (
        contamination_flags(docs, bench, n=8)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    bloom = (
        bloom_contamination_flags(docs, bench, n=8, m_bits=4096, k_hashes=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # one-sided guarantee: everything exactly contaminated is flagged, and
    # per-doc the bloom count never undercounts the exact overlap
    assert (bloom["n_flagged_ngrams"] >= exact["n_contaminated_ngrams"]).all()
    assert set(exact.loc[exact["contaminated"], "doc_id"]) <= set(
        bloom.loc[bloom["maybe_contaminated"], "doc_id"]
    )
    # the shared 12-word prefix really contaminates every doc (non-trivial)
    assert exact["contaminated"].all()
    # partition-invariant
    bloom2 = (
        bloom_contamination_flags(docs.repartition(7), bench, n=8, m_bits=4096, k_hashes=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(bloom, bloom2)


def test_group_bottomk_sample_exact_per_group(ray_session):
    import hashlib

    import pandas as pd

    from decisions_knowledge_graph_data_ray.stages.prep import group_bottomk_sample

    rows = [{"doc_id": i, "lang": f"L{i % 4}"} for i in range(120)]
    ds = rd.from_items(rows)
    out = (
        group_bottomk_sample(ds, k=3, group_col="lang", id_col="doc_id", seed="t")
        .to_pandas()
        .sort_values(["lang", "sample_key"])
        .reset_index(drop=True)
    )
    df = pd.DataFrame(rows)
    df["sample_key"] = [
        hashlib.md5(f"t:{i}".encode()).hexdigest() for i in df["doc_id"]
    ]
    want = (
        df.sort_values("sample_key").groupby("lang", sort=False).head(3)
        .sort_values(["lang", "sample_key"])
        .reset_index(drop=True)[out.columns.tolist()]
    )
    pd.testing.assert_frame_equal(out, want)
    assert (out.groupby("lang").size() == 3).all()
    # partition-invariant
    out2 = (
        group_bottomk_sample(
            ds.repartition(9), k=3, group_col="lang", id_col="doc_id", seed="t"
        )
        .to_pandas()
        .sort_values(["lang", "sample_key"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, out2)
