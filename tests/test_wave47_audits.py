"""Wave-47: HLL accuracy audit bound, per-source dup rate."""

import datetime as dt

import ray.data as rd


def test_hll_per_group_estimate_tracks_exact(ray_session):
    from decisions_knowledge_graph_data_ray.stages.cardinality import hll_distinct

    rows = []
    # group a: 50 distinct keys; group b: 3 distinct keys
    for u in range(50):
        rows.append({"g": "a", "k": u})
    for u in range(3):
        rows.append({"g": "b", "k": 1000 + u})
        rows.append({"g": "b", "k": 1000 + u})  # repeats must not inflate
    out = (
        hll_distinct(rd.from_items(rows).repartition(3), "k", "g", b=6)
        .to_pandas()
        .set_index("g")
    )
    # b=6 (m=64) keeps small-cardinality error modest via linear counting
    assert abs(out.loc["a", "hll_estimate"] - 50) / 50 < 0.35
    assert abs(out.loc["b", "hll_estimate"] - 3) / 3 < 0.35


def test_dedup_by_source_rates(ray_session):
    import pyarrow as pa

    from ray.data.aggregate import Count

    from decisions_knowledge_graph_data_ray.stages.graph import distinct_pairs

    rows = [
        {"source": "s1", "text": "aaa"},
        {"source": "s1", "text": "aaa"},  # dup
        {"source": "s1", "text": "bbb"},
        {"source": "s2", "text": "ccc"},
    ]
    ds = rd.from_items(rows).repartition(2)

    import hashlib

    def _hash(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "source": batch["source"],
                "h": pa.array(
                    [hashlib.md5(t.encode()).hexdigest() for t in batch["text"].to_pylist()],
                    pa.string(),
                ),
            }
        )

    hashed = ds.map_batches(_hash, batch_format="pyarrow").materialize()
    n_docs = hashed.groupby("source").aggregate(Count(alias_name="n_docs")).to_pandas()
    n_uni = (
        distinct_pairs(hashed, ["source", "h"])
        .groupby("source")
        .aggregate(Count(alias_name="n_unique"))
        .to_pandas()
    )
    m = n_docs.merge(n_uni, on="source").set_index("source")
    assert m.loc["s1", "n_docs"] == 3 and m.loc["s1", "n_unique"] == 2
    assert m.loc["s2", "n_docs"] == 1 and m.loc["s2", "n_unique"] == 1
