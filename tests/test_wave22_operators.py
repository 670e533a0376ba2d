"""Wave-22 operator tests: AMS F2 sketch, feature hashing."""

import hashlib
from collections import Counter

import pandas as pd
import ray.data as rd


def _u32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_ams_registers_match_brute_force(ray_session):
    from decisions_knowledge_graph_data_ray.stages.cardinality import ams_f2_registers

    rows = [
        {"g": g, "k": k}
        for g, keys in {"a": [1, 1, 2, 3, 3, 3], "b": [7, 8, 8]}.items()
        for k in keys
    ]
    out = (
        ams_f2_registers(rd.from_items(rows), key_col="k", group_col="g", r=4)
        .to_pandas()
        .sort_values(["g", "sketch_idx"])
        .reset_index(drop=True)
    )
    # brute force: per row, sign_j = +1 iff md5-u32("ams:{j}:{key}") even
    want = {}
    for row in rows:
        for j in range(4):
            sign = 1 if _u32(f"ams:{j}:{row['k']}") % 2 == 0 else -1
            want[(row["g"], j)] = want.get((row["g"], j), 0) + sign
    assert len(out) == 8
    for _, r in out.iterrows():
        assert r["s"] == want[(r["g"], r["sketch_idx"])]


def test_ams_partition_invariance(ray_session):
    from decisions_knowledge_graph_data_ray.stages.cardinality import ams_f2_registers

    rows = [{"g": "x", "k": i % 17} for i in range(300)]
    outs = []
    for nblocks in (1, 7):
        ds = rd.from_items(rows).repartition(nblocks)
        outs.append(
            ams_f2_registers(ds, key_col="k", group_col="g", r=8)
            .to_pandas()
            .sort_values(["g", "sketch_idx"])
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_ams_estimator_accuracy(ray_session):
    from decisions_knowledge_graph_data_ray.stages.cardinality import ams_f2_estimate

    # skewed multiset: F2 dominated by the hot key
    keys = [0] * 100 + list(range(1, 60)) * 3
    rows = [{"g": "x", "k": k} for k in keys]
    est = ams_f2_estimate(rd.from_items(rows), key_col="k", group_col="g", r=64)
    exact = sum(n * n for n in Counter(keys).values())
    assert est.loc[0, "ss"] == sum(
        # ss is the exact integer numerator: sum of squared counters
        int(s) ** 2
        for s in _ams_counters(keys, r=64)
    )
    # 64 counters: standard deviation ~ F2 * sqrt(2/64); allow 4 sigma
    assert abs(est.loc[0, "f2_est"] - exact) < 4 * exact * (2 / 64) ** 0.5


def _ams_counters(keys, r):
    sums = [0] * r
    for k in keys:
        for j in range(r):
            sums[j] += 1 if _u32(f"ams:{j}:{k}") % 2 == 0 else -1
    return sums


def test_feature_hash_matches_brute_force(ray_session):
    from decisions_knowledge_graph_data_ray.stages.prep import feature_hash

    docs = [
        {"doc_id": 1, "text": "Red apple RED apple pie"},
        {"doc_id": 2, "text": ""},
        {"doc_id": 3, "text": "zig zag zig"},
    ]
    out = (
        feature_hash(rd.from_items(docs), dim=8)
        .to_pandas()
        .sort_values(["doc_id", "bucket"])
        .reset_index(drop=True)
    )
    import re

    want = []
    for d in docs:
        acc = {}
        for tok, n in Counter(re.findall(r"[a-z0-9]+", d["text"].lower())).items():
            b = _u32(f"fh:{tok}") % 8
            sign = 1 if _u32(f"fhs:{tok}") % 2 == 0 else -1
            acc[b] = acc.get(b, 0) + sign * n
        for b in sorted(acc):
            if acc[b] != 0:
                want.append({"doc_id": d["doc_id"], "bucket": b, "weight": acc[b]})
    pd.testing.assert_frame_equal(out, pd.DataFrame(want), check_dtype=False)


def test_feature_hash_cancellation_dropped(ray_session):
    from decisions_knowledge_graph_data_ray.stages.prep import feature_hash

    # find two tokens colliding into one bucket with opposite signs
    tok_info = {}
    pos = neg = None
    i = 0
    while pos is None or neg is None:
        tok = f"w{i}"
        b = _u32(f"fh:{tok}") % 4
        sign = 1 if _u32(f"fhs:{tok}") % 2 == 0 else -1
        if b == 0 and sign == 1 and pos is None:
            pos = tok
        if b == 0 and sign == -1 and neg is None:
            neg = tok
        tok_info[tok] = (b, sign)
        i += 1
    docs = rd.from_items([{"doc_id": 1, "text": f"{pos} {neg}"}])
    out = feature_hash(docs, dim=4).to_pandas()
    assert len(out) == 0  # +1 and -1 in bucket 0 cancel; row dropped
