"""Deduplication stages over a documents table.

- exact_dedup:       content-hash → hash-partition groupby → per-group first
- minhash_lsh_pairs: shingle → minhash → band → bucket groupby → candidate
                     pairs → Jaccard verify (MinHash-LSH near-dup)
- simhash_pairs:     64-bit SimHash, bucket by 4 x 16-bit bands, verify by
                     Hamming distance
- near_dedup:        LSH pairs → connected components (stages/canonicalize)
                     → keep component minimum

Scale notes: signatures are computed per batch (vectorized numpy inside),
band rows explode 16x but carry only (band, hash, doc_id) ints; the bucket
groupby shuffles those narrow rows, never the text. Verification re-reads
only candidate documents' signatures (carried on the band rows via min/max
pair ids → joined back), here simplified to signature-carrying pairs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..functions import sketches as S

_BANDS = 16


def _with_content_hash(batch: pa.Table) -> pa.Table:
    return batch.append_column(
        "content_hash", pa.array([S.content_hash(t) for t in batch["text"].to_pylist()], pa.string())
    )


def exact_dedup(docs: ray.data.Dataset, id_col: str = "doc_id") -> ray.data.Dataset:
    """Keep the min-id document per exact text content (D1/D4/D5 analogue)."""
    from ray.data.aggregate import Min

    hashed = docs.map_batches(_with_content_hash, batch_format="pyarrow")
    return (
        hashed.select_columns(["content_hash", id_col])
        .groupby("content_hash")
        .aggregate(Min(id_col, alias_name=id_col))
    )


def _band_rows(batch: pa.Table) -> pa.Table:
    ids, bands, hashes, sigs = [], [], [], []
    for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        sig = S.minhash_signature(text)
        for band_id, band_hash in S.minhash_bands(sig, _BANDS):
            ids.append(doc_id)
            bands.append(band_id)
            hashes.append(band_hash & 0x7FFFFFFFFFFFFFFF)
            sigs.append(sig.tobytes())
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "band_id": pa.array(bands, pa.int32()),
            "band_hash": pa.array(hashes, pa.int64()),
            "sig": pa.array(sigs, pa.binary()),
        }
    )


def _partition_pairs_block(group) -> "pa.Table":
    """One hash partition of band rows: pandas-groupby by exact bucket inside,
    pairwise signature comparison per bucket. Python dispatch is O(partitions)
    not O(buckets)."""
    import pandas as pd

    out = []
    for _, bucket in group.groupby(["band_id", "band_hash"], sort=False):
        rows = bucket.sort_values("doc_id").drop_duplicates("doc_id")
        if len(rows) < 2:
            continue
        ids = rows["doc_id"].tolist()
        sigs = np.stack([np.frombuffer(s, dtype=np.uint64) for s in rows["sig"]])
        eq = (sigs[:, None, :] == sigs[None, :, :]).mean(axis=2)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                out.append({"src_id": ids[i], "dst_id": ids[j], "est_jaccard": float(eq[i, j])})
    return pd.DataFrame(out, columns=["src_id", "dst_id", "est_jaccard"])


def _add_bucket_pid(num_partitions: int):
    def f(batch: pa.Table) -> pa.Table:
        bids = batch["band_id"].to_pylist()
        hashes = batch["band_hash"].to_pylist()
        pids = [(b * 1_000_003 + h) % num_partitions for b, h in zip(bids, hashes)]
        return batch.append_column("pid", pa.array(pids, pa.int32()))

    return f


def _num_partitions_default() -> int:
    import ray as _ray

    cpus = int(_ray.cluster_resources().get("CPU", 8)) if _ray.is_initialized() else 8
    return max(16, cpus * 4)


def minhash_lsh_pairs(
    docs: ray.data.Dataset, threshold: float = 0.8, num_partitions: int | None = None
) -> ray.data.Dataset:
    """Candidate near-dup pairs with estimated Jaccard >= threshold."""
    num_partitions = num_partitions or _num_partitions_default()
    bands = docs.map_batches(_band_rows, batch_format="pyarrow")
    pairs = (
        bands.map_batches(_add_bucket_pid(num_partitions), batch_format="pyarrow")
        .groupby("pid")
        .map_groups(_partition_pairs_block, batch_format="pandas")
    )

    def _dedup_filter(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.greater_equal(batch["est_jaccard"], threshold))

    filtered = pairs.map_batches(_dedup_filter, batch_format="pyarrow")
    # same pair can surface from multiple bands → distinct
    from ray.data.aggregate import Max

    return (
        filtered.groupby(["src_id", "dst_id"]).aggregate(Max("est_jaccard", alias_name="est_jaccard"))
    )


def _simhash_rows(batch: pa.Table) -> pa.Table:
    ids, bands, keys, hashes = [], [], [], []
    for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        h = S.simhash(text)
        for b in range(4):  # 4 x 16-bit bands → Hamming<=3 candidates guaranteed
            ids.append(doc_id)
            bands.append(b)
            keys.append((h >> (16 * b)) & 0xFFFF)
            hashes.append(h & 0x7FFFFFFFFFFFFFFF)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "band_id": pa.array(bands, pa.int32()),
            "band_key": pa.array(keys, pa.int32()),
            "simhash": pa.array(hashes, pa.int64()),
        }
    )


def simhash_pairs(
    docs: ray.data.Dataset, max_hamming: int = 3, num_partitions: int | None = None
) -> ray.data.Dataset:
    """Near-dup pairs by SimHash banding + Hamming verification."""
    num_partitions = num_partitions or _num_partitions_default()
    rows = docs.map_batches(_simhash_rows, batch_format="pyarrow")

    def _add_pid(batch: pa.Table) -> pa.Table:
        bids = batch["band_id"].to_pylist()
        keys = batch["band_key"].to_pylist()
        pids = [(b * 1_000_003 + k) % num_partitions for b, k in zip(bids, keys)]
        return batch.append_column("pid", pa.array(pids, pa.int32()))

    def _pairs_block(group):
        import pandas as pd

        out = []
        for _, bucket in group.groupby(["band_id", "band_key"], sort=False):
            uniq = bucket.sort_values("doc_id").drop_duplicates("doc_id")
            ids = uniq["doc_id"].tolist()
            hs = uniq["simhash"].tolist()
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    d = bin(hs[i] ^ hs[j]).count("1")
                    if d <= max_hamming:
                        out.append({"src_id": ids[i], "dst_id": ids[j], "hamming": d})
        return pd.DataFrame(out, columns=["src_id", "dst_id", "hamming"])

    pairs = (
        rows.map_batches(_add_pid, batch_format="pyarrow")
        .groupby("pid")
        .map_groups(_pairs_block, batch_format="pandas")
    )
    from ray.data.aggregate import Min

    return pairs.groupby(["src_id", "dst_id"]).aggregate(Min("hamming", alias_name="hamming"))


def ngram_jaccard_verify(
    pairs: ray.data.Dataset, docs: ray.data.Dataset, threshold: float = 0.8,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Exact n-gram Jaccard verification of candidate pairs (join texts back)."""
    from .canonicalize import clamp_join_partitions, ensure_schema

    num_partitions = clamp_join_partitions(num_partitions)
    pairs = pairs.map_batches(
        ensure_schema(
            pa.schema(
                [("src_id", pa.int64()), ("dst_id", pa.int64()), ("est_jaccard", pa.float64())]
            )
        ),
        batch_format="pyarrow",
    )
    from .joins import hash_bucket_join

    texts = docs.select_columns(["doc_id", "text"])
    src_texts = texts.map_batches(
        lambda b: b.rename_columns(["src_doc_id", "src_text"]), batch_format="pyarrow"
    )
    dst_texts = texts.map_batches(
        lambda b: b.rename_columns(["dst_doc_id", "dst_text"]), batch_format="pyarrow"
    )
    a = hash_bucket_join(
        pairs, src_texts, on="src_id", right_on="src_doc_id",
        output_columns=["src_id", "dst_id", "est_jaccard", "src_text"],
        num_buckets=num_partitions,
    )
    b = hash_bucket_join(
        a, dst_texts, on="dst_id", right_on="dst_doc_id",
        output_columns=["src_id", "dst_id", "est_jaccard", "src_text", "dst_text"],
        num_buckets=num_partitions,
    )

    def _verify(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        jac = pa.array(
            [
                S.ngram_jaccard(s, d)
                for s, d in zip(batch["src_text"].to_pylist(), batch["dst_text"].to_pylist())
            ],
            pa.float64(),
        )
        batch = batch.append_column("jaccard", jac)
        batch = batch.filter(pc.greater_equal(batch["jaccard"], threshold))
        return batch.select(["src_id", "dst_id", "jaccard"])

    return b.map_batches(_verify, batch_format="pyarrow")


def near_dedup_keep_ids(docs: ray.data.Dataset, threshold: float = 0.8) -> ray.data.Dataset:
    """Full near-dedup: LSH pairs → connected components → keep min doc_id
    per component (plus all never-paired docs)."""
    from .canonicalize import connected_components

    pairs = minhash_lsh_pairs(docs, threshold)

    def _to_edges(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": pa.array([str(x) for x in batch["src_id"].to_pylist()], pa.string()),
                "dst": pa.array([str(x) for x in batch["dst_id"].to_pylist()], pa.string()),
            }
        )

    edges = pairs.map_batches(_to_edges, batch_format="pyarrow")
    labels = connected_components(edges)

    # drop any doc whose component label != itself (string-numeric compare on
    # equal-width ids is safe: labels are min by string; callers wanting
    # numeric-min should zero-pad ids)
    def _drops(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        nonroot = batch.filter(pc.invert(pc.equal(batch["node"], batch["label"])))
        return pa.table({"doc_id": pa.array([int(x) for x in nonroot["node"].to_pylist()], pa.int64())})

    drops = labels.map_batches(_drops, batch_format="pyarrow")
    drop_ids = set(drops.to_pandas()["doc_id"].tolist())  # small: near-dup docs only

    def _keep(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pa.array([i not in drop_ids for i in batch["doc_id"].to_pylist()])
        return batch.filter(mask).select(["doc_id"])

    return docs.map_batches(_keep, batch_format="pyarrow")
