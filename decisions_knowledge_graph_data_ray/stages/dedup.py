"""Deduplication stages over a documents table.

- exact_dedup:       content-hash → hash-partition groupby → per-group first
- minhash_lsh_pairs: shingle → minhash → band → bucket groupby → candidate
                     pairs → signature join-back → est-Jaccard filter
- simhash_pairs:     64-bit SimHash, bucket by 4 x 16-bit bands, verify by
                     Hamming distance
- near_dedup:        LSH pairs → connected components (stages/canonicalize)
                     → keep component minimum (distributed anti-join)

Scale notes: signatures are computed ONCE into a narrow (doc_id, sig)
side table (~1KB/doc; materialized so banding and verification share the
pass — at 10^9 docs that is ~1TB across the cluster's object store, which
spills); band rows carry only (doc_id, band_id, band_hash) ints — the
bucket groupby shuffles 20 bytes/row × 16 bands, never signatures or text.
Candidate pairs are made distinct BEFORE the signature join-back, so the
verification join moves |candidate pairs| rows, not |band collisions|.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..functions import sketches as S

_BANDS = 16
_SIG_BYTES = 128 * 8  # 128 uint64 minhash permutations
# below this doc count the sig table broadcasts (~1KB/doc → ≤200MB object);
# above it, verification joins signatures back with bucketed joins
SIG_BROADCAST_MAX_DOCS = 200_000


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


_SIG_SCHEMA = pa.schema([("doc_id", pa.int64()), ("sig", pa.binary())])


def minhash_sig_table(docs: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, sig) — one 1KB MinHash signature per document."""

    def _sigs(batch: pa.Table) -> pa.Table:
        sigs = [S.minhash_signature(t).tobytes() for t in batch["text"].to_pylist()]
        return pa.table(
            {"doc_id": batch["doc_id"].cast(pa.int64()), "sig": pa.array(sigs, pa.binary())},
            schema=_SIG_SCHEMA,
        )

    return docs.map_batches(_sigs, batch_format="pyarrow")


def _band_rows(batch: pa.Table) -> pa.Table:
    """sig table → 16 narrow int rows per doc (NO signature payload)."""
    ids, bands, hashes = [], [], []
    for doc_id, sig_bytes in zip(batch["doc_id"].to_pylist(), batch["sig"].to_pylist()):
        sig = np.frombuffer(sig_bytes, dtype=np.uint64)
        for band_id, band_hash in S.minhash_bands(sig, _BANDS):
            ids.append(doc_id)
            bands.append(band_id)
            hashes.append(band_hash & 0x7FFFFFFFFFFFFFFF)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "band_id": pa.array(bands, pa.int32()),
            "band_hash": pa.array(hashes, pa.int64()),
        }
    )


def _candidate_pairs_block(group) -> "pa.Table":
    """One hash partition of band rows: pandas-groupby by exact bucket inside,
    all-pairs emission per bucket (ids only). Python dispatch is
    O(partitions) not O(buckets)."""
    import pandas as pd

    src, dst = [], []
    for _, bucket in group.groupby(["band_id", "band_hash"], sort=False):
        ids = np.unique(bucket["doc_id"].to_numpy())
        if len(ids) < 2:
            continue
        iu, ju = np.triu_indices(len(ids), k=1)
        src.append(ids[iu])
        dst.append(ids[ju])
    if not src:
        return pd.DataFrame({"src_id": pd.Series(dtype="int64"), "dst_id": pd.Series(dtype="int64")})
    return pd.DataFrame({"src_id": np.concatenate(src), "dst_id": np.concatenate(dst)})


def _add_bucket_pid(num_partitions: int):
    def f(batch: pa.Table) -> pa.Table:
        bids = batch["band_id"].to_numpy()
        hashes = batch["band_hash"].to_numpy()
        pids = ((bids.astype(np.int64) * 1_000_003 + hashes) % num_partitions).astype(np.int32)
        return batch.append_column("pid", pa.array(pids, pa.int32()))

    return f


def _num_partitions_default() -> int:
    import ray as _ray

    cpus = int(_ray.cluster_resources().get("CPU", 8)) if _ray.is_initialized() else 8
    return max(16, cpus * 4)


def minhash_lsh_pairs(
    docs: ray.data.Dataset, threshold: float = 0.8, num_partitions: int | None = None
) -> ray.data.Dataset:
    """Candidate near-dup pairs with estimated Jaccard >= threshold.

    Plan: sig table (materialized once) → int-only band rows → bucket
    groupby → distinct candidate (src,dst) pairs → join signatures back on
    both sides → vectorized est-Jaccard → filter. The band shuffle moves
    ints only; signatures move once per candidate-pair side.
    """
    from .joins import hash_bucket_join

    num_partitions = num_partitions or _num_partitions_default()
    sigs = minhash_sig_table(docs).materialize()

    def _pairs_with_pid(group):
        # combiner-first distinct: the same pair surfaces from multiple
        # bands/partitions — dedup inside the block, route by pair hash, and
        # finish with a per-group Arrow distinct (Ray's multi-key Aggregate
        # was the bottleneck at high collision counts; see
        # jaccard_similarity_join for the measured numbers)
        out = _candidate_pairs_block(group).drop_duplicates(ignore_index=True)
        out["pair_pid"] = (
            (out["src_id"].to_numpy() * np.int64(1_000_003) + out["dst_id"].to_numpy())
            % num_partitions
        ).astype(np.int32)
        return out

    def _distinct_pairs(group: pa.Table) -> pa.Table:
        # Arrow C++ hash aggregate with no aggregations == distinct keys
        return pa.TableGroupBy(
            group.select(["src_id", "dst_id"]), ["src_id", "dst_id"]
        ).aggregate([])

    bands = sigs.map_batches(_band_rows, batch_format="pyarrow")
    pairs = (
        bands.map_batches(_add_bucket_pid(num_partitions), batch_format="pyarrow")
        .groupby("pid")
        .map_groups(_pairs_with_pid, batch_format="pandas")
        .groupby("pair_pid")
        .map_groups(_distinct_pairs, batch_format="pyarrow")
    )

    def _estimate_arrays(src_sig: list, dst_sig: list) -> np.ndarray:
        s = np.frombuffer(b"".join(src_sig), dtype=np.uint64).reshape(len(src_sig), -1)
        d = np.frombuffer(b"".join(dst_sig), dtype=np.uint64).reshape(len(dst_sig), -1)
        return (s == d).mean(axis=1)

    # small corpora (including every per-round test scale): broadcast the
    # sig table once (ray.put, fetched once per actor) and verify candidate
    # pairs with two dict lookups — zero extra shuffles. Large corpora:
    # bucketed signature join-back (below).
    if sigs.count() <= SIG_BROADCAST_MAX_DOCS:
        import pyarrow.compute as pc

        import ray as _ray

        sig_map = {}
        for blk in sigs.iter_batches(batch_format="pyarrow", batch_size=None):
            sig_map.update(zip(blk["doc_id"].to_pylist(), blk["sig"].to_pylist()))
        sig_ref = _ray.put(sig_map)

        class VerifyPairs:
            def __init__(self):
                self._sigs = _ray.get(sig_ref)

            def __call__(self, batch: pa.Table) -> pa.Table:
                if batch.num_rows == 0:
                    return pa.table(
                        {
                            "src_id": pa.array([], pa.int64()),
                            "dst_id": pa.array([], pa.int64()),
                            "est_jaccard": pa.array([], pa.float64()),
                        }
                    )
                src = [self._sigs[i] for i in batch["src_id"].to_pylist()]
                dst = [self._sigs[i] for i in batch["dst_id"].to_pylist()]
                out = pa.table(
                    {
                        "src_id": batch["src_id"],
                        "dst_id": batch["dst_id"],
                        "est_jaccard": pa.array(_estimate_arrays(src, dst), pa.float64()),
                    }
                )
                return out.filter(pc.greater_equal(out["est_jaccard"], threshold))

        return pairs.map_batches(VerifyPairs, batch_format="pyarrow", concurrency=(1, 4))

    _PAIR_SCHEMA = pa.schema([("src_id", pa.int64()), ("dst_id", pa.int64())])
    src_sigs = sigs.map_batches(
        lambda b: b.rename_columns(["src_doc_id", "src_sig"]), batch_format="pyarrow"
    )
    dst_sigs = sigs.map_batches(
        lambda b: b.rename_columns(["dst_doc_id", "dst_sig"]), batch_format="pyarrow"
    )
    a = hash_bucket_join(
        pairs, src_sigs, on="src_id", right_on="src_doc_id",
        output_columns=["src_id", "dst_id", "src_sig"],
        num_buckets=num_partitions,
        left_schema=_PAIR_SCHEMA,
        right_schema=pa.schema([("src_doc_id", pa.int64()), ("src_sig", pa.binary())]),
    )
    b = hash_bucket_join(
        a, dst_sigs, on="dst_id", right_on="dst_doc_id",
        output_columns=["src_id", "dst_id", "src_sig", "dst_sig"],
        num_buckets=num_partitions,
        left_schema=pa.schema(
            [("src_id", pa.int64()), ("dst_id", pa.int64()), ("src_sig", pa.binary())]
        ),
        right_schema=pa.schema([("dst_doc_id", pa.int64()), ("dst_sig", pa.binary())]),
    )

    def _estimate(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if batch.num_rows == 0:
            return pa.table(
                {
                    "src_id": pa.array([], pa.int64()),
                    "dst_id": pa.array([], pa.int64()),
                    "est_jaccard": pa.array([], pa.float64()),
                }
            )
        s = np.frombuffer(b"".join(batch["src_sig"].to_pylist()), dtype=np.uint64).reshape(
            batch.num_rows, -1
        )
        d = np.frombuffer(b"".join(batch["dst_sig"].to_pylist()), dtype=np.uint64).reshape(
            batch.num_rows, -1
        )
        est = (s == d).mean(axis=1)
        out = pa.table(
            {
                "src_id": batch["src_id"],
                "dst_id": batch["dst_id"],
                "est_jaccard": pa.array(est, pa.float64()),
            }
        )
        return out.filter(pc.greater_equal(out["est_jaccard"], threshold))

    return b.map_batches(_estimate, batch_format="pyarrow")


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
        bids = batch["band_id"].to_numpy()
        keys = batch["band_key"].to_numpy()
        pids = ((bids.astype(np.int64) * 1_000_003 + keys) % num_partitions).astype(np.int32)
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
                        out.append((ids[i], ids[j], d))
        df = pd.DataFrame(
            out, columns=["src_id", "dst_id", "hamming"], dtype="int64"
        ).drop_duplicates(ignore_index=True)
        df["pair_pid"] = (
            (df["src_id"].to_numpy() * np.int64(1_000_003) + df["dst_id"].to_numpy())
            % num_partitions
        ).astype(np.int32)
        return df

    def _distinct_pairs(group: pa.Table) -> pa.Table:
        # hamming is a pure function of the pair's two simhashes, so it is
        # identical across the bands that re-surface a pair — distinct over
        # all three columns == distinct pairs with their hamming
        return pa.TableGroupBy(
            group.select(["src_id", "dst_id", "hamming"]), ["src_id", "dst_id", "hamming"]
        ).aggregate([])

    return (
        rows.map_batches(_add_pid, batch_format="pyarrow")
        .groupby("pid")
        .map_groups(_pairs_block, batch_format="pandas")
        .groupby("pair_pid")
        .map_groups(_distinct_pairs, batch_format="pyarrow")
    )


def ngram_jaccard_verify(
    pairs: ray.data.Dataset, docs: ray.data.Dataset, threshold: float = 0.8,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Exact n-gram Jaccard verification of candidate pairs (join texts back)."""
    from .canonicalize import clamp_join_partitions, ensure_schema

    num_partitions = clamp_join_partitions(num_partitions)
    _PAIRS_SCHEMA = pa.schema(
        [("src_id", pa.int64()), ("dst_id", pa.int64()), ("est_jaccard", pa.float64())]
    )
    pairs = pairs.map_batches(ensure_schema(_PAIRS_SCHEMA), batch_format="pyarrow")
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
        left_schema=_PAIRS_SCHEMA,
        right_schema=pa.schema([("src_doc_id", pa.int64()), ("src_text", pa.string())]),
    )
    b = hash_bucket_join(
        a, dst_texts, on="dst_id", right_on="dst_doc_id",
        output_columns=["src_id", "dst_id", "est_jaccard", "src_text", "dst_text"],
        num_buckets=num_partitions,
        left_schema=pa.schema(
            [
                ("src_id", pa.int64()), ("dst_id", pa.int64()),
                ("est_jaccard", pa.float64()), ("src_text", pa.string()),
            ]
        ),
        right_schema=pa.schema([("dst_doc_id", pa.int64()), ("dst_text", pa.string())]),
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


def _char_ngrams(text: str, n: int) -> set:
    """Distinct char n-grams — definition shared verbatim with the DuckDB
    oracle (`list_distinct(list_transform(range(1, length(text)-n+2),
    i -> substr(text, i, n)))`)."""
    return {text[i : i + n] for i in range(len(text) - n + 1)}


def _prefix_rows(threshold: float, ngram: int):
    """doc → (shingle_hash, doc_id, set_size) rows for the PREFIX shingles
    only. Prefix filtering (SSJoin/PPJoin): under ANY fixed global order of
    shingles, two sets with Jaccard >= t must share an element within each
    set's first ``|s| - ceil(t*|s|) + 1`` shingles — hash order is used here,
    which needs no global document-frequency pass.

    Integer-safe prefix: ``|s| - floor(t*|s|) + 1`` (>= the minimal
    ``|s| - ceil(t*|s|) + 1`` by at most one element, never too short).
    The naive float form ``int((1-t)*|s|) + 1`` under-computes whenever
    (1-t)*|s| lands just below an integer (e.g. t=0.8, |s|=10 gives
    1.9999... -> prefix 2 where 3 is required), silently dropping
    exact-boundary pairs with J == t."""
    import zlib

    def f(batch: pa.Table) -> pa.Table:
        hashes, ids, sizes = [], [], []
        for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            sh = _char_ngrams(text, ngram)
            if not sh:
                continue
            hs = sorted(zlib.crc32(s.encode()) for s in sh)
            p = len(hs) - int(threshold * len(hs)) + 1
            hashes.extend(hs[:p])
            ids.extend([doc_id] * p)
            sizes.extend([len(hs)] * p)
        return pa.table(
            {
                "shingle_hash": pa.array(hashes, pa.int64()),
                "doc_id": pa.array(ids, pa.int64()),
                "set_size": pa.array(sizes, pa.int32()),
            }
        )

    return f


def jaccard_similarity_join(
    docs: ray.data.Dataset,
    threshold: float = 0.8,
    ngram: int = 5,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """EXACT all-pairs n-gram-Jaccard self-join: every (src_id < dst_id) with
    round(jaccard, 6) >= threshold. Unlike ``minhash_lsh_pairs`` (probabilistic
    estimate) this is exact — guaranteed recall via prefix filtering, then
    per-candidate verification on the real shingle sets.

    Plan: prefix shingle rows (≈(1-t)·|shingles| rows/doc, ints only) →
    shingle-hash bucket groupby → candidate pairs with the size-ratio filter
    (|A| >= t·|B|) → distinct → text join-back (bucketed Arrow join) → exact
    Jaccard verify. No stage holds more than a bucket; candidate count is
    bounded by true near-dup density, not N²."""

    num_partitions = num_partitions or _num_partitions_default()
    prefix = docs.map_batches(_prefix_rows(threshold, ngram), batch_format="pyarrow")

    def _add_pid(batch: pa.Table) -> pa.Table:
        pids = (batch["shingle_hash"].to_numpy() % num_partitions).astype(np.int32)
        return batch.append_column("pid", pa.array(pids, pa.int32()))

    def _pairs_block(group):
        import pandas as pd

        # only shingle hashes shared by >=2 rows can yield a pair — filter
        # vectorized BEFORE the per-bucket Python loop (the vast majority of
        # shingle hashes are singletons; looping over them cost ~300s at
        # t=0.7 on 500 docs)
        group = group[group.duplicated("shingle_hash", keep=False)]
        src, dst = [], []
        for _, bucket in group.groupby("shingle_hash", sort=False):
            uniq = bucket.drop_duplicates("doc_id").sort_values("doc_id")
            ids = uniq["doc_id"].to_numpy()
            sizes = uniq["set_size"].to_numpy().astype(np.float64)
            if len(ids) < 2:
                continue
            iu, ju = np.triu_indices(len(ids), k=1)
            # size-ratio filter: jaccard >= t needs min(|A|,|B|) >= t*max(|A|,|B|).
            # Epsilon guards the exact-boundary case (t=0.8, sizes 4/5:
            # 0.8*5 floats a hair above 4.0) — verify is exact, so slack
            # only costs a candidate, never a wrong pair.
            ok = (
                np.minimum(sizes[iu], sizes[ju]) + 1e-9
                >= threshold * np.maximum(sizes[iu], sizes[ju])
            )
            src.append(ids[iu][ok])
            dst.append(ids[ju][ok])
        if not src:
            return pd.DataFrame(
                {
                    "src_id": pd.Series(dtype="int64"),
                    "dst_id": pd.Series(dtype="int64"),
                    "pair_pid": pd.Series(dtype="int32"),
                }
            )
        # combiner: a pair sharing k prefix shingles in this pid appears k
        # times — dedup BEFORE the pair shuffle, then route by pair hash so
        # the cross-pid distinct is a cogroup, not Ray's slow multi-key
        # Aggregate (334s on 1.35M candidate rows at sf0.01)
        out = pd.DataFrame(
            {"src_id": np.concatenate(src), "dst_id": np.concatenate(dst)}
        ).drop_duplicates(ignore_index=True)
        out["pair_pid"] = (
            (out["src_id"].to_numpy() * np.int64(1000003) + out["dst_id"].to_numpy())
            % num_partitions
        ).astype(np.int32)
        return out

    def _distinct_pairs(group: pa.Table) -> pa.Table:
        # Arrow C++ hash aggregate with no aggregations == distinct keys
        return pa.TableGroupBy(group.select(["src_id", "dst_id"]), ["src_id", "dst_id"]).aggregate([])

    candidates = (
        prefix.map_batches(_add_pid, batch_format="pyarrow")
        .groupby("pid")
        .map_groups(_pairs_block, batch_format="pandas")
        .groupby("pair_pid")
        .map_groups(_distinct_pairs, batch_format="pyarrow")
    )

    from .joins import hash_bucket_join

    texts = docs.select_columns(["doc_id", "text"])
    src_texts = texts.map_batches(
        lambda b: b.rename_columns(["src_doc_id", "src_text"]), batch_format="pyarrow"
    )
    dst_texts = texts.map_batches(
        lambda b: b.rename_columns(["dst_doc_id", "dst_text"]), batch_format="pyarrow"
    )
    _CAND_SCHEMA = pa.schema([("src_id", pa.int64()), ("dst_id", pa.int64())])
    a = hash_bucket_join(
        candidates, src_texts, on="src_id", right_on="src_doc_id",
        output_columns=["src_id", "dst_id", "src_text"],
        num_buckets=num_partitions,
        left_schema=_CAND_SCHEMA,
        right_schema=pa.schema([("src_doc_id", pa.int64()), ("src_text", pa.string())]),
    )
    b = hash_bucket_join(
        a, dst_texts, on="dst_id", right_on="dst_doc_id",
        output_columns=["src_id", "dst_id", "src_text", "dst_text"],
        num_buckets=num_partitions,
        left_schema=pa.schema(
            [("src_id", pa.int64()), ("dst_id", pa.int64()), ("src_text", pa.string())]
        ),
        right_schema=pa.schema([("dst_doc_id", pa.int64()), ("dst_text", pa.string())]),
    )

    def _verify(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        jac = []
        for s, d in zip(batch["src_text"].to_pylist(), batch["dst_text"].to_pylist()):
            sa, sb = _char_ngrams(s, ngram), _char_ngrams(d, ngram)
            inter = len(sa & sb)
            union = len(sa) + len(sb) - inter
            jac.append(round(inter / union, 6) if union else 0.0)
        out = pa.table(
            {
                "src_id": batch["src_id"],
                "dst_id": batch["dst_id"],
                "jaccard": pa.array(jac, pa.float64()),
            }
        )
        return out.filter(pc.greater_equal(out["jaccard"], threshold))

    return b.map_batches(_verify, batch_format="pyarrow")


def keep_ids_from_pairs(
    ids: ray.data.Dataset, pairs: ray.data.Dataset, id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Shared near-dedup keep rule: duplicate pairs ``(src_id, dst_id)`` →
    connected components → keep the component minimum (plus every
    never-paired id). Used by the text family (:func:`near_dedup_keep_ids`)
    and the embedding family (``similarity.semantic_dedup_keep_ids``).

    The drop set never lands on the driver: non-root component members are
    removed by a distributed bucketed LEFT ANTI join (a web-scale corpus
    with a 40%+ dup rate keeps streaming). ``ids`` must be a single-column
    int64 dataset named ``id_col``."""
    from .canonicalize import connected_components
    from .joins import hash_bucket_join

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
        return pa.table(
            {"drop_id": pa.array([int(x) for x in nonroot["node"].to_pylist()], pa.int64())}
        )

    drops = labels.map_batches(_drops, batch_format="pyarrow")
    return hash_bucket_join(
        ids,
        drops,
        on=id_col,
        right_on="drop_id",
        output_columns=[id_col],
        how="left_anti",
        left_schema=pa.schema([(id_col, pa.int64())]),
        right_schema=pa.schema([("drop_id", pa.int64())]),
    )


def near_dedup_keep_ids(
    docs: ray.data.Dataset, threshold: float = 0.8, exact: bool = False
) -> ray.data.Dataset:
    """Full near-dedup: near-dup pairs → connected components → keep min
    doc_id per component (plus all never-paired docs).

    ``exact=False`` (default, the 100-TB path) pairs via MinHash-LSH sketch
    estimate; ``exact=True`` pairs via the prefix-filtered exact
    n-gram-Jaccard self-join (guaranteed recall — the mode the DuckDB
    keep-set oracle checks against, since sketch estimates are not SQL)."""
    pairs = (
        jaccard_similarity_join(docs, threshold)
        if exact
        else minhash_lsh_pairs(docs, threshold)
    )
    return keep_ids_from_pairs(docs.select_columns(["doc_id"]), pairs, "doc_id")


def duplicate_spans(
    docs: ray.data.Dataset,
    window: int = 8,
    top_k: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Exact repeated-substring detection: every ``window``-word span
    (stride 1, lowercase word tokens) counted corpus-wide; spans appearing
    in >= 2 documents ranked by (occurrences desc, span asc), top-k. The
    hashed-fixed-window approximation of suffix-array training-data dedup
    (Lee et al., "Deduplicating Training Data Makes Language Models
    Better") — the detector that finds boilerplate/licence blocks exact
    n-gram MinHash similarity misses because the containing documents
    differ.

    Scale shape: per-batch combiner (one partial row per DISTINCT span per
    batch with its occurrence count and within-batch doc count — a document
    lives in exactly one batch, so summed doc counts are exact distincts),
    then one groupby Sum; partial-top-k per block before the driver pick.
    The shuffle is bounded by distinct spans per batch, never raw windows;
    at larger scale raise the stride (windows every s words) to cut the
    span volume w/s-fold — boilerplate blocks longer than w+s still hit.
    """
    import re as _re
    from collections import Counter

    import pandas as pd
    from ray.data.aggregate import Sum

    word_re = _re.compile(r"[a-z0-9]+")

    def _partial(batch: pa.Table) -> pa.Table:
        occ: Counter = Counter()
        dcs: Counter = Counter()
        for text in batch[text_col].to_pylist():
            words = word_re.findall(text.lower())
            spans = [
                " ".join(words[i : i + window]) for i in range(len(words) - window + 1)
            ]
            occ.update(spans)
            dcs.update(set(spans))
        keys = list(occ)
        return pa.table(
            {
                "span": pa.array(keys, pa.string()),
                "n_occurrences": pa.array([occ[k] for k in keys], pa.int64()),
                "n_docs": pa.array([dcs[k] for k in keys], pa.int64()),
            }
        )

    totals = (
        docs.map_batches(_partial, batch_format="pyarrow")
        .groupby("span")
        .aggregate(
            Sum("n_occurrences", alias_name="n_occurrences"),
            Sum("n_docs", alias_name="n_docs"),
        )
    )

    def _topk(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df[df["n_docs"] >= 2]
        df = df.sort_values(["n_occurrences", "span"], ascending=[False, True]).head(top_k)
        return pa.Table.from_pandas(df, preserve_index=False)

    out = totals.map_batches(_topk, batch_format="pyarrow").to_pandas()
    if out.empty:  # no qualifying span anywhere: keep the schema
        return ray.data.from_arrow(
            pa.schema(
                [("span", pa.string()), ("n_docs", pa.int64()), ("n_occurrences", pa.int64())]
            ).empty_table()
        )
    out = (
        out.sort_values(["n_occurrences", "span"], ascending=[False, True])
        .head(top_k)
        .reset_index(drop=True)
    )
    return ray.data.from_pandas(pd.DataFrame(out[["span", "n_docs", "n_occurrences"]]))


def remove_duplicate_spans(
    docs: ray.data.Dataset,
    window: int = 8,
    top_k: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """The REMOVE step of span-level dedup (Lee et al.): detect the top-k
    cross-document boilerplate spans (:func:`duplicate_spans`) and strip
    every occurrence from each document's normalized text (lowercase word
    tokens joined by single spaces — the same view the detector counts on,
    so every detected span literally matches). Replacements apply in the
    detector's (occurrences desc, span asc) order, left-to-right
    non-overlapping — the fold a DuckDB ``list_reduce`` replays exactly.

    Scale shape: the span list is bounded by ``top_k`` (a driver-side pick
    by contract of duplicate_spans), broadcast once via ``ray.put``; the
    corpus streams through a pure map. Output:
    ``(id_col, clean_text, n_removed_chars)``.
    """
    import re as _re

    word_re = _re.compile(r"[a-z0-9]+")
    spans_df = duplicate_spans(
        docs, window=window, top_k=top_k, text_col=text_col, id_col=id_col
    ).to_pandas()
    spans_ref = ray.put(list(spans_df["span"]))

    def _strip(batch: pa.Table) -> pa.Table:
        spans = ray.get(spans_ref)
        ids, cleans, removed = [], [], []
        for i, text in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
            norm = " ".join(word_re.findall(text.lower()))
            clean = norm
            for s in spans:
                clean = clean.replace(s, "")
            ids.append(i)
            cleans.append(clean)
            removed.append(len(norm) - len(clean))
        return pa.table(
            {
                id_col: pa.array(ids, batch[id_col].type),
                "clean_text": pa.array(cleans, pa.string()),
                "n_removed_chars": pa.array(removed, pa.int64()),
            }
        )

    return docs.map_batches(_strip, batch_format="pyarrow")


def representative_ids_from_pairs(
    members: ray.data.Dataset,
    pairs: ray.data.Dataset,
    id_col: str = "doc_id",
    rank_col: str = "n_chars",
) -> ray.data.Dataset:
    """Quality-aware near-dedup keep rule: duplicate pairs → connected
    components → keep the component's BEST member by (``rank_col`` desc,
    id asc) instead of the min-id (the curation variant: keep-longest /
    keep-highest-quality is what a training-data pipeline actually ships;
    :func:`keep_ids_from_pairs` keeps the min-id canonical form the
    linker needs). Never-paired ids keep themselves.

    Scale shape: distributed CC on the pair edges; ONE bucketed join
    tags component members with their rank value; per-component argmax
    is a grouped head-1 (component sizes are dup-cluster sizes — small
    by definition); the final keep-set is assembled by a bucketed
    anti-join (drop the non-representatives), so no id set lands on the
    driver. ``members`` must carry (id_col int64, rank_col int64)."""
    import pandas as pd

    from .canonicalize import connected_components
    from .joins import hash_bucket_join

    def _to_edges(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": pa.array([str(x) for x in batch["src_id"].to_pylist()], pa.string()),
                "dst": pa.array([str(x) for x in batch["dst_id"].to_pylist()], pa.string()),
            }
        )

    labels = connected_components(pairs.map_batches(_to_edges, batch_format="pyarrow"))

    def _mem_key(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pa.array([str(x) for x in batch[id_col].to_pylist()], pa.string()),
                id_col: batch[id_col].cast(pa.int64()),
                rank_col: batch[rank_col].cast(pa.int64()),
            }
        )

    tagged = hash_bucket_join(
        labels,
        members.map_batches(_mem_key, batch_format="pyarrow"),
        on="node",
        output_columns=["label", id_col, rank_col],
        left_schema=pa.schema([("node", pa.string()), ("label", pa.string())]),
        right_schema=pa.schema(
            [("node", pa.string()), (id_col, pa.int64()), (rank_col, pa.int64())]
        ),
    )

    def _best(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([rank_col, id_col], ascending=[False, True])
        return g.head(1)[["label", id_col]]

    best = tagged.groupby("label").map_groups(_best, batch_format="pandas")

    # drops = component members that are NOT their component's best
    drops = hash_bucket_join(
        tagged.map_batches(
            lambda b: b.select(["label", id_col]), batch_format="pyarrow"
        ).map_batches(
            lambda b: pa.table(
                {
                    "mkey": pa.array(
                        [l + ":" + str(i) for l, i in zip(b["label"].to_pylist(), b[id_col].to_pylist())],
                        pa.string(),
                    ),
                    "drop_id": b[id_col],
                }
            ),
            batch_format="pyarrow",
        ),
        best.map_batches(
            lambda b: pa.table(
                {
                    "mkey": pa.array(
                        [l + ":" + str(i) for l, i in zip(b["label"].to_pylist(), b[id_col].to_pylist())],
                        pa.string(),
                    )
                }
            ),
            batch_format="pyarrow",
        ),
        on="mkey",
        output_columns=["drop_id"],
        how="left_anti",
        left_schema=pa.schema([("mkey", pa.string()), ("drop_id", pa.int64())]),
        right_schema=pa.schema([("mkey", pa.string())]),
    )

    return hash_bucket_join(
        members.map_batches(lambda b: b.select([id_col]), batch_format="pyarrow"),
        drops,
        on=id_col,
        right_on="drop_id",
        output_columns=[id_col],
        how="left_anti",
        left_schema=pa.schema([(id_col, pa.int64())]),
        right_schema=pa.schema([("drop_id", pa.int64())]),
    )


def near_dedup_keep_longest_ids(
    docs: ray.data.Dataset, threshold: float = 0.8, exact: bool = False
) -> ray.data.Dataset:
    """Near-dedup with the KEEP-LONGEST rule: near-dup pairs → connected
    components → keep the longest member (chars desc, id asc) per
    component — the curation-grade variant of :func:`near_dedup_keep_ids`
    (same pairing modes: exact n-gram-Jaccard for the oracle-checkable
    path, MinHash-LSH for the 100-TB path)."""

    def _len(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "n_chars": _pc.utf8_length(batch["text"]).cast(pa.int64()),
            }
        )

    pairs = (
        jaccard_similarity_join(docs, threshold)
        if exact
        else minhash_lsh_pairs(docs, threshold)
    )
    members = docs.map_batches(_len, batch_format="pyarrow")
    return representative_ids_from_pairs(members, pairs, "doc_id", "n_chars")
