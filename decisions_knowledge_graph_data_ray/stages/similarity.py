"""Similarity search over an embedding column (list<float>).

- brute_force_topk: exact cosine top-k per query — numpy matmul per batch
  against a ray.put-broadcast query matrix (the baseline).
- lsh_bucketed_topk: random-hyperplane LSH variant (the scale path): both
  corpus vectors and queries are bucketed by sign-pattern; only same-bucket
  (plus optional multi-probe) candidates are scored. At 100 TB the bucket
  groupby replaces an all-pairs scan.
- embedding_dup_pairs: embedding-cosine near-duplicate pairs via the same
  LSH bucketing.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray
import ray.data


def _as_matrix(col) -> np.ndarray:
    arr = col.to_pylist()
    return np.asarray(arr, dtype=np.float32)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class TopKScorer:
    """Actor: query matrix fetched from the object store once per actor.

    ``dtype`` selects the matmul precision (float32 default; float64 when an
    exact-oracle match is required). ``round_to`` rounds cosines BEFORE the
    per-batch top-k so the (cosine desc, vec_id asc) tie-break is applied to
    the same values the consumer sees — the partial top-k then selects
    exactly the rows the global ordering would, making the combiner lossless
    even across rounding ties.
    """

    def __init__(self, queries_ref, k: int, dtype=np.float32, round_to: int | None = None):
        q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        self._qids = np.asarray(q["query_id"], dtype=np.int64)
        self._qm = _normalize(np.asarray(q["matrix"], dtype=dtype))  # (Q, D)
        self._k = k
        self._dtype = dtype
        self._round_to = round_to

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = _normalize(np.asarray(batch["embedding"].to_pylist(), dtype=self._dtype))
        ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        sims = vecs @ self._qm.T  # (B, Q)
        if self._round_to is not None:
            sims = np.round(sims, self._round_to)
        # per-batch partial top-k per query (final top-k after a tiny groupby)
        k = min(self._k, len(ids))
        out_q, out_v, out_s = [], [], []
        for qi in range(sims.shape[1]):
            col = sims[:, qi]
            # deterministic (cosine desc, vec_id asc) selection
            idx = np.lexsort((ids, -col))[:k]
            out_q.append(np.full(k, self._qids[qi], dtype=np.int64))
            out_v.append(ids[idx])
            out_s.append(col[idx].astype(np.float64))
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
                "cosine": pa.array(np.concatenate(out_s), pa.float64()),
            }
        )


_SCORER_CACHE: dict = {}


def _cached_scorer(queries_ref, k, dtype, round_to) -> TopKScorer:
    """Per-worker-process TopKScorer cache for the TASK-based path (actors
    build theirs in __init__; tasks amortize construction here)."""
    key = (queries_ref.hex() if hasattr(queries_ref, "hex") else id(queries_ref),
           k, np.dtype(dtype).str, round_to)
    if key not in _SCORER_CACHE:
        _SCORER_CACHE[key] = TopKScorer(queries_ref, k, dtype=dtype, round_to=round_to)
    return _SCORER_CACHE[key]


def brute_force_topk(
    embeddings: ray.data.Dataset,
    queries_ref,
    k: int = 10,
    concurrency: int | tuple | None = None,
    batch_size: int = 4096,
    dtype=np.float32,
    round_to: int | None = None,
) -> ray.data.Dataset:
    """Exact cosine top-k: per-batch partial top-k (combiner) → per-query
    final top-k in a small map_groups.

    ``concurrency=None`` (default) runs plain tasks with a per-worker
    scorer cache — no actor-pool cold-start, right for one-shot queries.
    Pass an int/tuple to pin an actor pool (long-lived query services)."""
    if concurrency is None:
        def _score(batch: pa.Table) -> pa.Table:
            return _cached_scorer(queries_ref, k, dtype, round_to)(batch)

        partials = embeddings.map_batches(_score, batch_format="pyarrow", batch_size=batch_size)
    else:
        partials = embeddings.map_batches(
            TopKScorer,
            fn_constructor_kwargs={
                "queries_ref": queries_ref, "k": k, "dtype": dtype, "round_to": round_to
            },
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
        )

    def _final(group):
        g = group.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(k)
        g["rank"] = range(1, len(g) + 1)
        return g

    return partials.groupby("query_id").map_groups(_final, batch_format="pandas")


def make_queries_ref(matrix: np.ndarray, query_ids=None):
    qids = list(range(len(matrix))) if query_ids is None else list(query_ids)
    return ray.put({"query_id": qids, "matrix": np.asarray(matrix, dtype=np.float32)})


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    """Seed-stable random hyperplanes (hash-derived, no RNG state)."""
    out = np.empty((n_planes, dim), dtype=np.float32)
    for p in range(n_planes):
        for d in range(dim):
            h = hashlib.blake2b(f"lsh-{seed}-{p}-{d}".encode(), digest_size=8).digest()
            out[p, d] = (int.from_bytes(h, "little") / 2**64) * 2.0 - 1.0
    return out


def lsh_bucket_ids(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    signs = (m @ planes.T) > 0  # (N, P)
    weights = (1 << np.arange(planes.shape[0], dtype=np.int64))
    return (signs.astype(np.int64) * weights[None, :]).sum(axis=1)


def lsh_bucketed_topk(
    embeddings: ray.data.Dataset,
    queries_ref,
    k: int = 10,
    n_planes: int = 8,
    # autoscaling pool: a FIXED pool would eagerly reserve its CPUs and
    # starve upstream task operators (repartition/read) on small clusters —
    # measured deadlock at 4 CPUs
    concurrency: int | tuple = (1, 4),
) -> ray.data.Dataset:
    """ANN top-k: score only vectors sharing the query's LSH bucket.

    Recall < 1 by construction; n_planes trades bucket size vs recall.
    """
    q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
    qm = _normalize(np.asarray(q["matrix"], dtype=np.float32))
    planes = _hyperplanes(qm.shape[1], n_planes)
    q_buckets = lsh_bucket_ids(qm, planes)
    bucket_to_queries: dict[int, list[int]] = {}
    for qid, b in zip(q["query_id"], q_buckets):
        bucket_to_queries.setdefault(int(b), []).append(int(qid))
    btq_ref = ray.put({"planes": planes, "bucket_to_queries": bucket_to_queries, "qm": qm,
                       "qids": list(q["query_id"])})

    class BucketScorer:
        def __init__(self):
            ctx = ray.get(btq_ref)
            self._planes = ctx["planes"]
            self._btq = ctx["bucket_to_queries"]
            self._qm = ctx["qm"]
            self._qid_pos = {qid: i for i, qid in enumerate(ctx["qids"])}

        def __call__(self, batch: pa.Table) -> pa.Table:
            vecs = _normalize(_as_matrix(batch["embedding"]))
            ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
            buckets = lsh_bucket_ids(vecs, self._planes)
            out_q, out_v, out_s = [], [], []
            for i, b in enumerate(buckets):
                for qid in self._btq.get(int(b), ()):
                    s = float(vecs[i] @ self._qm[self._qid_pos[qid]])
                    out_q.append(qid)
                    out_v.append(int(ids[i]))
                    out_s.append(s)
            return pa.table(
                {
                    "query_id": pa.array(out_q, pa.int64()),
                    "vec_id": pa.array(out_v, pa.int64()),
                    "cosine": pa.array(out_s, pa.float64()),
                }
            )

    partials = embeddings.map_batches(
        BucketScorer, batch_format="pyarrow", batch_size=4096, concurrency=concurrency
    )

    def _final(group):
        g = group.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(k)
        g["rank"] = range(1, len(g) + 1)
        return g

    return partials.groupby("query_id").map_groups(_final, batch_format="pandas")


def kmeans_centroids(
    sample: np.ndarray, nlist: int, iters: int = 10, ids=None, dtype=np.float32
) -> np.ndarray:
    """Deterministic Lloyd's k-means over a (normalized) sample: seed-stable
    farthest-point-style init (first centroid = lowest-hash row, then
    greedily farthest), fixed iteration count, no RNG state. Runs on the
    driver over a bounded sample — the IVF coarse quantizer's train step.

    Every data-dependent pick is keyed on ``ids`` (row ids; positional index
    when absent), never on row ORDER: the init row minimizes the md5 hex of
    ``str(id)`` (md5, not blake2b, so the DuckDB oracle can reproduce it —
    the same reproducibility rule as sketches._shingle_hashes) and
    farthest-point / tie situations break by (d2 desc, id asc). The trained
    quantizer is therefore identical under any block layout or row order.
    SIGNATURE-VERSION NOTE: round 5 changed the init hash (blake2b-of-bytes →
    md5-of-id) — centroids differ from rounds 1-4; persisted IVF
    assignments from earlier rounds are not comparable.
    """
    sample = _normalize(np.asarray(sample, dtype=dtype))
    n = len(sample)
    nlist = min(nlist, n)
    ids = np.arange(n, dtype=np.int64) if ids is None else np.asarray(ids, dtype=np.int64)
    h0 = min(range(n), key=lambda i: hashlib.md5(str(int(ids[i])).encode()).hexdigest())
    centroids = [sample[h0]]
    d2 = 1.0 - sample @ centroids[0]
    for _ in range(1, nlist):
        nxt = int(np.lexsort((ids, -d2))[0])  # d2 desc, id asc
        centroids.append(sample[nxt])
        d2 = np.minimum(d2, 1.0 - sample @ centroids[-1])
    C = np.stack(centroids)
    for _ in range(iters):
        # ties → lowest cluster index (np.argmax picks the first maximum,
        # matching the oracle's ORDER BY dot DESC, cluster ASC)
        assign = np.argmax(sample @ C.T, axis=1)
        for j in range(nlist):
            members = sample[assign == j]
            if len(members):
                C[j] = members.mean(axis=0)
        C = _normalize(C)
    return C


def train_quantizer(
    embeddings: ray.data.Dataset,
    nlist: int,
    train_sample: int = 10_000,
    dtype=np.float32,
) -> np.ndarray:
    """Train the deterministic k-means coarse quantizer on a bounded,
    layout-independent sample of the corpus (shared by ``ivf_topk`` and
    ``kmeans_assign``).

    Deterministic HASH-based trainer sample (md5-low-64 of str(vec_id)
    mod m): unlike random_sample(seed=...) — whose draw depends on the
    block LAYOUT, so the quantizer (and thus every downstream result) would
    change with cluster size / partitioning — the same rows are selected
    on any topology, and first-N bias is still avoided on ordered
    corpora. md5 (not blake2b) so the DuckDB oracle reproduces the draw."""
    n_total = embeddings.count()
    if n_total > train_sample:
        m = max(1, n_total // train_sample)

        def _hash_sample(batch: pa.Table) -> pa.Table:
            import hashlib as _hl

            keep = [
                int.from_bytes(_hl.md5(str(v).encode()).digest()[:8], "little") % m == 0
                for v in batch["vec_id"].to_pylist()
            ]
            return batch.filter(pa.array(keep))

        sdf = (
            embeddings.select_columns(["vec_id", "embedding"])
            .map_batches(_hash_sample, batch_format="pyarrow")
            .to_pandas()
        )
        if len(sdf) < max(nlist, 2):  # undershoot on tiny corpora
            sdf = embeddings.limit(train_sample).to_pandas()
    else:
        sdf = embeddings.select_columns(["vec_id", "embedding"]).to_pandas()
    return kmeans_centroids(
        np.asarray(sdf["embedding"].tolist(), dtype=dtype),
        nlist,
        ids=sdf["vec_id"].to_numpy(),
        dtype=dtype,
    )


def kmeans_assign(
    embeddings: ray.data.Dataset,
    nlist: int = 16,
    train_sample: int = 10_000,
    dtype=np.float32,
) -> ray.data.Dataset:
    """Semantic clustering: assign every vector to its nearest k-means
    centroid → (vec_id, cluster). The topic-bucketing step of a
    training-data pipeline (cluster-balanced sampling, per-topic dedup,
    semantic sharding).

    Scale shape: the quantizer trains on a bounded hash sample (driver),
    centroids broadcast once via ``ray.put``; assignment is a single
    streaming vectorized map — no shuffle at any corpus size. Ties break to
    the lowest cluster index (np.argmax first-maximum), matching the DuckDB
    oracle's ORDER BY dot DESC, cluster ASC.

    ``dtype=np.float64`` selects oracle precision (the DuckDB twin computes
    in DOUBLE); the engine default stays float32."""
    C = train_quantizer(embeddings, nlist, train_sample=train_sample, dtype=dtype)
    c_ref = ray.put({"C": C, "dtype": np.dtype(dtype).str})

    def _assign(batch: pa.Table) -> pa.Table:
        from .broadcast import broadcast_cache

        ctx = broadcast_cache(c_ref)
        vecs = _normalize(np.asarray(batch["embedding"].to_pylist(), dtype=np.dtype(ctx["dtype"])))
        cl = np.argmax(vecs @ ctx["C"].T, axis=1)
        return pa.table(
            {
                "vec_id": batch["vec_id"],
                "cluster": pa.array(cl.astype(np.int64), pa.int64()),
            }
        )

    return embeddings.select_columns(["vec_id", "embedding"]).map_batches(
        _assign, batch_format="pyarrow"
    )


def ivf_topk(
    embeddings: ray.data.Dataset,
    queries_ref,
    k: int = 10,
    nlist: int = 32,
    nprobe: int = 4,
    train_sample: int = 10_000,
    # autoscaling pool: a FIXED pool would eagerly reserve its CPUs and
    # starve upstream task operators (repartition/read) on small clusters —
    # measured deadlock at 4 CPUs
    concurrency: int | tuple = (1, 4),
    dtype=np.float32,
) -> ray.data.Dataset:
    """IVF ANN top-k: coarse k-means quantizer; a corpus vector is scored
    against a query only when its cell is among the query's ``nprobe``
    nearest centroids. ``nprobe == nlist`` degenerates to exact brute force
    (the recall test exploits this).

    Scale path: train on a bounded sample (driver), broadcast centroids
    once; assignment + scoring are one streaming map_batches pass with a
    per-batch partial top-k — same combiner discipline as brute_force_topk,
    so the shuffle moves at most k rows per (batch, query).

    ``dtype=np.float64`` selects oracle precision (the DuckDB twin computes
    in DOUBLE); the engine default stays float32."""
    q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
    qm = _normalize(np.asarray(q["matrix"], dtype=dtype))
    C = train_quantizer(embeddings, nlist, train_sample=train_sample, dtype=dtype)
    nprobe = min(nprobe, len(C))
    # per query: the nprobe nearest cells (stable sort: ties keep the lower
    # cluster index, matching the oracle's ORDER BY dot DESC, cluster ASC)
    probes = np.argsort(-(qm @ C.T), axis=1, kind="stable")[:, :nprobe]  # (Q, nprobe)
    cell_to_queries: dict[int, list[int]] = {}
    for qi, cells in enumerate(probes):
        for c in cells:
            cell_to_queries.setdefault(int(c), []).append(qi)
    ctx_ref = ray.put(
        {"C": C, "cell_to_queries": cell_to_queries, "qm": qm, "qids": list(q["query_id"]), "k": k,
         "dtype": np.dtype(dtype).str}
    )

    class CellScorer:
        def __init__(self):
            ctx = ray.get(ctx_ref)
            self._C = ctx["C"]
            self._ctq = ctx["cell_to_queries"]
            self._qm = ctx["qm"]
            self._qids = np.asarray(ctx["qids"], dtype=np.int64)
            self._k = ctx["k"]
            self._dtype = np.dtype(ctx["dtype"])

        def __call__(self, batch: pa.Table) -> pa.Table:
            vecs = _normalize(np.asarray(batch["embedding"].to_pylist(), dtype=self._dtype))
            ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
            cells = np.argmax(vecs @ self._C.T, axis=1)
            out_q, out_v, out_s = [], [], []
            # group batch rows by cell, score each group against its queries
            for cell in np.unique(cells):
                qids = self._ctq.get(int(cell))
                if not qids:
                    continue
                mask = cells == cell
                sub, sub_ids = vecs[mask], ids[mask]
                sims = sub @ self._qm[qids].T  # (m, |qids|)
                kk = min(self._k, len(sub_ids))
                for col, qi in enumerate(qids):
                    sel = np.lexsort((sub_ids, -sims[:, col]))[:kk]
                    out_q.append(np.full(kk, self._qids[qi], dtype=np.int64))
                    out_v.append(sub_ids[sel])
                    out_s.append(sims[sel, col].astype(np.float64))
            if not out_q:
                return pa.table(
                    {
                        "query_id": pa.array([], pa.int64()),
                        "vec_id": pa.array([], pa.int64()),
                        "cosine": pa.array([], pa.float64()),
                    }
                )
            return pa.table(
                {
                    "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                    "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
                    "cosine": pa.array(np.concatenate(out_s), pa.float64()),
                }
            )

    partials = embeddings.map_batches(
        CellScorer, batch_format="pyarrow", batch_size=4096, concurrency=concurrency
    )

    def _final(group):
        g = group.sort_values(["cosine", "vec_id"], ascending=[False, True]).head(k)
        g["rank"] = range(1, len(g) + 1)
        return g

    return partials.groupby("query_id").map_groups(_final, batch_format="pandas")


def embedding_dup_pairs(
    embeddings: ray.data.Dataset, threshold: float = 0.95, n_planes: int = 10,
    # autoscaling pool: a FIXED pool would eagerly reserve its CPUs and
    # starve upstream task operators (repartition/read) on small clusters —
    # measured deadlock at 4 CPUs
    concurrency: int | tuple = (1, 4),
) -> ray.data.Dataset:
    """Embedding-cosine near-dup pairs via LSH bucketing + in-bucket matmul."""
    planes_ref = ray.put(_hyperplanes(_infer_dim(embeddings), n_planes))

    class Bucketer:
        def __init__(self):
            self._planes = ray.get(planes_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            vecs = _normalize(_as_matrix(batch["embedding"]))
            buckets = lsh_bucket_ids(vecs, self._planes)
            return pa.table(
                {
                    "bucket": pa.array(buckets, pa.int64()),
                    "vec_id": pa.array(batch["vec_id"].to_pylist(), pa.int64()),
                    "embedding": batch["embedding"],
                }
            )

    bucketed = embeddings.map_batches(Bucketer, batch_format="pyarrow", concurrency=concurrency)

    def _pairs(group):
        import pandas as pd

        g = group.drop_duplicates("vec_id").sort_values("vec_id")
        ids = g["vec_id"].to_numpy(dtype=np.int64)
        m = _normalize(np.asarray(g["embedding"].tolist(), dtype=np.float32))
        sims = m @ m.T
        # vectorized i<j emission (np.nonzero on the strict upper triangle):
        # a degenerate hot bucket stays O(n^2) in C, not in Python bytecode
        iu, ju = np.nonzero(np.triu(sims >= threshold, k=1))
        return pd.DataFrame(
            {
                "src_id": ids[iu],
                "dst_id": ids[ju],
                "cosine": sims[iu, ju].astype(np.float64),
            }
        )

    # no post-dedup needed: each vector hashes to exactly ONE bucket (single
    # LSH signature, no multi-probe/banding here), so the per-bucket groups
    # partition the corpus and a pair can be emitted at most once — the old
    # groupby(src,dst).Max was a wasted all-to-all over every emitted pair
    return bucketed.groupby("bucket").map_groups(_pairs, batch_format="pandas")


def semantic_dedup_keep_ids(
    embeddings: ray.data.Dataset,
    threshold: float = 0.95,
    n_planes: int = 10,
    id_col: str = "vec_id",
) -> ray.data.Dataset:
    """SemDeDup-style semantic dedup: embedding-cosine near-dup pairs
    (:func:`embedding_dup_pairs` — LSH buckets + in-bucket matmul, never
    all-pairs) → connected components → keep the component-minimum id plus
    every never-paired vector. The embedding twin of
    ``dedup.near_dedup_keep_ids`` — both share ``dedup.keep_ids_from_pairs``
    (distributed CC + bucketed LEFT ANTI join; no driver-side drop set)."""
    from .dedup import keep_ids_from_pairs

    pairs = embedding_dup_pairs(embeddings, threshold=threshold, n_planes=n_planes)
    return keep_ids_from_pairs(
        embeddings.select_columns([id_col]), pairs, id_col=id_col
    )


def _infer_dim(embeddings: ray.data.Dataset) -> int:
    first = embeddings.take(1)[0]
    return len(first["embedding"])


class _PairScorer:
    """Exact all-pairs scorer: the full normalized corpus matrix is broadcast
    once (ray.put) and fetched once per worker; each batch emits its pairs
    (i < j) above threshold. float64 + round-before-compare keeps the
    threshold decision identical to the DuckDB oracle."""

    def __init__(self, corpus_ref, threshold: float, round_to: int):
        c = ray.get(corpus_ref) if isinstance(corpus_ref, ray.ObjectRef) else corpus_ref
        self._ids = np.asarray(c["vec_id"], dtype=np.int64)
        self._m = _normalize(np.asarray(c["matrix"], dtype=np.float64))
        self._threshold = threshold
        self._round_to = round_to

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = _normalize(np.asarray(batch["embedding"].to_pylist(), dtype=np.float64))
        ids = np.asarray(batch["vec_id"].to_pylist(), dtype=np.int64)
        sims = np.round(vecs @ self._m.T, self._round_to)  # (B, N)
        bi, cj = np.nonzero(sims >= self._threshold)
        # keep i < j only (dedupe the symmetric pair once, drop self-pairs)
        keep = ids[bi] < self._ids[cj]
        return pa.table(
            {
                "src_id": pa.array(ids[bi][keep], pa.int64()),
                "dst_id": pa.array(self._ids[cj][keep], pa.int64()),
                "cosine": pa.array(sims[bi, cj][keep], pa.float64()),
            }
        )


_PAIR_CACHE: dict = {}


# cosine_pairs_exact refuses (rather than OOMs) above this corpus size: the
# exact self-join broadcasts one O(N*D) matrix to every worker, so its role
# is the small-N correctness oracle for embedding_dup_pairs, never the scale
# path. 2M rows x 128-dim float64 ≈ 2 GiB — the sensible per-worker ceiling.
EXACT_PAIRS_MAX_ROWS = 2_000_000


def cosine_pairs_exact(
    embeddings: ray.data.Dataset,
    threshold: float = 0.9,
    batch_size: int = 4096,
    round_to: int = 6,
    max_rows: int = EXACT_PAIRS_MAX_ROWS,
) -> ray.data.Dataset:
    """EXACT cosine-threshold self-join: every (src_id < dst_id) pair with
    round(cosine, round_to) >= threshold.

    Scale envelope (documented, deliberate): compute is O(N^2/P) distributed
    across blocks; memory is one O(N*D) broadcast matrix per worker — the
    exact baseline, same broadcast pattern as brute_force_topk. Beyond
    broadcast capacity, use ``embedding_dup_pairs`` (LSH-bucketed, no
    all-pairs scan) — this operator is its recall/correctness oracle.
    Corpora above ``max_rows`` are REFUSED with a pointer to the scale path
    instead of OOMing mid-broadcast. The cap is enforced WHILE streaming the
    corpus in (one pass — a separate count() would re-execute any derived
    upstream pipeline), so the driver never holds more than max_rows rows."""
    ids: list = []
    vecs: list = []
    for blk in embeddings.select_columns(["vec_id", "embedding"]).iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        if len(ids) + blk.num_rows > max_rows:
            raise ValueError(
                f"cosine_pairs_exact is the exact small-N oracle (O(N*D) broadcast "
                f"matrix per worker); corpus exceeds max_rows={max_rows:,}. "
                f"Use embedding_dup_pairs (LSH-bucketed near-dup pairs) for large "
                f"corpora, or raise max_rows explicitly if the matrix fits."
            )
        ids.extend(blk["vec_id"].to_pylist())
        vecs.extend(blk["embedding"].to_pylist())
    corpus_ref = ray.put(
        {
            "vec_id": ids,
            "matrix": np.asarray(vecs, dtype=np.float64),
        }
    )

    def _score(batch: pa.Table) -> pa.Table:
        key = corpus_ref.hex() if hasattr(corpus_ref, "hex") else id(corpus_ref)
        if key not in _PAIR_CACHE:
            _PAIR_CACHE[key] = _PairScorer(corpus_ref, threshold, round_to)
        return _PAIR_CACHE[key](batch)

    return embeddings.map_batches(_score, batch_format="pyarrow", batch_size=batch_size)


def rrf_fuse(
    lexical: ray.data.Dataset,
    semantic: ray.data.Dataset,
    id_col: str,
    rank_col: str = "rank",
    k: int = 60,
) -> ray.data.Dataset:
    """Reciprocal-rank fusion of two rankings (hybrid search: a BM25-style
    lexical ranking ⊕ an embedding ANN ranking):
    ``rrf = 1/(k + lex_rank) + 1/(k + sem_rank)`` with a missing side
    contributing 0.0 — the standard parameter-free fusion (Cormack et al.,
    k=60). The two contributions are added in a FIXED order (lexical then
    semantic), so the double is one deterministic expression the SQL oracle
    reproduces bit-exact.

    Scale shape: a bucketed FULL OUTER join on the id (both inputs are
    top-k tables — already bounded), then a pure map. Output:
    ``(id_col, lex_rank, sem_rank, rrf)`` with null ranks where a side is
    missing."""
    from .joins import hash_bucket_join

    def _rn(name):
        def f(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    id_col: batch[id_col].cast(pa.int64()),
                    name: batch[rank_col].cast(pa.int64()),
                }
            )

        return f

    lex = lexical.map_batches(_rn("lex_rank"), batch_format="pyarrow")
    sem = semantic.map_batches(_rn("sem_rank"), batch_format="pyarrow")
    sch_l = pa.schema([(id_col, pa.int64()), ("lex_rank", pa.int64())])
    sch_r = pa.schema([(id_col, pa.int64()), ("sem_rank", pa.int64())])
    joined = hash_bucket_join(
        lex,
        sem,
        on=id_col,
        output_columns=[id_col, "lex_rank", "sem_rank"],
        how="full_outer",
        left_schema=sch_l,
        right_schema=sch_r,
    )

    def _score(batch: pa.Table) -> pa.Table:
        rrf = [
            (1.0 / (k + lr) if lr is not None else 0.0)
            + (1.0 / (k + sr) if sr is not None else 0.0)
            for lr, sr in zip(batch["lex_rank"].to_pylist(), batch["sem_rank"].to_pylist())
        ]
        return batch.append_column("rrf", pa.array(rrf, pa.float64()))

    return joined.map_batches(_score, batch_format="pyarrow")


def gram_matrix(
    embeddings: ray.data.Dataset,
    vec_col: str = "embedding",
    scale: float = 10000.0,
) -> ray.data.Dataset:
    """Distributed Gram matrix over quantized embeddings: ``G[i][j] =
    Σ_rows q_i·q_j`` with ``q = floor(x·scale + 0.5)`` int64 — the
    second-moment building block of PCA / linear probes / whitening,
    computed as a streaming matmul.

    Quantization makes the sum EXACT int64 arithmetic, so the result is a
    pure function of the row multiset — independent of partitioning,
    batch boundaries and summation order (float accumulation is not),
    and SQL-reproducible. Overflow headroom: |q| ≤ scale·|x|_max, so a
    cell is bounded by rows·(scale·|x|_max)²; at scale 1e4 and |x| ≤ 1
    that is 1e8 per row — safe to ~9·10^10 rows per int64 cell (rescale
    for more).

    Scale shape: one ``(dim·(dim+1)/2)``-row partial per BATCH (a local
    ``Qᵀ Q`` matmul — upper triangle only), then a groupby Sum over
    ``(i, j)`` int keys. The shuffle is bounded by dim², never rows.
    Output: ``(i, j, s)`` with 1-indexed ``i ≤ j``."""
    import pandas as pd

    from ray.data.aggregate import Sum

    def _partial(batch: pa.Table) -> pa.Table:
        x = _as_matrix(batch[vec_col]).astype(np.float64)
        q = np.floor(x * scale + 0.5).astype(np.int64)
        g = q.T @ q  # dim×dim int64
        iu, ju = np.triu_indices(g.shape[0])
        return pa.Table.from_pandas(
            pd.DataFrame(
                {"i": (iu + 1).astype(np.int64), "j": (ju + 1).astype(np.int64),
                 "s": g[iu, ju]}
            ),
            preserve_index=False,
        )

    return (
        embeddings.select_columns([vec_col])
        .map_batches(_partial, batch_format="pyarrow")
        .groupby(["i", "j"])
        .aggregate(Sum("s", alias_name="s"))
    )


# ---------------------------------------------------------------------------
# random projection (Johnson–Lindenstrauss) + MMR diversified retrieval
# ---------------------------------------------------------------------------

# MMR trade-off λ = 0.7 as INTEGER weights over micro-unit scores:
# score_u = 7·rel_u − 3·pen_u where rel_u/pen_u are the round-6 cosines
# × 1e6 as int64. All selection arithmetic is integer-exact, so the SQL
# twin's argmax can never drift on a float rounding boundary (a double
# λ·rel − (1−λ)·pen landed exactly on a .5 ulp at 6 dp in testing).
MMR_LAM_NUM = 7
MMR_OML_NUM = 3
MMR_SCORE_DEN = 10_000_000.0  # score_u → display double (exact both sides)


def rp_matrix(dim: int, out_dim: int, seed: int = 7) -> np.ndarray:
    """Seed-stable dense random-projection matrix (dim × out_dim):
    hash-derived uniform [-1, 1) entries scaled by 1/sqrt(out_dim), the
    same no-RNG-state rule as _hyperplanes — every worker (and the SQL
    twin, via spliced literals) regenerates the identical matrix. float64
    end-to-end: there is no float32 intermediate to drift from the
    oracle's DOUBLE literals."""
    out = np.empty((dim, out_dim), dtype=np.float64)
    for j in range(out_dim):
        for d in range(dim):
            h = hashlib.blake2b(f"rp-{seed}-{j}-{d}".encode(), digest_size=8).digest()
            out[d, j] = (int.from_bytes(h, "little") / 2**64) * 2.0 - 1.0
    return out / np.sqrt(out_dim)


def random_project(
    embeddings: ray.data.Dataset,
    out_dim: int = 8,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> ray.data.Dataset:
    """Johnson–Lindenstrauss dimensionality reduction: project every
    embedding through the seed-stable dense matrix to ``out_dim`` WIDE
    double columns (p0..p{out_dim-1}), rounded to ``round_to`` so the
    DuckDB list_dot_product twin (sequential sum vs numpy pairwise sum,
    ~1e-15 apart) lands on the same value.

    Pure per-batch matmul — zero shuffle, zero state; the matrix is
    regenerated per worker from the seed (dim × out_dim doubles, cheaper
    than shipping it). The 100-TB shape: this is the cheap front half of
    any downstream ANN/cluster pass over very high-dim embeddings."""
    dim = _infer_dim(embeddings)
    r = rp_matrix(dim, out_dim, seed)

    def _proj(batch: pa.Table) -> pa.Table:
        x = _as_matrix(batch[vec_col]).astype(np.float64)
        p = np.round(x @ r, round_to)
        cols = {id_col: batch[id_col]}
        for j in range(out_dim):
            cols[f"p{j}"] = pa.array(p[:, j], pa.float64())
        return pa.table(cols)

    return embeddings.select_columns([id_col, vec_col]).map_batches(
        _proj, batch_format="pyarrow"
    )


def mmr_topk(
    embeddings: ray.data.Dataset,
    query_id: int = 0,
    k: int = 10,
    n_candidates: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Maximal-marginal-relevance diversified top-k for one query vector
    (the embedding of ``query_id``): a DISTRIBUTED brute-force cosine
    prefilter picks the ``n_candidates`` most relevant vectors (partial
    top-k combiner, round-6 float64 — the brute_force_topk contract), then
    the greedy MMR selection runs on the driver over that bounded
    candidate set (k × n_candidates scores — driver work by definition,
    like the reference's top-3 candidate caps).

    score_u(d) = MMR_LAM_NUM·rel_u(d) − MMR_OML_NUM·max_{s∈selected}
    sim_u(d,s) over int64 micro-unit cosines (round-6 × 1e6) — integer
    arithmetic, so the SQL twin selects bit-identically; ties break on min
    vec_id. Returns a pandas frame (rank, vec_id, relevance, mmr_score)
    — k rows, bounded by definition."""
    import pandas as pd

    qvec = None
    for blk in embeddings.filter(expr=f"{id_col} == {query_id}").iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        if blk.num_rows:
            qvec = np.asarray(blk[vec_col].to_pylist()[0], dtype=np.float64)
            break
    if qvec is None:
        raise ValueError(f"query_id {query_id} not found")

    q_ref = ray.put({"query_id": [query_id], "matrix": qvec[None, :]})
    top = brute_force_topk(
        embeddings.filter(expr=f"{id_col} != {query_id}"),
        q_ref,
        k=n_candidates,
        dtype=np.float64,
        round_to=6,
    ).to_pandas()

    cand_ids = top[id_col].tolist()
    rel = dict(zip(top[id_col], top["cosine"]))
    idset_ref = ray.put(set(cand_ids))

    def _pick(batch: pa.Table) -> pa.Table:
        from .broadcast import broadcast_cache

        ids = broadcast_cache(idset_ref)
        mask = pa.array([v in ids for v in batch[id_col].to_pylist()], pa.bool_())
        return batch.filter(mask)

    cdf = (
        embeddings.select_columns([id_col, vec_col])
        .map_batches(_pick, batch_format="pyarrow")
        .to_pandas()
    )
    order = {v: i for i, v in enumerate(cand_ids)}
    cdf = cdf.sort_values(id_col, key=lambda s: s.map(order)).reset_index(drop=True)
    m = _normalize(np.asarray(cdf[vec_col].tolist(), dtype=np.float64))
    sims_u = np.rint(np.round(m @ m.T, 6) * 1e6).astype(np.int64)
    rel_u = {vid: int(round(r * 1e6)) for vid, r in rel.items()}

    sel_pos: list[int] = []
    rows = []
    remaining = list(range(len(cand_ids)))
    for rank in range(1, min(k, len(cand_ids)) + 1):
        best_i, best_score = None, None
        for i in remaining:
            vid = cand_ids[i]
            penalty_u = int(sims_u[i, sel_pos].max()) if sel_pos else 0
            score_u = MMR_LAM_NUM * rel_u[vid] - MMR_OML_NUM * penalty_u
            if best_score is None or score_u > best_score or (
                score_u == best_score and vid < cand_ids[best_i]
            ):
                best_i, best_score = i, score_u
        remaining.remove(best_i)
        sel_pos.append(best_i)
        vid = cand_ids[best_i]
        rows.append(
            {
                "rank": rank,
                id_col: vid,
                "relevance": rel[vid],
                "mmr_score": best_score / MMR_SCORE_DEN,
            }
        )
    return pd.DataFrame(rows)


def pca_top_component(
    embeddings: ray.data.Dataset,
    iters: int = 10,
    scale: float = 10000.0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
):
    """Top principal-component scores via the distributed Gram matrix +
    driver-side power iteration — the classic two-phase PCA shape:

      1. ``gram_matrix`` streams the corpus once (per-batch QᵀQ over
         int64-quantized rows → dim²-bounded groupby Sum) — EXACT integer
         arithmetic, independent of partitioning;
      2. power iteration runs on the driver over the dim×dim matrix
         (trivial), with every accumulation a SEQUENTIAL left fold in
         index order so the SQL twin (list_reduce over ORDER BY lists)
         reproduces the eigenvector BIT-EXACTLY — no rounding resync
         needed;
      3. a final zero-shuffle map projects every embedding onto the
         (sign-normalized: first component ≥ 0) eigenvector, rounded to
         ``round_to``.

    Returns (scores_dataset, eigenvector ndarray). At 100 TB only phase 1
    touches the corpus; its shuffle moves dim(dim+1)/2 int rows per batch."""
    import math

    g = gram_matrix(embeddings, vec_col=vec_col, scale=scale).to_pandas()
    d = int(g["j"].max())
    G = [[0.0] * d for _ in range(d)]
    for i, j, s in zip(g["i"], g["j"], g["s"]):
        G[i - 1][j - 1] = float(s)
        G[j - 1][i - 1] = float(s)

    v = [1.0 / math.sqrt(float(d))] * d
    for _ in range(iters):
        w = []
        for i in range(d):
            acc = 0.0
            for j in range(d):
                acc += G[i][j] * v[j]
            w.append(acc)
        n2 = 0.0
        for x in w:
            n2 += x * x
        nrm = math.sqrt(n2)
        v = [x / nrm for x in w]
    if v[0] < 0.0:
        v = [x * -1.0 for x in v]
    vec = np.asarray(v, dtype=np.float64)
    vec_ref = ray.put(vec)

    def _score(batch: pa.Table) -> pa.Table:
        from .broadcast import broadcast_cache

        pc = broadcast_cache(vec_ref)
        x = _as_matrix(batch[vec_col]).astype(np.float64)
        return pa.table(
            {
                id_col: batch[id_col],
                "pc1": pa.array(np.round(x @ pc, round_to), pa.float64()),
            }
        )

    scores = embeddings.select_columns([id_col, vec_col]).map_batches(
        _score, batch_format="pyarrow"
    )
    return scores, vec
