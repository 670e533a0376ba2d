"""Training-data preparation operators over a documents table.

The operators a large-scale LLM-data pipeline runs between dedup and
tokenization, each in its scale-safe Ray Data shape and each with an exact
DuckDB oracle (the hash functions and token definitions are chosen to be
SQL-reproducible, the same rule as sketches/_shingle_hashes):

- train_val_test_split: deterministic md5-bucket split — a pure per-batch
  map, no shuffle; the same document lands in the same split on every
  machine and at every scale.
- contamination_flags: word-n-gram overlap against a BENCHMARK set
  (decontamination against eval suites). The benchmark side is small by
  definition → collected once, broadcast via ray.put, membership-checked
  per batch. The corpus side streams; no shuffle.
- vocabulary: corpus-wide token counts + document frequencies with a
  per-batch combiner (one partial row per distinct token per batch) before
  the groupby — the shuffle moves |vocab| rows per batch, never raw tokens.
- redact_numbers: PII-shaped redaction (long digit runs → [NUM]) as a pure
  vectorized map.
- chunk_documents: fixed-token-window chunking (flat_map shape: one output
  row per chunk) — the pre-tokenization packing step.
- pack_sequences: offset packing of chunks into fixed-token-budget training
  sequences via a DISTRIBUTED PREFIX SUM (bucketed two-level scan) — no
  global sort, no driver-side corpus.
- mixture_sample: deterministic per-group rate sampling (domain/language
  mixture rebalancing) — a pure map, zero shuffle.
- deterministic_shuffle: content-addressed global permutation (order by
  md5(seed:id)) — reproducible across runs and cluster sizes, unlike
  random_shuffle; the stable epoch shuffle a resumable training run needs.
"""

from __future__ import annotations

import hashlib
import re
from collections import Counter

import pyarrow as pa

import ray
import ray.data

_WORD_RE = re.compile(r"[a-z0-9]+")
_WS_TOKEN_RE = re.compile(r"\S+")
_NUM_RE = re.compile(r"\d{4,}")

SPLITS = ("train", "val", "test")


def split_of(doc_id, weights: tuple[int, int, int] = (80, 10, 10)) -> str:
    """Deterministic split: md5 of the id's decimal string, first 8 hex
    chars mod 100 (md5 so the DuckDB oracle reproduces it)."""
    bucket = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % 100
    if bucket < weights[0]:
        return "train"
    if bucket < weights[0] + weights[1]:
        return "val"
    return "test"


def train_val_test_split(
    docs: ray.data.Dataset, id_col: str = "doc_id",
    weights: tuple[int, int, int] = (80, 10, 10),
) -> ray.data.Dataset:
    """Add a ``split`` column. Pure map — no shuffle at any scale."""

    def _split(batch: pa.Table) -> pa.Table:
        splits = [split_of(i, weights) for i in batch[id_col].to_pylist()]
        return batch.append_column("split", pa.array(splits, pa.string()))

    return docs.map_batches(_split, batch_format="pyarrow")


def _word_ngrams(text: str, n: int) -> set[str]:
    words = _WORD_RE.findall(text.lower())
    if len(words) < n:
        return set()
    return {" ".join(words[i : i + n]) for i in range(len(words) - n + 1)}


def contamination_flags(
    docs: ray.data.Dataset, benchmark: ray.data.Dataset, n: int = 8,
    text_col: str = "text", id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Per-document benchmark-overlap counts (decontamination check).

    ``benchmark`` is the SMALL side (an eval suite): its n-gram set is
    built by streaming its batches once and broadcast via ``ray.put``; each
    corpus batch then checks membership locally — zero shuffles. Scale
    envelope: the broadcast is O(|benchmark n-grams|), independent of
    corpus size.
    """
    bench: set[str] = set()
    for blk in benchmark.select_columns([text_col]).iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        for t in blk[text_col].to_pylist():
            bench |= _word_ngrams(t, n)
    bench_ref = ray.put(bench)

    def _flags(batch: pa.Table) -> pa.Table:
        from .broadcast import broadcast_cache

        b = broadcast_cache(bench_ref)  # one ray.get per worker, not per batch
        counts = [len(_word_ngrams(t, n) & b) for t in batch[text_col].to_pylist()]
        return pa.table(
            {
                id_col: batch[id_col],
                "n_contaminated_ngrams": pa.array(counts, pa.int64()),
                "contaminated": pa.array([c > 0 for c in counts], pa.bool_()),
            }
        )

    return docs.map_batches(_flags, batch_format="pyarrow")


def semantic_contamination_flags(
    corpus: ray.data.Dataset,
    benchmark: ray.data.Dataset,
    threshold: float = 0.8,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    dtype="float32",
) -> ray.data.Dataset:
    """Embedding-space decontamination: flag corpus vectors whose cosine to
    ANY benchmark vector reaches ``threshold`` — the semantic complement of
    ``contamination_flags``' exact n-gram overlap (catches paraphrased eval
    leakage that n-grams miss).

    Same scale envelope as the n-gram variant: the benchmark side is small
    by definition (an eval suite) — streamed once into a matrix, L2-
    normalized, broadcast via ``ray.put``; each corpus batch then computes
    one vectorized matmul + row-max locally. Zero shuffles; the broadcast
    is O(|benchmark| × dim), independent of corpus size.

    ``dtype="float64"`` selects oracle precision (the DuckDB twin computes
    in DOUBLE); the engine default stays float32."""
    import numpy as np

    from .similarity import _normalize

    np_dtype = np.dtype(dtype)
    mats = [
        np.asarray(blk[emb_col].to_pylist(), dtype=np_dtype)
        for blk in benchmark.select_columns([emb_col]).iter_batches(
            batch_format="pyarrow", batch_size=None
        )
        if blk.num_rows
    ]
    bm = _normalize(np.concatenate(mats)) if mats else np.zeros((0, 1), dtype=np_dtype)
    bm_ref = ray.put({"bm": bm, "dtype": np_dtype.str})

    def _flags(batch: pa.Table) -> pa.Table:
        from .broadcast import broadcast_cache

        ctx = broadcast_cache(bm_ref)
        b = ctx["bm"]
        if b.shape[0] == 0:
            mx = np.zeros(batch.num_rows, dtype=np.float64)
        else:
            vecs = _normalize(
                np.asarray(batch[emb_col].to_pylist(), dtype=np.dtype(ctx["dtype"]))
            )
            mx = (vecs @ b.T).max(axis=1).astype(np.float64)
        return pa.table(
            {
                id_col: batch[id_col],
                "max_cosine": pa.array(mx, pa.float64()),
                "contaminated": pa.array(mx >= threshold, pa.bool_()),
            }
        )

    return corpus.select_columns([id_col, emb_col]).map_batches(
        _flags, batch_format="pyarrow"
    )


def vocabulary(
    docs: ray.data.Dataset, top_k: int = 50, text_col: str = "text"
) -> ray.data.Dataset:
    """Top-k corpus vocabulary: (token, count, doc_freq), ordered by
    (count desc, token asc). Combiner-first: each batch emits one partial
    row per distinct token, so the shuffle is bounded by |vocab| per batch."""
    from ray.data.aggregate import Sum

    def _partial(batch: pa.Table) -> pa.Table:
        counts: Counter = Counter()
        dfs: Counter = Counter()
        for t in batch[text_col].to_pylist():
            words = _WORD_RE.findall(t.lower())
            counts.update(words)
            dfs.update(set(words))
        toks = list(counts)
        return pa.table(
            {
                "token": pa.array(toks, pa.string()),
                "count": pa.array([counts[t] for t in toks], pa.int64()),
                "doc_freq": pa.array([dfs[t] for t in toks], pa.int64()),
            }
        )

    totals = (
        docs.map_batches(_partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("count", alias_name="count"), Sum("doc_freq", alias_name="doc_freq"))
    )

    # partial-top-k combiner before the driver pick (same discipline as
    # brute_force_topk): each block keeps its own top-k so the driver sorts
    # <= k x blocks rows, never the full vocabulary
    def _topk(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df.sort_values(["count", "token"], ascending=[False, True]).head(top_k)
        return pa.Table.from_pandas(df, preserve_index=False)

    import pandas as pd

    out = totals.map_batches(_topk, batch_format="pyarrow").to_pandas()
    out = out.sort_values(["count", "token"], ascending=[False, True]).head(top_k)
    return ray.data.from_pandas(pd.DataFrame(out.reset_index(drop=True)))


def redact_numbers(
    docs: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Redact long digit runs (>=4) to [NUM]; per-doc redaction counts and
    redacted length. Pure vectorized map."""

    def _redact(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        n_red = [len(_NUM_RE.findall(t)) for t in texts]
        red = [_NUM_RE.sub("[NUM]", t) for t in texts]
        return pa.table(
            {
                id_col: batch[id_col],
                "n_redactions": pa.array(n_red, pa.int64()),
                "redacted_len": pa.array([len(t) for t in red], pa.int64()),
            }
        )

    return docs.map_batches(_redact, batch_format="pyarrow")


def chunk_documents(
    docs: ray.data.Dataset, chunk_tokens: int = 64,
    text_col: str = "text", id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Fixed-window chunking: one output row per ``chunk_tokens``-token
    window (whitespace tokens, chunk text re-joined with single spaces —
    the whitespace-normalizing convention the SQL oracle shares). The
    flat_map shape for pre-tokenization packing."""

    def _chunks(batch: pa.Table) -> pa.Table:
        ids, idxs, ntoks, texts = [], [], [], []
        for doc_id, t in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
            toks = _WS_TOKEN_RE.findall(t)
            for ci in range(0, max(1, (len(toks) + chunk_tokens - 1) // chunk_tokens)):
                window = toks[ci * chunk_tokens : (ci + 1) * chunk_tokens]
                ids.append(doc_id)
                idxs.append(ci)
                ntoks.append(len(window))
                texts.append(" ".join(window))
        return pa.table(
            {
                id_col: pa.array(ids),
                "chunk_idx": pa.array(idxs, pa.int64()),
                "n_tokens": pa.array(ntoks, pa.int64()),
                "chunk_text": pa.array(texts, pa.string()),
            }
        )

    return docs.map_batches(_chunks, batch_format="pyarrow")


def pack_sequences(
    chunks: ray.data.Dataset,
    capacity: int = 1024,
    bucket_span: int = 1 << 16,
    id_col: str = "doc_id",
    idx_col: str = "chunk_idx",
    tok_col: str = "n_tokens",
) -> ray.data.Dataset:
    """Pack chunk rows into fixed-token-budget training sequences:
    ``seq_id = start_offset // capacity`` where ``start_offset`` is the
    GLOBAL exclusive prefix sum of ``tok_col`` in (id_col, idx_col) order.

    The assignment is a pure function of the corpus — not of block
    boundaries, partitioning, or cluster size — and SQL-reproducible (one
    ``SUM ... OVER`` window). A sequence may straddle a chunk boundary: a
    chunk belongs to the bin containing its START offset, the usual
    document-packing compromise (no chunk is split; a bin may run slightly
    over capacity when a chunk straddles its end).

    Distributed-scan shape (no global sort, never the corpus on the driver):

    1. ``bucket = id // bucket_span`` — requires a monotone integer id
       (the partitioning assumption this operator relies on);
    2. per-bucket token totals via a per-batch combiner then a small
       groupby — the shuffle moves one int row per (bucket, batch);
    3. the bucket-total table (|id range| / bucket_span rows) is collected
       and exclusive-cumsum'd in bucket order on the driver — THE
       driver-side bound; size ``bucket_span`` so this stays ~1e5-1e6 rows
       at 100 TB — then broadcast once via ``ray.put``;
    4. a per-bucket ``map_groups`` computes the within-bucket running sum
       and adds the bucket carry. Only the three int columns cross the
       shuffle (chunk text never moves; join it back on (id, idx) if the
       packed text itself is needed).

    The input is streamed twice (bucket totals, then assignment) — two
    cheap int-only passes instead of one materialization.

    Returns one row per chunk: (id, idx, n_tokens, start_offset, seq_id).
    """
    import numpy as np
    import pandas as pd
    from ray.data.aggregate import Sum

    ints = chunks.select_columns([id_col, idx_col, tok_col])

    def _with_bucket(batch: pa.Table) -> pa.Table:
        b = np.asarray(batch[id_col], dtype=np.int64) // bucket_span
        return batch.append_column("_bucket", pa.array(b, pa.int64()))

    bucketed = ints.map_batches(_with_bucket, batch_format="pyarrow")

    def _partial(batch: pa.Table) -> pa.Table:
        df = batch.select(["_bucket", tok_col]).to_pandas()
        g = df.groupby("_bucket", as_index=False)[tok_col].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    totals = (
        bucketed.map_batches(_partial, batch_format="pyarrow")
        .groupby("_bucket")
        .aggregate(Sum(tok_col, alias_name="_tok"))
        .to_pandas()
    )
    if len(totals):
        totals = totals.sort_values("_bucket").reset_index(drop=True)
        offs = totals["_tok"].cumsum().shift(fill_value=0).astype("int64")
        carry = dict(zip(totals["_bucket"].astype(int), offs))
    else:
        carry = {}
    carry_ref = ray.put(carry)

    def _assign(g: pd.DataFrame) -> pd.DataFrame:
        from .broadcast import broadcast_cache

        c = broadcast_cache(carry_ref)
        g = g.sort_values([id_col, idx_col]).reset_index(drop=True)
        off = int(c.get(int(g["_bucket"].iloc[0]), 0))
        ends = g[tok_col].astype("int64").cumsum()
        g["start_offset"] = (ends - g[tok_col] + off).astype("int64")
        g["seq_id"] = (g["start_offset"] // capacity).astype("int64")
        return g.drop(columns=["_bucket"])

    return bucketed.groupby("_bucket").map_groups(_assign, batch_format="pandas")


def mixture_sample(
    docs: ray.data.Dataset,
    rates: dict[str, float],
    default_rate: float = 0.0,
    group_col: str = "lang",
    id_col: str = "doc_id",
    seed: str = "mix",
) -> ray.data.Dataset:
    """Deterministic per-group rate sampling — the domain/language mixture
    rebalancing step of a training-data pipeline. A row is kept iff the
    first 32 bits of ``md5("{seed}:{id}")`` fall below its group's integer
    threshold ``floor(rate * 2^32)``. Pure map, zero shuffle: the same
    document keeps/drops at any scale and partitioning, and the integer
    comparison makes the DuckDB oracle exact (no float thresholds)."""
    thr = {g: min(int(r * 4294967296), 4294967296) for g, r in rates.items()}
    dthr = min(int(default_rate * 4294967296), 4294967296)

    def _keep(batch: pa.Table) -> pa.Table:
        mask = [
            int(hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:8], 16)
            < thr.get(g, dthr)
            for i, g in zip(batch[id_col].to_pylist(), batch[group_col].to_pylist())
        ]
        return batch.filter(pa.array(mask, pa.bool_()))

    return docs.map_batches(_keep, batch_format="pyarrow")


def balanced_sample(
    docs: ray.data.Dataset,
    group_col: str = "lang",
    id_col: str = "doc_id",
    seed: str = "bal",
) -> ray.data.Dataset:
    """Deterministically downsample every group toward the SMALLEST
    group's size (the equal-representation mixture: each group's keep rate
    is ``c_min / c_group``). Thresholds are the exact rational
    ``floor(2^32 * c_min / c_group)`` — pure integer arithmetic, so the
    SQL oracle reproduces the keep set bit-for-bit (no float pow/div).

    Two passes: a tiny per-group count (combiner-first groupby, one int
    row per group per batch), thresholds broadcast via the closure, then
    the same zero-shuffle hash-filter map as :func:`mixture_sample`.
    The smallest group is kept whole (threshold 2^32); others come out at
    ≈ c_min in expectation (hash-Bernoulli, not exact-k — no shuffle)."""
    from ray.data.aggregate import Count

    counts = (
        docs.select_columns([group_col])
        .groupby(group_col)
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    if not len(counts):
        return docs
    c_min = int(counts["n"].min())
    thr = {
        g: (4294967296 * c_min) // int(n)
        for g, n in zip(counts[group_col], counts["n"])
    }

    def _keep(batch: pa.Table) -> pa.Table:
        mask = [
            int(hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:8], 16)
            < thr.get(g, 0)
            for i, g in zip(batch[id_col].to_pylist(), batch[group_col].to_pylist())
        ]
        return batch.filter(pa.array(mask, pa.bool_()))

    return docs.map_batches(_keep, batch_format="pyarrow")


def deterministic_shuffle(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    seed: str = "shuffle",
    key_col: str = "shuffle_key",
) -> ray.data.Dataset:
    """Deterministic global shuffle: order by ``md5("{seed}:{id}")`` — a
    content-addressed permutation that is reproducible across runs, block
    layouts and cluster sizes (``random_shuffle`` is not), which is what a
    resumable multi-epoch training run needs (vary ``seed`` per epoch).
    One distributed range-partition sort over a 32-char key column; the
    lowercase-hex string order matches SQL's byte collation exactly."""

    def _key(batch: pa.Table) -> pa.Table:
        keys = [
            hashlib.md5(f"{seed}:{i}".encode()).hexdigest()
            for i in batch[id_col].to_pylist()
        ]
        return batch.append_column(key_col, pa.array(keys, pa.string()))

    return ds.map_batches(_key, batch_format="pyarrow").sort(key_col)


def uniform_sample(
    ds: ray.data.Dataset,
    k: int = 10,
    id_col: str = "doc_id",
    seed: str = "sample",
    key_col: str = "sample_key",
) -> ray.data.Dataset:
    """Deterministic uniform k-sample WITHOUT a global sort: bottom-k by
    ``md5("{seed}:{id}")`` (the bottom-k / KMV sketch). Each batch keeps
    only its own k smallest rows — the partial-top-k combiner discipline of
    ``brute_force_topk``/``vocabulary`` — so the driver merges at most
    k × blocks rows, never the corpus. Equivalent to ``ORDER BY md5(...)
    LIMIT k`` (which is what :func:`deterministic_shuffle` + ``limit``
    computes via a full range-partition sort; use THIS when only a sample
    is needed — one streaming pass, no shuffle). Rows come back in key
    order with all input columns plus ``key_col``."""
    import pandas as pd

    def _partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df[key_col] = [
            hashlib.md5(f"{seed}:{i}".encode()).hexdigest() for i in df[id_col]
        ]
        return pa.Table.from_pandas(
            df.sort_values(key_col).head(k), preserve_index=False
        )

    merged = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .to_pandas()
        .sort_values(key_col)
        .head(k)
        .reset_index(drop=True)
    )
    return ray.data.from_pandas(pd.DataFrame(merged))


def weighted_sample(
    ds: ray.data.Dataset,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    seed: str = "ws",
) -> ray.data.Dataset:
    """Weight-proportional Bernoulli sample with EXPECTED ``k`` rows — the
    tokens-proportional document sampling step of a training-data mixture
    (long documents are proportionally more likely to be kept, so the
    SAMPLED TOKEN mass, not the document count, tracks the corpus).

    Integer-exact end to end (the md5/integer-threshold reproducibility
    rule of :func:`mixture_sample`): with integer weights ``w`` and
    ``c = (k << 32) // sum(w)``, a row is kept iff ``md5_u32("{seed}:{id}")
    < min(2^32, c * w)``. No float pow/ln (the classic A-Res key
    ``u^(1/w)`` is libm-dependent and would break the SQL oracle); IEEE
    products never enter — the keep set is bit-reproducible at any scale,
    partitioning, and in DuckDB.

    Two passes: an integer weight sum (per-block aggregate → one driver
    scalar), then a zero-shuffle hash-filter map. Weights must be a
    non-negative integer column (token counts, byte lengths)."""
    if not k > 0:
        raise ValueError("k must be positive")
    sw = ds.sum(weight_col)
    if sw is None or sw <= 0:
        return ds.limit(0)
    c = (int(k) << 32) // int(sw)
    full = 1 << 32

    def _keep(batch: pa.Table) -> pa.Table:
        ws = batch[weight_col].to_pylist()
        ids = batch[id_col].to_pylist()
        mask = [
            int(hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:8], 16)
            < min(full, c * int(w))
            for i, w in zip(ids, ws)
        ]
        return batch.filter(pa.array(mask, pa.bool_()))

    return ds.map_batches(_keep, batch_format="pyarrow")


def bloom_contamination_flags(
    docs: ray.data.Dataset,
    benchmark: ray.data.Dataset,
    n: int = 8,
    m_bits: int = 65536,
    k_hashes: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: str = "bloom",
) -> ray.data.Dataset:
    """Bloom-filter variant of :func:`contamination_flags` — the
    bounded-memory scale path. The broadcast state is a FIXED ``m_bits``
    bit array (8 KB at the default 2^16) instead of the benchmark's full
    n-gram set, so it stays constant no matter how large the eval suite
    grows; membership is one-sided (never misses a truly contaminated
    document; false positives per gram bounded by fill_ratio^k).

    Determinism rule as everywhere: bit positions are
    ``md5_u32("{seed}:{j}:{gram}") % m_bits`` for ``j < k_hashes`` — pure
    integer arithmetic, reproduced cell-for-cell by the DuckDB oracle.
    A gram is flagged iff ALL ``k_hashes`` of its bits are set. Output:
    ``(id_col, n_flagged_ngrams, maybe_contaminated)``, one row per doc."""
    import numpy as np

    def _u32(s: str) -> int:
        return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16)

    bits = np.zeros(m_bits, dtype=bool)
    for blk in benchmark.select_columns([text_col]).iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        for t in blk[text_col].to_pylist():
            for g in _word_ngrams(t, n):
                for j in range(k_hashes):
                    bits[_u32(f"{seed}:{j}:{g}") % m_bits] = True
    bits_ref = ray.put(bits)

    def _flags(batch: pa.Table) -> pa.Table:
        from .broadcast import broadcast_cache

        b = broadcast_cache(bits_ref)
        counts = []
        for t in batch[text_col].to_pylist():
            c = 0
            for g in _word_ngrams(t, n):
                if all(
                    b[_u32(f"{seed}:{j}:{g}") % m_bits] for j in range(k_hashes)
                ):
                    c += 1
            counts.append(c)
        return pa.table(
            {
                id_col: batch[id_col],
                "n_flagged_ngrams": pa.array(counts, pa.int64()),
                "maybe_contaminated": pa.array([c > 0 for c in counts], pa.bool_()),
            }
        )

    return docs.map_batches(_flags, batch_format="pyarrow")


def group_bottomk_sample(
    ds: ray.data.Dataset,
    k: int,
    group_col: str = "lang",
    id_col: str = "doc_id",
    seed: str = "gbk",
    key_col: str = "sample_key",
) -> ray.data.Dataset:
    """EXACT-k deterministic sample PER GROUP (the balanced eval-set draw):
    within each group, the k smallest ``md5("{seed}:{id}")`` keys — the
    per-group generalization of :func:`uniform_sample`'s bottom-k/KMV
    pattern, equal to per-group ``ORDER BY md5 LIMIT k`` without a global
    sort.

    Scale shape: a per-batch PER-GROUP bottom-k combiner (≤ k × groups
    rows per batch cross the shuffle, never the corpus), then a per-group
    merge (``groupby().map_groups`` over ≤ k × blocks rows per group)."""
    import pandas as pd

    def _partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df[key_col] = [
            hashlib.md5(f"{seed}:{i}".encode()).hexdigest() for i in df[id_col]
        ]
        out = (
            df.sort_values(key_col)
            .groupby(group_col, sort=False)
            .head(k)
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    def _merge(g: "pd.DataFrame") -> "pd.DataFrame":
        return g.sort_values(key_col).head(k)

    return (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby(group_col)
        .map_groups(_merge, batch_format="pandas")
    )


def bpe_train_merges(
    docs: ray.data.Dataset,
    n_merges: int,
    text_col: str = "text",
) -> "list[dict]":
    """Train the first ``n_merges`` BPE merge rules over the corpus — the
    tokenizer-training step of an LLM data pipeline (Sennrich et al. 2016).

    Classic vocab-based formulation: the only CORPUS-SCALE pass is the
    word-frequency count (combiner-first, shuffle bounded by |vocab| per
    batch); the merge loop then runs over the bounded (word, freq) table
    as Dataset ops — per-batch pair-count combiners, a groupby Sum over
    pair keys, a driver-side argmax of ONE row, and a broadcast merge
    application. Each iteration's shuffle moves pair-count partials
    (bounded by vocab size), never corpus text; the driver never holds
    the vocabulary.

    Semantics contract (SQL-reproducible by construction): words are
    ``[a-z0-9]+`` of the lowercased text, represented as the spaced char
    string ``' h e l l o '``; pair counts and merge application both use
    non-overlapping left-to-right scans (Python ``str.count`` /
    ``str.replace`` == DuckDB ``replace``-difference counting — the same
    consuming-scan semantics as Sennrich's ``re.sub``, where back-to-back
    occurrences sharing a boundary defer to the next round); argmax ties
    break by (count desc, left asc, right asc).

    Returns the merge table ``[{rank, left, right, n}, ...]``."""
    import pandas as pd

    from ray.data.aggregate import Sum

    def _word_freq(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch[text_col].to_pylist():
            c.update(_WORD_RE.findall((t or "").lower()))
        words = list(c)
        return pa.table(
            {
                "spaced": pa.array(
                    [" " + " ".join(w) + " " for w in words], pa.string()
                ),
                "freq": pa.array([c[w] for w in words], pa.int64()),
            }
        )

    vocab = (
        docs.map_batches(_word_freq, batch_format="pyarrow")
        .groupby("spaced")
        .aggregate(Sum("freq", alias_name="freq"))
        .materialize()
    )

    merges: list[dict] = []
    for rank in range(1, n_merges + 1):

        def _pair_partial(batch: pa.Table) -> pa.Table:
            c: Counter = Counter()
            for s, f in zip(batch["spaced"].to_pylist(), batch["freq"].to_pylist()):
                toks = s.split()
                for a, b in set(zip(toks, toks[1:])):
                    c[(a, b)] += s.count(f" {a} {b} ") * f
            keys = list(c)
            return pa.table(
                {
                    "left": pa.array([k[0] for k in keys], pa.string()),
                    "right": pa.array([k[1] for k in keys], pa.string()),
                    "n": pa.array([c[k] for k in keys], pa.int64()),
                }
            )

        pair_counts = (
            vocab.map_batches(_pair_partial, batch_format="pyarrow")
            .groupby(["left", "right"])
            .aggregate(Sum("n", alias_name="n"))
        )

        # partial-top-1 per block before the driver pick (top_k discipline)
        def _top1(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            df = df.sort_values(
                ["n", "left", "right"], ascending=[False, True, True]
            ).head(1)
            return pa.Table.from_pandas(df, preserve_index=False)

        cands = pair_counts.map_batches(_top1, batch_format="pyarrow").to_pandas()
        if cands.empty:
            break
        best = (
            cands.sort_values(["n", "left", "right"], ascending=[False, True, True])
            .iloc[0]
        )
        left, right, n = str(best["left"]), str(best["right"]), int(best["n"])
        merges.append({"rank": rank, "left": left, "right": right, "n": n})

        pat, rep = f" {left} {right} ", f" {left}{right} "

        def _apply(batch: pa.Table, _p=pat, _r=rep) -> pa.Table:
            return pa.table(
                {
                    "spaced": pa.array(
                        [s.replace(_p, _r) for s in batch["spaced"].to_pylist()],
                        pa.string(),
                    ),
                    "freq": batch["freq"],
                }
            )

        # merge barrier: the next round's counts read the rewritten vocab
        vocab = vocab.map_batches(_apply, batch_format="pyarrow").materialize()

    return merges


# Content-defined chunking constants — FIXED so the DuckDB oracle splices
# the same values: polynomial base, window width, boundary mask bits.
CDC_BASE = 257
CDC_WINDOW = 16
CDC_MASK_BITS = 6  # expected chunk length 2^6 = 64 chars


def cdc_chunks(
    docs: ray.data.Dataset,
    window: int = CDC_WINDOW,
    mask_bits: int = CDC_MASK_BITS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Content-defined chunking (the Rabin/FastCDC family): cut a document
    AFTER character position i when the rolling polynomial hash of the
    last ``window`` code points — ``Σ cp[i-k]·BASE^k mod 2^32`` — has its
    low ``mask_bits`` bits zero. Boundaries depend only on LOCAL content,
    so an insertion early in a document shifts at most one chunk instead
    of re-aligning every fixed-width window — the property that makes CDC
    the dedup-friendly chunker (backup dedup, diff transfer, and
    chunk-hash-level corpus dedup all rest on it).

    Output: one row per chunk — ``(doc_id, chunk_idx, start, length,
    chunk_md5)`` with 1-based character offsets and the md5 hex of the
    chunk text (the join key a chunk-level dedup would bucket on). A
    document shorter than ``window`` is one chunk. Pure map — zero
    shuffles; the hash window is vectorized numpy (``window`` fused
    multiply-adds over the code-point array, not a per-position loop)."""
    import numpy as np

    mask = (1 << mask_bits) - 1
    mod = 1 << 32
    pows = [pow(CDC_BASE, k, mod) for k in range(window)]

    def _chunks(batch: pa.Table) -> pa.Table:
        rows: dict = {"doc_id": [], "chunk_idx": [], "start": [], "length": [], "chunk_md5": []}
        for did, text in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
            L = len(text)
            cuts: list[int] = []
            if L >= window:
                cps = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
                acc = np.zeros(L - window + 1, dtype=np.uint64)
                for k in range(window):
                    # window END positions e = window-1 .. L-1 (0-based)
                    acc = (acc + cps[window - 1 - k : L - k] * pows[k]) % mod
                ends = np.nonzero((acc & mask) == 0)[0] + window  # 1-based i
                cuts = [int(i) for i in ends if i < L]
            starts = [1] + [c + 1 for c in cuts]
            stops = cuts + [L]
            for idx, (s, e) in enumerate(zip(starts, stops)):
                seg = text[s - 1 : e]
                rows["doc_id"].append(did)
                rows["chunk_idx"].append(idx)
                rows["start"].append(s)
                rows["length"].append(e - s + 1)
                rows["chunk_md5"].append(hashlib.md5(seg.encode("utf-8")).hexdigest())
        return pa.table(
            {
                "doc_id": pa.array(rows["doc_id"], batch[id_col].type),
                "chunk_idx": pa.array(rows["chunk_idx"], pa.int64()),
                "start": pa.array(rows["start"], pa.int64()),
                "length": pa.array(rows["length"], pa.int64()),
                "chunk_md5": pa.array(rows["chunk_md5"], pa.string()),
            }
        )

    return docs.map_batches(_chunks, batch_format="pyarrow")


def feature_hash(
    docs: ray.data.Dataset,
    dim: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Hashing-trick sparse bag-of-words features (Weinberger et al. 2009):
    token ``t`` maps to bucket ``md5-u32("fh:"+t) % dim`` with sign +1 iff
    ``md5-u32("fhs:"+t)`` is even (the signed variant that makes the
    hashed inner product unbiased). Output: one row per (doc, bucket)
    with the signed count sum, zero-weight buckets (full cancellation)
    dropped — the fixed-width featurizer that needs no vocabulary pass.

    Scale shape: a pure per-batch map, zero shuffles — each document's
    features are computed where its text lives; the (bucket, sign) pair
    per token is memoized in a bounded per-worker cache. Output is sparse
    rows ``(id, bucket, weight)``, at most ``dim`` per document.
    """
    bucket_cache: dict[str, tuple[int, int]] = {}

    def _lookup(tok: str) -> tuple[int, int]:
        bs = bucket_cache.get(tok)
        if bs is None:
            h = int(hashlib.md5(f"fh:{tok}".encode()).hexdigest()[:8], 16)
            s = int(hashlib.md5(f"fhs:{tok}".encode()).hexdigest()[:8], 16)
            bs = (h % dim, 1 if s % 2 == 0 else -1)
            if len(bucket_cache) < 1_000_000:
                bucket_cache[tok] = bs
        return bs

    def _features(batch: pa.Table) -> pa.Table:
        ids, buckets, weights = [], [], []
        for i, text in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
            acc: dict[int, int] = {}
            for tok, n in Counter(_WORD_RE.findall(text.lower())).items():
                b, sign = _lookup(tok)
                acc[b] = acc.get(b, 0) + sign * n
            for b in sorted(acc):
                if acc[b] != 0:
                    ids.append(i)
                    buckets.append(b)
                    weights.append(acc[b])
        return pa.table(
            {
                id_col: pa.array(ids),
                "bucket": pa.array(buckets, pa.int64()),
                "weight": pa.array(weights, pa.int64()),
            }
        )

    return docs.select_columns([id_col, text_col]).map_batches(
        _features, batch_format="pyarrow"
    )


def curation_pipeline(
    docs: ray.data.Dataset,
    benchmark: ray.data.Dataset,
    jaccard_threshold: float = 0.7,
    num_buckets: int = 16,
) -> ray.data.Dataset:
    """The composed end-to-end curation pass a pre-training corpus runs,
    SEQUENTIALLY (each stage sees only the previous stage's survivors),
    with the FIRST failing stage as the document's drop reason:

    1. quality — :func:`..text_analysis.gopher_filter` (word count /
       word length / type-token ratio / duplicate-2-grams, first-fail);
    2. exact dedup — md5(text) groups keep min doc_id
       (``'exact_duplicate'``);
    3. near dedup — :func:`..dedup.near_dedup_keep_ids` exact mode
       (prefix-filtered 5-char-shingle Jaccard → connected components →
       keep component min; ``'near_duplicate'``);
    4. decontamination — :func:`contamination_flags` word-8-gram overlap
       against the broadcast ``benchmark`` (``'contaminated'``);
    5. kept survivors get their :func:`split_of` train/val/test split.

    Output: one row per input document —
    ``(doc_id, status, reason, split)`` with status ``kept``/``dropped``,
    reason ``ok`` or the first-failing stage's reason, and split ``''``
    for dropped documents (dtype-stable sentinel).

    Scale shape: every stage is the already-scale-shaped primitive it
    reuses (pure maps for 1/4/5; one hash-bounded groupby+join for 2; the
    prefix-filtered join + distributed CC for 3); survivors flow between
    stages as datasets via bucketed semi/anti joins — no id set on the
    driver. The Jaccard stage is the documented-cost step (the
    ``jaccard_similarity_join`` contract); swap ``exact=False`` inside
    ``near_dedup_keep_ids`` for the MinHash path at 100-TB scale.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Min

    from .dedup import near_dedup_keep_ids
    from .joins import hash_bucket_join
    from .text_analysis import gopher_filter

    doc_schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string())])
    id_schema = pa.schema([("doc_id", pa.int64())])
    out_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("status", pa.string()),
            ("reason", pa.string()),
            ("split", pa.string()),
        ]
    )

    def _semi(left: ray.data.Dataset, ids: ray.data.Dataset) -> ray.data.Dataset:
        return hash_bucket_join(
            left, ids, on="doc_id", output_columns=["doc_id", "text"],
            how="left_semi", num_buckets=num_buckets,
            left_schema=doc_schema, right_schema=id_schema,
        )

    def _verdict(ds, status: str, reason, split):
        """reason/split: a constant, or a column name to copy."""

        def f(batch: pa.Table) -> pa.Table:
            n = batch.num_rows

            def col(v):
                if v in batch.column_names:
                    return batch[v].cast(pa.string())
                return pa.array([v] * n, pa.string())

            return pa.table(
                {
                    "doc_id": batch["doc_id"].cast(pa.int64()),
                    "status": pa.array([status] * n, pa.string()),
                    "reason": col(reason),
                    "split": col(split),
                },
                schema=out_schema,
            )

        return ds.map_batches(f, batch_format="pyarrow")

    docs = docs.select_columns(["doc_id", "text"]).materialize()

    # 1. quality (pure map); survivors flow on as a dataset semi-join
    quality = gopher_filter(docs).materialize()
    q_drop = _verdict(
        quality.map_batches(
            lambda b: b.filter(pc.invert(b["keep"])).select(["doc_id", "drop_reason"]),
            batch_format="pyarrow",
        ),
        "dropped", "drop_reason", "",
    )
    s1 = _semi(
        docs,
        quality.map_batches(
            lambda b: b.filter(b["keep"]).select(["doc_id"]), batch_format="pyarrow"
        ),
    ).materialize()

    # 2. exact dedup: md5 groups keep min doc_id
    def _hash(batch: pa.Table) -> pa.Table:
        hs = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in batch["text"].to_pylist()]
        return pa.table({"doc_id": batch["doc_id"], "h": pa.array(hs, pa.string())})

    eh = s1.map_batches(_hash, batch_format="pyarrow")
    emin = eh.groupby("h").aggregate(Min("doc_id", alias_name="keep_id"))
    ej = hash_bucket_join(
        eh, emin, on="h", output_columns=["doc_id", "keep_id"],
        num_buckets=num_buckets,
        left_schema=pa.schema([("doc_id", pa.int64()), ("h", pa.string())]),
        right_schema=pa.schema([("h", pa.string()), ("keep_id", pa.int64())]),
    ).materialize()
    e_drop = _verdict(
        ej.map_batches(
            lambda b: b.filter(pc.not_equal(b["doc_id"], b["keep_id"])).select(["doc_id"]),
            batch_format="pyarrow",
        ),
        "dropped", "exact_duplicate", "",
    )
    s2 = _semi(
        s1,
        ej.map_batches(
            lambda b: b.filter(pc.equal(b["doc_id"], b["keep_id"])).select(["doc_id"]),
            batch_format="pyarrow",
        ),
    ).materialize()

    # 3. near dedup (exact-recall mode; the oracle-checkable path)
    nd_keep = near_dedup_keep_ids(s2, threshold=jaccard_threshold, exact=True).materialize()
    nd_drop = _verdict(
        hash_bucket_join(
            s2.select_columns(["doc_id"]), nd_keep, on="doc_id",
            output_columns=["doc_id"], how="left_anti", num_buckets=num_buckets,
            left_schema=id_schema, right_schema=id_schema,
        ),
        "dropped", "near_duplicate", "",
    )
    s3 = _semi(s2, nd_keep).materialize()

    # 4. decontamination (benchmark broadcast once; zero shuffles)
    cf = contamination_flags(s3, benchmark).materialize()
    c_drop = _verdict(
        cf.map_batches(
            lambda b: b.filter(b["contaminated"]).select(["doc_id"]),
            batch_format="pyarrow",
        ),
        "dropped", "contaminated", "",
    )

    # 5. split assignment for the kept survivors (pure map)
    def _split(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "split": pa.array(
                    [split_of(i) for i in batch["doc_id"].to_pylist()], pa.string()
                ),
            }
        )

    kept = _verdict(
        cf.map_batches(
            lambda b: b.filter(pc.invert(b["contaminated"])).select(["doc_id"]),
            batch_format="pyarrow",
        ).map_batches(_split, batch_format="pyarrow"),
        "kept", "ok", "split",
    )

    return q_drop.union(e_drop).union(nd_drop).union(c_drop).union(kept)


def weighted_topk_sample(
    ds: ray.data.Dataset,
    weight_col: str,
    id_col: str = "doc_id",
    k: int = 20,
    seed: str = "es",
) -> "pandas.DataFrame":  # noqa: F821 — annotation only
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis): each
    row draws a deterministic uniform u from md5(seed:id) and keeps key
    ``ln(u) / w``; the k largest keys are the sample — inclusion
    probability proportional to weight, no replacement, and the SAME k
    rows selected at any partitioning or cluster size (u is
    content-addressed, not RNG-state). The exact-rational
    ``u = (h + 1) / 2^32`` keeps both sides' doubles identical; ties
    break on id.

    Shape: a pure map computes keys, a per-batch partial top-k combiner
    bounds the shuffle at k rows per block (the brute_force_topk
    discipline), and the driver merges block winners. The WOR complement
    of mixture_sample's Bernoulli rate sampling."""
    import math

    import pandas as pd

    def _keys(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        ws = batch[weight_col].to_pylist()
        keys = []
        for i, w in zip(ids, ws):
            h = int(
                hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:8], 16
            )
            u = (h + 1) / 4294967296.0  # exact rational in (0, 1]
            keys.append(math.log(u) / float(w))
        out = pa.table(
            {
                id_col: batch[id_col],
                weight_col: batch[weight_col],
                "es_key": pa.array(keys, pa.float64()),
            }
        )
        # per-batch partial top-k: only each block's k best leave the map
        idx = sorted(
            range(len(keys)), key=lambda j: (-keys[j], ids[j])
        )[: min(k, len(keys))]
        return out.take(idx)

    parts = ds.select_columns([id_col, weight_col]).map_batches(
        _keys, batch_format="pyarrow"
    ).to_pandas()
    top = parts.sort_values(
        ["es_key", id_col], ascending=[False, True]
    ).head(k)
    top = top.reset_index(drop=True)
    # selection ran on the raw doubles; display rounds against ln() ulp
    top["es_key"] = top["es_key"].round(6)
    return top
