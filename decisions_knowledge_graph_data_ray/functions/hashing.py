"""Vectorized partition-bucket hashing for shuffle stages.

``bucket_ids`` maps a key column to int32 bucket ids without a per-row
Python loop. It uses polars' vectorized xxhash (deterministic for a fixed
polars version, which a Ray cluster guarantees within one job — every
worker runs the same image). Bucket assignment only influences WHERE a row
is processed, never the result, so cross-version stability is not required;
``stable_hash32`` (crc32, a fixed standard — stable across library
versions) remains the hash for anything persisted or user-visible.

Falls back to a stable_hash32 loop if polars is unavailable.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from .normalize import stable_hash32

# A Ray worker runs many processes per node; an unpinned polars would spawn
# a num_cpus-wide rayon pool in EACH of them. Our usage is single-batch
# hashing — 2 threads is plenty and avoids pool oversubscription.
os.environ.setdefault("POLARS_MAX_THREADS", "2")

try:  # baked into the environment; guarded per repo policy
    import polars as _pl
except Exception:  # pragma: no cover
    _pl = None


def bucket_ids(col: pa.ChunkedArray | pa.Array, num_buckets: int, seed: int = 0) -> pa.Int32Array:
    """Key column → int32 bucket id in [0, num_buckets)."""
    if isinstance(col, pa.Array):
        col = pa.chunked_array([col])
    if _pl is not None:
        h = _pl.from_arrow(col).hash(seed=seed).to_numpy()
        return pa.array((h % np.uint64(num_buckets)).astype(np.int32), pa.int32())
    vals = col.to_pylist()  # pragma: no cover
    return pa.array([stable_hash32(f"{seed}:{v}") % num_buckets for v in vals], pa.int32())


def bucket_ids_np(values: np.ndarray, num_buckets: int, seed: int = 0) -> np.ndarray:
    """numpy array variant (int32 out)."""
    if _pl is not None:
        h = _pl.Series(values).hash(seed=seed).to_numpy()
        return (h % np.uint64(num_buckets)).astype(np.int32)
    return np.array(  # pragma: no cover
        [stable_hash32(f"{seed}:{v}") % num_buckets for v in values], dtype=np.int32
    )
