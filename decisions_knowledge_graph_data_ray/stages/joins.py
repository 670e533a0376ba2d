"""Portable partitioned hash join: bucket by key hash → cogroup → pandas merge.

``Dataset.join`` (Ray 2.49 hash-shuffle join) crashes on sparse keys: a hash
partition whose right side receives zero blocks finalizes a schema-less
empty table and the Arrow join errors with "No match ... for key field".
This helper implements the guide's explicit bucketed-join pattern instead:
both sides are packed into a uniform (bucket, side, key, payload) schema
(payload = pickled row), unioned, and cogrouped with
``groupby(bucket).map_groups`` doing a pandas merge per bucket. Empty
buckets never materialize; skew is handled by raising ``num_buckets``
(salting the hot key across buckets is the caller's option via a composite
key column).

Used by the sparse-key stages (connected-components label propagation,
candidate-pair text verification). Dense-key relational joins keep
``Dataset.join``. Payload pickling costs a copy per row — acceptable for
narrow id/label rows; do NOT route wide text columns through this (join the
ids first, fetch text on the joined result).
"""

from __future__ import annotations

import pickle

import pandas as pd
import pyarrow as pa

import ray.data

from ..functions.normalize import stable_hash32

_PACKED_SCHEMA = pa.schema(
    [
        ("bucket", pa.int64()),
        ("side", pa.string()),
        ("key", pa.string()),
        ("payload", pa.binary()),
    ]
)


def _pack(side: str, key_col: str, num_buckets: int):
    def f(batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        return pa.table(
            {
                "bucket": pa.array(
                    [stable_hash32(str(r[key_col])) % num_buckets for r in rows], pa.int64()
                ),
                "side": pa.array([side] * len(rows), pa.string()),
                "key": pa.array([str(r[key_col]) for r in rows], pa.string()),
                "payload": pa.array([pickle.dumps(r) for r in rows], pa.binary()),
            }
        )

    return f


def hash_bucket_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str,
    output_columns: list[str],
    right_on: str | None = None,
    how: str = "inner",
    num_buckets: int = 16,
) -> ray.data.Dataset:
    """Join on one key column (stringified equality).

    ``output_columns`` fixes the output schema (every emitted block is
    reindexed to it — including empty buckets), which is precisely what
    Ray's built-in hash join fails to do for sparse keys.
    ``how`` ∈ {inner, left_outer}; row order unspecified.
    """
    right_on = right_on or on
    ltag = left.map_batches(_pack("L", on, num_buckets), batch_format="pyarrow")
    rtag = right.map_batches(_pack("R", right_on, num_buckets), batch_format="pyarrow")

    pd_how = {"inner": "inner", "left_outer": "left"}[how]

    def _merge(group: pd.DataFrame) -> pd.DataFrame:
        l_rows = [pickle.loads(p) for p in group.loc[group["side"] == "L", "payload"]]
        r_rows = [pickle.loads(p) for p in group.loc[group["side"] == "R", "payload"]]
        if not l_rows or (not r_rows and pd_how == "inner"):
            return pd.DataFrame(columns=output_columns)
        ldf = pd.DataFrame(l_rows)
        rdf = pd.DataFrame(r_rows) if r_rows else pd.DataFrame(columns=[right_on])
        merged = ldf.merge(rdf, left_on=on, right_on=right_on, how=pd_how)
        before = set(merged.columns)
        out = merged.reindex(columns=output_columns)
        for c in output_columns:
            if c not in before:  # padded column: object-None, not float-NaN
                out[c] = pd.Series([None] * len(out), dtype=object)
        return out

    return ltag.union(rtag).groupby("bucket").map_groups(_merge, batch_format="pandas")
