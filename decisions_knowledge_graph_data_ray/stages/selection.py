"""Multi-objective selection: the 2-D Pareto frontier (skyline).

``skyline_2d`` keeps every row not STRICTLY dominated on two objectives
(minimize one column, maximize the other) — the classic skyline operator
(Börzsönyi, Kossmann, Stocker, ICDE 2001): cheapest-vs-best trade-off
curves, data-selection frontiers (quality score vs token cost), model
sweeps. Row ``q`` is dominated iff some ``p`` has ``p.min <= q.min AND
p.max >= q.max`` with at least one strict inequality; duplicates of the
same objective point are mutually non-dominated and ALL survive.

Scale shape (the distributed-skyline two-phase): a per-batch LOCAL skyline
is a sound filter (dominance is transitive, so any point dominated within
a batch is dominated globally — local skylines are a superset of the
global one), then ONE constant-key cogroup merges the survivors. The merge
input is bounded by Σ per-batch skyline sizes — for continuous-ish 2-D
data the expected skyline is O(log n) per batch (Bentley et al. 1978), so
the merge table is tiny even when the input is billions of rows; a
pathological anti-correlated worst case degrades toward the input size,
which the 2-D sort-scan kernel still handles in O(n log n) per batch and
documented memory on the single merge worker.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data


def _skyline_kernel(df: pd.DataFrame, min_col: str, max_col: str) -> pd.DataFrame:
    """Exact in-memory 2-D skyline, duplicates-preserving sort-scan."""
    if df.empty:
        return df
    # one candidate objective point per (min, max): the max_col winner at
    # each min_col value, then a cummax scan over min_col-ascending order
    pairs = (
        df[[min_col, max_col]]
        .groupby(min_col, sort=True)[max_col]
        .max()
        .reset_index()
    )
    best_below = pairs[max_col].cummax().shift(1, fill_value=-np.inf)
    keep_pairs = pairs[pairs[max_col] > best_below]
    key = pd.MultiIndex.from_frame(df[[min_col, max_col]])
    return df[key.isin(pd.MultiIndex.from_frame(keep_pairs))]


def skyline_2d(
    ds: ray.data.Dataset,
    min_col: str,
    max_col: str,
) -> ray.data.Dataset:
    """Rows on the Pareto frontier of (minimize ``min_col``, maximize
    ``max_col``). See module docstring for semantics and the two-phase
    distributed shape."""
    import pyarrow as pa

    def _local(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        out = _skyline_kernel(df, min_col, max_col)
        out = out.copy()
        out["__sky"] = 0
        return pa.Table.from_pandas(out, preserve_index=False)

    def _merge(g: pd.DataFrame) -> pd.DataFrame:
        return _skyline_kernel(g.drop(columns="__sky"), min_col, max_col)

    return (
        ds.map_batches(_local, batch_format="pyarrow")
        .groupby("__sky")
        .map_groups(_merge, batch_format="pandas")
    )
