"""Reshape operators: pivot (long → wide) and stratified head sampling.

Training-data pipelines constantly reshape long event/label tables into
wide per-entity features and draw per-stratum samples; Ray Data has no
native pivot/stratified primitives, so both are built from the engine's
standard combiner + pid-cogroup pattern:

- ``pivot_counts``: per-key count columns for a CLOSED category set (the
  closed set keeps the output schema static — a requirement for any wide
  table at scale; discovering categories dynamically would need an extra
  pass). Partial (key, cat) counts are aggregated inside each batch, so the
  shuffle moves at most |keys|x|cats| rows per block, never raw events.
- ``stratified_head``: the first ``k`` rows per stratum under a total order
  (deterministic "sample"); a per-batch top-k combiner bounds the shuffle
  at |strata| x k rows per block — the same partial-top-k discipline as
  ``brute_force_topk``.

Reference parity: the reference's closest analogue is the per-dimension
mapping-stats fan-out (src/pipeline/mapping/steps.ts stats accumulators);
these generalize it to first-class reshape operators with DuckDB-checkable
semantics.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..functions.hashing import bucket_ids


def pivot_counts(
    ds: ray.data.Dataset,
    key_col: str,
    cat_col: str,
    categories: list[str],
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """Wide per-key table: one ``n_<category>`` int64 column per category.

    Rows whose category is outside ``categories`` are ignored (closed-set
    contract). Keys appear iff they have at least one in-set row.
    """
    cats = list(categories)
    out_cols = [f"n_{c}" for c in cats]

    def _partial(batch: pa.Table) -> pa.Table:
        # Filter to the closed set BEFORE the group-count so the shuffle
        # bound really is |keys|x|cats| per block even when cat_col carries
        # high-cardinality out-of-set values.
        batch = batch.select([key_col, cat_col])
        batch = batch.filter(pa.compute.is_in(batch[cat_col], value_set=pa.array(cats)))
        out = pa.TableGroupBy(batch, [key_col, cat_col]).aggregate([([], "count_all")])
        remap = {"count_all": "n"}
        out = out.rename_columns([remap.get(c, c) for c in out.column_names])
        return out.append_column("pid", bucket_ids(out[key_col], num_partitions))

    def _widen(group: pd.DataFrame) -> pd.DataFrame:
        g = group[group[cat_col].isin(cats)]
        if not len(g):
            return pd.DataFrame(
                {key_col: pd.Series(dtype=group[key_col].dtype)}
                | {c: pd.Series(dtype="int64") for c in out_cols}
            )
        wide = (
            g.pivot_table(index=key_col, columns=cat_col, values="n",
                          aggfunc="sum", fill_value=0)
            .reindex(columns=cats, fill_value=0)
            .astype("int64")
        )
        wide.columns = out_cols
        return wide.reset_index()

    return (
        ds.select_columns([key_col, cat_col])
        .map_batches(_partial, batch_format="pyarrow", batch_size=None)
        .groupby("pid")
        .map_groups(_widen, batch_format="pandas")
    )


def stratified_head(
    ds: ray.data.Dataset,
    stratum_col: str,
    order_col: str,
    k: int,
    columns: list[str] | None = None,
) -> ray.data.Dataset:
    """First ``k`` rows per stratum ordered by ``order_col`` (ascending,
    deterministic). Combiner-first: each batch keeps at most k rows per
    stratum before the stratum cogroup, so the shuffle moves |strata| x k
    rows per block. Partitioning assumption: strata are a small categorical
    set (languages, quality buckets) — the final cogroup dispatches one
    Python call per stratum.

    ``order_col`` must be a unique total order WITHIN each stratum (e.g. a
    row id): with ties, the per-block combiner keeps an arbitrary
    block-dependent subset of the tied rows, so results would vary run to
    run. Add a tie-break column to ``order_col``'s values if needed.
    """
    keep = columns or list(ds.schema().names)
    for required in (order_col, stratum_col):
        if required not in keep:
            keep = [required] + keep

    def _topk(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values([stratum_col, order_col], kind="stable")
            .groupby(stratum_col, sort=False)
            .head(k)
        )

    partial = ds.select_columns(keep).map_batches(
        lambda df: _topk(df), batch_format="pandas", batch_size=None
    )
    return partial.groupby(stratum_col).map_groups(_topk, batch_format="pandas")


def unpivot(
    ds: ray.data.Dataset,
    key_cols: list[str],
    value_cols: list[str],
    var_name: str = "variable",
    value_name: str = "value",
) -> ray.data.Dataset:
    """Wide → long melt: one output row per (input row, value column). A
    pure per-batch map (k-fold vectorized expansion, no shuffle) — the exact
    inverse shape of ``pivot_counts``.

    The value column's type is unified ACROSS ``value_cols`` from the
    dataset schema up front (Arrow type promotion), so every output block —
    including zero-row ones — carries the same explicit type instead of a
    per-batch inferred (possibly null) one.
    """
    k = len(value_cols)
    base = ds.schema().base_schema
    if not isinstance(base, pa.Schema):  # pandas-block input → Arrow types
        base = pa.Schema.from_pandas(
            pd.DataFrame({n: pd.Series(dtype=t) for n, t in zip(base.names, base.types)})
        )
    in_types = [base.field(c).type for c in value_cols]
    value_type = in_types[0]
    for t in in_types[1:]:
        if not value_type.equals(t):
            # promote across heterogeneous value columns (int32+int64 →
            # int64, int+float → float64, etc.)
            value_type = pa.unify_schemas(
                [pa.schema([pa.field("v", value_type)]), pa.schema([pa.field("v", t)])],
                promote_options="permissive",
            ).field("v").type

    def _cast_col(batch: pa.Table, c: str) -> pa.Array:
        arr = batch[c].cast(value_type).combine_chunks()
        if isinstance(arr, pa.ChunkedArray):  # pyarrow-version-dependent
            arr = arr.chunk(0) if arr.num_chunks else pa.array([], value_type)
        return arr

    def _melt(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        idx = pa.array(np.repeat(np.arange(n), k))
        cols = {c: batch[c].take(idx) for c in key_cols}
        cols[var_name] = pa.array(value_cols * n, pa.string())
        # column-major concat of the k casted value arrays, then an
        # interleave-take back to row-major (row0col0, row0col1, ...).
        interleave = (np.arange(k)[None, :] * n + np.arange(n)[:, None]).ravel()
        cols[value_name] = pa.concat_arrays(
            [_cast_col(batch, c) for c in value_cols]
        ).take(pa.array(interleave, pa.int64()))
        return pa.table(cols)

    return ds.map_batches(_melt, batch_format="pyarrow")


def zorder_assign(
    ds: ray.data.Dataset,
    x_col: str,
    y_col: str,
    id_col: str,
    num_partitions: int = 64,
    bits: int = 16,
) -> ray.data.Dataset:
    """Z-order (Morton) layout assignment over two integer dimensions —
    the multi-dimensional data-layout pass a 100-TB table runs before
    writing partitioned Parquet, so range scans on EITHER dimension touch
    a bounded fraction of files: interleave the low ``bits`` bits of the
    two columns into ``zcode``, then range-partition by zcode WITHOUT a
    global sort (the rank_transform value-CDF: per-batch zcode-count
    combiner → one bounded groupby → broadcast CDF → pure map).
    ``part_id = rows_with_smaller_zcode · P // n_rows`` — ties co-locate
    by construction (the property a layout wants).

    Output: ``(id_col, zcode, part_id)``. Scale envelope: the CDF is
    bounded by |distinct zcodes| ≤ 4^bits (and in practice by data
    locality); raise ``bits`` only with a coarser partition count.
    """
    import numpy as np

    from .diagnostics import rank_transform

    def _z(batch: pa.Table) -> pa.Table:
        x = np.asarray(batch[x_col], dtype=np.int64) & ((1 << bits) - 1)
        y = np.asarray(batch[y_col], dtype=np.int64) & ((1 << bits) - 1)
        z = np.zeros(len(x), dtype=np.int64)
        for b in range(bits):
            z |= ((x >> b) & 1) << (2 * b)
            z |= ((y >> b) & 1) << (2 * b + 1)
        return pa.table({id_col: batch[id_col], "zcode": pa.array(z, pa.int64())})

    coded = ds.select_columns([id_col, x_col, y_col]).map_batches(
        _z, batch_format="pyarrow"
    )
    n_rows = coded.count()
    ranked = rank_transform(coded, "zcode", out_prefix="zr")

    def _part(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        lt = batch["zr_lt"]
        part = pc.divide(
            pc.multiply(lt, pa.scalar(num_partitions, pa.int64())),
            pa.scalar(n_rows, pa.int64()),
        )
        return pa.table(
            {
                id_col: batch[id_col],
                "zcode": batch["zcode"],
                "part_id": pc.cast(part, pa.int64()),
            }
        )

    return ranked.map_batches(_part, batch_format="pyarrow")
