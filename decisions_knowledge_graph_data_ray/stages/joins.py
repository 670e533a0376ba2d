"""Portable partitioned hash join: bucket by key hash → cogroup → Arrow join.

``Dataset.join`` (Ray 2.49 hash-shuffle join) crashes on sparse keys: a hash
partition whose right side receives zero blocks finalizes a schema-less
empty table and the Arrow join errors with "No match ... for key field".
This helper implements the guide's explicit bucketed-join pattern instead,
fully Arrow-native (no pickling, no per-row Python):

- both sides are packed into ONE uniform Arrow schema
  ``(__hbj_bucket, __hbj_side, l:…left cols…, r:…right cols…)`` where the
  other side's columns are null arrays (columnar nulls cost ~1 bit/row);
- bucket ids come from a vectorized hash of the key column
  (functions/hashing.bucket_ids — polars xxhash, no Python loop);
- the union cogroups with ``groupby(bucket).map_groups`` and each bucket
  joins via ``pyarrow.Table.join`` (Arrow C++ hash join).

Empty buckets never materialize; skew is handled by raising ``num_buckets``
(salting the hot key across buckets is the caller's option via a composite
key column). Used by the sparse-key stages (connected-components label
propagation, candidate-pair verification, anti-joins). Dense-key relational
joins keep ``Dataset.join``.

Key types must match between sides (native equality — ints join ints).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..functions.hashing import bucket_ids

_BUCKET = "__hbj_bucket"
_SIDE = "__hbj_side"


def _arrow_schema(ds: ray.data.Dataset) -> pa.Schema:
    sch = ds.schema()
    sch = getattr(sch, "base_schema", sch)
    if isinstance(sch, pa.Schema):
        return sch
    # pandas-block dataset: PandasBlockSchema carries names + numpy dtypes
    fields = []
    for name, dt in zip(sch.names, sch.types):
        if isinstance(dt, pa.DataType):
            fields.append((name, dt))
        elif getattr(dt, "kind", None) == "O":
            fields.append((name, pa.string()))
        else:
            fields.append((name, pa.from_numpy_dtype(dt)))
    return pa.schema(fields)


def _pack(side_val: int, key_col: str, prefix: str, my_schema: pa.Schema,
          other_prefix: str, other_schema: pa.Schema, num_buckets: int,
          combined: pa.Schema):
    def f(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols: dict[str, pa.ChunkedArray | pa.Array] = {
            _BUCKET: (
                bucket_ids(batch[key_col], num_buckets)
                if key_col in batch.column_names
                else pa.nulls(n, pa.int32())
            ),
            _SIDE: pa.array(np.full(n, side_val, dtype=np.int8)),
        }
        for field in my_schema:
            # an upstream EMPTY aggregate emits zero-column blocks (no
            # schema survives an empty groupby) — substitute typed nulls
            if field.name in batch.column_names:
                cols[prefix + field.name] = batch[field.name].cast(field.type)
            else:
                cols[prefix + field.name] = pa.nulls(n, field.type)
        for field in other_schema:
            cols[other_prefix + field.name] = pa.nulls(n, field.type)
        return pa.table({name: cols[name] for name in combined.names}, schema=combined)

    return f


def hash_bucket_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str,
    output_columns: list[str],
    right_on: str | None = None,
    how: str = "inner",
    num_buckets: int = 16,
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
) -> ray.data.Dataset:
    """Join on one key column (native-type equality).

    ``output_columns`` fixes the output schema (every emitted block is
    built to it — including empty buckets), which is precisely what Ray's
    built-in hash join fails to do for sparse keys.
    ``how`` ∈ {inner, left_outer, left_anti, left_semi, right_outer,
    right_anti, right_semi, full_outer}; row order unspecified. For
    ``full_outer`` the key lands in the LEFT key's column name (Arrow
    coalesces the right key into it); for the right_* types the key keeps
    ``right_on``'s name. Pass ``left_schema``/``right_schema`` (Arrow) to skip the
    schema-inference pass — hot loops (CC label propagation) should.
    """
    right_on = right_on or on
    lsch = left_schema or _arrow_schema(left)
    rsch = right_schema or _arrow_schema(right)

    combined = pa.schema(
        [(_BUCKET, pa.int32()), (_SIDE, pa.int8())]
        + [("l:" + f.name, f.type) for f in lsch]
        + [("r:" + f.name, f.type) for f in rsch]
    )
    type_of: dict[str, pa.DataType] = {f.name: f.type for f in rsch}
    type_of.update({f.name: f.type for f in lsch})  # left wins on collision
    out_schema = pa.schema([(c, type_of[c]) for c in output_columns])

    ltag = left.map_batches(
        _pack(0, on, "l:", lsch, "r:", rsch, num_buckets, combined), batch_format="pyarrow"
    )
    rtag = right.map_batches(
        _pack(1, right_on, "r:", rsch, "l:", lsch, num_buckets, combined), batch_format="pyarrow"
    )

    join_type = {
        "inner": "inner",
        "left_outer": "left outer",
        "left_anti": "left anti",
        "left_semi": "left semi",
        "right_outer": "right outer",
        "right_anti": "right anti",
        "right_semi": "right semi",
        "full_outer": "full outer",
    }[how]
    lnames = [f.name for f in lsch]
    rnames = [f.name for f in rsch]

    def _merge(group: pa.Table) -> pa.Table:
        # Ray passes zero-column EMPTY blocks through map_batches without
        # running the UDF, so a fully-empty input side reaches the sort
        # untagged and gets unified in as null-typed columns. Re-pin the
        # group to the combined schema (cast is a no-op when types match).
        if group.schema != combined:
            group = pa.table(
                {
                    n: (
                        group[n].cast(combined.field(n).type)
                        if n in group.column_names
                        else pa.nulls(group.num_rows, combined.field(n).type)
                    )
                    for n in combined.names
                },
                schema=combined,
            )
        lmask = pc.equal(group[_SIDE], 0)
        ltab = group.filter(lmask).select(["l:" + n for n in lnames]).rename_columns(lnames)
        rtab = (
            group.filter(pc.invert(lmask)).select(["r:" + n for n in rnames]).rename_columns(rnames)
        )
        # short-circuit only provably-empty results; full outer never is
        # (a group exists only if at least one side contributed rows)
        if join_type == "inner" and (ltab.num_rows == 0 or rtab.num_rows == 0):
            return out_schema.empty_table()
        if join_type.startswith("left") and ltab.num_rows == 0:
            return out_schema.empty_table()
        if join_type.startswith("right") and rtab.num_rows == 0:
            return out_schema.empty_table()
        joined = ltab.join(rtab, keys=[on], right_keys=[right_on], join_type=join_type)
        cols = {
            c: joined[c] if c in joined.column_names
            else pa.nulls(joined.num_rows, out_schema.field(c).type)
            for c in output_columns
        }
        return pa.table(cols).cast(out_schema)

    # NOTE: when the join result is EMPTY, Ray drops all zero-row blocks and
    # the returned Dataset has no schema (to_pandas() → zero columns).
    # Callers needing a typed empty frame should reindex to output_columns.
    return ltag.union(rtag).groupby(_BUCKET).map_groups(_merge, batch_format="pyarrow")


def snapshot_diff(
    old: ray.data.Dataset,
    new: ray.data.Dataset,
    key_col: str,
    value_cols: list[str],
    num_buckets: int = 16,
) -> ray.data.Dataset:
    """Change-data-capture diff of two table snapshots keyed by ``key_col``:
    one row per key whose state changed — ``(key, status)`` with status in
    ``{'added','removed','changed'}``. Unchanged keys are dropped (the
    point of CDC: output is proportional to the delta, not the table).

    Scale shape: one bucketed full-outer join (``hash_bucket_join`` — both
    snapshots shuffle ONCE by key hash), then a vectorized per-bucket
    classification. Side presence comes from constant flag columns (the
    full-outer join coalesces the key itself), and value comparison is
    native-type and null-aware (``IS DISTINCT FROM`` semantics) — no row
    fingerprints, no string casts, so floats/timestamps diff exactly like
    SQL.
    """
    import numpy as np

    def _pack_side(prefix: str, flag_name: str):
        # one Arrow map: project, side-prefix the value columns, add the
        # presence flag (Dataset.rename_columns breaks on pandas blocks)
        def _do(batch: pa.Table, _p=prefix, _f=flag_name) -> pa.Table:
            cols = {key_col: batch[key_col]}
            for c in value_cols:
                cols[f"{_p}{c}"] = batch[c]
            cols[_f] = pa.array([1] * batch.num_rows, pa.int8())
            return pa.table(cols)

        return _do

    o = old.select_columns([key_col] + value_cols).map_batches(
        _pack_side("o_", "__in_old"), batch_format="pyarrow"
    )
    n = new.select_columns([key_col] + value_cols).map_batches(
        _pack_side("n_", "__in_new"), batch_format="pyarrow"
    )

    joined = hash_bucket_join(
        o,
        n,
        on=key_col,
        how="full_outer",
        num_buckets=num_buckets,
        output_columns=[key_col, "__in_old", "__in_new"]
        + [f"o_{c}" for c in value_cols]
        + [f"n_{c}" for c in value_cols],
    )

    def _classify(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                key_col: pa.array([], batch.schema.field(key_col).type
                                   if batch.num_columns else pa.int64()),
                "status": pa.array([], pa.string()),
            }
        )
        if batch.num_rows == 0:
            return empty
        added = pc.is_null(batch["__in_old"]).to_numpy(zero_copy_only=False)
        removed = pc.is_null(batch["__in_new"]).to_numpy(zero_copy_only=False)
        diff = None
        for c in value_cols:
            a, b = batch[f"o_{c}"], batch[f"n_{c}"]
            ne = pc.fill_null(pc.not_equal(a, b), False)
            null_mismatch = pc.xor(pc.is_null(a), pc.is_null(b))
            d = pc.or_(ne, null_mismatch).to_numpy(zero_copy_only=False)
            diff = d if diff is None else (diff | d)
        if diff is None:
            diff = np.zeros(batch.num_rows, dtype=bool)
        changed = (~added) & (~removed) & diff
        status = np.select(
            [added, removed, changed], ["added", "removed", "changed"], default=""
        )
        keep = status != ""
        return pa.table(
            {
                key_col: batch[key_col].combine_chunks()
                if isinstance(batch[key_col], pa.ChunkedArray)
                else batch[key_col],
                "status": pa.array(status, pa.string()),
            }
        ).filter(pa.array(keep))

    return joined.map_batches(_classify, batch_format="pyarrow")


def skew_aware_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str,
    output_columns: list[str],
    right_on: str | None = None,
    hot_threshold: int = 100_000,
    num_buckets: int = 16,
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
) -> ray.data.Dataset:
    """Inner join that survives hot keys: keys whose LEFT frequency
    reaches ``hot_threshold`` take a BROADCAST path (their right-side
    rows ship once via ``ray.put`` and join map-side, so the hot key
    never concentrates in one shuffle bucket), everything else takes the
    ordinary :func:`hash_bucket_join`. Row-for-row identical to a plain
    inner join — the split is an execution detail, which is exactly what
    makes it gateable against a plain SQL JOIN.

    The frequency scan is a combiner-first count (one partial row per
    distinct key per batch), so the pre-pass shuffle is bounded by
    |distinct keys|; the hot set itself is driver-side but bounded BY
    DEFINITION (≤ rows/hot_threshold keys can be hot — the
    assemble.py hot-id discipline). The broadcast payload is the hot
    keys' right-side rows: small when the right side is a dimension
    table; for hot-on-both-sides workloads lower ``hot_threshold``
    consciously — the broadcast is the documented trade."""
    from ray.data.aggregate import Sum

    right_on = right_on or on
    lsch = left_schema or _arrow_schema(left)
    rsch = right_schema or _arrow_schema(right)

    def _key_partial(batch: pa.Table) -> pa.Table:
        out = pa.TableGroupBy(batch.select([on]), on).aggregate([([], "count_all")])
        return out.rename_columns([on, "__n"])

    counts = (
        left.map_batches(_key_partial, batch_format="pyarrow")
        .groupby(on)
        .aggregate(Sum("__n", alias_name="__n"))
    )
    hot_tab = counts.map_batches(
        lambda b: b.filter(pc.greater_equal(b["__n"], hot_threshold)).select([on]),
        batch_format="pyarrow",
    ).to_pandas()
    # an all-cold filter drops the schema (zero-column empty frame)
    hot_keys = set(hot_tab[on].tolist()) if on in hot_tab.columns else set()

    if not hot_keys:
        return hash_bucket_join(
            left, right, on=on, right_on=right_on, output_columns=output_columns,
            num_buckets=num_buckets, left_schema=lsch, right_schema=rsch,
        )

    import ray as _ray

    hot_arr = pa.array(sorted(hot_keys), lsch.field(on).type)

    def _side_filter(key_col: str, keep_hot: bool):
        def f(batch: pa.Table) -> pa.Table:
            mask = pc.is_in(batch[key_col], value_set=hot_arr)
            return batch.filter(mask if keep_hot else pc.invert(mask))

        return f

    # cold path: the ordinary bucketed shuffle join
    cold = hash_bucket_join(
        left.map_batches(_side_filter(on, False), batch_format="pyarrow"),
        right.map_batches(_side_filter(right_on, False), batch_format="pyarrow"),
        on=on, right_on=right_on, output_columns=output_columns,
        num_buckets=num_buckets, left_schema=lsch, right_schema=rsch,
    )

    # hot path: right-side rows of hot keys broadcast once, joined map-side
    hot_right = (
        right.map_batches(_side_filter(right_on, True), batch_format="pyarrow")
        .to_pandas()
    )
    hot_ref = _ray.put(hot_right)
    lnames = [f.name for f in lsch]
    out_types = {f.name: f.type for f in rsch}
    out_types.update({f.name: f.type for f in lsch})
    out_schema = pa.schema([(c, out_types[c]) for c in output_columns])

    def _map_join(batch: pa.Table) -> pa.Table:
        import pandas as pd

        lhot = batch.filter(pc.is_in(batch[on], value_set=hot_arr))
        if lhot.num_rows == 0:
            return out_schema.empty_table()
        rdf = _ray.get(hot_ref)
        merged = lhot.to_pandas().merge(
            rdf, left_on=on, right_on=right_on,
            suffixes=("", "__r"),
        )
        out = pa.Table.from_pandas(
            merged[output_columns], preserve_index=False
        )
        return out.cast(out_schema)

    hot = left.map_batches(_map_join, batch_format="pyarrow")
    return cold.union(hot)
