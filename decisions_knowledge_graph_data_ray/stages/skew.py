"""Skew-safe grouped-aggregation primitives.

The engine's flagship pipeline already defuses hot-key skew bespoke
(``stages/assemble.py``: salted two-phase assembly, hot-aware routing).
This module names the two underlying patterns as reusable primitives so
any new grouped stage gets the 100-TB shape for free:

- ``combiner_aggregate``: algebraic grouped aggregates (count / sum /
  min / max / mean) with a per-batch Arrow combiner BEFORE the shuffle.
  Each batch collapses to at most one partial row per distinct key in
  that batch, so the all-to-all exchange moves ``O(distinct keys x
  batches)`` narrow rows instead of every input row — and a hot key
  contributes ONE row per batch, which is exactly why combiner-first
  aggregation is also the skew fix for algebraic aggregates (no salt
  needed; the combiner IS the salt).

- ``salted_map_groups``: the generic two-phase plan for HOLISTIC
  per-group kernels (ones Ray's ``AggregateFn`` can't express) that
  still decompose into ``partial_fn`` + ``merge_fn``. Rows are salted by
  a caller-named column (hash % n_salts — deterministic across
  partitionings, so results are layout-invariant), phase 1 runs
  ``partial_fn`` per (key, salt) group, phase 2 merges the partials per
  key. A key with 10M rows becomes ``n_salts`` phase-1 groups that land
  on different partitions; only its (small) partial rows re-shuffle.

Contract for ``salted_map_groups``: the final result must not depend on
HOW rows were split across salts — ``merge_fn`` must be insensitive to
partial boundaries (true for associative/commutative reductions and for
kernels that re-sort internally, like document assembly's turn order).

Reference parity: the reference's run-summary and mapping-stats
aggregations (SURVEY.md §2.5) are single-process reduces; these
primitives are their distributed generalization.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data
from ray.data.aggregate import Max, Min, Sum

from ..functions.hashing import bucket_ids

_OPS = ("count", "sum", "min", "max", "mean")


def combiner_aggregate(
    ds: ray.data.Dataset,
    keys: list[str],
    specs: dict[str, tuple[str, str | None]],
) -> ray.data.Dataset:
    """Grouped algebraic aggregates with a per-batch combiner.

    ``specs`` maps output column name -> ``(op, column)`` with op in
    ``{"count","sum","min","max","mean"}`` (``count`` ignores the column
    and counts rows, matching ``ray.data.aggregate.Count`` and SQL
    ``count(*)``; sum/min/max/mean skip nulls, matching Arrow and SQL).

    Plan: map_batches(Arrow ``TableGroupBy`` partials, zero-copy) →
    one small ``groupby(keys)`` over partial rows (Sum of sums/counts,
    Min of mins, Max of maxs) → vectorized finalize (mean = sum/count).
    Output columns: ``keys + list(specs)``.
    """
    for out, (op, _col) in specs.items():
        if op not in _OPS:
            raise ValueError(f"unknown op {op!r} for {out!r} (want one of {_OPS})")

    # partial columns needed, deduplicated: count-rows partial, and per
    # source column the (sum, valid-count, min, max) partials actually used
    need_rowcount = any(op == "count" for op, _ in specs.values())
    per_col: dict[str, set] = {}
    for _out, (op, col) in specs.items():
        if op == "count":
            continue
        per_col.setdefault(col, set()).add(op)
        if op == "mean":
            per_col[col].update(("sum", "valid"))

    def _partials(batch: pa.Table) -> pa.Table:
        cols = list(keys)
        aggs: list[tuple[str, str]] = []
        renames: list[str] = list(keys)
        if need_rowcount:
            # count(*) == count over any key column (keys are non-null
            # group labels by construction of the groupby semantics; use
            # a dedicated all-ones column to count rows null-safely)
            batch = batch.append_column("__one", pa.array([1] * batch.num_rows, pa.int8()))
            aggs.append(("__one", "sum"))
            renames.append("__n_rows")
        for col, ops in sorted(per_col.items()):
            for op in sorted(ops & {"sum", "min", "max"}):
                aggs.append((col, op))
                renames.append(f"__{op}_{col}")
            if "valid" in ops:
                aggs.append((col, "count"))  # arrow count mode: only_valid
                renames.append(f"__valid_{col}")
        needed = list(dict.fromkeys(cols + [a for a, _ in aggs]))
        grouped = pa.TableGroupBy(batch.select(needed), keys).aggregate(aggs)
        # arrow names results "<col>_<op>" and puts keys LAST; restore order
        out_cols = {}
        for k in keys:
            out_cols[k] = grouped[k]
        i = len(keys)
        for col, op in aggs:
            out_cols[renames[i]] = grouped[f"{col}_{op}"]
            i += 1
        return pa.table(out_cols)

    partials = ds.map_batches(_partials, batch_format="pyarrow")

    merge_aggs = []
    if need_rowcount:
        merge_aggs.append(Sum("__n_rows", alias_name="__n_rows"))
    for col, ops in sorted(per_col.items()):
        for op in sorted(ops):
            pcol = f"__{op}_{col}"
            if op == "sum" or op == "valid":
                merge_aggs.append(Sum(pcol, alias_name=pcol))
            elif op == "min":
                merge_aggs.append(Min(pcol, alias_name=pcol))
            elif op == "max":
                merge_aggs.append(Max(pcol, alias_name=pcol))
    merged = partials.groupby(keys).aggregate(*merge_aggs)

    out_names = list(specs)

    def _finalize(batch: pa.Table) -> pa.Table:
        cols = {k: batch[k] for k in keys}
        for out, (op, col) in specs.items():
            if op == "count":
                cols[out] = batch["__n_rows"].cast(pa.int64())
            elif op == "mean":
                import pyarrow.compute as pc

                cols[out] = pc.divide(
                    batch[f"__sum_{col}"].cast(pa.float64()),
                    batch[f"__valid_{col}"].cast(pa.float64()),
                )
            else:
                cols[out] = batch[f"__{op}_{col}"]
        return pa.table(cols)

    out = merged.map_batches(_finalize, batch_format="pyarrow")
    return out.select_columns(keys + out_names)


def grouping_sets_aggregate(
    ds: ray.data.Dataset,
    sets: list[list[str]],
    specs: dict[str, tuple[str, str | None]],
    sentinels: dict[str, object],
) -> ray.data.Dataset:
    """Multi-level grouped aggregates (SQL ``GROUPING SETS`` / ``ROLLUP`` /
    ``CUBE``) in ONE pass over the data — an operator Ray Data has no
    native analogue for.

    ``sets`` lists the grouping sets (e.g. rollup(a,b) = ``[[a,b],[a],[]]``);
    ``specs`` is :func:`combiner_aggregate`'s op map; ``sentinels`` gives,
    for every column in any set, the value standing in for "all" at levels
    that don't group by it (explicit sentinels, not NULLs, so the result
    is a plain typed table and the oracle can match it exactly).

    Scale shape: a sentinel-fill map runs per grouping set over the SAME
    streamed input (each set's combiner collapses batches before its
    shuffle — the per-batch partials make each pass cheap), and the level
    results union. Levels with fewer keys shuffle strictly fewer partial
    rows, so the total exchange is bounded by the finest level × number
    of levels. A single-pass shared-combiner variant would save reading
    the input ``len(sets)`` times; Ray Data caches the upstream blocks in
    the object store, so the re-reads are object-store-local, not
    storage reads.
    """
    all_keys: list[str] = []
    for s in sets:
        for c in s:
            if c not in all_keys:
                all_keys.append(c)
    for c in all_keys:
        if c not in sentinels:
            raise ValueError(f"no sentinel for rollup column {c!r}")

    out: ray.data.Dataset | None = None
    for level, gset in enumerate(sets):
        fixed = [c for c in all_keys if c not in gset]

        def _fill(batch: pa.Table, _fixed=tuple(fixed), _level=level) -> pa.Table:
            cols = {}
            for name in batch.column_names:
                cols[name] = (
                    pa.array(
                        [sentinels[name]] * batch.num_rows,
                        type=batch.schema.field(name).type,
                    )
                    if name in _fixed
                    else batch[name]
                )
            cols["grouping_level"] = pa.array([_level] * batch.num_rows, pa.int64())
            return pa.table(cols)

        leveled = ds.map_batches(_fill, batch_format="pyarrow")
        agg = combiner_aggregate(leveled, all_keys + ["grouping_level"], specs)
        out = agg if out is None else out.union(agg)
    return out


def salted_map_groups(
    ds: ray.data.Dataset,
    keys: list[str],
    partial_fn,
    merge_fn,
    salt_col: str,
    n_salts: int = 16,
) -> ray.data.Dataset:
    """Two-phase ``map_groups`` for holistic kernels under key skew.

    - phase 1: rows gain ``_salt = hash(salt_col) % n_salts`` (seeded,
      deterministic across partitionings → layout-invariant results),
      then ``groupby(keys + [_salt]).map_groups(partial_fn)``;
    - phase 2: ``groupby(keys).map_groups(merge_fn)`` over the partials.

    ``partial_fn`` receives a pandas frame of ONE (key, salt) group
    (including the ``_salt`` column) and must return rows carrying the
    key columns; ``merge_fn`` receives one key's partial rows. The final
    result must not depend on how rows were split across salts.
    """

    def _add_salt(batch: pa.Table) -> pa.Table:
        salts = bucket_ids(batch[salt_col], n_salts, seed=7)
        return batch.append_column("_salt", salts)

    salted = ds.map_batches(_add_salt, batch_format="pyarrow")
    partials = salted.groupby(keys + ["_salt"]).map_groups(partial_fn, batch_format="pandas")
    return partials.groupby(keys).map_groups(merge_fn, batch_format="pandas")


_STATE_OPS = ("count", "sum", "min", "max")


def aggregate_state(
    ds: ray.data.Dataset,
    keys: list[str],
    specs: dict[str, tuple[str, str | None]],
) -> ray.data.Dataset:
    """The MERGEABLE form of :func:`combiner_aggregate` for incremental
    maintenance: compute the per-key aggregate STATE of one partition of
    the data (a snapshot, a day, a delta) so totals update by merging
    states — never by re-reading old raw data. For the supported ops
    (count/sum/min/max) state == result with a known merge rule (counts
    and sums merge by Sum, min by Min, max by Max); mean is intentionally
    unsupported — persist sum + count and divide downstream.

    Same output schema as ``combiner_aggregate(ds, keys, specs)``.
    """
    for out, (op, _c) in specs.items():
        if op not in _STATE_OPS:
            raise ValueError(
                f"{op!r} ({out!r}) is not mergeable state; use {_STATE_OPS}"
                " (mean = sum/count downstream)"
            )
    return combiner_aggregate(ds, keys, specs)


def merge_aggregate_states(
    states: "list[ray.data.Dataset]",
    keys: list[str],
    specs: dict[str, tuple[str, str | None]],
) -> ray.data.Dataset:
    """Merge :func:`aggregate_state` tables (base ⊕ deltas) into the
    aggregate of the union of their inputs. The shuffle moves only state
    rows (|keys| per state table) — the incremental-update shape for a
    100-TB corpus where yesterday's totals are a table and today's delta
    is the only raw data read."""
    from ray.data.aggregate import Max, Min, Sum

    out = states[0]
    for s in states[1:]:
        out = out.union(s)
    aggs = []
    for name, (op, _col) in specs.items():
        if op in ("count", "sum"):
            aggs.append(Sum(name, alias_name=name))
        elif op == "min":
            aggs.append(Min(name, alias_name=name))
        elif op == "max":
            aggs.append(Max(name, alias_name=name))
        else:
            raise ValueError(f"{op!r} is not mergeable state")
    return out.groupby(keys).aggregate(*aggs)


def group_mode(
    ds: ray.data.Dataset,
    key_cols: list[str],
    value_col: str,
    out_col: str = "mode_value",
) -> ray.data.Dataset:
    """Deterministic per-key MODE: the most frequent ``value_col`` per key,
    ties broken by smallest value — the canonical-record pick of entity
    resolution (most-observed name/court/label per entity) where SQL
    ``mode()`` is tie-nondeterministic and therefore ungateable.

    Scale shape: a per-batch ``(key, value)`` count combiner bounds the
    shuffle by distinct pairs per batch, a groupby Sum merges, then one
    argmax scan per key over its ≤ |distinct values| rows (``map_groups``).
    Output: ``(key..., mode_value, n_mode, n_rows)``."""
    import pandas as pd

    from ray.data.aggregate import Sum

    cols = key_cols + [value_col]

    def _vc(batch: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(batch.select(cols), cols).aggregate([([], "count_all")])
        return g.rename_columns(cols + ["n"])

    counts = (
        ds.map_batches(_vc, batch_format="pyarrow")
        .groupby(cols)
        .aggregate(Sum("n", alias_name="n"))
    )

    def _pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["n", value_col], ascending=[False, True])
        top = g.iloc[0]
        row = {k: [top[k]] for k in key_cols}
        row[out_col] = [top[value_col]]
        row["n_mode"] = [int(top["n"])]
        row["n_rows"] = [int(g["n"].sum())]
        return pd.DataFrame(row)

    return counts.groupby(key_cols).map_groups(_pick, batch_format="pandas")


def abc_classification(
    ds: ray.data.Dataset,
    key_cols: list[str],
    value_col: str,
    a_pct: int = 80,
    b_pct: int = 95,
    bucket_width: int = 1 << 20,
) -> ray.data.Dataset:
    """ABC / Pareto classification: per-key integer totals ranked by
    (value desc, key asc) and classified by INCLUSIVE cumulative share —
    'A' while cum·100 ≤ a_pct·total, 'B' while ≤ b_pct·total, else 'C'
    (all integer arithmetic — no float ranks). The 80/20 curation cut a
    data pipeline runs on contributors, sources, or domains.

    Distributed-scan shape (the pack_sequences discipline — NO global
    sort): per-key totals via :func:`combiner_aggregate`; keys bucket by
    VALUE RANGE (``bucket = value // bucket_width``, equal values can
    never straddle a bucket), per-bucket sums collect to a driver-side
    carry table bounded by |value range|/bucket_width; the within-bucket
    inclusive cumsum + classification runs per bucket in one cogroup.

    Output: ``(key..., value, cum_value, abc_class)``."""
    import numpy as np
    import pandas as pd

    from ray.data.aggregate import Sum

    totals = combiner_aggregate(ds, key_cols, {"__v": ("sum", value_col)})

    def _with_bucket(batch: pa.Table) -> pa.Table:
        b = np.asarray(batch["__v"], dtype=np.int64) // bucket_width
        return batch.append_column("__bucket", pa.array(b, pa.int64()))

    bucketed = totals.map_batches(_with_bucket, batch_format="pyarrow").materialize()

    def _bsum(batch: pa.Table) -> pa.Table:
        df = batch.select(["__bucket", "__v"]).to_pandas()
        g = df.groupby("__bucket", as_index=False)["__v"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    btab = (
        bucketed.map_batches(_bsum, batch_format="pyarrow")
        .groupby("__bucket")
        .aggregate(Sum("__v", alias_name="__v"))
        .to_pandas()
    )
    # value-descending scan order == bucket-descending order
    btab = btab.sort_values("__bucket", ascending=False).reset_index(drop=True)
    grand = int(btab["__v"].sum())
    offs = btab["__v"].cumsum().shift(fill_value=0).astype("int64")
    carry = dict(zip(btab["__bucket"].astype(int), offs))
    carry_ref = ray.put(carry)

    def _classify(g: pd.DataFrame) -> pd.DataFrame:
        import ray as _ray

        c = _ray.get(carry_ref)
        g = g.sort_values(["__v"] + key_cols, ascending=[False] + [True] * len(key_cols))
        cum = int(c.get(int(g["__bucket"].iloc[0]), 0)) + g["__v"].cumsum()
        cls = np.where(
            cum * 100 <= a_pct * grand, "A",
            np.where(cum * 100 <= b_pct * grand, "B", "C"),
        )
        out = g[key_cols].copy()
        out[value_col] = g["__v"].to_numpy()
        out["cum_value"] = cum.to_numpy()
        out["abc_class"] = cls
        return out

    return bucketed.groupby("__bucket").map_groups(_classify, batch_format="pandas")


def largest_remainder_allocate(
    ds: ray.data.Dataset,
    key_col: str,
    order_col: str,
    weight_col: str,
    total_col: str,
) -> ray.data.Dataset:
    """Largest-remainder (Hamilton) proration: distribute each key's
    integer ``total_col`` across its rows proportional to integer
    ``weight_col`` so the parts sum EXACTLY to the total —
    ``alloc_i = floor(T·w_i/W)`` plus one extra unit to the R rows with
    the largest remainders (R = T − Σfloor; remainder ties break by
    ``order_col`` asc). The standard exact-allocation rule behind
    invoice line-item tax splits, budget distribution, and seat
    apportionment — all-integer arithmetic, so the DuckDB twin matches
    bit-for-bit. Degenerate W=0 keys assign the whole total to the
    first row by ``order_col``.

    Scale shape: ONE shuffle on the key; the per-group kernel is
    vectorized numpy (lexsort for the remainder ranking). Partitioning
    assumption: one key's rows fit a worker — group size here is an
    order's line count, bounded by business shape (same contract as
    sessionize/asof). Output: ``(key, order, weight, alloc)`` with the
    input column names preserved plus ``alloc``."""
    import numpy as np
    import pandas as pd

    def _alloc(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_col).reset_index(drop=True)
        w = g[weight_col].to_numpy(dtype=np.int64)
        T = int(g[total_col].iloc[0])
        W = int(w.sum())
        n = len(w)
        if W == 0:
            alloc = np.zeros(n, dtype=np.int64)
            alloc[0] = T
        else:
            prod = T * w  # ≤ ~2^47 for cent-scale inputs; int64-safe
            base = prod // W
            rem = prod % W
            r_extra = T - int(base.sum())
            rank = np.lexsort((np.arange(n), -rem))
            bump = np.zeros(n, dtype=np.int64)
            bump[rank[:r_extra]] = 1
            alloc = base + bump
        out = g[[key_col, order_col, weight_col]].copy()
        out["alloc"] = alloc
        return out

    return ds.groupby(key_col).map_groups(_alloc, batch_format="pandas")
