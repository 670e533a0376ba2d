"""Data-profiling and skew diagnostics over arbitrary tables.

The operators an engineer runs BEFORE sizing a 100-TB job:

- profile_columns: per-column row/null counts, min/max, and an HLL
  register digest for approximate distinct — the schema-profiling pass
  that decides partitioning keys and broadcast-vs-shuffle joins.
- key_skew_histogram: frequency-of-frequencies of a key column — the skew
  diagnostic that justifies (or rules out) hot-key salting before a
  groupby/join (the engine's salted assembly path exists precisely for the
  heavy tail this histogram exposes).

Scale shapes: every pass is a per-batch combiner whose partial output is
bounded by columns × batches (profile) or distinct-keys-per-batch (skew),
never by row count; merges are tiny groupbys or a driver-side reduce over
the bounded partials.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data


def profile_columns(
    ds: ray.data.Dataset,
    columns: list[str],
    b: int = 6,
) -> "pandas.DataFrame":  # noqa: F821 — annotation only
    """Profile ``columns`` (integer or string typed): one output row per
    column with ``(column, n_rows, n_nulls, min_value, max_value,
    hll_nonzero, hll_sum_rho, hll_max_rho)``. min/max are computed in the
    column's NATIVE type (so 9 < 10 for ints) and rendered to strings only
    after the merge; the HLL digests summarize the distinct-value sketch of
    ``str(value)`` (see stages/cardinality.py — int-exact, the estimator is
    a pure function of the registers).

    Two streaming passes, each with a bounded partial:
      1. stats — one partial row per (column, batch); the driver reduces
         columns × batches rows (min/max merged natively per dtype);
      2. distinct — cells explode to (column, str(value)) rows (a pure
         map) feeding ``hll_registers``; the shuffle moves at most
         columns × 2^b int rows per batch.

    Returns a small pandas frame (one row per column) — a diagnostic
    result, bounded by definition.
    """
    import pandas as pd

    from .cardinality import hll_registers

    def _stats(batch: pa.Table) -> pa.Table:
        out: dict[str, list] = {
            "column": [], "n_rows": [], "n_nulls": [],
            "int_min": [], "int_max": [], "str_min": [], "str_max": [],
        }
        for col in columns:
            arr = batch[col]
            vals = [v for v in arr.to_pylist() if v is not None]
            is_str = pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type)
            out["column"].append(col)
            out["n_rows"].append(len(arr))
            out["n_nulls"].append(len(arr) - len(vals))
            out["int_min"].append(None if (is_str or not vals) else min(vals))
            out["int_max"].append(None if (is_str or not vals) else max(vals))
            out["str_min"].append(min(vals) if (is_str and vals) else None)
            out["str_max"].append(max(vals) if (is_str and vals) else None)
        return pa.table(
            {
                "column": pa.array(out["column"], pa.string()),
                "n_rows": pa.array(out["n_rows"], pa.int64()),
                "n_nulls": pa.array(out["n_nulls"], pa.int64()),
                "int_min": pa.array(out["int_min"], pa.int64()),
                "int_max": pa.array(out["int_max"], pa.int64()),
                "str_min": pa.array(out["str_min"], pa.string()),
                "str_max": pa.array(out["str_max"], pa.string()),
            }
        )

    parts = (
        ds.select_columns(columns)
        .map_batches(_stats, batch_format="pyarrow")
        .to_pandas()  # columns × batches rows — bounded
    )
    # a (column, batch) partial may be all-null for the str/int twin of the
    # other dtype (or for an empty block), so the merge must drop NaN before
    # comparing — pandas' object-dtype min would otherwise compare str vs NaN
    def _nullsafe(how):
        return lambda s: (s.dropna().agg(how) if s.notna().any() else None)

    agg = parts.groupby("column", as_index=False).agg(
        n_rows=("n_rows", "sum"),
        n_nulls=("n_nulls", "sum"),
        int_min=("int_min", _nullsafe("min")),
        int_max=("int_max", _nullsafe("max")),
        str_min=("str_min", _nullsafe("min")),
        str_max=("str_max", _nullsafe("max")),
    )

    def _render(row, lo_hi):
        iv, sv = row[f"int_{lo_hi}"], row[f"str_{lo_hi}"]
        if pd.notna(iv):
            return str(int(iv))
        return sv if pd.notna(sv) else None

    agg["min_value"] = agg.apply(lambda r: _render(r, "min"), axis=1)
    agg["max_value"] = agg.apply(lambda r: _render(r, "max"), axis=1)

    def _explode(batch: pa.Table) -> pa.Table:
        cols_out, vals_out = [], []
        for col in columns:
            for v in batch[col].to_pylist():
                if v is not None:
                    cols_out.append(col)
                    vals_out.append(str(v))
        return pa.table(
            {
                "column": pa.array(cols_out, pa.string()),
                "value": pa.array(vals_out, pa.string()),
            }
        )

    kv = ds.select_columns(columns).map_batches(_explode, batch_format="pyarrow")
    regs = hll_registers(kv, key_col="value", group_col="column", b=b).to_pandas()
    dig = regs.groupby("column", as_index=False).agg(
        hll_nonzero=("rho", "size"),
        hll_sum_rho=("rho", "sum"),
        hll_max_rho=("rho", "max"),
    )

    out = agg.merge(dig, on="column", how="left")
    for c in ("hll_nonzero", "hll_sum_rho", "hll_max_rho"):
        out[c] = out[c].fillna(0).astype("int64")
    return (
        out[
            [
                "column", "n_rows", "n_nulls", "min_value", "max_value",
                "hll_nonzero", "hll_sum_rho", "hll_max_rho",
            ]
        ]
        .sort_values("column")
        .reset_index(drop=True)
    )


def rank_transform(
    ds: ray.data.Dataset,
    value_col: str,
    out_prefix: str = "rank",
) -> ray.data.Dataset:
    """Global rank of every row by an integer ``value_col`` WITHOUT a
    global sort: adds ``{out_prefix}_lt`` (rows with a strictly smaller
    value) and ``{out_prefix}_eq`` (rows tied at the value, inclusive) —
    the exact numerators of min-rank / max-rank / percentile, kept integer
    so the oracle is exact (divide by n_rows downstream for the float
    percentile).

    Shape: a per-batch value-count combiner → one small groupby → the
    value-count table collected and turned into a CDF on the driver —
    bounded by |distinct values|, which for the lengths/scores this is
    meant for is orders below row count (the partitioning assumption;
    don't use it on near-unique keys, that's ``deterministic_shuffle``'s
    sort) — then broadcast once and a pure map adds the two columns."""
    import numpy as np
    from ray.data.aggregate import Sum

    def _vc(batch: pa.Table) -> pa.Table:
        from collections import Counter

        c = Counter(batch[value_col].to_pylist())
        ks = sorted(c)
        return pa.table(
            {
                value_col: pa.array(ks, pa.int64()),
                "n": pa.array([c[k] for k in ks], pa.int64()),
            }
        )

    vc = (
        ds.select_columns([value_col])
        .map_batches(_vc, batch_format="pyarrow")
        .groupby(value_col)
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values(value_col)
        .reset_index(drop=True)
    )
    vals = vc[value_col].to_numpy(dtype="int64")
    counts = vc["n"].to_numpy(dtype="int64")
    less = np.concatenate(([0], counts.cumsum()[:-1]))
    cdf_ref = ray.put({"vals": vals, "less": less, "counts": counts})

    def _rank(batch: pa.Table) -> pa.Table:
        from .broadcast import broadcast_cache

        cdf = broadcast_cache(cdf_ref)
        x = np.asarray(batch[value_col], dtype=np.int64)
        idx = np.searchsorted(cdf["vals"], x)
        return batch.append_column(
            f"{out_prefix}_lt", pa.array(cdf["less"][idx], pa.int64())
        ).append_column(f"{out_prefix}_eq", pa.array(cdf["counts"][idx], pa.int64()))

    return ds.map_batches(_rank, batch_format="pyarrow")


def key_skew_histogram(
    ds: ray.data.Dataset,
    key_col: str,
) -> ray.data.Dataset:
    """Frequency-of-frequencies of ``key_col``: one row per observed
    per-key count ``(key_count, n_keys)``, ordered by key_count. A heavy
    tail here is the signal to salt before grouping/joining on the key.

    Two bounded shuffles: per-batch partial key counts (combiner — one int
    row per distinct key per batch) → groupby Sum for exact per-key
    counts, then the same combiner shape over the counts themselves (one
    row per distinct count per block, bounded by ~log of the max count in
    practice)."""
    from ray.data.aggregate import Sum

    def _partial_counts(batch: pa.Table) -> pa.Table:
        from collections import Counter

        c = Counter(batch[key_col].to_pylist())
        ks = list(c)
        return pa.table(
            {
                key_col: pa.array(ks),
                "key_count": pa.array([c[k] for k in ks], pa.int64()),
            }
        )

    per_key = (
        ds.select_columns([key_col])
        .map_batches(_partial_counts, batch_format="pyarrow")
        .groupby(key_col)
        .aggregate(Sum("key_count", alias_name="key_count"))
    )

    def _partial_fof(batch: pa.Table) -> pa.Table:
        from collections import Counter

        c = Counter(batch["key_count"].to_pylist())
        ks = sorted(c)
        return pa.table(
            {
                "key_count": pa.array(ks, pa.int64()),
                "n_keys": pa.array([c[k] for k in ks], pa.int64()),
            }
        )

    return (
        per_key.map_batches(_partial_fof, batch_format="pyarrow")
        .groupby("key_count")
        .aggregate(Sum("n_keys", alias_name="n_keys"))
    )


def group_quantiles(
    ds: ray.data.Dataset,
    value_col: str,
    group_col: str,
    qs: tuple = (0.25, 0.5, 0.75, 0.9),
) -> ray.data.Dataset:
    """EXACT per-group discrete quantiles (``percentile_disc`` semantics:
    the 1-indexed ``ceil(q·n)``-th value in sorted order — an actual data
    element, so integer columns stay integer-exact for the SQL oracle;
    the ceil is computed on EXACT RATIONALS, never float).

    No global sort: a (group, value) count combiner bounds the shuffle by
    distinct values per batch, a small ``groupby Sum`` merges, and each
    group's quantiles come from one CDF scan over its ≤ |distinct| rows
    (``map_groups``). The documented assumption of the value-CDF family
    (see :func:`rank_transform`): distinct values per group must fit a
    worker — true for lengths/scores/counts; near-unique values belong to
    a sort-based path.

    Output: one row per group — ``(group_col, n, q25, q50, ...)`` with
    column names ``q{100·q:g}``."""
    from fractions import Fraction

    import numpy as np
    import pandas as pd

    from ray.data.aggregate import Sum

    fracs = [Fraction(q).limit_denominator(10_000) for q in qs]
    names = [f"q{round(q * 100):d}" for q in qs]

    def _vc(batch: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(
            batch.select([group_col, value_col]), [group_col, value_col]
        ).aggregate([([], "count_all")])
        return g.rename_columns([group_col, value_col, "n"])

    counts = (
        ds.map_batches(_vc, batch_format="pyarrow")
        .groupby([group_col, value_col])
        .aggregate(Sum("n", alias_name="n"))
    )

    def _scan(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values(value_col)
        cum = g["n"].cumsum().to_numpy()
        n = int(cum[-1])
        row = {group_col: [g[group_col].iloc[0]], "n": [n]}
        vals = g[value_col].to_numpy()
        for name, f in zip(names, fracs):
            # 1-indexed ceil(q*n) on exact rationals
            idx = -((-f.numerator * n) // f.denominator)
            pos = int(np.searchsorted(cum, idx, side="left"))
            row[name] = [vals[pos]]
        return pd.DataFrame(row)

    return counts.groupby(group_col).map_groups(_scan, batch_format="pandas")


def bucket_by_group_quantiles(
    ds: ray.data.Dataset,
    value_col: str,
    group_col: str,
    id_col: str,
) -> ray.data.Dataset:
    """Per-group quartile binning (feature bucketing / curriculum tiers):
    each row is labeled q1..q4 by comparing its value to ITS GROUP's exact
    q25/q50/q75 (:func:`group_quantiles` — percentile_disc semantics, so
    the cutoffs are actual data values and the comparison is integer-exact).

    Scale shape: the quantile table is one row per group (bounded by
    |groups|, collected + ``ray.put`` broadcast); the corpus streams
    through a pure map. ``q1``: value <= q25, ``q2``: <= q50, ``q3``:
    <= q75, ``q4``: above."""
    import numpy as np

    import ray as _ray

    q = group_quantiles(ds, value_col=value_col, group_col=group_col).to_pandas()
    cuts_ref = _ray.put(
        {r[group_col]: (r["q25"], r["q50"], r["q75"]) for _, r in q.iterrows()}
    )

    def _label(batch: pa.Table) -> pa.Table:
        cuts = _ray.get(cuts_ref)
        vals = batch[value_col].to_numpy(zero_copy_only=False)
        labels = []
        for g, v in zip(batch[group_col].to_pylist(), vals):
            q25, q50, q75 = cuts[g]
            labels.append(
                "q1" if v <= q25 else "q2" if v <= q50 else "q3" if v <= q75 else "q4"
            )
        return pa.table(
            {
                id_col: batch[id_col],
                group_col: batch[group_col],
                value_col: batch[value_col],
                "bucket": pa.array(labels, pa.string()),
            }
        )

    return ds.map_batches(_label, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Declarative constraint validation (the Deequ/Great-Expectations surface):
# the acceptance gate a training-data pipeline runs on every ingested
# partition before letting it into the corpus.
# ---------------------------------------------------------------------------

_ROW_RULES = ("not_null", "in_set", "range", "regex")


def validate_constraints(
    ds: ray.data.Dataset,
    rules: list[dict],
) -> ray.data.Dataset:
    """Per-rule violation counts over a declarative rule list.

    Each rule is a dict with ``name``, ``column``, ``kind`` and
    kind-specific params:

    - ``{"kind": "not_null"}`` — value must be non-null;
    - ``{"kind": "in_set", "values": [...]}`` — closed vocabulary;
    - ``{"kind": "range", "lo": x, "hi": y}`` — inclusive numeric bounds
      (nulls don't violate range — compose with not_null to forbid them);
    - ``{"kind": "regex", "pattern": p}`` — full-match RE2-safe pattern
      (nulls don't violate);
    - ``{"kind": "unique"}`` — no duplicate values in the column.

    Output: one row per rule — ``(rule, kind, column, n_checked,
    n_violations)``.

    Scale shape: all row-level rules evaluate in ONE vectorized
    ``map_batches`` pass (pyarrow.compute kernels, partial counts per
    batch) merged by a tiny groupby — zero data shuffle. ``unique`` is
    the one rule that needs key co-location: a per-batch distinct-count
    combiner feeds a groupby over values, and ``n_violations = n_rows -
    n_distinct`` — the shuffle moves one narrow row per distinct value
    per batch (the exact-dedup shape, skew-safe because the combiner
    collapses in-batch duplicates first).
    """
    import re

    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    row_rules = [r for r in rules if r["kind"] in _ROW_RULES]
    uniq_rules = [r for r in rules if r["kind"] == "unique"]
    unknown = [r for r in rules if r["kind"] not in _ROW_RULES + ("unique",)]
    if unknown:
        raise ValueError(f"unknown constraint kinds: {[r['kind'] for r in unknown]}")

    parts: list[ray.data.Dataset] = []

    if row_rules:
        compiled = {
            r["name"]: re.compile(r["pattern"]) for r in row_rules if r["kind"] == "regex"
        }

        def _check(batch: pa.Table) -> pa.Table:
            names, kinds, cols, checked, viol = [], [], [], [], []
            for r in row_rules:
                col = batch[r["column"]]
                n = len(col)
                if r["kind"] == "not_null":
                    bad = col.null_count
                elif r["kind"] == "in_set":
                    ok = pc.is_in(col, value_set=pa.array(r["values"], col.type))
                    bad = n - col.null_count - (
                        pc.sum(ok.cast(pa.int64())).as_py() or 0
                    )
                elif r["kind"] == "range":
                    in_rng = pc.and_(
                        pc.greater_equal(col, r["lo"]), pc.less_equal(col, r["hi"])
                    )
                    bad = n - col.null_count - (
                        pc.sum(in_rng.cast(pa.int64())).as_py() or 0
                    )
                else:  # regex — python re on the decoded strings (compiled once
                    # per actor via the module-level closure; full-match)
                    pat = compiled[r["name"]]
                    bad = sum(
                        1
                        for v in col.to_pylist()
                        if v is not None and pat.fullmatch(v) is None
                    )
                names.append(r["name"])
                kinds.append(r["kind"])
                cols.append(r["column"])
                checked.append(n)
                viol.append(int(bad))
            return pa.table(
                {
                    "rule": pa.array(names, pa.string()),
                    "kind": pa.array(kinds, pa.string()),
                    "column": pa.array(cols, pa.string()),
                    "n_checked": pa.array(checked, pa.int64()),
                    "n_violations": pa.array(viol, pa.int64()),
                }
            )

        merged = (
            ds.map_batches(_check, batch_format="pyarrow")
            .groupby(["rule", "kind", "column"])
            .aggregate(
                Sum("n_checked", alias_name="n_checked"),
                Sum("n_violations", alias_name="n_violations"),
            )
        )
        parts.append(merged)

    for r in uniq_rules:
        col = r["column"]

        def _batch_distinct(batch: pa.Table, _col=col) -> pa.Table:
            vals = pc.drop_null(batch[_col]).unique()
            nn = len(batch[_col]) - batch[_col].null_count
            t = pa.table({"v": vals})
            t = t.append_column("__rows", pa.array([0] * len(vals), pa.int64()))
            # ride the row count on one extra row (v=null) so ONE pass
            # yields both n_distinct and n_checked
            extra = pa.table(
                {"v": pa.array([None], vals.type), "__rows": pa.array([nn], pa.int64())}
            )
            return pa.concat_tables([t, extra])

        dist = (
            ds.select_columns([col])
            .map_batches(_batch_distinct, batch_format="pyarrow")
            .groupby("v")
            .aggregate(Count(alias_name="__n"), Sum("__rows", alias_name="__rows"))
        )

        def _flags(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "__is_val": pc.is_valid(batch["v"]).cast(pa.int64()),
                    "__rows": batch["__rows"],
                }
            )

        # streaming scalar aggregate over the distinct table — the distinct
        # values themselves never reach the driver
        tot = dist.map_batches(_flags, batch_format="pyarrow").sum(
            on=["__is_val", "__rows"]
        )
        n_distinct = int(tot["sum(__is_val)"])
        n_checked = int(tot["sum(__rows)"])

        import pandas as pd

        parts.append(
            ray.data.from_pandas(
                pd.DataFrame(
                    {
                        "rule": [r["name"]],
                        "kind": ["unique"],
                        "column": [r["column"]],
                        "n_checked": pd.array([n_checked], dtype="int64"),
                        "n_violations": pd.array(
                            [n_checked - n_distinct], dtype="int64"
                        ),
                    }
                )
            )
        )

    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def referential_integrity(
    pairs: list[dict],
) -> ray.data.Dataset:
    """Cross-table foreign-key audit: for each declared relationship
    ``{"name", "child": Dataset, "child_key", "parent": Dataset,
    "parent_key"}``, count child rows whose key has no parent (ORPHANS —
    the violation) and parent rows never referenced by any child
    (UNREFERENCED — the coverage signal). One row per relationship:
    ``(rule, n_child, n_orphans, n_parents, n_unreferenced)``.

    Scale shape: each direction is one bucketed ANTI-join
    (``stages/joins.hash_bucket_join``) over single-key-column
    projections — both tables shuffle once as narrow key tables, counts
    stream back as scalars; neither key set is ever collected."""
    import pandas as pd

    from .joins import hash_bucket_join

    rows = []
    for p in pairs:
        child = p["child"].select_columns([p["child_key"]])
        parent = p["parent"].select_columns([p["parent_key"]])
        n_child = child.count()
        n_parents = parent.count()
        n_orphans = hash_bucket_join(
            child, parent, on=p["child_key"], right_on=p["parent_key"],
            how="left_anti", output_columns=[p["child_key"]],
        ).count()
        n_unref = hash_bucket_join(
            parent, child, on=p["parent_key"], right_on=p["child_key"],
            how="left_anti", output_columns=[p["parent_key"]],
        ).count()
        rows.append(
            {
                "rule": p["name"],
                "n_child": n_child,
                "n_orphans": n_orphans,
                "n_parents": n_parents,
                "n_unreferenced": n_unref,
            }
        )
    return ray.data.from_pandas(pd.DataFrame(rows))


def winsorize_by_group(
    ds: ray.data.Dataset,
    value_col: str,
    group_col: str,
    id_col: str,
    lo_q: float = 0.05,
    hi_q: float = 0.95,
) -> ray.data.Dataset:
    """Per-group percentile clipping (winsorization — the outlier-robust
    normalization step before length/score features feed a model): each
    row's value is clamped to its GROUP's exact [lo_q, hi_q] discrete
    percentiles (:func:`group_quantiles`, ``percentile_disc`` semantics —
    cutoffs are actual data values, so integer columns stay
    integer-exact for the SQL oracle).

    Scale shape: the cutoff table is one row per group (bounded by
    |groups|, collected + ``ray.put`` broadcast — the
    ``bucket_by_group_quantiles`` discipline); the corpus streams through
    a pure vectorized map, zero shuffle."""
    import numpy as np

    import ray as _ray

    names = [f"q{round(q * 100):d}" for q in (lo_q, hi_q)]
    q = group_quantiles(ds, value_col=value_col, group_col=group_col, qs=(lo_q, hi_q)).to_pandas()
    cuts_ref = _ray.put({r[group_col]: (r[names[0]], r[names[1]]) for _, r in q.iterrows()})

    def _clip(batch: pa.Table) -> pa.Table:
        cuts = _ray.get(cuts_ref)
        groups = batch[group_col].to_pylist()
        lo = np.array([cuts[g][0] for g in groups])
        hi = np.array([cuts[g][1] for g in groups])
        v = batch[value_col].to_numpy(zero_copy_only=False)
        clipped = np.minimum(np.maximum(v, lo), hi)
        return pa.table(
            {
                id_col: batch[id_col],
                group_col: batch[group_col],
                value_col: batch[value_col],
                f"{value_col}_winsorized": pa.array(clipped),
            }
        )

    return ds.map_batches(_clip, batch_format="pyarrow")


def distribution_drift_psi(
    base: ray.data.Dataset,
    current: ray.data.Dataset,
    value_col: str,
    group_col: str,
    vmin: float,
    width: float,
    nbins: int,
) -> ray.data.Dataset:
    """Per-group population-stability-index drift between two snapshots of
    the same column — the data-drift monitor a continuously-ingesting
    pipeline runs before letting a new partition into the corpus:
    ``PSI = Σ_bins (p_i - q_i) · ln(p_i / q_i)`` over a DECLARED fixed
    binning (``cardinality.histogram_registers`` edges; declared so the
    two sides are comparable across runs). Empty bins are Laplace-floored
    at one count so the log stays finite — the standard PSI practice.

    Scale shape: each snapshot reduces to its ≤ ``groups × nbins``
    register table (per-batch combiners, groupby Sum); the PSI fold runs
    per group over the two registers' union (``map_groups`` on the
    bounded sketch, never raw rows). Both sides of the hash gate
    evaluate the identical double tree in bin order (left fold), so the
    score is bit-exact.

    Output: ``(group, n_base, n_current, psi)``."""
    import pandas as pd

    from .cardinality import histogram_registers

    def _tag(ds: ray.data.Dataset, side: int) -> ray.data.Dataset:
        regs = histogram_registers(ds, value_col, group_col, vmin, width, nbins)
        return regs.map_batches(
            lambda b, _s=side: b.append_column(
                "side", pa.array([_s] * b.num_rows, pa.int64())
            ),
            batch_format="pyarrow",
        )

    both = _tag(base, 0).union(_tag(current, 1))

    def _psi(g: pd.DataFrame) -> pd.DataFrame:
        import math

        base_n = {int(r["bin"]): int(r["n"]) for _, r in g[g["side"] == 0].iterrows()}
        cur_n = {int(r["bin"]): int(r["n"]) for _, r in g[g["side"] == 1].iterrows()}
        nb = sum(base_n.values())
        nc = sum(cur_n.values())
        psi = 0.0
        # fold in bin order with Laplace-floored counts: the identical
        # (p-q)*ln(p/q) double term the SQL twin sums via list_reduce
        for b in sorted(set(base_n) | set(cur_n)):
            p = float(max(base_n.get(b, 0), 1)) / float(nb)
            q = float(max(cur_n.get(b, 0), 1)) / float(nc)
            psi = psi + (p - q) * math.log(p / q)
        return pd.DataFrame(
            {
                group_col: [g[group_col].iloc[0]],
                "n_base": [nb],
                "n_current": [nc],
                "psi": [psi],
            }
        )

    return both.groupby(group_col).map_groups(_psi, batch_format="pandas")


def zscore_outliers(
    ds: ray.data.Dataset,
    value_col: str,
    group_col: str,
    id_col: str,
    n_sigma: float = 3.0,
    scale: float = 100.0,
) -> ray.data.Dataset:
    """Per-group z-score outlier flags without any per-row float mean/std:
    values quantize to ints (``floor(v·scale + 0.5)``), the per-group
    moment state ``(n, Σx, Σx²)`` is EXACT int64 (an algebraic combiner —
    partition-invariant, mergeable), and the flag evaluates
    ``(n·x - S)² > n_sigma²·(n·Σx² - S²)`` — the |x-μ| > kσ inequality
    cleared of divisions. Both sides compute it in the identical double
    tree (the big products exceed 2⁵³, where double rounding is IEEE-
    deterministic, not value-exact — same tree ⟹ same bits ⟹ same flag).

    Scale shape: one tiny moment table (|groups| rows) broadcast via
    ``ray.put``; the corpus streams through a vectorized map — zero
    shuffle on the wide data. Output: ``(id, group, value, is_outlier)``."""
    import numpy as np

    import ray as _ray
    from ray.data.aggregate import Sum

    k2 = float(n_sigma) * float(n_sigma)

    def _q(batch: pa.Table) -> pa.Table:
        v = batch[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        x = np.floor(v * scale + 0.5).astype(np.int64)
        import pandas as pd

        df = pd.DataFrame({group_col: batch[group_col].to_pandas(), "x": x, "xx": x * x})
        out = df.groupby(group_col, sort=False).agg(
            n=("x", "size"), s=("x", "sum"), ss=("xx", "sum")
        ).reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    moments = (
        ds.select_columns([group_col, value_col])
        .map_batches(_q, batch_format="pyarrow")
        .groupby(group_col)
        .aggregate(Sum("n", alias_name="n"), Sum("s", alias_name="s"),
                   Sum("ss", alias_name="ss"))
        .to_pandas()
    )
    mom_ref = _ray.put(
        {r[group_col]: (float(r["n"]), float(r["s"]), float(r["ss"]))
         for _, r in moments.iterrows()}
    )

    def _flag(batch: pa.Table) -> pa.Table:
        mom = _ray.get(mom_ref)
        v = batch[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        x = np.floor(v * scale + 0.5)
        groups = batch[group_col].to_pylist()
        nd = np.array([mom[g][0] for g in groups])
        sd = np.array([mom[g][1] for g in groups])
        ssd = np.array([mom[g][2] for g in groups])
        lhs = nd * x - sd
        flags = lhs * lhs > k2 * (nd * ssd - sd * sd)
        return pa.table(
            {
                id_col: batch[id_col],
                group_col: batch[group_col],
                value_col: batch[value_col],
                "is_outlier": pa.array(flags, pa.bool_()),
            }
        )

    return ds.map_batches(_flag, batch_format="pyarrow")


def chi_square_independence(
    ds: ray.data.Dataset,
    col_a: str,
    col_b: str,
) -> "pd.DataFrame":
    """Pearson chi-square test of independence between two categorical
    columns — the data-QA check behind "is event mix stable across hours /
    segments / shards" (the categorical cousin of the PSI drift monitor).
    Returns ONE row: (n, n_rows_a, n_cols_b, dof, chi2, cramers_v).

    chi2 sums ``(O-E)^2/E`` over the FULL contingency grid (observed
    margins × observed margins, zero cells included) as a LEFT FOLD in
    sorted (a, b) cell order — bit-reproducible doubles, the surprisal
    ``list_reduce`` discipline; E is computed with the identical
    expression tree (``rt·ct/n``) on both sides. Cramér's V is
    ``sqrt(chi2 / (n · min(r-1, c-1)))``.

    Scale shape: cell counts follow the combiner discipline (one partial
    row per distinct (a, b) per batch → groupby Sum); only the bounded
    |a|·|b| cell table ever reaches the driver."""
    import math

    import pandas as pd

    from ray.data.aggregate import Sum

    def _cnt_partial(batch: pa.Table) -> pa.Table:
        out = pa.TableGroupBy(batch.select([col_a, col_b]), [col_a, col_b]).aggregate(
            [([], "count_all")]
        )
        return out.rename_columns(["a", "b", "o"])

    cells = (
        ds.map_batches(_cnt_partial, batch_format="pyarrow")
        .groupby(["a", "b"])
        .aggregate(Sum("o", alias_name="o"))
        .to_pandas()
    )
    obs = {(a, b): int(o) for a, b, o in zip(cells["a"], cells["b"], cells["o"])}
    avals = sorted(set(a for a, _ in obs))
    bvals = sorted(set(b for _, b in obs))
    rt = {a: sum(o for (x, _), o in obs.items() if x == a) for a in avals}
    ct = {b: sum(o for (_, y), o in obs.items() if y == b) for b in bvals}
    n = sum(obs.values())

    chi2 = 0.0
    for a in avals:  # left fold in sorted (a, b) order — the oracle's twin
        for b in bvals:
            e = float(rt[a]) * float(ct[b]) / float(n)
            t = float(obs.get((a, b), 0)) - e
            chi2 = chi2 + (t * t) / e
    dof = (len(avals) - 1) * (len(bvals) - 1)
    denom = min(len(avals) - 1, len(bvals) - 1)
    v = math.sqrt(chi2 / (float(n) * float(denom))) if denom > 0 else 0.0
    return pd.DataFrame(
        [
            {
                "n": n,
                "n_rows_a": len(avals),
                "n_cols_b": len(bvals),
                "dof": dof,
                "chi2": chi2,
                "cramers_v": v,
            }
        ]
    )


def benford_first_digit(
    ds: ray.data.Dataset,
    value_col: str,
) -> "pd.DataFrame":
    """Benford's-law first-digit audit — the classic anomaly/fraud screen
    for positive monetary columns: observed first-significant-digit
    shares vs the Benford expectation ``log10(1 + 1/d)``, with absolute
    deviations. Returns NINE rows (digit 1-9, zero-count digits
    included): ``(digit, n, obs_share, benford_share, abs_dev)``.

    Exactness: values are fixed to integer cents (``floor(x·100+0.5)``) and
    the first digit is taken from the integer's decimal string — no
    float log10 near power-of-ten boundaries; shares are one double
    division each and the Benford constants are module-level Python
    literals the oracle splices verbatim. Combiner discipline: one
    partial row per digit per batch; nine rows ever shuffle."""
    import pandas as pd

    from ray.data.aggregate import Sum

    def _digit_partial(batch: pa.Table) -> pa.Table:
        import numpy as np

        x = np.asarray(batch[value_col], dtype=np.float64)
        # half-up fix to integer cents — floor(x*100 + 0.5) is the same
        # double expression the oracle runs (np.round/SQL round disagree
        # on ties-to-even vs away-from-zero; this sidesteps both)
        cents = np.floor(x * 100.0 + 0.5).astype(np.int64)
        cents = cents[cents > 0]
        counts = [0] * 10
        for c in cents.tolist():
            counts[int(str(c)[0])] += 1
        return pa.table(
            {
                "digit": pa.array(list(range(1, 10)), pa.int64()),
                "n": pa.array(counts[1:], pa.int64()),
            }
        )

    agg = (
        ds.map_batches(_digit_partial, batch_format="pyarrow")
        .groupby("digit")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    by = dict(zip(agg["digit"], agg["n"]))
    total = int(sum(by.values()))
    import math

    rows = []
    for d in range(1, 10):
        n_d = int(by.get(d, 0))
        obs = float(n_d) / float(total) if total else 0.0
        ben = math.log10(1.0 + 1.0 / float(d))
        rows.append(
            {
                "digit": d,
                "n": n_d,
                "obs_share": obs,
                "benford_share": ben,
                "abs_dev": abs(obs - ben),
            }
        )
    return pd.DataFrame(rows)


def k_anonymity(
    ds: ray.data.Dataset,
    quasi_cols: list[str],
    k: int,
) -> ray.data.Dataset:
    """k-anonymity audit (Sweeney 2002) over declared quasi-identifier
    columns — the privacy gate a training-data release runs next to PII
    redaction: every equivalence class (distinct quasi-identifier
    combination) with its row count and whether it meets the k-anonymity
    bar. A row in a class of size < k is re-identifiable by joining the
    quasi-identifiers against an external table.

    Scale shape: reuses :func:`..skew.combiner_aggregate` — a per-batch
    Arrow count combiner bounds the shuffle by distinct classes per
    batch, never rows; the flag is a pure vectorized map over the
    bounded class table. Output:
    ``(quasi..., class_n, anonymous)`` with ``anonymous = class_n >= k``.
    """
    import pyarrow.compute as pc

    from .skew import combiner_aggregate

    classes = combiner_aggregate(
        ds.select_columns(quasi_cols), quasi_cols, {"class_n": ("count", None)}
    )
    return classes.map_batches(
        lambda b: b.append_column(
            "anonymous", pc.greater_equal(b["class_n"], pa.scalar(k, pa.int64()))
        ),
        batch_format="pyarrow",
    )


def json_field_histogram(
    ds: ray.data.Dataset,
    json_col: str,
    field: str,
    group_col: str,
    bucket_width: int = 10,
) -> ray.data.Dataset:
    """Histogram of an integer field extracted from a JSON-string column,
    per group — the semi-structured payload path (event properties,
    request metadata) every log pipeline needs: parse once, bucket by
    ``value // bucket_width``, count combiner-first. Rows whose JSON is
    null/invalid or lack the field are dropped (mirrored by the oracle's
    ``IS NOT NULL`` on ``json_extract_string``).

    Scale shape: the parse is per row inside the batch (stdlib json —
    no driver involvement); the shuffle carries one partial row per
    distinct (group, bucket) per batch via :func:`..skew.combiner_aggregate`.
    Output: ``(group, bucket, n)``.
    """
    import json

    from .skew import combiner_aggregate

    def _extract(batch: pa.Table) -> pa.Table:
        gs, bs = [], []
        for g, s in zip(batch[group_col].to_pylist(), batch[json_col].to_pylist()):
            if s is None:
                continue
            try:
                v = json.loads(s).get(field)
            except (ValueError, AttributeError):
                continue
            if not isinstance(v, int) or isinstance(v, bool):
                continue
            gs.append(g)
            bs.append(v // bucket_width)
        return pa.table({group_col: pa.array(gs), "bucket": pa.array(bs, pa.int64())})

    rows = ds.select_columns([group_col, json_col]).map_batches(
        _extract, batch_format="pyarrow"
    )
    return combiner_aggregate(rows, [group_col, "bucket"], {"n": ("count", None)})


def mad_outliers(
    ds: ray.data.Dataset,
    value_col: str,
    group_col: str,
    id_col: str,
    n_mad: int = 3,
    scale: float = 100.0,
) -> ray.data.Dataset:
    """Per-group ROBUST outlier flags via median absolute deviation — the
    heavy-tail-safe cousin of :func:`zscore_outliers` (one extreme value
    drags a mean/σ but not a median/MAD): quantize values to ints
    (``floor(v·scale + 0.5)``), per-group exact discrete median via the
    value-CDF combiner (:func:`group_quantiles`), deviations
    ``|x - med|``, per-group exact MAD (median of deviations), flag
    ``dev > n_mad · MAD``. EVERY comparison is int64 — no float anywhere
    after quantization, so the flags are bit-reproducible in SQL.

    Scale shape: two bounded value-CDF passes (shuffle ≤ distinct values
    per group per batch) whose |groups|-row results broadcast via
    ``ray.put``; the wide data streams through two vectorized maps.
    Output: ``(id, group, vq, dev, is_outlier)``.
    """
    import numpy as np
    import pandas as pd

    import ray as _ray

    def _q(batch: pa.Table) -> pa.Table:
        v = batch[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        x = np.floor(v * scale + 0.5).astype(np.int64)
        return pa.table(
            {
                id_col: batch[id_col],
                group_col: batch[group_col],
                "vq": pa.array(x, pa.int64()),
            }
        )

    quant = ds.select_columns([id_col, group_col, value_col]).map_batches(
        _q, batch_format="pyarrow"
    ).materialize()  # read for the median pass AND the deviation map

    med_df = group_quantiles(quant, "vq", group_col, qs=(0.5,)).to_pandas()
    med_ref = _ray.put(dict(zip(med_df[group_col], med_df["q50"])))

    def _dev(batch: pa.Table) -> pa.Table:
        from .broadcast import broadcast_cache

        med = broadcast_cache(med_ref)
        g = batch[group_col].to_pylist()
        x = batch["vq"].to_numpy()
        m = np.array([med[k] for k in g], dtype=np.int64)
        return batch.append_column("dev", pa.array(np.abs(x - m), pa.int64()))

    devs = quant.map_batches(_dev, batch_format="pyarrow").materialize()

    mad_df = group_quantiles(devs, "dev", group_col, qs=(0.5,)).to_pandas()
    mad_ref = _ray.put(dict(zip(mad_df[group_col], mad_df["q50"])))

    def _flag(batch: pa.Table) -> pa.Table:
        from .broadcast import broadcast_cache

        mad = broadcast_cache(mad_ref)
        g = batch[group_col].to_pylist()
        m = np.array([mad[k] for k in g], dtype=np.int64)
        return batch.append_column(
            "is_outlier", pa.array(batch["dev"].to_numpy() > n_mad * m, pa.bool_())
        )

    return devs.map_batches(_flag, batch_format="pyarrow")


def seasonal_outliers(
    ds: ray.data.Dataset,
    value_col: str,
    group_col: str,
    ts_col: str,
    id_col: str,
    quantize_scale: float = 100.0,
) -> ray.data.Dataset:
    """Seasonality-aware Tukey-fence outlier flags: the baseline is the
    per-(group, HOUR-OF-WEEK) exact quartile pair, so a value is judged
    against its own weekly seasonal slot (weekday-evening purchases vs
    3am-Sunday purchases), not the global distribution. INTEGER-EXACT end
    to end: values quantize to int64, quartiles are percentile_disc data
    elements (group_quantiles), and the fence test is cross-multiplied —
    ``2·vq < 2·q25 − 3·iqr  OR  2·vq > 2·q75 + 3·iqr`` — so flags are
    bit-reproducible and SQL-twin-exact.

    Shape: one value-CDF combiner pass for the ≤ |groups|·168-row quartile
    table (broadcast via ray.put), then a pure flag map — the wide data
    never shuffles. Hour-of-week derives from raw epoch microseconds
    (dow = (days + 4) % 7, Sunday = 0 — the DuckDB dayofweek convention),
    no timezone."""
    import numpy as np

    def _prep(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch[value_col], dtype=np.float64)
        vq = np.floor(v * quantize_scale + 0.5).astype(np.int64)
        # normalize the timestamp unit first: parquet carries us, but
        # from_items-style inputs arrive as timestamp[s]
        us = np.asarray(
            batch[ts_col].cast(pa.timestamp("us")).cast(pa.int64()),
            dtype=np.int64,
        )
        dow = ((us // 86_400_000_000) + 4) % 7
        hour = (us // 3_600_000_000) % 24
        how = dow * 24 + hour
        gk = [
            f"{g}:{h}" for g, h in zip(batch[group_col].to_pylist(), how.tolist())
        ]
        return pa.table(
            {
                id_col: batch[id_col],
                group_col: batch[group_col],
                "how": pa.array(how, pa.int64()),
                "vq": pa.array(vq, pa.int64()),
                "gkey": pa.array(gk, pa.string()),
            }
        )

    prepped = ds.select_columns([id_col, group_col, value_col, ts_col]).map_batches(
        _prep, batch_format="pyarrow"
    )
    qt = (
        group_quantiles(
            prepped.select_columns(["gkey", "vq"]), "vq", "gkey", qs=(0.25, 0.75)
        )
        .to_pandas()
    )
    fences = {
        g: (int(a), int(b)) for g, a, b in zip(qt["gkey"], qt["q25"], qt["q75"])
    }
    import ray as _ray

    fence_ref = _ray.put(fences)

    def _flag(batch: pa.Table) -> pa.Table:
        from .broadcast import broadcast_cache

        f = broadcast_cache(fence_ref)
        vq = np.asarray(batch["vq"], dtype=np.int64)
        q25 = np.empty(len(vq), dtype=np.int64)
        q75 = np.empty(len(vq), dtype=np.int64)
        for i, g in enumerate(batch["gkey"].to_pylist()):
            q25[i], q75[i] = f[g]
        iqr = q75 - q25
        out = (2 * vq < 2 * q25 - 3 * iqr) | (2 * vq > 2 * q75 + 3 * iqr)
        return pa.table(
            {
                id_col: batch[id_col],
                group_col: batch[group_col],
                "how": batch["how"],
                "vq": batch["vq"],
                "is_outlier": pa.array(out, pa.bool_()),
            }
        )

    return prepped.map_batches(_flag, batch_format="pyarrow")


def roc_auc(
    ds: ray.data.Dataset,
    score_col: str,
    label_col: str,
    quantize_scale: float = 100.0,
):
    """EXACT ROC-AUC of an integer-quantized score against a boolean
    label, distributed with NO global sort: the Mann-Whitney midrank
    formula over :func:`rank_transform`'s value-CDF numerators.

    With midranks (the tie-correct AUC), 2·Σ_{i∈pos} midrank_i =
    Σ_{i∈pos} (2·rank_lt_i + rank_eq_i + 1) — an INTEGER — so
    ``auc = (u2 − n_pos·(n_pos+1)) / (2·n_pos·n_neg)`` is one exact
    int-by-int double division, bit-identical to the SQL window twin.

    Returns a one-row pandas frame ``(n_pos, n_neg, u2, auc)`` — the
    model-evaluation scalar a 100-TB scoring run reports per shard/day.
    Shape: one value-CDF combiner pass + one filtered Sum; the wide data
    never sorts."""
    import numpy as np
    import pandas as pd
    from ray.data.aggregate import Sum

    def _prep(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch[score_col], dtype=np.float64)
        vq = np.floor(v * quantize_scale + 0.5).astype(np.int64)
        lab = np.asarray(batch[label_col], dtype=bool)
        return pa.table(
            {
                "vq": pa.array(vq, pa.int64()),
                "pos": pa.array(lab.astype(np.int64), pa.int64()),
            }
        )

    # narrow (2 int cols); materialized because the CDF pass, the rank
    # map and the count each re-execute the plan otherwise
    prepped = ds.select_columns([score_col, label_col]).map_batches(
        _prep, batch_format="pyarrow"
    ).materialize()
    ranked = rank_transform(prepped, "vq", out_prefix="r")

    def _terms(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        pos = batch["pos"]
        term = pc.multiply(
            pos,
            pc.add(
                pc.add(
                    pc.multiply(batch["r_lt"], pa.scalar(2, pa.int64())),
                    batch["r_eq"],
                ),
                pa.scalar(1, pa.int64()),
            ),
        )
        return pa.table({"pos": pos, "term": term})

    agg = (
        ranked.map_batches(_terms, batch_format="pyarrow")
        .aggregate(Sum("pos", alias_name="n_pos"), Sum("term", alias_name="u2"))
    )
    n_rows = prepped.count()
    n_pos = int(agg["n_pos"])
    u2 = int(agg["u2"])
    n_neg = n_rows - n_pos
    auc = (u2 - n_pos * (n_pos + 1)) / (2 * n_pos * n_neg) if n_pos and n_neg else 0.0
    return pd.DataFrame(
        {
            "n_pos": pd.array([n_pos], dtype="int64"),
            "n_neg": pd.array([n_neg], dtype="int64"),
            "u2": pd.array([u2], dtype="int64"),
            "auc": [auc],
        }
    )


def lift_table(
    ds: ray.data.Dataset,
    score_col: str,
    label_col: str,
    n_buckets: int = 10,
    quantize_scale: float = 100.0,
) -> ray.data.Dataset:
    """Decile lift / calibration table: rows bucket by EXACT score rank
    (``bucket = rank_lt · B // n`` — ties share a bucket, deterministic,
    unlike NTILE's order-dependent tie splitting), then per-bucket
    ``(n, n_pos, pos_rate)``. The classifier-calibration readout of a
    scored corpus. Shape: value-CDF combiner + one bounded groupby."""
    import numpy as np
    from ray.data.aggregate import Count, Sum

    def _prep(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch[score_col], dtype=np.float64)
        vq = np.floor(v * quantize_scale + 0.5).astype(np.int64)
        lab = np.asarray(batch[label_col], dtype=bool)
        return pa.table(
            {
                "vq": pa.array(vq, pa.int64()),
                "pos": pa.array(lab.astype(np.int64), pa.int64()),
            }
        )

    prepped = ds.select_columns([score_col, label_col]).map_batches(
        _prep, batch_format="pyarrow"
    ).materialize()  # narrow; reused by the CDF pass + rank map + count
    n_rows = prepped.count()
    ranked = rank_transform(prepped, "vq", out_prefix="r")

    def _bucket(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = pc.divide(
            pc.multiply(batch["r_lt"], pa.scalar(n_buckets, pa.int64())),
            pa.scalar(n_rows, pa.int64()),
        )
        return pa.table({"bucket": pc.cast(b, pa.int64()), "pos": batch["pos"]})

    agg = (
        ranked.map_batches(_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Count(alias_name="n"), Sum("pos", alias_name="n_pos"))
    )

    def _rate(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        rate = pc.divide(
            pc.cast(batch["n_pos"], pa.float64()), pc.cast(batch["n"], pa.float64())
        )
        return pa.table(
            {
                "bucket": batch["bucket"],
                "n": batch["n"],
                "n_pos": batch["n_pos"],
                "pos_rate": rate,
            }
        )

    return agg.map_batches(_rate, batch_format="pyarrow")


def target_encode_loo(
    ds: ray.data.Dataset,
    cat_col: str,
    target_col: str,
    id_col: str,
    quantize_scale: float = 100.0,
) -> ray.data.Dataset:
    """Leave-one-out target encoding — the leakage-safe categorical
    feature a tabular model trains on: for each row, the mean target of
    its category EXCLUDING the row itself,
    ``enc = (sum_cat − x_i) / (n_cat − 1)`` (NULL-free: singleton
    categories fall back to the global LOO mean ``(T − x_i)/(N − 1)``).
    Integer-exact: targets quantize to int64, both numerators and
    denominators are integers, and the division is one exact int/int
    double op — bit-identical to the SQL twin.

    Shape: one bounded groupby for the |categories|-row sum table
    (broadcast via ray.put), then a pure map. The wide data never
    shuffles."""
    import numpy as np
    from ray.data.aggregate import Count, Sum

    def _prep(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch[target_col], dtype=np.float64)
        vq = np.floor(v * quantize_scale + 0.5).astype(np.int64)
        return pa.table(
            {
                id_col: batch[id_col],
                cat_col: batch[cat_col],
                "xq": pa.array(vq, pa.int64()),
            }
        )

    prepped = ds.select_columns([id_col, cat_col, target_col]).map_batches(
        _prep, batch_format="pyarrow"
    ).materialize()  # narrow; reused by the sum pass and the encode map

    sums = (
        prepped.groupby(cat_col)
        .aggregate(Sum("xq", alias_name="s"), Count(alias_name="n"))
        .to_pandas()
    )
    stats = {c: (int(s), int(n)) for c, s, n in zip(sums[cat_col], sums["s"], sums["n"])}
    total_s = sum(s for s, _ in stats.values())
    total_n = sum(n for _, n in stats.values())
    import ray as _ray

    state_ref = _ray.put((stats, total_s, total_n))

    def _encode(batch: pa.Table) -> pa.Table:
        from .broadcast import broadcast_cache

        st, ts_, tn = broadcast_cache(state_ref)
        xq = batch["xq"].to_pylist()
        cats = batch[cat_col].to_pylist()
        enc = []
        for c, x in zip(cats, xq):
            s, n = st[c]
            if n > 1:
                enc.append((s - x) / (n - 1))
            elif tn > 1:
                enc.append((ts_ - x) / (tn - 1))
            else:
                enc.append(0.0)
        return pa.table(
            {
                id_col: batch[id_col],
                cat_col: batch[cat_col],
                "xq": batch["xq"],
                "loo_enc": pa.array(enc, pa.float64()),
            }
        )

    return prepped.map_batches(_encode, batch_format="pyarrow")


def gini_coefficient(
    ds: ray.data.Dataset,
    value_col: str,
    quantize_scale: float = 100.0,
):
    """EXACT Gini concentration coefficient of an integer-quantized value
    column — the inequality/skew scalar (spend concentration, token-count
    concentration) that decides whether a key needs salting or a corpus
    needs rebalancing. Midrank formulation over the rank_transform
    value-CDF: ``S2 = Σ x_i·(2·rank_lt + rank_eq + 1)`` (an integer — the
    same numerator family as roc_auc), then
    ``G = (S2 − (n+1)·T) / (n·T)`` — one exact int/int double division.

    Shape: one value-CDF combiner pass + one Sum; no global sort. The
    documented value-CDF bound applies: |distinct values| must fit the
    driver — run it on AGGREGATED per-entity totals (bounded by entities)
    or pre-bucketed values, not raw unbounded doubles. Returns a one-row
    pandas frame ``(n, total, s2, gini)``."""
    import numpy as np
    import pandas as pd
    from ray.data.aggregate import Sum

    def _prep(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch[value_col], dtype=np.float64)
        vq = np.floor(v * quantize_scale + 0.5).astype(np.int64)
        return pa.table({"vq": pa.array(vq, pa.int64())})

    prepped = ds.select_columns([value_col]).map_batches(
        _prep, batch_format="pyarrow"
    ).materialize()
    ranked = rank_transform(prepped, "vq", out_prefix="r")

    def _terms(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        two_r = pc.add(
            pc.add(pc.multiply(batch["r_lt"], pa.scalar(2, pa.int64())), batch["r_eq"]),
            pa.scalar(1, pa.int64()),
        )
        return pa.table(
            {"x": batch["vq"], "s2": pc.multiply(batch["vq"], two_r)}
        )

    agg = ranked.map_batches(_terms, batch_format="pyarrow").aggregate(
        Sum("x", alias_name="total"), Sum("s2", alias_name="s2")
    )
    n = prepped.count()
    total = int(agg["total"])
    s2 = int(agg["s2"])
    gini = (s2 - (n + 1) * total) / (n * total) if n and total else 0.0
    return pd.DataFrame(
        {
            "n": pd.array([n], dtype="int64"),
            "total": pd.array([total], dtype="int64"),
            "s2": pd.array([s2], dtype="int64"),
            "gini": [gini],
        }
    )


def burst_hours(
    ds: ray.data.Dataset,
    type_col: str,
    ts_col: str,
) -> ray.data.Dataset:
    """Volume-burst detection on hourly event COUNTS (the rate cousin of
    the value-outlier passes): an hour is a burst for a type when its
    count exceeds that type's mean by more than 3 standard deviations —
    evaluated ENTIRELY in integers by cross-multiplication,
    ``c·K − S > 0  AND  (c·K − S)² > 9·(K·SS − S²)`` over the observed
    hours K, so the flag is bit-reproducible. Output:
    ``(type, ehour, c, is_burst)``.

    Shape: one (type, hour)-count combiner groupby (cells, never events),
    then per-type flags in a map_groups over the bounded count table;
    stats use Python ints (no int64 overflow at any scale)."""
    import numpy as np
    import pandas as pd
    from ray.data.aggregate import Sum

    def _hour_counts(batch: pa.Table) -> pa.Table:
        from collections import Counter

        us = np.asarray(
            batch[ts_col].cast(pa.timestamp("us")).cast(pa.int64()), dtype=np.int64
        )
        eh = us // 3_600_000_000
        c: Counter = Counter(zip(batch[type_col].to_pylist(), eh.tolist()))
        keys = list(c)
        return pa.table(
            {
                type_col: pa.array([k[0] for k in keys]),
                "ehour": pa.array([k[1] for k in keys], pa.int64()),
                "c": pa.array([c[k] for k in keys], pa.int64()),
            }
        )

    counts = (
        ds.select_columns([type_col, ts_col])
        .map_batches(_hour_counts, batch_format="pyarrow")
        .groupby([type_col, "ehour"])
        .aggregate(Sum("c", alias_name="c"))
    )

    def _flags(g: pd.DataFrame) -> pd.DataFrame:
        cs = [int(x) for x in g["c"]]
        k = len(cs)
        s = sum(cs)
        ss = sum(x * x for x in cs)
        var_num = k * ss - s * s  # K²·variance — an integer
        flags = [
            (x * k - s > 0) and ((x * k - s) ** 2 > 9 * var_num) for x in cs
        ]
        out = g.copy()
        out["is_burst"] = flags
        return out

    return counts.groupby(type_col).map_groups(_flags, batch_format="pandas")


def roc_auc_by_group(
    ds: ray.data.Dataset,
    score_col: str,
    label_col: str,
    group_col: str,
    quantize_scale: float = 100.0,
) -> ray.data.Dataset:
    """SLICED model evaluation: the exact tie-correct Mann-Whitney AUC of
    :func:`roc_auc`, computed independently per slice (hour-of-day,
    segment, shard) — the robustness readout that catches a classifier
    scoring well globally but failing a slice. Within each group the
    midrank numerators come from the group's own value CDF, built in
    Python ints inside ``map_groups`` (exact, no overflow); slices with a
    degenerate class (n_pos·n_neg = 0) report auc 0.0.

    Shape: one groupby on the slice key; each group reduces to a single
    output row. Output: ``(group, n_pos, n_neg, u2, auc)``."""
    import numpy as np
    import pandas as pd

    def _prep(batch: pa.Table) -> pa.Table:
        v = np.asarray(batch[score_col], dtype=np.float64)
        vq = np.floor(v * quantize_scale + 0.5).astype(np.int64)
        lab = np.asarray(batch[label_col], dtype=bool)
        return pa.table(
            {
                group_col: batch[group_col],
                "vq": pa.array(vq, pa.int64()),
                "pos": pa.array(lab.astype(np.int64), pa.int64()),
            }
        )

    def _auc(g: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        vals = [int(x) for x in g["vq"]]
        poss = [int(x) for x in g["pos"]]
        cdf = Counter(vals)
        ks = sorted(cdf)
        less: dict = {}
        run = 0
        for k in ks:
            less[k] = run
            run += cdf[k]
        u2 = sum(
            (2 * less[v] + cdf[v] + 1) for v, p in zip(vals, poss) if p
        )
        n = len(vals)
        n_pos = sum(poss)
        n_neg = n - n_pos
        auc = (
            (u2 - n_pos * (n_pos + 1)) / (2 * n_pos * n_neg)
            if n_pos and n_neg
            else 0.0
        )
        return pd.DataFrame(
            {
                group_col: [g[group_col].iloc[0]],
                "n_pos": pd.array([n_pos], dtype="int64"),
                "n_neg": pd.array([n_neg], dtype="int64"),
                "u2": pd.array([u2], dtype="int64"),
                "auc": [auc],
            }
        )

    return (
        ds.select_columns([group_col, score_col, label_col])
        .map_batches(_prep, batch_format="pyarrow")
        .groupby(group_col)
        .map_groups(_auc, batch_format="pandas")
    )
