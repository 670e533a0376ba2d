"""Time-ordered operators Ray Data lacks natively: as-of join and
hopping-window aggregation.

Both follow the engine's standard scale pattern — co-locate by a hash of the
equality key, then run a vectorized kernel per partition:

- ``asof_join``: for every left row, the right row with the same ``by`` key
  and the greatest ``on`` value <= the left ``on`` (backward as-of, the
  semantics of DuckDB ``ASOF JOIN`` / pandas ``merge_asof``). Partitioning
  assumption: rows sharing a ``by`` key fit one hash bucket (same contract as
  the groupby stages; raise ``num_buckets`` for skew — a single user's event
  history is the unit of locality, never the whole table).
- ``hopping_window_count``: count/sum per (window_start, group) for hopping
  (overlapping) windows of ``size`` every ``hop``. Each row belongs to
  ``size/hop`` windows; the expansion happens vectorized inside the batch
  and is immediately pre-aggregated (combiner), so the shuffle moves at most
  ``windows x groups`` partial rows per block, never ``rows x size/hop``.

Reference parity note: the reference's closest analogues are the date-cutoff
("version as-of decision date") lookup inside provision mapping
(src/pipeline/mapping/steps.ts candidate filtering) and the calendar-window
validation in the N8N reference extractor; this module generalizes them to
first-class operators with DuckDB-checkable semantics.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..functions.hashing import bucket_ids

_BUCKET = "__asof_bucket"
_SIDE = "__asof_side"


def _to_arrow_schema(sch) -> pa.Schema:
    """ray.data.Schema → pyarrow.Schema, whether the dataset's last operator
    produced Arrow blocks (base_schema IS a pa.Schema) or pandas blocks
    (base_schema is a PandasBlockSchema carrying numpy dtypes)."""
    base = getattr(sch, "base_schema", sch)
    if isinstance(base, pa.Schema):
        return base
    fields = []
    for name, typ in zip(base.names, base.types):
        if isinstance(typ, pa.DataType):
            fields.append((name, typ))
        else:
            fields.append((name, pa.from_numpy_dtype(typ)))
    return pa.schema(fields)


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str,
    by: str,
    right_columns: list[str],
    suffix: str = "_r",
    num_buckets: int = 32,
    right_tie_cols: list[str] | None = None,
) -> ray.data.Dataset:
    """Backward as-of left join (allow-exact-match), DuckDB ``ASOF LEFT
    JOIN ... ON l.by = r.by AND r.on <= l.on`` semantics.

    ``right_columns`` are the right-side payload columns to attach (the
    ``on`` column itself may be included; every attached column is renamed
    with ``suffix``). Left rows with no match keep nulls.

    Duplicate right rows per (by, on): pass ``right_tie_cols`` to break ties
    deterministically INSIDE the merge (keep the last row under a stable
    sort by those columns) — this rides the existing cogroup, so no extra
    dedupe shuffle; it is exact because every row of a ``by`` key lands in
    one bucket. Without it, pre-deduplicate (by, on) upstream.
    """
    lsch = _to_arrow_schema(left.schema())
    rsch = _to_arrow_schema(right.schema())
    rkeep = [by, on] + [c for c in right_columns if c not in (by, on)]
    rtypes = {f.name: f.type for f in rsch}
    ltypes = {f.name: f.type for f in lsch}
    lnames = [f.name for f in lsch]

    out_fields = [(n, ltypes[n]) for n in lnames] + [
        (c + suffix, rtypes[c]) for c in right_columns
    ]
    out_schema = pa.schema([(_BUCKET, pa.int32()), (_SIDE, pa.int8())] + out_fields)
    out_names = [n for n, _ in out_fields]

    def _pack(side: int, keep: list[str]):
        def f(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            cols = {
                _BUCKET: bucket_ids(batch[by], num_buckets),
                _SIDE: pa.array(np.full(n, side, dtype=np.int8)),
            }
            if side == 0:
                for name in lnames:
                    cols[name] = batch[name]
                for c in right_columns:
                    cols[c + suffix] = pa.nulls(n, rtypes[c])
            else:
                # right rows ride in the right-payload slots; by/on travel in
                # dedicated left slots so the merge can read them uniformly
                for name in lnames:
                    if name == by:
                        cols[name] = batch[by].cast(ltypes[name])
                    elif name == on:
                        cols[name] = batch[on].cast(ltypes[name])
                    else:
                        cols[name] = pa.nulls(n, ltypes[name])
                for c in right_columns:
                    cols[c + suffix] = batch[c]
            return pa.table({k: cols[k] for k in out_schema.names}, schema=out_schema)

        return f

    ltag = left.map_batches(_pack(0, lnames), batch_format="pyarrow")
    rtag = right.select_columns(rkeep).map_batches(_pack(1, rkeep), batch_format="pyarrow")

    rpayload = [c + suffix for c in right_columns]

    # The packed union null-pads left slots on right-side rows, so the
    # group's pandas conversion promotes int64 left columns to float64 (and
    # bool to object). Restore the DECLARED dtypes on every return path via
    # pandas nullable extension dtypes (round-trip cleanly to Arrow nulls).
    def _nullable_dtype(typ: pa.DataType) -> str | None:
        if pa.types.is_integer(typ):
            return str(typ).replace("int", "Int").replace("uInt", "UInt")
        if pa.types.is_boolean(typ):
            return "boolean"
        return None

    restore = {
        n: d for n, t in out_fields if (d := _nullable_dtype(t)) is not None
    }

    def _restore(df: pd.DataFrame) -> pd.DataFrame:
        for name, dtype in restore.items():
            if str(df[name].dtype) != dtype:
                df[name] = df[name].astype(dtype)
        return df

    def _merge(group: pd.DataFrame) -> pd.DataFrame:
        lmask = group[_SIDE].to_numpy() == 0
        ldf = group.loc[lmask, out_names]
        rdf = group.loc[~lmask, [by, on] + rpayload]
        if not len(ldf):
            return _restore(pd.DataFrame(columns=out_names))
        if not len(rdf):
            return _restore(ldf.reset_index(drop=True))
        ldf = ldf.drop(columns=rpayload).sort_values(on, kind="stable")
        if right_tie_cols:
            tie = [c + suffix if c in right_columns else c for c in right_tie_cols]
            rdf = rdf.sort_values([on] + tie, kind="stable").drop_duplicates(
                [by, on], keep="last"
            )
        rdf = rdf.sort_values(on, kind="stable")
        merged = pd.merge_asof(
            ldf, rdf, on=on, by=by, direction="backward", allow_exact_matches=True
        )
        return _restore(merged[out_names])

    return (
        ltag.union(rtag)
        .groupby(_BUCKET)
        .map_groups(_merge, batch_format="pandas")
    )


def hopping_window_count(
    events: ray.data.Dataset,
    ts_col: str,
    size_s: int,
    hop_s: int,
    group_col: str | None = None,
    value_col: str | None = None,
) -> ray.data.Dataset:
    """Hopping-window aggregate: for windows [w, w + size) with starts every
    ``hop`` (epoch-aligned), count rows (and sum ``value_col`` if given) per
    (window_start, group). ``size_s`` must be a multiple of ``hop_s``.

    Emits window_start as timestamp[us]. Combiner-first: the k-fold row
    expansion is pre-aggregated inside each batch before the groupby.
    """
    if size_s % hop_s:
        raise ValueError("size_s must be a multiple of hop_s")
    k = size_s // hop_s
    keys = ["window_start"] + ([group_col] if group_col else [])

    def _expand(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ts = (
            batch[ts_col]
            .cast(pa.timestamp("us"))
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        # last (most recent) window containing ts starts at floor(ts/hop)*hop;
        # the k-1 hops before it also contain ts
        hop_us = hop_s * 1_000_000
        last_start = (ts // hop_us) * hop_us
        starts = (last_start[:, None] - np.arange(k)[None, :] * hop_us).ravel()
        cols = {
            "window_start": pa.array(starts, pa.int64()),
            "n": pa.array(np.ones(n * k, dtype=np.int64)),
        }
        if group_col:
            idx = np.repeat(np.arange(n), k)
            cols[group_col] = batch[group_col].take(pa.array(idx))
        if value_col:
            cols["value_sum"] = pa.array(
                np.repeat(batch[value_col].to_numpy(zero_copy_only=False), k)
            )
        expanded = pa.table(cols)
        spec = [("n", "sum")] + ([("value_sum", "sum")] if value_col else [])
        out = pa.TableGroupBy(expanded, keys).aggregate(spec)
        # rename by NAME, not position — aggregate's column order has varied
        # across pyarrow versions (keys first vs last)
        remap = {"n_sum": "n", "value_sum_sum": "value_sum"}
        return out.rename_columns([remap.get(c, c) for c in out.column_names])

    expanded = events.map_batches(_expand, batch_format="pyarrow", batch_size=None)

    from ray.data.aggregate import Sum

    aggs = [Sum("n", alias_name="n")] + ([Sum("value_sum", alias_name="value_sum")] if value_col else [])
    out = expanded.groupby(keys).aggregate(*aggs)

    def _finish(batch: pa.Table) -> pa.Table:
        ws = batch["window_start"].cast(pa.timestamp("us"))
        cols = {"window_start": ws}
        for c in batch.column_names:
            if c != "window_start":
                cols[c] = batch[c]
        return pa.table(cols)

    return out.map_batches(_finish, batch_format="pyarrow")


_IBUCKET = "__ij_bucket"
_ISIDE = "__ij_side"


def interval_join(
    points: ray.data.Dataset,
    intervals: ray.data.Dataset,
    on: str,
    start: str,
    end: str,
    interval_columns: list[str],
    by: str | None = None,
    suffix: str = "_i",
    num_buckets: int = 32,
    bucket_width_us: int | None = None,
) -> ray.data.Dataset:
    """Inner range (interval containment) join: every (point, interval) pair
    with ``interval.start <= point.on < interval.end`` — and an equal ``by``
    key when given. DuckDB ``JOIN ... ON p.by = i.by AND p.on >= i.start AND
    p.on < i.end`` semantics; half-open so back-to-back intervals never
    double-match a boundary point.

    Two partitioning strategies (the operator's scale contract):

    - ``by`` given (keyed range join): hash cogroup on ``by`` — one shuffle,
      vectorized merge+filter per bucket. Assumption: one key's points and
      intervals fit a bucket (the same per-key locality contract as
      ``asof_join``; intervals never cross keys so no replication).
    - ``by=None`` (pure band join): time-range bucketing — each point goes to
      bucket ``on // bucket_width_us``; each interval is REPLICATED to every
      bucket it overlaps, so a pair co-occurs in exactly the point's bucket
      (no post-join dedup). Assumptions: interval length is bounded (the
      replication factor is ``len/width + 1``) and ``bucket_width_us`` is
      chosen so one bucket's point x interval product fits in memory.

    ``interval_columns`` are the interval payload columns to attach, renamed
    with ``suffix``. Points with no containing interval are dropped (inner).
    """
    if by is None and bucket_width_us is None:
        raise ValueError("keyless interval_join needs bucket_width_us")

    psch = _to_arrow_schema(points.schema())
    isch = _to_arrow_schema(intervals.schema())
    ptypes = {f.name: f.type for f in psch}
    itypes = {f.name: f.type for f in isch}
    pnames = [f.name for f in psch]
    ikeep = ([by] if by else []) + [start, end] + [
        c for c in interval_columns if c not in (by, start, end)
    ]
    ipayload = [start + suffix, end + suffix] + [c + suffix for c in interval_columns]

    out_fields = [(n, ptypes[n]) for n in pnames] + [
        (start + suffix, itypes[start]),
        (end + suffix, itypes[end]),
    ] + [(c + suffix, itypes[c]) for c in interval_columns]
    pack_schema = pa.schema([(_IBUCKET, pa.int32()), (_ISIDE, pa.int8())] + out_fields)
    out_names = [n for n, _ in out_fields]

    def _us(arr: pa.ChunkedArray | pa.Array) -> np.ndarray:
        a = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        return a.cast(pa.int64()).to_numpy(zero_copy_only=False)

    def _pack_points(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if by is not None:
            bucket = bucket_ids(batch[by], num_buckets)
        else:
            bucket = pa.array((_us(batch[on]) // bucket_width_us).astype(np.int32))
        cols = {_IBUCKET: bucket, _ISIDE: pa.array(np.zeros(n, dtype=np.int8))}
        for name in pnames:
            cols[name] = batch[name]
        for c, typ in zip(ipayload, [itypes[start], itypes[end]] + [itypes[c] for c in interval_columns]):
            cols[c] = pa.nulls(n, typ)
        return pa.table({k: cols[k] for k in pack_schema.names}, schema=pack_schema)

    def _pack_intervals(batch: pa.Table) -> pa.Table:
        if by is not None:
            expanded = batch
            bucket = bucket_ids(batch[by], num_buckets)
        else:
            s_us = _us(batch[start])
            e_us = np.maximum(_us(batch[end]) - 1, s_us)  # half-open end
            first = s_us // bucket_width_us
            last = e_us // bucket_width_us
            reps = (last - first + 1).astype(np.int64)
            idx = np.repeat(np.arange(batch.num_rows), reps)
            expanded = batch.take(pa.array(idx))
            # bucket of the k-th replica = first + k
            offsets = np.concatenate([np.arange(r) for r in reps]) if len(reps) else np.array([], dtype=np.int64)
            bucket = pa.array((np.repeat(first, reps) + offsets).astype(np.int32))
        n = expanded.num_rows
        cols = {_IBUCKET: bucket, _ISIDE: pa.array(np.ones(n, dtype=np.int8))}
        for name in pnames:
            if by is not None and name == by:
                cols[name] = expanded[by].cast(ptypes[name])
            else:
                cols[name] = pa.nulls(n, ptypes[name])
        cols[start + suffix] = expanded[start]
        cols[end + suffix] = expanded[end]
        for c in interval_columns:
            cols[c + suffix] = expanded[c]
        return pa.table({k: cols[k] for k in pack_schema.names}, schema=pack_schema)

    ptag = points.map_batches(_pack_points, batch_format="pyarrow")
    itag = intervals.select_columns(ikeep).map_batches(_pack_intervals, batch_format="pyarrow")

    def _nullable_dtype(typ: pa.DataType) -> str | None:
        if pa.types.is_integer(typ):
            return str(typ).replace("int", "Int").replace("uInt", "UInt")
        if pa.types.is_boolean(typ):
            return "boolean"
        return None

    restore = {n: d for n, t in out_fields if (d := _nullable_dtype(t)) is not None}

    def _restore(df: pd.DataFrame) -> pd.DataFrame:
        for name, dtype in restore.items():
            if str(df[name].dtype) != dtype:
                df[name] = df[name].astype(dtype)
        return df

    def _merge(group: pd.DataFrame) -> pd.DataFrame:
        lmask = group[_ISIDE].to_numpy() == 0
        pts = group.loc[lmask, pnames]
        itv = group.loc[~lmask, ([by] if by else []) + ipayload]
        if not len(pts) or not len(itv):
            return _restore(pd.DataFrame(columns=out_names))
        if by is not None:
            merged = pts.merge(itv, on=by)
        else:
            merged = pts.assign(__k=0).merge(itv.assign(__k=0), on="__k").drop(columns="__k")
        m = merged[
            (merged[on] >= merged[start + suffix]) & (merged[on] < merged[end + suffix])
        ]
        return _restore(m[out_names].reset_index(drop=True))

    return ptag.union(itag).groupby(_IBUCKET).map_groups(_merge, batch_format="pandas")


def debounce_events(
    events: ray.data.Dataset,
    min_gap_s: int,
    keys: tuple = ("user_id",),
    ts_col: str = "ts",
    order_col: str = "event_id",
) -> ray.data.Dataset:
    """Stateful per-key debounce: keep an event iff it is >= ``min_gap_s``
    after the last KEPT event of the same key (greedy earliest-first scan in
    ``(ts, order_col)`` order). This depends on the previously *kept* event,
    not the previous row, so no ``lag()``/window function expresses it — the
    classic sequential-state stream operator (duplicate-click suppression,
    alert throttling, sensor thinning).

    Scale shape: ONE shuffle on the key (``groupby().map_groups``); the
    per-group kernel jumps via ``searchsorted`` so the Python loop runs once
    per KEPT event, not per row. Partitioning assumption: one key's history
    fits a worker (same contract as asof_join/sessionize). Gap arithmetic is
    integer microseconds — exact in both numpy and the DuckDB oracle.
    """
    gap_us = int(min_gap_s) * 1_000_000
    key_list = list(keys)

    def _scan(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, order_col])
        ts_us = g[ts_col].to_numpy(dtype="datetime64[us]").view(np.int64)
        n = len(ts_us)
        keep_idx = []
        i = 0
        while i < n:
            keep_idx.append(i)
            j = int(np.searchsorted(ts_us, ts_us[i] + gap_us, side="left"))
            i = max(j, i + 1)
        return g.iloc[keep_idx].reset_index(drop=True)

    return events.groupby(key_list).map_groups(_scan, batch_format="pandas")


def event_transitions(
    events: ray.data.Dataset,
    keys: tuple = ("user_id",),
    type_col: str = "event_type",
    ts_col: str = "ts",
    order_col: str = "event_id",
) -> ray.data.Dataset:
    """Per-key event-sequence transition counts (the Markov bigram matrix a
    next-event model or funnel-anomaly detector trains on): within each
    key's ``(ts, order_col)``-ordered stream, count consecutive
    ``(src_type, dst_type)`` pairs, then sum globally.

    Scale shape: ONE shuffle on the key; each group emits at most
    ``|types|^2`` partial rows (combiner inside ``map_groups``), so the
    final groupby moves transition-matrix cells, never events."""
    from collections import Counter

    from ray.data.aggregate import Sum

    key_list = list(keys)

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        t = g.sort_values([ts_col, order_col])[type_col].to_numpy()
        c = Counter(zip(t[:-1], t[1:]))
        return pd.DataFrame(
            {
                "src_type": [k[0] for k in c],
                "dst_type": [k[1] for k in c],
                "n": list(c.values()),
            }
        )

    return (
        events.groupby(key_list)
        .map_groups(_pairs, batch_format="pandas")
        .groupby(["src_type", "dst_type"])
        .aggregate(Sum("n", alias_name="n"))
    )


def rolling_window_sum(
    events: ray.data.Dataset,
    value_col: str,
    keys: tuple = ("user_id",),
    window: int = 3,
    ts_col: str = "ts",
    order_col: str = "event_id",
    out_col: str = "rolling_sum",
) -> ray.data.Dataset:
    """Per-key ROWS-frame rolling sum: for each event, the sum of
    ``value_col`` over the last ``window`` events of its key (SQL ``SUM(v)
    OVER (PARTITION BY key ORDER BY ts, order ROWS BETWEEN window-1
    PRECEDING AND CURRENT ROW)``) — the bounded-lookback window family
    (trailing spend, rate-of-change features) alongside the time-based
    hopping/session windows above.

    Scale shape: ONE shuffle on the key; each group computes its frame
    sums vectorized (cumsum difference — O(n), no per-row rescan) and
    emits one row per event. Integer inputs stay integer-exact; float
    inputs match SQL only if the engine and the oracle use the same
    summation order (cumsum differences are NOT a left fold — keep the
    hash gate to integer values).
    """

    def _roll(g: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        g = g.sort_values([ts_col, order_col])
        v = g[value_col].to_numpy()
        cs = np.concatenate(([0], np.cumsum(v)))
        lo = np.maximum(0, np.arange(len(v)) - (window - 1))
        out = pd.DataFrame(
            {
                order_col: g[order_col].to_numpy(),
                out_col: cs[1 + np.arange(len(v))] - cs[lo],
            }
        )
        for k in keys:
            out[k] = g[k].iloc[0]
        return out[list(keys) + [order_col, out_col]]

    return events.groupby(list(keys)).map_groups(_roll, batch_format="pandas")


def ewma(
    events: ray.data.Dataset,
    alpha: float,
    value_col: str = "value",
    keys: tuple = ("user_id",),
    ts_col: str = "ts",
    order_col: str = "event_id",
    out_col: str = "ewma",
) -> ray.data.Dataset:
    """Per-key exponentially-weighted moving average: in ``(ts, order_col)``
    order, ``y_1 = x_1`` and ``y_i = alpha*x_i + (1-alpha)*y_{i-1}`` — the
    standard smoothing recurrence (trend baselines, anomaly thresholds,
    rate estimators). Like :func:`debounce_events`, the state is the
    previous OUTPUT, so no ``lag()`` window expresses it.

    Scale shape: ONE shuffle on the key; the recurrence is inherently
    sequential per key, so the kernel is a per-row fold INSIDE the group
    (a key's history is the unit of locality — the asof_join contract).

    Determinism contract: the fold evaluates the literal expression
    ``alpha*x + beta*y`` with ``beta`` computed ONCE as ``1 - alpha`` and
    both constants spliced verbatim into the SQL twin (``repr(alpha)``,
    ``repr(beta)``) — ``1 - 0.3`` and the literal ``0.7`` are DIFFERENT
    doubles, so the oracle must reuse the engine's beta, not re-derive it.
    """
    beta = 1.0 - alpha
    key_list = list(keys)

    def _fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, order_col])
        x = g[value_col].to_numpy(dtype=np.float64)
        out = np.empty(len(x), dtype=np.float64)
        y = x[0]
        out[0] = y
        for i in range(1, len(x)):
            y = alpha * x[i] + beta * y
            out[i] = y
        res = pd.DataFrame({order_col: g[order_col].to_numpy(), out_col: out})
        for k in key_list:
            res[k] = g[k].iloc[0]
        res[value_col] = x
        return res[key_list + [order_col, value_col, out_col]]

    return events.groupby(key_list).map_groups(_fold, batch_format="pandas")


def resample_ffill(
    events: ray.data.Dataset,
    freq_s: int,
    keys: tuple = ("user_id",),
    ts_col: str = "ts",
    order_col: str = "event_id",
    carry_cols: tuple = ("event_type", "value"),
) -> ray.data.Dataset:
    """Per-key regular-grid resampling with forward fill (the pandas
    ``resample(freq).last().ffill()`` convention): one output row per
    ``freq_s``-second slot from ``floor(min ts)`` to ``floor(max ts)`` of
    each key, labeled by the slot START and carrying the columns of the
    LAST event with ``ts < slot + freq`` (ties on ``ts`` broken by
    greatest ``order_col`` — the latest write wins). The first slot
    contains the key's first event by construction, so every slot is
    filled. The gap-filling shape every time-series feature pipeline
    needs before windowed models.

    Scale shape: ONE shuffle on the key; the grid is generated vectorized
    inside the group (``np.arange`` over integer microseconds) and filled
    with one ``searchsorted`` — no per-slot scan. Output volume is
    ``span/freq`` per key (bounded by each key's own observed span, never
    the global span). Carried values are copied verbatim (zero float
    arithmetic), so the hash gate is exact."""
    step_us = int(freq_s) * 1_000_000
    key_list = list(keys)

    def _grid(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, order_col])
        ts_us = g[ts_col].to_numpy(dtype="datetime64[us]").view(np.int64)
        lo = (ts_us[0] // step_us) * step_us
        hi = (ts_us[-1] // step_us) * step_us
        slots = np.arange(lo, hi + step_us, step_us, dtype=np.int64)
        # last event with ts < slot_end; rows are (ts, order)-sorted so
        # the index before the insertion point is the greatest order among
        # tied ts. slots[0] + step > ts_us[0], so idx >= 0 always.
        idx = np.searchsorted(ts_us, slots + step_us, side="left") - 1
        out = pd.DataFrame({"slot_ts": slots.view("datetime64[us]")})
        for c in carry_cols:
            out[c] = g[c].to_numpy()[idx]
        for k in key_list:
            out[k] = g[k].iloc[0]
        return out[key_list + ["slot_ts"] + list(carry_cols)]

    return events.groupby(key_list).map_groups(_grid, batch_format="pandas")


def scd2_intervals(
    events: ray.data.Dataset,
    value_col: str,
    keys: tuple = ("user_id",),
    ts_col: str = "ts",
    order_col: str = "event_id",
) -> ray.data.Dataset:
    """Compress a per-key event stream into SCD-2 validity intervals: one
    row per RUN of consecutive equal ``value_col`` values in ``(ts,
    order_col)`` order — ``(key..., value, start_<order>, valid_from,
    valid_to)`` with ``valid_to`` = the next run's start (null for the
    current run). The slowly-changing-dimension builder every warehouse
    derives from a change stream; the inverse of :func:`asof_join`. The
    run-starting ``order_col`` rides along so runs stay totally ordered
    even when two runs of one key start at the same timestamp.

    Scale shape: ONE shuffle on the key; run starts come from one
    vectorized shift-compare per group (no per-row scan), so cost is
    O(rows) with output proportional to the number of CHANGES."""
    key_list = list(keys)
    start_col = f"start_{order_col}"

    def _runs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, order_col])
        v = g[value_col].to_numpy()
        ts = g[ts_col].to_numpy()
        oid = g[order_col].to_numpy()
        start = np.empty(len(v), dtype=bool)
        start[0] = True
        start[1:] = v[1:] != v[:-1]
        idx = np.flatnonzero(start)
        out = pd.DataFrame(
            {
                value_col: v[idx],
                start_col: oid[idx],
                "valid_from": ts[idx],
                "valid_to": np.append(ts[idx[1:]], np.datetime64("NaT")),
            }
        )
        for k in key_list:
            out[k] = g[k].iloc[0]
        return out[key_list + [value_col, start_col, "valid_from", "valid_to"]]

    return events.groupby(key_list).map_groups(_runs, batch_format="pandas")


def time_weighted_average(
    events: ray.data.Dataset,
    keys: tuple = ("user_id",),
    ts_col: str = "ts",
    value_col: str = "value",
    order_col: str = "event_id",
) -> ray.data.Dataset:
    """Per-key TIME-weighted average of a step series (TWAP — the market /
    telemetry convention where a value holds until the next observation):
    with the key's events ordered by ``(ts, order_col)``, each value is
    weighted by the integer-microsecond interval to the NEXT event;
    ``twap = Σ value_i·Δt_i / Σ Δt_i`` over the n-1 intervals. Keys with
    all events at one timestamp (total span 0) are dropped — the average
    is undefined, matching the oracle's WHERE.

    Float parity: the weighted sum is a LEFT FOLD in event order of the
    per-interval ``value·Δt`` doubles (Δt exact int64 microseconds), so
    it matches the oracle's ``list_reduce(list(v*dt ORDER BY ts, id))``
    bit-exact; the final division is one mirrored double op.

    Scale shape: ONE shuffle on the key; the per-group kernel is
    vectorized except the Python-sum fold (the surprisal discipline).
    Partitioning assumption: one key's history fits a worker (the
    asof_join/debounce contract). Output: ``(keys..., n_events, span_us,
    twap)``.
    """
    key_list = list(keys)

    def _twap(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, order_col])
        ts_us = g[ts_col].to_numpy(dtype="datetime64[us]").view(np.int64)
        span = int(ts_us[-1] - ts_us[0])
        if span == 0:
            return pd.DataFrame(
                {
                    **{k: pd.Series(dtype=g[k].dtype) for k in key_list},
                    "n_events": pd.Series(dtype="int64"),
                    "span_us": pd.Series(dtype="int64"),
                    "twap": pd.Series(dtype="float64"),
                }
            )
        dt = (ts_us[1:] - ts_us[:-1]).astype("float64")
        vals = g[value_col].to_numpy(dtype="float64")[:-1]
        weighted = sum((vals * dt).tolist())  # left fold in event order
        row = {k: [g[k].iloc[0]] for k in key_list}
        row["n_events"] = [len(g)]
        row["span_us"] = [span]
        row["twap"] = [weighted / float(span)]
        return pd.DataFrame(row)

    return events.groupby(key_list).map_groups(_twap, batch_format="pandas")


def sequence_ngrams(
    events: ray.data.Dataset,
    keys: tuple = ("user_id",),
    type_col: str = "event_type",
    order_cols: tuple = ("ts", "event_id"),
    n: int = 3,
) -> ray.data.Dataset:
    """Per-key ordered sequence n-grams summed globally — the sequential
    pattern counts (event trigrams, conversation role flows) a
    next-action model or anomaly detector trains on; the n>2
    generalization of :func:`event_transitions`.

    Scale shape: ONE shuffle on the key; each group emits at most
    ``|types|^n`` partial rows (a Counter combiner inside ``map_groups``),
    so the final groupby moves n-gram cells, never events. Output:
    ``(t1..tn, n)``."""
    from collections import Counter

    from ray.data.aggregate import Sum

    key_list = list(keys)
    order_list = list(order_cols)
    gram_cols = [f"t{i + 1}" for i in range(n)]

    def _grams(g: pd.DataFrame) -> pd.DataFrame:
        t = g.sort_values(order_list)[type_col].to_numpy()
        c = Counter(zip(*(t[i : len(t) - (n - 1) + i] for i in range(n))))
        return pd.DataFrame(
            {
                **{gc: [k[i] for k in c] for i, gc in enumerate(gram_cols)},
                "n": list(c.values()),
            }
        )

    return (
        events.groupby(key_list)
        .map_groups(_grams, batch_format="pandas")
        .groupby(gram_cols)
        .aggregate(Sum("n", alias_name="n"))
    )
