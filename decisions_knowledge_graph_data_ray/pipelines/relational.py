"""Relational operator suite over the driver's testdata tables.

Each function takes ``sf_dir`` and returns a Ray Dataset / pandas DataFrame
whose schema + values match the oracle SQL registered in
``__ray_entry__.oracle_sql()`` (column names identical, floats rounded the
same on both sides).

These exercise the engine's generic operator library — pruned reads,
vectorized map_batches, partial-aggregate + groupby, hash joins (broadcast
and shuffled), sort/top-k, distinct, windowed event aggregation — the §2
operator families (S1, M1, A1-A8, J1-J10, O1-O4, D5) re-expressed on the
TPC-H-ish star schema.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Mean, Min, Sum

from ..functions import text_stats as T


def _read(sf_dir: str, table: str, columns=None) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _broadcast_cache(ref):
    """Per-worker-process cache for ray.put broadcast objects used from
    TASK-based map_batches (actors cache in __init__; tasks cache here).
    Shared implementation: stages/broadcast.broadcast_cache."""
    from ..stages.broadcast import broadcast_cache

    return broadcast_cache(ref)


def _partitioned_groupby(ds: rd.Dataset, key: str, per_group_fn, out_columns: list[str],
                         num_partitions: int = 64) -> rd.Dataset:
    """Hash-partition by key, ONE pandas groupby per partition: avoids Ray's
    per-group Python dispatch for high-cardinality keys (same shuffle volume)."""
    import pandas as pd

    from ..functions.hashing import bucket_ids

    def _pid(batch: pa.Table) -> pa.Table:
        return batch.append_column("pid", bucket_ids(batch[key], num_partitions))

    def _block(group: pd.DataFrame) -> pd.DataFrame:
        outs = [per_group_fn(g) for _, g in group.groupby(key, sort=False)]
        if not outs:
            return pd.DataFrame(columns=out_columns)
        return pd.concat(outs, ignore_index=True)[out_columns]

    return (
        ds.map_batches(_pid, batch_format="pyarrow")
        .groupby("pid")
        .map_groups(_block, batch_format="pandas")
    )


def _round_cols(df, spec: dict):
    for col, nd in spec.items():
        df[col] = df[col].round(nd)
    return df


# ---------------------------------------------------------------------------
# aggregations (A1/A3 family)
# ---------------------------------------------------------------------------


def q_lineitem_agg(sf_dir: str):
    """TPC-H Q1-style pricing summary: filter + groupby + multi-aggregate."""
    ds = _read(
        sf_dir,
        "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def _revenue(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        return batch.append_column("revenue", rev)

    out = (
        ds.map_batches(_revenue, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Sum("l_extendedprice", alias_name="sum_base_price"),
            Sum("revenue", alias_name="sum_revenue"),
            Mean("l_discount", alias_name="avg_disc"),
            Count(alias_name="count_order"),
        )
        .to_pandas()
    )
    out = _round_cols(out, {"sum_qty": 2, "sum_base_price": 2, "sum_revenue": 2, "avg_disc": 6})
    return out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


# Above this many orders the (o_orderkey → priority) dimension no longer
# belongs on the driver / in a broadcast object (orderkey cardinality grows
# linearly with the fact table); q_orders_priority_revenue switches to a
# bucketed shuffle join. Same pattern as stages/dedup.SIG_BROADCAST_MAX_DOCS.
DIM_BROADCAST_MAX_KEYS = 5_000_000


def q_orders_priority_revenue(sf_dir: str):
    """orders ⋈ lineitem → revenue per order priority.

    Two paths, switched on dimension cardinality (DIM_BROADCAST_MAX_KEYS):

    - **broadcast** (≤ threshold): the (o_orderkey → priority code) table is
      ray.put once and fetched once per worker; each lineitem batch maps
      keys to codes via a vectorized pandas-Index lookup and bincounts
      revenue into ≤|priorities| partial rows. The groupby then reduces
      |batches|×5 tiny rows — no all-to-all shuffle of lineitem.
    - **bucketed join** (> threshold): lineitem is reduced to
      (l_orderkey, revenue) and hash_bucket_join'd with orders, then a
      per-batch pyarrow partial aggregate shrinks each block to
      ≤|priorities| rows before the final tiny groupby. No driver-side
      materialization of either side at any cardinality.
    """
    import numpy as np
    import pandas as pd

    orders_ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    if orders_ds.count() > DIM_BROADCAST_MAX_KEYS:
        return _orders_priority_revenue_join(sf_dir, orders_ds)

    orders = orders_ds.to_pandas()
    prio_labels = sorted(orders["o_orderpriority"].unique())
    code_of = {p: i for i, p in enumerate(prio_labels)}
    dim_ref = ray.put(
        {
            "index": pd.Index(orders["o_orderkey"].to_numpy()),
            "codes": orders["o_orderpriority"].map(code_of).to_numpy(np.int64),
            "n_prio": len(prio_labels),
        }
    )
    lineitem = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"])

    # plain tasks, not an actor pool: the broadcast side is fetched via a
    # per-worker-process cache (ray.get is zero-copy-ish and amortized over
    # every batch the worker processes), so there is no actor cold-start
    def _partial_revenue(batch: pa.Table) -> pa.Table:
        dim = _broadcast_cache(dim_ref)
        index, codes_all, n = dim["index"], dim["codes"], dim["n_prio"]
        pos = index.get_indexer(batch["l_orderkey"].to_numpy())
        hit = pos >= 0  # inner-join semantics: drop unmatched keys
        codes = codes_all[pos[hit]]
        rev = (
            batch["l_extendedprice"].to_numpy() * (1.0 - batch["l_discount"].to_numpy())
        )[hit]
        return pa.table(
            {
                "prio_code": pa.array(np.arange(n), pa.int64()),
                "revenue": pa.array(np.bincount(codes, weights=rev, minlength=n)),
                "n_items": pa.array(np.bincount(codes, minlength=n).astype(np.int64)),
            }
        )

    partials = lineitem.map_batches(_partial_revenue, batch_format="pyarrow")
    out = (
        partials.groupby("prio_code")
        .aggregate(Sum("revenue", alias_name="revenue"), Sum("n_items", alias_name="n_items"))
        .to_pandas()
    )
    out["o_orderpriority"] = out["prio_code"].map(dict(enumerate(prio_labels)))
    out = _round_cols(out, {"revenue": 2})
    out = out[out["n_items"] > 0][["o_orderpriority", "revenue", "n_items"]]
    return out.sort_values("o_orderpriority").reset_index(drop=True)


def _orders_priority_revenue_join(sf_dir: str, orders_ds: rd.Dataset):
    """Unbounded-dimension path: bucketed shuffle join, partial-aggregate
    before the final groupby. Result-identical to the broadcast path
    (test_relational gates equality)."""
    from ..stages.joins import hash_bucket_join

    lineitem = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def _revenue(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        return pa.table({"l_orderkey": batch["l_orderkey"], "revenue": rev})

    rev = lineitem.map_batches(_revenue, batch_format="pyarrow")
    joined = hash_bucket_join(
        rev,
        orders_ds,
        on="l_orderkey",
        right_on="o_orderkey",
        output_columns=["o_orderpriority", "revenue"],
        num_buckets=64,
    )

    def _partial(batch: pa.Table) -> pa.Table:
        out = pa.TableGroupBy(batch, "o_orderpriority").aggregate(
            [("revenue", "sum"), ([], "count_all")]
        )
        remap = {"revenue_sum": "revenue", "count_all": "n_items"}
        return out.rename_columns([remap.get(c, c) for c in out.column_names])

    out = (
        joined.map_batches(_partial, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(Sum("revenue", alias_name="revenue"), Sum("n_items", alias_name="n_items"))
        .to_pandas()
    )
    out = _round_cols(out, {"revenue": 2})
    out = out[out["n_items"] > 0][["o_orderpriority", "revenue", "n_items"]]
    return out.sort_values("o_orderpriority").reset_index(drop=True)


def q_top_customers(sf_dir: str):
    """customer ⋈ orders → top-10 customers by total spend.

    Bounded at every cardinality (no dimension broadcast at all): the
    top-10 is computed FIRST over the per-customer aggregate (partial-top-k
    combiner, names not needed), then the customer table is streamed once
    with a 10-key ``is_in`` filter to fetch just the winners' names. The
    only driver-side state is ≤10×blocks combiner rows and the final ≤10
    (custkey, name) pairs — replaces the former full (c_custkey→c_name)
    ``ray.put`` broadcast, which grew linearly with scale."""
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    totals = (
        orders.groupby("o_custkey")
        .aggregate(Sum("o_totalprice", alias_name="total_spent"), Count(alias_name="n_orders"))
    )

    # per-batch partial top-10 (combiner) → driver sorts ≤ 10×blocks rows,
    # never the full per-customer table
    def _partial_top(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        # round BEFORE selecting so the partial ordering (rounded desc,
        # custkey asc) is the same total order the final sort uses — the
        # combiner stays lossless across rounding ties
        df["total_spent"] = df["total_spent"].round(2)
        return pa.Table.from_pandas(
            df.sort_values(["total_spent", "o_custkey"], ascending=[False, True]).head(10),
            preserve_index=False,
        )

    out = totals.map_batches(_partial_top, batch_format="pyarrow").to_pandas()
    out = out.rename(columns={"o_custkey": "c_custkey"})
    out = _round_cols(out, {"total_spent": 2})
    out = out.sort_values(["total_spent", "c_custkey"], ascending=[False, True]).head(10)

    # name lookup for ONLY the winning keys: stream customer once with a
    # 10-key filter; ≤10 rows ever reach the driver
    win_keys = pa.array(out["c_custkey"].to_numpy())
    names = (
        _read(sf_dir, "customer", columns=["c_custkey", "c_name"])
        .map_batches(
            lambda b: b.filter(pc.is_in(b["c_custkey"], value_set=win_keys)),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    out = out.merge(names, on="c_custkey", how="left")
    return out[["c_custkey", "c_name", "total_spent", "n_orders"]].reset_index(drop=True)


def q_region_customer_counts(sf_dir: str):
    """3-way join region ⋈ nation ⋈ customer → customers + balance per region."""
    region = _read(sf_dir, "region")
    nation = _read(sf_dir, "nation")
    customer = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey", "c_acctbal"])
    n_r = nation.join(region, "inner", 4, on=("n_regionkey",), right_on=("r_regionkey",))
    c_n = customer.join(
        n_r.select_columns(["n_nationkey", "r_name"]), "inner", 4,
        on=("c_nationkey",), right_on=("n_nationkey",),
    )
    out = (
        c_n.groupby("r_name")
        .aggregate(Count(alias_name="n_customers"), Sum("c_acctbal", alias_name="total_acctbal"))
        .to_pandas()
    )
    out = _round_cols(out, {"total_acctbal": 2})
    return out.sort_values("r_name").reset_index(drop=True)


def q_part_type_stats(sf_dir: str):
    """Vectorized filter (LIKE + range) + groupby brand."""
    part = _read(sf_dir, "part", columns=["p_brand", "p_type", "p_size", "p_retailprice"])

    def _filter(batch: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.match_substring(batch["p_type"], "AND"), pc.greater_equal(batch["p_size"], 10)
        )
        return batch.filter(mask)

    out = (
        part.map_batches(_filter, batch_format="pyarrow")
        .groupby("p_brand")
        .aggregate(
            Count(alias_name="n_parts"),
            Mean("p_retailprice", alias_name="avg_price"),
            Max("p_size", alias_name="max_size"),
        )
        .to_pandas()
    )
    out = _round_cols(out, {"avg_price": 4})
    return out.sort_values("p_brand").reset_index(drop=True)


def q_supplier_balance_by_nation(sf_dir: str):
    supplier = _read(sf_dir, "supplier", columns=["s_nationkey", "s_acctbal"])
    nation = _read(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    joined = supplier.join(nation, "inner", 4, on=("s_nationkey",), right_on=("n_nationkey",))
    out = (
        joined.groupby("n_name")
        .aggregate(
            Count(alias_name="n_suppliers"),
            Sum("s_acctbal", alias_name="total_bal"),
            Min("s_acctbal", alias_name="min_bal"),
        )
        .to_pandas()
    )
    out = _round_cols(out, {"total_bal": 2, "min_bal": 2})
    return out.sort_values("n_name").reset_index(drop=True)


# ---------------------------------------------------------------------------
# events: windowed aggregation + top-k (streaming-shaped log table)
# ---------------------------------------------------------------------------


def q_events_hourly(sf_dir: str):
    """Tumbling 1-hour windows per event_type: count + sum(value).

    Ordering assumption: none needed — tumbling windows are a pure groupby
    on (event_type, hour bucket); partial-aggregated inside map_batches.
    """
    events = _read(sf_dir, "events", columns=["ts", "event_type", "value"])

    def _bucket(batch: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(batch["ts"], unit="hour")
        return pa.table({"event_type": batch["event_type"], "hour": hour, "value": batch["value"]})

    out = (
        events.map_batches(_bucket, batch_format="pyarrow")
        .groupby(["event_type", "hour"])
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="sum_value"))
        .to_pandas()
    )
    out = _round_cols(out, {"sum_value": 2})
    return out.sort_values(["event_type", "hour"]).reset_index(drop=True)


def q_events_top_users(sf_dir: str):
    """Top-20 users by event count (tie-broken by user_id): per-batch
    partial top-20 combiner after the per-user aggregate, so the driver
    sorts ≤ 20×blocks rows, never the full user table."""
    events = _read(sf_dir, "events", columns=["user_id", "value"])
    totals = events.groupby("user_id").aggregate(
        Count(alias_name="n_events"), Sum("value", alias_name="sum_value")
    )

    def _partial_top(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        return pa.Table.from_pandas(
            df.sort_values(["n_events", "user_id"], ascending=[False, True]).head(20),
            preserve_index=False,
        )

    out = totals.map_batches(_partial_top, batch_format="pyarrow").to_pandas()
    out = _round_cols(out, {"sum_value": 2})
    out = out.sort_values(["n_events", "user_id"], ascending=[False, True]).head(20)
    return out.reset_index(drop=True)


def q_events_sessionized(sf_dir: str):
    """Session windows per user (gap > 30 min splits): per-user ordered
    map_groups — the engine's ordered-log window pattern."""
    events = _read(sf_dir, "events", columns=["user_id", "ts", "value"])

    def _sessions(g):
        g = g.sort_values("ts", kind="stable")
        gap = g["ts"].diff().dt.total_seconds().fillna(0.0)
        session = (gap > 1800).cumsum()
        agg = g.groupby(session).agg(
            session_start=("ts", "min"), n_events=("ts", "count"), sum_value=("value", "sum")
        )
        agg["user_id"] = g["user_id"].iloc[0]
        return agg.reset_index(drop=True)

    out = _partitioned_groupby(
        events, "user_id", _sessions, ["user_id", "session_start", "n_events", "sum_value"]
    ).to_pandas()
    out = _round_cols(out, {"sum_value": 2})
    return (
        out[["user_id", "session_start", "n_events", "sum_value"]]
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )


def q_events_funnel(sf_dir: str):
    """Ordered funnel analysis (view -> click -> purchase) per user: the
    greedy earliest-match scan over the (ts, event_id)-ordered event log —
    equivalent to first-view / first-click-after / first-purchase-after
    (earliest-first is maximal). Per-user ordered map over the same
    hash-partitioned cogroup shape as sessionization; no global sort."""
    import numpy as np
    import pandas as pd

    events = _read(sf_dir, "events", columns=["user_id", "ts", "event_id", "event_type"])
    seq = ("view", "click", "purchase")

    def _funnel(g: pd.DataFrame) -> pd.DataFrame:
        types = g.sort_values(["ts", "event_id"], kind="stable")["event_type"].to_numpy()
        pos, stage = -1, 0
        for step in seq:
            nxt = np.nonzero(types[pos + 1 :] == step)[0]
            if len(nxt) == 0:
                break
            pos += 1 + int(nxt[0])
            stage += 1
        return pd.DataFrame({"user_id": [g["user_id"].iloc[0]], "funnel_stage": [stage]})

    out = _partitioned_groupby(events, "user_id", _funnel, ["user_id", "funnel_stage"]).to_pandas()
    out["funnel_stage"] = out["funnel_stage"].astype("int64")
    return out.sort_values("user_id").reset_index(drop=True)


def q_events_retention(sf_dir: str):
    """Cohort retention: users grouped by first-activity hour (the cohort),
    counted as retained at every hour offset they are active again. Shape:
    combiner-first per-user Min (first ts) -> one bounded hash join back to
    the event stream -> distinct (user, offset) via the pid-cogroup distinct
    -> combiner-first (cohort, offset) count. No global sort; the join and
    both distincts are hash-bucketed on user_id."""
    import pandas as pd
    from ray.data.aggregate import Min, Sum

    from ..stages.graph import distinct_pairs
    from ..stages.joins import hash_bucket_join

    events = _read(sf_dir, "events", columns=["user_id", "ts"])

    def _min_partial(batch: pa.Table) -> pa.Table:
        out = pa.TableGroupBy(batch.select(["user_id", "ts"]), "user_id").aggregate(
            [("ts", "min")]
        )
        return out.rename_columns(["user_id", "first_ts"])

    firsts = (
        events.map_batches(_min_partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Min("first_ts", alias_name="first_ts"))
    )

    ev_schema = pa.schema([("user_id", pa.int64()), ("ts", pa.timestamp("us"))])
    f_schema = pa.schema([("user_id", pa.int64()), ("first_ts", pa.timestamp("us"))])
    joined = hash_bucket_join(
        events,
        firsts,
        on="user_id",
        output_columns=["user_id", "ts", "first_ts"],
        left_schema=ev_schema,
        right_schema=f_schema,
    )

    def _offsets(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        cohort = df["first_ts"].dt.floor("h")
        offset = (
            (df["ts"].dt.floor("h") - cohort).dt.total_seconds() // 3600
        ).astype("int64")
        return pa.table(
            {
                "user_id": pa.array(df["user_id"], pa.int64()),
                "cohort_hour": pa.Array.from_pandas(cohort, type=pa.timestamp("us")),
                "offset_hours": pa.array(offset, pa.int64()),
            }
        )

    triples = distinct_pairs(
        joined.map_batches(_offsets, batch_format="pyarrow"),
        ["user_id", "cohort_hour", "offset_hours"],
    )

    def _count_partial(batch: pa.Table) -> pa.Table:
        out = pa.TableGroupBy(
            batch.select(["cohort_hour", "offset_hours"]), ["cohort_hour", "offset_hours"]
        ).aggregate([([], "count_all")])
        return out.rename_columns(["cohort_hour", "offset_hours", "n_users"])

    out = (
        triples.map_batches(_count_partial, batch_format="pyarrow")
        .groupby(["cohort_hour", "offset_hours"])
        .aggregate(Sum("n_users", alias_name="n_users"))
        .to_pandas()
    )
    return out.sort_values(["cohort_hour", "offset_hours"]).reset_index(drop=True)


# ---------------------------------------------------------------------------
# documents: text analysis + dedup (training-data ops with SQL oracles)
# ---------------------------------------------------------------------------


def q_documents_token_counts(sf_dir: str):
    """Whitespace + BPE-ish token counts per document."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def _counts(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_ws_tokens": pa.array([T.whitespace_token_count(t) for t in texts], pa.int64()),
                "n_word_tokens": pa.array([T.word_token_count(t) for t in texts], pa.int64()),
            }
        )

    return docs.map_batches(_counts, batch_format="pyarrow").to_pandas().sort_values(
        "doc_id"
    ).reset_index(drop=True)


def q_documents_exact_dedup(sf_dir: str):
    """Exact dedup: min doc_id per md5(text) (D4/D5)."""
    from ..stages.dedup import exact_dedup

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = exact_dedup(docs).to_pandas()
    return out.sort_values("content_hash").reset_index(drop=True)


def q_documents_langid(sf_dir: str):
    """Stopword-argmax language ID counts per (lang, lang_pred)."""
    from ..stages.text_analysis import language_id

    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    out = (
        language_id(docs)
        .groupby(["lang", "lang_pred"])
        .aggregate(Count(alias_name="n_docs"))
        .to_pandas()
    )
    return out.sort_values(["lang", "lang_pred"]).reset_index(drop=True)


def q_documents_quality(sf_dir: str):
    """Quality metrics per doc (ratios rounded to 6)."""
    from ..stages.text_analysis import quality_score

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = quality_score(docs).select_columns(
        ["doc_id", "n_chars", "n_tokens", "punct_ratio", "keep"]
    ).to_pandas()
    out = _round_cols(out, {"punct_ratio": 6})
    return out.sort_values("doc_id").reset_index(drop=True)


def q_embeddings_topk(sf_dir: str, k: int = 5):
    """Brute-force cosine top-k vs the first 3 vectors as queries.

    Uses the stages/similarity partial-top-k combiner (each batch emits only
    its k best rows per query, not B×Q pairs — round-1 'What's wrong' #1).
    float64 math + round-before-topk so the DuckDB list_cosine_similarity
    oracle matches to 6 dp including ties."""
    import numpy as np

    from ..stages.similarity import brute_force_topk

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    qdf = emb.filter(expr="vec_id < 3").to_pandas().sort_values("vec_id")
    q_ref = ray.put(
        {
            "query_id": qdf["vec_id"].tolist(),
            "matrix": np.asarray(qdf["embedding"].tolist(), dtype=np.float64),
        }
    )
    out = brute_force_topk(emb, q_ref, k=k, dtype=np.float64, round_to=6).to_pandas()
    return (
        out[["query_id", "vec_id", "cosine", "rank"]]
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )


def q_orders_distinct_status(sf_dir: str):
    """DISTINCT via groupby (D5)."""
    orders = _read(sf_dir, "orders", columns=["o_orderstatus"])
    out = orders.groupby("o_orderstatus").aggregate(Count(alias_name="n")).to_pandas()
    return out.sort_values("o_orderstatus").reset_index(drop=True)


def q_lineitem_shipdate_window(sf_dir: str):
    """Per-order running quantity by shipdate (ordered window in map_groups)."""
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber", "l_shipdate", "l_quantity"])

    def _running(g):
        # l_quantity as the last sort key: (shipdate, linenumber) can tie, and
        # rows tied on all three produce the same running-value multiset in
        # any order — keeps the output deterministic vs the SQL oracle
        g = g.sort_values(["l_shipdate", "l_linenumber", "l_quantity"], kind="stable").copy()
        g["running_qty"] = g["l_quantity"].cumsum().round(2)
        return g

    out = _partitioned_groupby(
        li, "l_orderkey", _running,
        ["l_orderkey", "l_linenumber", "l_shipdate", "l_quantity", "running_qty"],
    ).to_pandas()
    return (
        out[["l_orderkey", "l_linenumber", "running_qty"]]
        .sort_values(["l_orderkey", "l_linenumber"])
        .reset_index(drop=True)
    )


def q_documents_length_stats(sf_dir: str):
    """A3 analogue: per-length-category stats (min/max/avg/median/p25/p75 of
    n_chars). Few groups → per-group numpy percentiles (linear interpolation,
    matching DuckDB quantile_cont)."""
    import numpy as np

    from ..functions.normalize import length_category

    docs = _read(sf_dir, "documents", columns=["text"])

    def _cat(batch: pa.Table) -> pa.Table:
        lens = [len(t) for t in batch["text"].to_pylist()]
        return pa.table(
            {
                "length_category": pa.array([length_category(n) for n in lens], pa.string()),
                "n_chars": pa.array(lens, pa.int64()),
            }
        )

    def _stats(group):
        import pandas as pd

        v = group["n_chars"].to_numpy()
        return pd.DataFrame(
            [
                {
                    "length_category": group["length_category"].iloc[0],
                    "n_docs": len(v),
                    "min_chars": int(v.min()),
                    "max_chars": int(v.max()),
                    "avg_chars": round(float(v.mean()), 4),
                    "median_chars": round(float(np.percentile(v, 50)), 4),
                    "p25_chars": round(float(np.percentile(v, 25)), 4),
                    "p75_chars": round(float(np.percentile(v, 75)), 4),
                }
            ]
        )

    out = (
        docs.map_batches(_cat, batch_format="pyarrow")
        .groupby("length_category")
        .map_groups(_stats, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("length_category").reset_index(drop=True)


def q_documents_corr(sf_dir: str):
    """A3 analogue: Pearson correlation of doc length vs whitespace tokens.

    Computed from distributed moment sums (sum x, sum y, sum xy, sum x²,
    sum y², n) — a single partial-aggregate pass, finalized on the driver."""
    import pandas as pd

    docs = _read(sf_dir, "documents", columns=["text"])

    def _moments(batch: pa.Table) -> pa.Table:
        xs = [float(len(t)) for t in batch["text"].to_pylist()]
        ys = [float(T.whitespace_token_count(t)) for t in batch["text"].to_pylist()]
        return pa.table(
            {
                "n": [float(len(xs))],
                "sx": [sum(xs)],
                "sy": [sum(ys)],
                "sxx": [sum(x * x for x in xs)],
                "syy": [sum(y * y for y in ys)],
                "sxy": [sum(x * y for x, y in zip(xs, ys))],
            }
        )

    m = docs.map_batches(_moments, batch_format="pyarrow").to_pandas().sum()
    n = m["n"]
    cov = m["sxy"] - m["sx"] * m["sy"] / n
    vx = m["sxx"] - m["sx"] ** 2 / n
    vy = m["syy"] - m["sy"] ** 2 / n
    corr = cov / (vx**0.5 * vy**0.5) if vx > 0 and vy > 0 else 0.0
    return pd.DataFrame([{"corr_chars_tokens": round(float(corr), 6)}])


def q_documents_sample_limit(sf_dir: str, n: int = 50):
    """O4 eval sampling: deterministic first-N slice by doc_id."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def _len(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_chars": pa.array([len(t) for t in batch["text"].to_pylist()], pa.int64()),
            }
        )

    out = docs.map_batches(_len, batch_format="pyarrow").sort("doc_id").limit(n).to_pandas()
    return out.reset_index(drop=True)


def q_events_asof_join(sf_dir: str):
    """As-of join: for each 'purchase' event, the most recent prior (or
    simultaneous) 'view' event by the same user — DuckDB ``ASOF JOIN``
    semantics via stages/windows.asof_join (hash-bucketed by user, pandas
    merge_asof per bucket)."""
    from ..stages.windows import asof_join

    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type", "value"])
    left = ev.filter(expr="event_type == 'purchase'").select_columns(
        ["event_id", "ts", "user_id", "value"]
    )
    # deterministic right side: one row per (user_id, ts) keeping max
    # event_id — tie-broken inside the as-of merge (rides the cogroup; no
    # separate dedupe shuffle)
    right = ev.filter(expr="event_type == 'view'").select_columns(
        ["event_id", "ts", "user_id", "value"]
    )
    out = asof_join(
        left, right, on="ts", by="user_id", right_columns=["event_id", "value"],
        suffix="_view", right_tie_cols=["event_id"],
    ).to_pandas()
    out = out.rename(columns={"event_id_view": "view_event_id", "value_view": "view_value"})
    # no-match sentinels (-1 / 0.0) keep plain int64/float64 dtypes on both
    # the Ray and DuckDB sides of the driver's value-hash compare
    out["view_event_id"] = out["view_event_id"].fillna(-1).astype("int64")
    out["view_value"] = out["view_value"].fillna(0.0)
    out = _round_cols(out, {"value": 6, "view_value": 6})
    return (
        out[["event_id", "user_id", "ts", "value", "view_event_id", "view_value"]]
        .sort_values("event_id")
        .reset_index(drop=True)
    )


def q_events_hopping(sf_dir: str):
    """Hopping-window aggregate: event counts + value sums per (1h window
    every 15min, event_type) — combiner-first window expansion."""
    from ..stages.windows import hopping_window_count

    ev = _read(sf_dir, "events", columns=["ts", "event_type", "value"])
    out = hopping_window_count(
        ev, ts_col="ts", size_s=3600, hop_s=900, group_col="event_type", value_col="value"
    ).to_pandas()
    out = _round_cols(out, {"value_sum": 4})
    return (
        out[["window_start", "event_type", "n", "value_sum"]]
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )


def q_embeddings_cosine_pairs(sf_dir: str, threshold: float = 0.4):
    """Exact cosine-threshold self-join (the LSH dup-pair oracle)."""
    from ..stages.similarity import cosine_pairs_exact

    emb = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = cosine_pairs_exact(emb, threshold=threshold).to_pandas()
    # empty result drops columns (documented Ray empty-block contract)
    out = out.reindex(columns=["src_id", "dst_id", "cosine"])
    return out.sort_values(["src_id", "dst_id"]).reset_index(drop=True)


def q_documents_jaccard_pairs(sf_dir: str, threshold: float = 0.8):
    """Exact char-5-gram Jaccard self-join via prefix filtering (the
    MinHash estimate's exact counterpart)."""
    from ..stages.dedup import jaccard_similarity_join

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = jaccard_similarity_join(docs, threshold=threshold).to_pandas()
    return out.sort_values(["src_id", "dst_id"]).reset_index(drop=True)


def q_events_interval_join(sf_dir: str):
    """Keyed range join: for every purchase, all events of the SAME user in
    the half-open 30-minute window starting at the purchase — counts + value
    sums per purchase. DuckDB inequality-join semantics via
    stages/windows.interval_join (hash cogroup on user_id, vectorized
    merge+filter per bucket), aggregated combiner-first."""
    import numpy as np
    import pyarrow.compute as pc

    from ..stages.windows import interval_join

    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type", "value"])

    def _mk_intervals(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b["event_type"], "purchase"))
        end = pc.add(b["ts"].cast(pa.int64()), 30 * 60 * 1_000_000).cast(pa.timestamp("us"))
        return pa.table(
            {
                "user_id": b["user_id"],
                "purchase_id": b["event_id"],
                "w_start": b["ts"],
                "w_end": end,
            }
        )

    intervals = ev.map_batches(_mk_intervals, batch_format="pyarrow")
    points = ev.select_columns(["event_id", "ts", "user_id", "value"])
    pairs = interval_join(
        points, intervals, on="ts", start="w_start", end="w_end",
        interval_columns=["purchase_id"], by="user_id",
    )

    # combiner-first aggregate per purchase (pid cogroup, Arrow C++ agg)
    num_partitions = 32

    def _partial(batch: pa.Table) -> pa.Table:
        out = pa.TableGroupBy(
            batch.select(["purchase_id_i", "value"]), "purchase_id_i"
        ).aggregate([("value", "sum"), ([], "count_all")])
        names = {"value_sum": "sum_value", "count_all": "n_events", "purchase_id_i": "purchase_id"}
        out = out.rename_columns([names.get(c, c) for c in out.column_names])
        pid = pc.cast(
            pc.bit_wise_and(out["purchase_id"], pa.scalar(num_partitions - 1, pa.int64())),
            pa.int32(),
        )
        return out.append_column("pid", pid)

    def _final(group: pa.Table) -> pa.Table:
        out = pa.TableGroupBy(
            group.select(["purchase_id", "sum_value", "n_events"]), "purchase_id"
        ).aggregate([("sum_value", "sum"), ("n_events", "sum")])
        names = {"sum_value_sum": "sum_value", "n_events_sum": "n_events"}
        return out.rename_columns([names.get(c, c) for c in out.column_names])

    df = (
        pairs.map_batches(_partial, batch_format="pyarrow", batch_size=None)
        .groupby("pid")
        .map_groups(_final, batch_format="pyarrow")
        .to_pandas()
    )
    df = _round_cols(df, {"sum_value": 2})
    return (
        df[["purchase_id", "n_events", "sum_value"]]
        .sort_values("purchase_id")
        .reset_index(drop=True)
    )


def q_events_pivot(sf_dir: str):
    """Long→wide reshape: per-user event-type count columns over the CLOSED
    event-type set (stages/reshape.pivot_counts — per-batch (key,cat) count
    combiner, pid cogroup, static wide schema)."""
    from ..stages.reshape import pivot_counts

    ev = _read(sf_dir, "events", columns=["user_id", "event_type"])
    cats = ["click", "error", "purchase", "signup", "view"]
    df = pivot_counts(ev, "user_id", "event_type", cats).to_pandas()
    return df.sort_values("user_id").reset_index(drop=True)


def q_documents_stratified(sf_dir: str):
    """Deterministic stratified sample: first 5 doc_ids per PREDICTED
    LANGUAGE (stages/reshape.stratified_head — per-batch per-stratum top-k
    combiner; strata = the closed language set of the langid heuristic)."""
    from ..stages.reshape import stratified_head

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def _cat(batch: pa.Table) -> pa.Table:
        langs = [T.detect_language(t) for t in batch["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "lang_pred": pa.array(langs, pa.string()),
                "text_len": pa.array([len(t) for t in batch["text"].to_pylist()], pa.int64()),
            }
        )

    cats = docs.map_batches(_cat, batch_format="pyarrow")
    out = stratified_head(
        cats, stratum_col="lang_pred", order_col="doc_id", k=5,
        columns=["lang_pred", "doc_id", "text_len"],
    ).to_pandas()
    return (
        out[["lang_pred", "doc_id", "text_len"]]
        .sort_values(["lang_pred", "doc_id"])
        .reset_index(drop=True)
    )


def q_events_attribution(sf_dir: str):
    """Last-touch marketing attribution: each 'purchase' is credited to the
    most recent prior 'click'/'view' by the same user within a 24h window,
    else 'direct' — composed from the engine's own primitives: ONE
    backward as-of join (stages/windows.asof_join, right side tie-broken
    inside the cogroup) + a vectorized channel map + a combiner-first
    aggregate (stages/skew.combiner_aggregate). Output: per channel, the
    conversion count and total purchase value (rounded 6)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..stages.skew import combiner_aggregate
    from ..stages.windows import asof_join

    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type", "value"])
    # one map_batches per side (filter + project fused): asof_join infers
    # its pack schema from left.schema(), and a Filter->Project chain's
    # lazy schema can surface the unprojected parquet schema
    purchases = ev.map_batches(
        lambda b: b.filter(pc.equal(b["event_type"], "purchase")).select(
            ["event_id", "ts", "user_id", "value"]
        ),
        batch_format="pyarrow",
    )
    touches = ev.map_batches(
        lambda b: b.filter(pc.is_in(b["event_type"], pa.array(["click", "view"]))),
        batch_format="pyarrow",
    ).select_columns(["event_id", "ts", "user_id", "event_type"])

    joined = asof_join(
        purchases,
        touches,
        on="ts",
        by="user_id",
        # event_id rides along so right_tie_cols can break (user, ts) ties
        right_columns=["ts", "event_type", "event_id"],
        suffix="_t",
        right_tie_cols=["event_id"],
    )

    window_us = 24 * 3600 * 1_000_000

    def _channel(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        ts_t = batch["ts_t"].cast(pa.timestamp("us")).cast(pa.int64())
        within = pc.and_kleene(
            pc.is_valid(ts_t),
            pc.less_equal(pc.subtract_checked(ts, pc.coalesce(ts_t, ts)), window_us),
        )
        channel = pc.if_else(
            pc.coalesce(within, pa.scalar(False)),
            pc.coalesce(batch["event_type_t"], pa.scalar("direct")),
            pa.scalar("direct"),
        )
        return pa.table({"channel": channel, "value": batch["value"]})

    out = combiner_aggregate(
        joined.map_batches(_channel, batch_format="pyarrow"),
        ["channel"],
        {"n_conversions": ("count", None), "total_value": ("sum", "value")},
    ).to_pandas()
    out["total_value"] = out["total_value"].round(6)
    return out.sort_values("channel").reset_index(drop=True)
