"""Graph analytics over the constructed knowledge graph.

Downstream of construction, the reference's users analyze the citation
network (citationStatisticsAnalyzer.ts:12-80 is the histogram cousin);
these are the graph-shaped follow-ons: node degrees, co-citation pairs
(two decisions cited by the same document — the classic legal-citation
coupling measure), and bounded k-hop neighborhood expansion.

All operators are Ray-Data-first and combiner-first:

- ``node_degrees``: two bounded shuffles — a per-batch (node, group)
  pre-count, then per-node sums; the shuffle carries one row per distinct
  (node, group) per batch, never one per edge.
- ``cocitation_pairs``: pid-cogroup pair emission (np.triu_indices per
  group, the dedup.py pattern) with a per-pid combiner before the final
  (src, dst) count — pair explosion is bounded by the per-group degree,
  which for citations is tens, not millions.
- ``k_hop``: BFS frontier expansion where the frontier and visited sets
  stay DATASETS — each hop is a distributed semi-join (edges ⋉ frontier)
  plus an anti-join against visited (both via hash_bucket_join), so no
  node set is ever materialized on the driver. One barrier per hop is
  inherent to BFS (hop h+1 needs hop h complete); k is small by use-case.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Sum

from ..functions.hashing import bucket_ids
from .joins import hash_bucket_join

_NODE_T = pa.string()


def node_degrees(
    edges: ray.data.Dataset,
    node_col: str,
    group_col: str,
) -> ray.data.Dataset:
    """(node, n_edges, n_groups): edge count + distinct-group count per node.

    ``n_edges`` counts edge rows; ``n_groups`` counts distinct ``group_col``
    values per node (for a citation graph: citations vs citing documents).
    """

    def _pair_partial(batch: pa.Table) -> pa.Table:
        out = pa.TableGroupBy(
            batch.select([node_col, group_col]), [node_col, group_col]
        ).aggregate([([], "count_all")])
        return out.rename_columns([node_col, group_col, "cnt"])

    per_pair = (
        edges.map_batches(_pair_partial, batch_format="pyarrow")
        .groupby([node_col, group_col])
        .aggregate(Sum("cnt", alias_name="cnt"))
    )

    # per_pair rows are globally unique (node, group) after the shuffle, so
    # a row count per node IS the distinct-group count
    def _node_partial(batch: pa.Table) -> pa.Table:
        out = pa.TableGroupBy(batch.select([node_col, "cnt"]), node_col).aggregate(
            [("cnt", "sum"), ([], "count_all")]
        )
        return out.rename_columns([node_col, "n_edges", "n_groups"])

    return (
        per_pair.map_batches(_node_partial, batch_format="pyarrow")
        .groupby(node_col)
        .aggregate(Sum("n_edges", alias_name="n_edges"), Sum("n_groups", alias_name="n_groups"))
    )


def top_nodes(degrees: ray.data.Dataset, node_col: str, k: int) -> pd.DataFrame:
    """Top-k by (n_edges desc, node asc) — partial-top-k per block before
    the driver pick (brute_force_topk discipline), never a full sort."""

    def _topk(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df.sort_values(["n_edges", node_col], ascending=[False, True]).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    out = degrees.map_batches(_topk, batch_format="pyarrow").to_pandas()
    return (
        out.sort_values(["n_edges", node_col], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )


def cocitation_pairs(
    edges: ray.data.Dataset,
    group_col: str,
    node_col: str,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """(src, dst, n_groups): unordered node pairs (src < dst) co-occurring
    in the same group, with the number of groups containing both. Input
    edge rows may repeat; co-occurrence is counted per DISTINCT
    (group, node)."""

    def _pid(batch: pa.Table) -> pa.Table:
        return batch.select([group_col, node_col]).append_column(
            "pid", bucket_ids(batch[group_col], num_partitions)
        )

    def _pairs(group: pd.DataFrame) -> pd.DataFrame:
        src, dst = [], []
        for _, g in group.groupby(group_col, sort=False):
            nodes = np.sort(g[node_col].drop_duplicates().to_numpy())
            if len(nodes) < 2:
                continue
            iu, ju = np.triu_indices(len(nodes), k=1)
            src.append(nodes[iu])
            dst.append(nodes[ju])
        if not src:
            return pd.DataFrame(
                {
                    "src": pd.Series(dtype="object"),
                    "dst": pd.Series(dtype="object"),
                    "n_groups": pd.Series(dtype="int64"),
                }
            )
        out = pd.DataFrame({"src": np.concatenate(src), "dst": np.concatenate(dst)})
        # combiner: count within the pid before the pair shuffle
        return out.groupby(["src", "dst"], sort=False).size().reset_index(name="n_groups")

    return (
        edges.map_batches(_pid, batch_format="pyarrow")
        .groupby("pid")
        .map_groups(_pairs, batch_format="pandas")
        .groupby(["src", "dst"])
        .aggregate(Sum("n_groups", alias_name="n_groups"))
    )


def k_hop(
    edges: ray.data.Dataset,
    seeds: list[str],
    k: int,
    src_col: str = "src",
    dst_col: str = "dst",
    num_buckets: int = 16,
) -> ray.data.Dataset:
    """Min-hop BFS distances: every node within ``k`` directed hops of the
    seed set, as (node, hop). Pass a symmetrized edge set for undirected
    semantics. Seeds are hop 0 (a seed list is small by definition — it is
    the only driver-side input); all expansion state stays distributed."""
    edge_schema = pa.schema([(src_col, _NODE_T), (dst_col, _NODE_T)])
    node_schema = pa.schema([("node", _NODE_T), ("hop", pa.int32())])

    def _level(nodes: list[str], hop: int) -> ray.data.Dataset:
        return ray.data.from_arrow(
            pa.table({"node": pa.array(nodes, _NODE_T), "hop": pa.array([hop] * len(nodes), pa.int32())})
        )

    visited = _level(sorted(set(seeds)), 0)
    frontier = visited
    for hop in range(1, k + 1):
        # edges whose src is in the frontier → candidate next nodes
        reached = hash_bucket_join(
            edges.select_columns([src_col, dst_col]),
            frontier.select_columns(["node"]),
            on=src_col,
            right_on="node",
            output_columns=[dst_col],
            how="left_semi",
            num_buckets=num_buckets,
            left_schema=edge_schema,
            right_schema=pa.schema([("node", _NODE_T)]),
        )

        # distinct candidates: per-batch combiner, then pid-cogroup distinct
        # (the dedup.py pattern — never a per-key group)
        def _distinct(batch: pa.Table) -> pa.Table:
            out = pa.TableGroupBy(batch.select([dst_col]), dst_col).aggregate([])
            out = out.rename_columns(["node"])
            return out.append_column("pid", bucket_ids(out["node"], num_buckets))

        candidates = (
            reached.map_batches(_distinct, batch_format="pyarrow")
            .groupby("pid")
            .map_groups(
                lambda g: pa.TableGroupBy(g.select(["node"]), "node").aggregate([]),
                batch_format="pyarrow",
            )
        )
        new = hash_bucket_join(
            candidates,
            visited.select_columns(["node"]),
            on="node",
            output_columns=["node"],
            how="left_anti",
            num_buckets=num_buckets,
            left_schema=pa.schema([("node", _NODE_T)]),
            right_schema=pa.schema([("node", _NODE_T)]),
        ).map_batches(
            lambda b: b.append_column("hop", pa.array([hop] * b.num_rows, pa.int32())),
            batch_format="pyarrow",
        )
        # BFS barrier: hop h+1 expands from COMPLETE hop h (and the anti-join
        # above re-reads visited, so both sides must be pinned)
        new = new.materialize()
        if new.count() == 0:
            break
        frontier = new
        visited = visited.union(new).materialize()
    return visited


def k_hop_multi(
    edges: ray.data.Dataset,
    seeds: list[str],
    k: int,
    src_col: str = "src",
    dst_col: str = "dst",
    num_buckets: int = 16,
) -> ray.data.Dataset:
    """Multi-source min-hop BFS → (seed, node, hop): like ``k_hop`` but ONE
    frontier carries every seed's expansion as (seed, node) rows, so each
    hop costs a constant number of distributed joins regardless of seed
    count (len(seeds) separate k_hop runs would serialize len(seeds)·k
    barrier joins). Min-hop semantics hold per (seed, node): a pair enters
    visited at the first hop it appears, and the per-hop anti-join keys on
    the composite seed||0x1f||node."""
    edge_schema = pa.schema([(src_col, _NODE_T), (dst_col, _NODE_T)])
    pair_schema = pa.schema([("seed", _NODE_T), ("node", _NODE_T)])

    uniq = sorted(set(seeds))
    visited = ray.data.from_arrow(
        pa.table(
            {
                "seed": pa.array(uniq, _NODE_T),
                "node": pa.array(uniq, _NODE_T),
                "hop": pa.array([0] * len(uniq), pa.int32()),
            }
        )
    )
    frontier = visited

    def _compkey(seed_col, node_col):
        return pc.binary_join_element_wise(seed_col, node_col, "\x1f")

    def _distinct(batch: pa.Table) -> pa.Table:
        out = pa.TableGroupBy(batch.select(["seed", "node"]), ["seed", "node"]).aggregate([])
        out = out.rename_columns(["seed", "node"])
        return out.append_column("pid", bucket_ids(_compkey(out["seed"], out["node"]), num_buckets))

    def _group_distinct(g: pa.Table) -> pa.Table:
        return pa.TableGroupBy(g.select(["seed", "node"]), ["seed", "node"]).aggregate([])

    def _with_key(b: pa.Table) -> pa.Table:
        return b.append_column("ck", _compkey(b["seed"], b["node"]))

    def _vis_key(b: pa.Table) -> pa.Table:
        return pa.table({"ck": _compkey(b["seed"], b["node"])})

    cand_schema = pa.schema([("seed", _NODE_T), ("node", _NODE_T), ("ck", _NODE_T)])
    key_schema = pa.schema([("ck", _NODE_T)])

    for hop in range(1, k + 1):
        # expand: edges whose src is in the frontier → (seed, dst) pairs
        reached = hash_bucket_join(
            edges.select_columns([src_col, dst_col]),
            frontier.select_columns(["seed", "node"]),
            on=src_col,
            right_on="node",
            output_columns=["seed", dst_col],
            how="inner",
            num_buckets=num_buckets,
            left_schema=edge_schema,
            right_schema=pair_schema,
        ).map_batches(
            lambda b: b.rename_columns(["seed", "node"]), batch_format="pyarrow"
        )

        # distinct (seed, node): per-batch combiner, then pid-cogroup distinct
        candidates = (
            reached.map_batches(_distinct, batch_format="pyarrow")
            .groupby("pid")
            .map_groups(_group_distinct, batch_format="pyarrow")
        )

        new = hash_bucket_join(
            candidates.map_batches(_with_key, batch_format="pyarrow"),
            visited.map_batches(_vis_key, batch_format="pyarrow"),
            on="ck",
            output_columns=["seed", "node"],
            how="left_anti",
            num_buckets=num_buckets,
            left_schema=cand_schema,
            right_schema=key_schema,
        ).map_batches(
            lambda b, h=hop: b.append_column("hop", pa.array([h] * b.num_rows, pa.int32())),
            batch_format="pyarrow",
        )
        # BFS barrier: hop h+1 expands from COMPLETE hop h
        new = new.materialize()
        if new.count() == 0:
            break
        frontier = new
        visited = visited.union(new).materialize()
    return visited


def symmetrize(pairs: ray.data.Dataset, src_col: str = "src", dst_col: str = "dst") -> ray.data.Dataset:
    """Unordered pairs → both directed edges (undirected-graph view)."""

    def _sym(b: pa.Table) -> pa.Table:
        s, d = b[src_col].combine_chunks(), b[dst_col].combine_chunks()
        return pa.table({src_col: pa.chunked_array([s, d]), dst_col: pa.chunked_array([d, s])})

    return pairs.select_columns([src_col, dst_col]).map_batches(_sym, batch_format="pyarrow")


def pagerank(
    edges: ray.data.Dataset,
    iterations: int = 10,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    num_buckets: int = 16,
) -> ray.data.Dataset:
    """Fixed-iteration PageRank over a directed edge set → (node, score).

    Pass a symmetrized edge set for undirected semantics (then every node
    has out-degree ≥ 1, so there are no dangling nodes — the implementation
    assumes this; a dangling node's mass would leak). Each iteration is two
    bounded hash joins (score ⋈ degree, then edges ⋈ per-node contribution)
    plus a combiner-first groupby Sum — no driver-side state beyond the
    node count. One barrier per iteration is inherent to power iteration.
    The edge set is re-read every iteration: pass it materialized."""
    node_schema = pa.schema([("node", _NODE_T)])
    deg_schema = pa.schema([("node", _NODE_T), ("deg", pa.int64())])
    score_schema = pa.schema([("node", _NODE_T), ("score", pa.float64())])

    def _deg_partial(batch: pa.Table) -> pa.Table:
        out = pa.TableGroupBy(batch.select([src_col]), src_col).aggregate([([], "count_all")])
        return out.rename_columns(["node", "deg"])

    degrees = (
        edges.map_batches(_deg_partial, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Sum("deg", alias_name="deg"))
        .materialize()
    )
    n_nodes = degrees.count()
    if n_nodes == 0:
        return ray.data.from_arrow(score_schema.empty_table())
    base = (1.0 - damping) / n_nodes

    scores = degrees.map_batches(
        lambda b: pa.table(
            {"node": b["node"], "score": pa.array([1.0 / n_nodes] * b.num_rows, pa.float64())}
        ),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(iterations):
        per_out = hash_bucket_join(
            scores,
            degrees,
            on="node",
            output_columns=["node", "score", "deg"],
            num_buckets=num_buckets,
            left_schema=score_schema,
            right_schema=deg_schema,
        ).map_batches(
            lambda b: pa.table(
                {
                    "node": b["node"],
                    "contrib": pc.divide(
                        b["score"].cast(pa.float64()), b["deg"].cast(pa.float64())
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        spread = hash_bucket_join(
            edges.select_columns([src_col, dst_col]),
            per_out,
            on=src_col,
            right_on="node",
            output_columns=[dst_col, "contrib"],
            num_buckets=num_buckets,
            left_schema=pa.schema([(src_col, _NODE_T), (dst_col, _NODE_T)]),
            right_schema=pa.schema([("node", _NODE_T), ("contrib", pa.float64())]),
        )

        def _sum_partial(batch: pa.Table) -> pa.Table:
            out = pa.TableGroupBy(batch.select([dst_col, "contrib"]), dst_col).aggregate(
                [("contrib", "sum")]
            )
            return out.rename_columns(["node", "contrib"])

        scores = (
            spread.map_batches(_sum_partial, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Sum("contrib", alias_name="contrib"))
            .map_batches(
                lambda b: pa.table(
                    {
                        "node": b["node"],
                        "score": pc.add(
                            pa.scalar(base, pa.float64()),
                            pc.multiply(
                                pa.scalar(damping, pa.float64()),
                                b["contrib"].cast(pa.float64()),
                            ),
                        ),
                    }
                ),
                batch_format="pyarrow",
            )
            .materialize()  # power-iteration barrier: next round reads this
        )
    return scores


def distinct_pairs(
    ds: ray.data.Dataset, cols: list[str], num_buckets: int = 16
) -> ray.data.Dataset:
    """Distinct rows over ``cols``: per-batch combiner distinct, then a
    pid-cogroup distinct (the dedup.py pattern — never a per-key group)."""

    def _partial(batch: pa.Table) -> pa.Table:
        out = pa.TableGroupBy(batch.select(cols), cols).aggregate([])
        return out.append_column("pid", bucket_ids(out[cols[0]], num_buckets))

    return (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("pid")
        .map_groups(
            lambda g: pa.TableGroupBy(g.select(cols), cols).aggregate([]),
            batch_format="pyarrow",
        )
    )


def hits(
    edges: ray.data.Dataset,
    iterations: int = 10,
    src_col: str = "src",
    dst_col: str = "dst",
    num_buckets: int = 16,
) -> ray.data.Dataset:
    """HITS hubs-and-authorities over a directed edge set → (node, role,
    score), role ∈ {'hub', 'authority'}. On the document→decision citation
    graph this is the natural ranking pair: hub = a document that cites
    many authoritative decisions, authority = a decision cited by many good
    hubs (Kleinberg's mutual reinforcement).

    Per iteration: authority = L1-normalized Σ of hub scores over in-edges,
    then hub = L1-normalized Σ of authority scores over out-edges — each
    half is one bounded hash join + a combiner-first groupby Sum + a global
    scalar Sum for the norm (the only driver-side value). One barrier per
    half-iteration is inherent to power iteration. The edge set is re-read
    every iteration: pass it materialized and DISTINCT (parallel edges
    would double-count)."""
    node_schema = pa.schema([("node", _NODE_T), ("score", pa.float64())])
    edge_schema = pa.schema([(src_col, _NODE_T), (dst_col, _NODE_T)])

    def _distinct_nodes(col: str) -> ray.data.Dataset:
        def _partial(batch: pa.Table) -> pa.Table:
            out = pa.TableGroupBy(batch.select([col]), col).aggregate([])
            return out.rename_columns(["node"])

        return (
            edges.map_batches(_partial, batch_format="pyarrow")
            .groupby("node")
            .map_groups(
                lambda g: pa.TableGroupBy(g.select(["node"]), "node").aggregate([]),
                batch_format="pyarrow",
            )
        )

    hub_nodes = _distinct_nodes(src_col).materialize()
    n_hubs = hub_nodes.count()
    if n_hubs == 0:
        return ray.data.from_arrow(
            pa.schema([("node", _NODE_T), ("role", pa.string()), ("score", pa.float64())]).empty_table()
        )

    hubs = hub_nodes.map_batches(
        lambda b: pa.table(
            {"node": b["node"], "score": pa.array([1.0 / n_hubs] * b.num_rows, pa.float64())}
        ),
        batch_format="pyarrow",
    ).materialize()
    auths = None

    def _half_step(scores: ray.data.Dataset, join_col: str, out_col: str) -> ray.data.Dataset:
        """Push ``scores`` across the edges from ``join_col`` to ``out_col``,
        sum per target, L1-normalize."""
        spread = hash_bucket_join(
            edges.select_columns([src_col, dst_col]),
            scores,
            on=join_col,
            right_on="node",
            output_columns=[out_col, "score"],
            num_buckets=num_buckets,
            left_schema=edge_schema,
            right_schema=node_schema,
        )

        def _sum_partial(batch: pa.Table) -> pa.Table:
            out = pa.TableGroupBy(batch.select([out_col, "score"]), out_col).aggregate(
                [("score", "sum")]
            )
            return out.rename_columns(["node", "score"])

        unnorm = (
            spread.map_batches(_sum_partial, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Sum("score", alias_name="score"))
            .materialize()  # read twice: the norm Sum + the divide
        )
        total = unnorm.sum("score") or 1.0
        return unnorm.map_batches(
            lambda b: pa.table(
                {
                    "node": b["node"],
                    "score": pc.divide(b["score"].cast(pa.float64()), pa.scalar(total, pa.float64())),
                }
            ),
            batch_format="pyarrow",
        ).materialize()  # power-iteration barrier

    for _ in range(iterations):
        auths = _half_step(hubs, src_col, dst_col)
        hubs = _half_step(auths, dst_col, src_col)

    def _tag(role: str):
        def _t(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "node": b["node"],
                    "role": pa.array([role] * b.num_rows, pa.string()),
                    "score": b["score"],
                }
            )

        return _t

    return hubs.map_batches(_tag("hub"), batch_format="pyarrow").union(
        auths.map_batches(_tag("authority"), batch_format="pyarrow")
    )


def triangle_counts(
    pairs: ray.data.Dataset,
    src_col: str = "src",
    dst_col: str = "dst",
    num_buckets: int = 16,
) -> ray.data.Dataset:
    """Per-node triangle participation over an undirected graph given as
    DISTINCT ordered pairs (src < dst) → (node, n_triangles), nodes in ≥1
    triangle only.

    Classic oriented wedge enumeration: every triangle u<v<w is found
    exactly once as the wedge (v, w) hanging off u, confirmed by a
    distributed semi-join of the wedge set against the edge set on a packed
    v\\x01w key. Wedge volume is Σ deg⁺(u)² over the ORIENTED adjacency —
    the standard bound; a hub's wedges are quadratic in its oriented
    degree, which lexicographic orientation roughly halves. Pass ``pairs``
    materialized (it is read twice: wedges + closing-edge join)."""
    _SEP = "\x01"

    def _pid(batch: pa.Table) -> pa.Table:
        return batch.select([src_col, dst_col]).append_column(
            "pid", bucket_ids(batch[src_col], num_buckets)
        )

    def _wedges(group: pd.DataFrame) -> pd.DataFrame:
        us, vs, ws = [], [], []
        for u, g in group.groupby(src_col, sort=False):
            nbrs = np.sort(g[dst_col].drop_duplicates().to_numpy())
            if len(nbrs) < 2:
                continue
            iu, ju = np.triu_indices(len(nbrs), k=1)
            us.append(np.full(len(iu), u, dtype=object))
            vs.append(nbrs[iu])
            ws.append(nbrs[ju])
        if not us:
            return pd.DataFrame(
                {"u": pd.Series(dtype="object"), "v": pd.Series(dtype="object"), "w": pd.Series(dtype="object")}
            )
        return pd.DataFrame(
            {"u": np.concatenate(us), "v": np.concatenate(vs), "w": np.concatenate(ws)}
        )

    wedges = (
        pairs.map_batches(_pid, batch_format="pyarrow")
        .groupby("pid")
        .map_groups(_wedges, batch_format="pandas")
        .map_batches(
            lambda b: b.append_column(
                "key", pc.binary_join_element_wise(b["v"], b["w"], _SEP)
            ),
            batch_format="pyarrow",
        )
    )
    edge_keys = pairs.map_batches(
        lambda b: pa.table({"key": pc.binary_join_element_wise(b[src_col], b[dst_col], _SEP)}),
        batch_format="pyarrow",
    )
    triangles = hash_bucket_join(
        wedges,
        edge_keys,
        on="key",
        output_columns=["u", "v", "w"],
        how="left_semi",
        num_buckets=num_buckets,
        left_schema=pa.schema(
            [("u", _NODE_T), ("v", _NODE_T), ("w", _NODE_T), ("key", _NODE_T)]
        ),
        right_schema=pa.schema([("key", _NODE_T)]),
    )

    def _count_partial(batch: pa.Table) -> pa.Table:
        nodes = pa.chunked_array(
            [batch["u"].combine_chunks(), batch["v"].combine_chunks(), batch["w"].combine_chunks()]
        )
        out = pa.TableGroupBy(pa.table({"node": nodes}), "node").aggregate([([], "count_all")])
        return out.rename_columns(["node", "n_triangles"])

    return (
        triangles.map_batches(_count_partial, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Sum("n_triangles", alias_name="n_triangles"))
    )


def citation_edges(extractions: ray.data.Dataset) -> ray.data.Dataset:
    """(conv_id, ecli) citation edge list from the extraction surface —
    one row per cited-decision record with a non-null ECLI."""

    def _explode(batch: pa.Table) -> pa.Table:
        conv, ecli = [], []
        for rec in batch.to_pylist():
            for d in rec["cited_decisions"] or []:
                if d.get("ecli"):
                    conv.append(rec["conv_id"])
                    ecli.append(d["ecli"])
        return pa.table({"conv_id": pa.array(conv, _NODE_T), "ecli": pa.array(ecli, _NODE_T)})

    return extractions.map_batches(_explode, batch_format="pyarrow")


def k_core(
    edges: ray.data.Dataset,
    k: int,
    src_col: str = "conv_id",
    dst_col: str = "ecli",
    iters: int = 12,
    num_buckets: int = 16,
) -> ray.data.Dataset:
    """Bipartite k-core: iteratively peel endpoints with degree < ``k``
    until fixpoint (or ``iters`` rounds — a FIXED unroll, matching the
    oracle's unrolled-CTE chain round for round, the kg_hits discipline).
    Returns the surviving edge set.

    Scale shape per round: two per-side degree counts (combiner-first
    groupbys) and two bucketed SEMI-joins (``hash_bucket_join`` — the
    surviving-node sets shuffle as narrow single-column tables, never
    broadcast, so a billion-node side never lands on the driver). Peeling
    is monotone, so an early exit at the fixpoint (edge count unchanged —
    one cheap count per round) returns exactly what the full unroll
    would.
    """
    from .joins import hash_bucket_join

    edge_schema = pa.schema([(src_col, _NODE_T), (dst_col, _NODE_T)])
    node_schema = pa.schema([("__node", _NODE_T)])
    cur = edges.select_columns([src_col, dst_col])
    prev_n = cur.count()
    for _ in range(iters):
        good = {}
        for col in (src_col, dst_col):
            # degree count via the pid-cogroup idiom (distinct_pairs /
            # hash_bucket_join pattern): per-batch combiner partials, one
            # all-to-all on 16 int keys — an order of magnitude cheaper
            # per round than a string-key groupby
            def _deg_partial(batch: pa.Table, _col=col) -> pa.Table:
                out = pa.TableGroupBy(batch.select([_col]), _col).aggregate(
                    [([], "count_all")]
                )
                out = out.rename_columns(["__node", "__deg"])
                return out.append_column("__pid", bucket_ids(out["__node"], num_buckets))

            def _deg_merge(g: pa.Table) -> pa.Table:
                import pyarrow.compute as pc

                tot = pa.TableGroupBy(g.select(["__node", "__deg"]), "__node").aggregate(
                    [("__deg", "sum")]
                )
                kept = tot.filter(pc.greater_equal(tot["__deg_sum"], k))
                return pa.table({"__node": kept["__node"]})

            good[col] = (
                cur.map_batches(_deg_partial, batch_format="pyarrow")
                .groupby("__pid")
                .map_groups(_deg_merge, batch_format="pyarrow")
            )
        nxt = cur
        for col in (src_col, dst_col):
            nxt = hash_bucket_join(
                nxt,
                good[col],
                on=col,
                right_on="__node",
                how="left_semi",
                num_buckets=num_buckets,
                output_columns=[src_col, dst_col],
                left_schema=edge_schema,
                right_schema=node_schema,
            )
        # peeling barrier: next round re-reads this. The repartition is
        # load-bearing: cogroups and joins multiply block counts, and
        # without re-coalescing each round the per-block task overhead
        # compounds (measured 4s → 74s/round by round 3 without it)
        nxt = nxt.repartition(num_buckets).materialize()
        n = nxt.count()
        cur = nxt
        if n == prev_n:
            break
        prev_n = n
    return cur


def clustering_coefficients(
    pairs: ray.data.Dataset,
    src_col: str = "src",
    dst_col: str = "dst",
    num_buckets: int = 16,
) -> ray.data.Dataset:
    """Local clustering coefficient per node over an undirected graph given
    as DISTINCT ordered pairs (src < dst): ``c = 2T / (d(d-1))`` for nodes
    with degree ≥ 2 — how close each node's neighborhood is to a clique,
    the standard cohesion signal next to :func:`triangle_counts` (which
    supplies T; the same wedge/semi-join shape and cost).

    Scale shape: degree = a combiner-first count over the symmetrized
    pairs; T joins on via one bucketed left-outer join (triangle-free
    nodes coalesce to 0). The division is the literal double tree
    ``(2.0·T) / (d·(d−1.0))`` — mirror it in the SQL twin. Pass ``pairs``
    materialized (read three times: symmetrize + wedges + closing edge).

    Output: ``(node, degree, n_triangles, coefficient)``, degree ≥ 2."""
    from ray.data.aggregate import Sum

    from .joins import hash_bucket_join

    sym = symmetrize(pairs, src_col, dst_col)

    def _deg_partial(batch: pa.Table) -> pa.Table:
        out = pa.TableGroupBy(batch.select([src_col]), src_col).aggregate(
            [([], "count_all")]
        )
        return out.rename_columns(["node", "degree"])

    degrees = (
        sym.map_batches(_deg_partial, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Sum("degree", alias_name="degree"))
        .map_batches(
            lambda b: b.filter(pc.greater_equal(b["degree"], 2)),
            batch_format="pyarrow",
        )
    )
    tri = triangle_counts(pairs, src_col, dst_col, num_buckets)

    joined = hash_bucket_join(
        degrees,
        tri,
        on="node",
        how="left_outer",
        output_columns=["node", "degree", "n_triangles"],
        num_buckets=num_buckets,
        left_schema=pa.schema([("node", _NODE_T), ("degree", pa.int64())]),
        right_schema=pa.schema([("node", _NODE_T), ("n_triangles", pa.int64())]),
    )

    def _coef(batch: pa.Table) -> pa.Table:
        t = pc.coalesce(batch["n_triangles"], pa.scalar(0, pa.int64()))
        dd = batch["degree"].cast(pa.float64())
        coef = pc.divide(
            pc.multiply(pa.scalar(2.0, pa.float64()), t.cast(pa.float64())),
            pc.multiply(dd, pc.subtract(dd, pa.scalar(1.0, pa.float64()))),
        )
        return pa.table(
            {
                "node": batch["node"],
                "degree": batch["degree"],
                "n_triangles": t,
                "coefficient": coef,
            }
        )

    return joined.map_batches(_coef, batch_format="pyarrow")


def personalized_pagerank(
    edges: ray.data.Dataset,
    seed: str,
    iterations: int = 10,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    num_buckets: int = 16,
) -> ray.data.Dataset:
    """Personalized PageRank with a single restart node — the
    related-item / recommendation score rooted at ``seed``:
    ``score(v) = (1-d)·1[v=seed] + d·Σ_{u→v} score(u)/deg(u)``, fixed
    ``iterations`` power steps from the sparse start (score 1 at the
    seed). Returns every REACHED node (support grows one hop per
    iteration; unreached nodes never materialize — the sparse frontier
    is the whole point at scale), ordered consumption by node.

    Same shape as :func:`pagerank` (kept separate on purpose: that
    path is hash-gated and stays untouched): per iteration two bounded
    hash joins + a combiner-first Sum; the one addition is a single
    seed row unioned into the contribution table so the restart term
    survives iterations where the seed receives no mass. Pass the edge
    set materialized and symmetrized for undirected semantics."""
    score_schema = pa.schema([("node", _NODE_T), ("score", pa.float64())])
    deg_schema = pa.schema([("node", _NODE_T), ("deg", pa.int64())])

    def _deg_partial(batch: pa.Table) -> pa.Table:
        out = pa.TableGroupBy(batch.select([src_col]), src_col).aggregate([([], "count_all")])
        return out.rename_columns(["node", "deg"])

    degrees = (
        edges.map_batches(_deg_partial, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Sum("deg", alias_name="deg"))
        .materialize()
    )
    if degrees.count() == 0:
        return ray.data.from_arrow(score_schema.empty_table())
    restart = 1.0 - damping

    scores = ray.data.from_arrow(
        pa.table({"node": pa.array([seed], _NODE_T), "score": pa.array([1.0], pa.float64())})
    ).materialize()

    seed_zero = pa.table(
        {"node": pa.array([seed], _NODE_T), "contrib": pa.array([0.0], pa.float64())}
    )

    for _ in range(iterations):
        per_out = hash_bucket_join(
            scores,
            degrees,
            on="node",
            output_columns=["node", "score", "deg"],
            num_buckets=num_buckets,
            left_schema=score_schema,
            right_schema=deg_schema,
        ).map_batches(
            lambda b: pa.table(
                {
                    "node": b["node"],
                    "contrib": pc.divide(
                        b["score"].cast(pa.float64()), b["deg"].cast(pa.float64())
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        spread = hash_bucket_join(
            edges.select_columns([src_col, dst_col]),
            per_out,
            on=src_col,
            right_on="node",
            output_columns=[dst_col, "contrib"],
            num_buckets=num_buckets,
            left_schema=pa.schema([(src_col, _NODE_T), (dst_col, _NODE_T)]),
            right_schema=pa.schema([("node", _NODE_T), ("contrib", pa.float64())]),
        )

        def _sum_partial(batch: pa.Table) -> pa.Table:
            out = pa.TableGroupBy(batch.select([dst_col, "contrib"]), dst_col).aggregate(
                [("contrib", "sum")]
            )
            return out.rename_columns(["node", "contrib"])

        scores = (
            spread.map_batches(_sum_partial, batch_format="pyarrow")
            .union(ray.data.from_arrow(seed_zero))
            .groupby("node")
            .aggregate(Sum("contrib", alias_name="contrib"))
            .map_batches(
                lambda b: pa.table(
                    {
                        "node": b["node"],
                        "score": pc.add(
                            pc.if_else(
                                pc.equal(b["node"], pa.scalar(seed, _NODE_T)),
                                pa.scalar(restart, pa.float64()),
                                pa.scalar(0.0, pa.float64()),
                            ),
                            pc.multiply(
                                pa.scalar(damping, pa.float64()),
                                b["contrib"].cast(pa.float64()),
                            ),
                        ),
                    }
                ),
                batch_format="pyarrow",
            )
            .materialize()  # power-iteration barrier
        )
    return scores


def link_prediction_scores(
    pairs: ray.data.Dataset,
    src_col: str = "src",
    dst_col: str = "dst",
    num_buckets: int = 16,
) -> ray.data.Dataset:
    """Link prediction over an undirected graph given as DISTINCT ordered
    pairs (src < dst): for every NON-adjacent node pair at distance 2,
    the two classic common-neighbor scores —

    - ``jaccard`` = |N(u)∩N(v)| / |N(u)∪N(v)| (integer counts, mirrored
      double division), and
    - ``aa_score`` = Σ_{z ∈ N(u)∩N(v)} 1/ln(deg z), Adamic-Adar 2003
      (every common neighbor z has deg ≥ 2, so ln(deg) > 0); the per-z
      contributions are summed as a LEFT FOLD in ascending-z order so the
      double matches the oracle's ``list_reduce(list(... ORDER BY z))``
      bit-exact (the surprisal/closeness float-parity discipline).

    Scale shape: wedges enumerate per center z via a pid-cogroup
    (np.triu_indices over z's sorted neighbor set — the triangle_counts
    pattern; volume Σ deg², centers co-located with their whole adjacency
    so deg z is the group size, no extra join); per-pair fold runs inside
    a pid-cogroup keyed on u (pairs with the same u co-locate); existing
    edges leave via one bucketed anti-join on a packed u\\x01v key; the
    two degree attachments are bounded hash joins. Pass ``pairs``
    materialized (read for wedges, the anti-join, and degrees).

    Output: ``(src, dst, n_common, n_union, jaccard, aa_score)``.
    """
    import math

    _SEP = "\x01"
    sym = symmetrize(pairs, src_col, dst_col)

    def _pid_center(batch: pa.Table) -> pa.Table:
        return batch.append_column("pid", bucket_ids(batch[src_col], num_buckets))

    def _wedges(group: pd.DataFrame) -> pd.DataFrame:
        us, vs, zs, cs = [], [], [], []
        for z, g in group.groupby(src_col, sort=False):
            nbrs = np.sort(g[dst_col].drop_duplicates().to_numpy())
            if len(nbrs) < 2:
                continue
            iu, ju = np.triu_indices(len(nbrs), k=1)
            us.append(nbrs[iu])
            vs.append(nbrs[ju])
            zs.append(np.full(len(iu), z, dtype=object))
            cs.append(np.full(len(iu), 1.0 / math.log(float(len(nbrs)))))
        if not us:
            return pd.DataFrame(
                {
                    "u": pd.Series(dtype="object"),
                    "v": pd.Series(dtype="object"),
                    "z": pd.Series(dtype="object"),
                    "c": pd.Series(dtype="float64"),
                }
            )
        return pd.DataFrame(
            {
                "u": np.concatenate(us),
                "v": np.concatenate(vs),
                "z": np.concatenate(zs),
                "c": np.concatenate(cs),
            }
        )

    wedges = (
        sym.map_batches(_pid_center, batch_format="pyarrow")
        .groupby("pid")
        .map_groups(_wedges, batch_format="pandas")
    )

    def _pid_u(batch: pa.Table) -> pa.Table:
        return batch.append_column("pid", bucket_ids(batch["u"], num_buckets))

    def _fold(group: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for (u, v), sub in group.sort_values("z").groupby(["u", "v"], sort=False):
            rows.append((u, v, len(sub), sum(sub["c"].tolist())))
        return pd.DataFrame(rows, columns=["u", "v", "n_common", "aa_score"])

    cand = (
        wedges.map_batches(_pid_u, batch_format="pyarrow")
        .groupby("pid")
        .map_groups(_fold, batch_format="pandas")
        .map_batches(
            lambda b: b.append_column(
                "key", pc.binary_join_element_wise(b["u"], b["v"], _SEP)
            ),
            batch_format="pyarrow",
        )
    )
    edge_keys = pairs.map_batches(
        lambda b: pa.table(
            {"key": pc.binary_join_element_wise(b[src_col], b[dst_col], _SEP)}
        ),
        batch_format="pyarrow",
    )
    cand_schema = pa.schema(
        [
            ("u", _NODE_T),
            ("v", _NODE_T),
            ("n_common", pa.int64()),
            ("aa_score", pa.float64()),
            ("key", _NODE_T),
        ]
    )
    nonadj = hash_bucket_join(
        cand,
        edge_keys,
        on="key",
        output_columns=["u", "v", "n_common", "aa_score"],
        how="left_anti",
        num_buckets=num_buckets,
        left_schema=cand_schema,
        right_schema=pa.schema([("key", _NODE_T)]),
    )

    def _deg_partial(batch: pa.Table) -> pa.Table:
        out = pa.TableGroupBy(batch.select([src_col]), src_col).aggregate([([], "count_all")])
        return out.rename_columns(["node", "deg"])

    degrees = (
        sym.map_batches(_deg_partial, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Sum("deg", alias_name="deg"))
    )
    deg_schema = pa.schema([("node", _NODE_T), ("deg", pa.int64())])
    with_du = hash_bucket_join(
        nonadj,
        degrees,
        on="u",
        right_on="node",
        output_columns=["u", "v", "n_common", "aa_score", "deg"],
        num_buckets=num_buckets,
        left_schema=pa.schema(
            [
                ("u", _NODE_T),
                ("v", _NODE_T),
                ("n_common", pa.int64()),
                ("aa_score", pa.float64()),
            ]
        ),
        right_schema=deg_schema,
    ).map_batches(
        lambda b: b.rename_columns(["u", "v", "n_common", "aa_score", "deg_u"]),
        batch_format="pyarrow",
    )
    both = hash_bucket_join(
        with_du,
        degrees,
        on="v",
        right_on="node",
        output_columns=["u", "v", "n_common", "aa_score", "deg_u", "deg"],
        num_buckets=num_buckets,
        left_schema=pa.schema(
            [
                ("u", _NODE_T),
                ("v", _NODE_T),
                ("n_common", pa.int64()),
                ("aa_score", pa.float64()),
                ("deg_u", pa.int64()),
            ]
        ),
        right_schema=deg_schema,
    )

    def _final(batch: pa.Table) -> pa.Table:
        n_union = pc.subtract(
            pc.add(batch["deg_u"], batch["deg"]), batch["n_common"]
        )
        return pa.table(
            {
                "src": batch["u"],
                "dst": batch["v"],
                "n_common": batch["n_common"],
                "n_union": n_union,
                "jaccard": pc.divide(
                    batch["n_common"].cast(pa.float64()), n_union.cast(pa.float64())
                ),
                "aa_score": batch["aa_score"],
            }
        )

    return both.map_batches(_final, batch_format="pyarrow")


def label_propagation(
    pairs: ray.data.Dataset,
    iterations: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
    num_buckets: int = 16,
) -> ray.data.Dataset:
    """Deterministic synchronous label-propagation community detection
    (Raghavan et al. 2007, made gateable): labels start as the node's own
    id; each round EVERY node simultaneously takes the most frequent label
    among its neighbors, ties broken by smallest label — the
    (count desc, label asc) pick is exactly ``stages/skew.group_mode``,
    so the community step reuses the engine's deterministic-mode
    primitive. Fixed ``iterations`` rounds (no convergence test), so the
    result is a pure function of the edge set.

    Scale shape: per round, one bounded hash join (edges ⋈ labels on the
    source endpoint — labels is one row per node) and one group_mode
    (combiner-first counts, argmax per node). One barrier per round is
    inherent to synchronous LPA. Pass ``pairs`` materialized; every node
    in the pair set has degree ≥ 1, so no node is dropped.

    Output: ``(node, community)`` — the final label per node.
    """
    sym = symmetrize(pairs, src_col, dst_col)
    label_schema = pa.schema([("node", _NODE_T), ("label", _NODE_T)])

    labels = (
        distinct_pairs(
            sym.map_batches(
                lambda b: pa.table({"node": b[src_col]}), batch_format="pyarrow"
            ),
            ["node"],
            num_buckets=num_buckets,
        )
        .map_batches(
            lambda b: pa.table({"node": b["node"], "label": b["node"]}),
            batch_format="pyarrow",
        )
        .materialize()
    )

    from .skew import group_mode

    for _ in range(iterations):
        votes = hash_bucket_join(
            sym,
            labels,
            on=src_col,
            right_on="node",
            output_columns=[dst_col, "label"],
            num_buckets=num_buckets,
            left_schema=pa.schema([(src_col, _NODE_T), (dst_col, _NODE_T)]),
            right_schema=label_schema,
        )
        labels = (
            group_mode(votes, [dst_col], "label", out_col="new_label")
            .map_batches(
                lambda b: pa.table({"node": b[dst_col], "label": b["new_label"]}),
                batch_format="pyarrow",
            )
            .materialize()  # synchronous-round barrier: next round reads this
        )
    return labels.map_batches(
        lambda b: pa.table({"node": b["node"], "community": b["label"]}),
        batch_format="pyarrow",
    )
