"""Canonicalization: distributed connected components over candidate pairs.

The reference canonicalizes by exact keys (entity IDs + top-match >= 80 +
intersection joins, merge_full_data.ts:133-188) — no fuzzy clustering. Our
engine generalizes that to the distributed setting the north rule requires:
union-find over candidate entity pairs (mention ↔ matched canonical entity,
plus any near-dup pairs callers append), implemented as iterative min-label
propagation with Dataset.join + groupby — never a driver-side union-find
over the full node set.

Skew handling: candidate labels are pre-combined to one (node, min label)
row per batch inside ``map_batches`` before every shuffle (combiner
pattern), so a hot entity with millions of incident edges contributes one
row per upstream block to the reduce, not one per edge.

Convergence: min-label propagation reaches fixpoint in O(component
diameter) rounds; link graphs here are stars around canonical entities
(diameter 2). ``max_rounds`` caps pathological chains; each round checks an
exact changed-row count and stops early at 0.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Min

_LABEL_SCHEMA = pa.schema([("node", pa.string()), ("label", pa.string())])


def ensure_schema(schema: pa.Schema):
    """map_batches fn that pins a stable schema on every block: Ray's
    groupby().aggregate() emits schema-less empty blocks for empty hash
    partitions, which crashes downstream Arrow joins ("No match ... for key
    field"). Rebuild empties with the expected schema; cast the rest."""

    def f(b: pa.Table) -> pa.Table:
        if b.num_columns == 0 or b.num_rows == 0:
            return schema.empty_table()
        return b.select(schema.names).cast(schema)

    return f


def clamp_join_partitions(requested: int | None) -> int:
    """Dataset.join spawns one hash-aggregator actor per partition; asking
    for more partitions than the cluster has CPUs deadlocks the streaming
    executor on small clusters. Clamp to the CPU count (floor 2)."""
    import ray as _ray

    cpus = int(_ray.cluster_resources().get("CPU", 4)) if _ray.is_initialized() else 4
    cap = max(2, cpus)
    return min(requested, cap) if requested else min(8, cap)


def _combine_min(batch: pa.Table, node_col: str, label_col: str) -> pa.Table:
    """Per-batch combiner: one (node, min label) row per node."""
    nodes = batch[node_col].to_pylist()
    labels = batch[label_col].to_pylist()
    best: dict[str, str] = {}
    for n, l in zip(nodes, labels):
        if l is not None and (n not in best or l < best[n]):
            best[n] = l
    return pa.table(
        {"node": list(best.keys()), "label": list(best.values())}, schema=_LABEL_SCHEMA
    )


def _edges_to_candidates(batch: pa.Table) -> pa.Table:
    """(src,dst) → per-node min(self, neighbor) candidate labels, combined."""
    both = pa.table(
        {
            "node": pa.concat_arrays(
                [batch["src"].combine_chunks(), batch["dst"].combine_chunks()]
            ),
            "label": pa.concat_arrays(
                [
                    pc.min_element_wise(batch["src"], batch["dst"]).combine_chunks(),
                    pc.min_element_wise(batch["src"], batch["dst"]).combine_chunks(),
                ]
            ),
        }
    )
    return _combine_min(both, "node", "label")


def _undirect(batch: pa.Table) -> pa.Table:
    return pa.table(
        {
            "node": pa.concat_arrays(
                [batch["src"].combine_chunks(), batch["dst"].combine_chunks()]
            ),
            "nbr": pa.concat_arrays(
                [batch["dst"].combine_chunks(), batch["src"].combine_chunks()]
            ),
        }
    )


def _driver_union_find(edge_table: pa.Table) -> ray.data.Dataset:
    """Exact union-find on the driver — for provably-small candidate sets."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        parent.setdefault(x, x)
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for s, d in zip(edge_table["src"].to_pylist(), edge_table["dst"].to_pylist()):
        rs, rd_ = find(s), find(d)
        if rs != rd_:
            if rd_ < rs:
                rs, rd_ = rd_, rs
            parent[rd_] = rs

    nodes = sorted(parent)
    return ray.data.from_arrow(
        pa.table({"node": nodes, "label": [find(n) for n in nodes]}, schema=_LABEL_SCHEMA)
    )


DRIVER_CC_MAX_EDGES = 2_000_000


def connected_components(
    edges: ray.data.Dataset,
    max_rounds: int = 8,
    num_partitions: int | None = None,
    driver_threshold: int = DRIVER_CC_MAX_EDGES,
) -> ray.data.Dataset:
    """edges(src,dst) → (node, label) with label = component minimum.

    Hybrid: when the candidate-pair set is provably small (< driver_threshold
    edges — ids only, no payloads) the exact union-find runs on the driver
    (the guide's recommendation); above it, distributed min-label propagation
    via bucketed joins takes over. Both produce identical labels (component
    minimum)."""
    num_partitions = clamp_join_partitions(num_partitions)

    if driver_threshold > 0:
        edges = edges.materialize()
        if edges.count() <= driver_threshold:
            tables = list(edges.iter_batches(batch_format="pyarrow", batch_size=None))
            table = (
                pa.concat_tables(tables, promote_options="permissive")
                if tables
                else pa.table({"src": pa.array([], pa.string()), "dst": pa.array([], pa.string())})
            )
            return _driver_union_find(table)
    labels = (
        edges.map_batches(_edges_to_candidates, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Min("label", alias_name="label"))
        .map_batches(ensure_schema(_LABEL_SCHEMA), batch_format="pyarrow")
        .materialize()
    )
    und = edges.map_batches(_undirect, batch_format="pyarrow").materialize()

    from .joins import hash_bucket_join

    _UND_SCHEMA = pa.schema([("node", pa.string()), ("nbr", pa.string())])
    _NBR_SCHEMA = pa.schema([("nbr", pa.string()), ("nbr_label", pa.string())])
    _CAND_SCHEMA = pa.schema([("node", pa.string()), ("cand", pa.string())])
    for _ in range(max_rounds):
        nbr_labels = hash_bucket_join(
            und,
            labels.map_batches(
                lambda b: b.rename_columns(["nbr", "nbr_label"]), batch_format="pyarrow"
            ),
            on="nbr",
            output_columns=["node", "nbr", "nbr_label"],
            num_buckets=num_partitions,
            left_schema=_UND_SCHEMA,
            right_schema=_NBR_SCHEMA,
        )
        cand = (
            nbr_labels.map_batches(
                lambda b: _combine_min(b, "node", "nbr_label"), batch_format="pyarrow"
            )
            .groupby("node")
            .aggregate(Min("label", alias_name="cand"))
            .map_batches(
                ensure_schema(pa.schema([("node", pa.string()), ("cand", pa.string())])),
                batch_format="pyarrow",
            )
        )
        joined = hash_bucket_join(
            labels,
            cand,
            on="node",
            output_columns=["node", "label", "cand"],
            how="left_outer",
            num_buckets=num_partitions,
            left_schema=_LABEL_SCHEMA,
            right_schema=_CAND_SCHEMA,
        )

        def _update(batch: pa.Table) -> pa.Table:
            label = pc.cast(batch["label"], pa.string())
            cand_col = pc.cast(batch["cand"], pa.string())
            new = pc.min_element_wise(label, cand_col, skip_nulls=True)
            changed = pc.cast(pc.not_equal(new, label), "int64")
            return pa.table({"node": batch["node"], "label": new, "changed": changed})

        updated = joined.map_batches(_update, batch_format="pyarrow").materialize()
        total_changed = updated.sum("changed") if updated.count() else 0
        labels = updated.drop_columns(["changed"]).materialize()
        if not total_changed:
            break
    return labels


def canonical_triples(labels: ray.data.Dataset) -> ray.data.Dataset:
    """(node,label) → canonical_rep triples for non-root nodes."""

    def _to_triples(batch: pa.Table) -> pa.Table:
        nonroot = batch.filter(pc.invert(pc.equal(batch["node"], batch["label"])))
        n = nonroot.num_rows
        return pa.table(
            {
                "subj": nonroot["node"],
                "pred": pa.array(["canonical_rep"] * n, pa.string()),
                "obj": nonroot["label"],
                "conv_id": pa.array([""] * n, pa.string()),
                "score": pa.array([None] * n, pa.int32()),
            }
        )

    return labels.map_batches(_to_triples, batch_format="pyarrow")
