"""Triple emission + distributed triple dedup.

Triple emission is a per-document map (needs extraction + that document's
links together). To avoid shuffling the two tables into a join, the flagship
pipeline emits triples inside the linking pass (LinkTripleActor below): the
extraction record and its links are already co-resident in the actor, so
triples + links + canonical edges stream out of one stage — the reference's
"assemble one merged record per document" (merge_full_data.ts) without an
N-way shuffle, because our stages never split a document across workers
until AFTER per-document work is done.

Dedup (D9): distinct (subj,pred,obj) keeping min conv_id then max score —
hash-partition groupby with a per-batch combiner first, so duplicate-heavy
corpora don't shuffle every duplicate row.
"""

from __future__ import annotations

import pyarrow as pa

import ray
import ray.data

from .. import schemas
from ..functions.document import canonical_edges, emit_triples, link_document
from ..functions.normalize import extract_date_from_ecli

EDGES_SCHEMA = pa.schema([("src", pa.string()), ("dst", pa.string())])


class LinkTripleActor:
    """Fused link+triple stage: extraction batch → triple rows + link rows.

    Output rows are tagged by ``table`` ∈ {'triples','links','edges'} so one
    streamed pass produces all three logical tables; callers filter by tag
    (or use the convenience splitters below).
    """

    def __init__(self, index_ref):
        self._idx = ray.get(index_ref) if isinstance(index_ref, ray.ObjectRef) else index_ref

    def __call__(self, batch: pa.Table) -> pa.Table:
        triples, links, edges = [], [], []
        for rec in batch.to_pylist():
            decision_date = extract_date_from_ecli(rec.get("self_ecli") or "") or None
            doc_links = link_document(rec, self._idx, decision_date)
            links.extend(doc_links)
            triples.extend(emit_triples(rec, doc_links))
            edges.extend(canonical_edges(doc_links))

        rows = []
        for t in triples:
            rows.append(
                {
                    "table": "triples",
                    "subj": t["subj"], "pred": t["pred"], "obj": t["obj"],
                    "conv_id": t["conv_id"], "score": t["score"],
                    "mention_internal_id": None, "kind": None, "method": None,
                    "matched_entity": None, "src": None, "dst": None,
                }
            )
        for l in links:
            rows.append(
                {
                    "table": "links",
                    "subj": None, "pred": None, "obj": None,
                    "conv_id": l["conv_id"], "score": l["score"],
                    "mention_internal_id": l["mention_internal_id"],
                    "kind": l["kind"], "method": l["method"],
                    "matched_entity": l["matched_entity"], "src": None, "dst": None,
                }
            )
        for s, d in edges:
            rows.append(
                {
                    "table": "edges",
                    "subj": None, "pred": None, "obj": None, "conv_id": None,
                    "score": None, "mention_internal_id": None, "kind": None,
                    "method": None, "matched_entity": None, "src": s, "dst": d,
                }
            )
        return pa.Table.from_pylist(rows, schema=_FUSED_SCHEMA)


_FUSED_SCHEMA = pa.schema(
    [
        ("table", pa.string()),
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("conv_id", pa.string()),
        ("score", pa.int32()),
        ("mention_internal_id", pa.string()),
        ("kind", pa.string()),
        ("method", pa.string()),
        ("matched_entity", pa.string()),
        ("src", pa.string()),
        ("dst", pa.string()),
    ]
)


def split_fused(fused: ray.data.Dataset):
    """fused tagged rows → (triples, links, edges) datasets."""
    triples = fused.filter(expr="table == 'triples'").select_columns(
        ["subj", "pred", "obj", "conv_id", "score"]
    )
    links = fused.filter(expr="table == 'links'").select_columns(
        ["conv_id", "mention_internal_id", "kind", "method", "matched_entity", "score"]
    )
    edges = fused.filter(expr="table == 'edges'").select_columns(["src", "dst"])
    return triples, links, edges


def _dedup_batch(batch: pa.Table) -> pa.Table:
    """Per-batch combiner for triple dedup (min conv_id, then max score)."""
    best: dict[tuple, dict] = {}
    for row in batch.to_pylist():
        key = (row["subj"], row["pred"], row["obj"])
        cur = best.get(key)
        if (
            cur is None
            or row["conv_id"] < cur["conv_id"]
            or (row["conv_id"] == cur["conv_id"] and (row["score"] or -1) > (cur["score"] or -1))
        ):
            best[key] = row
    return pa.Table.from_pylist(list(best.values()), schema=schemas.TRIPLES_SCHEMA)


_SEP = "\x01"


def _pack_pick(batch: pa.Table) -> pa.Table:
    """Encode the keep-rule (min conv_id, then max score) into ONE sortable
    string so the groupby reduce is a plain vectorized Min — no per-group
    Python dispatch. packed = conv_id \\x01 (100 - score) zero-padded (None
    score → 101, sorts last)."""
    rows = batch.to_pylist()
    packed = [
        f"{r['conv_id']}{_SEP}{(100 - r['score']) if r['score'] is not None else 101:03d}"
        for r in rows
    ]
    return pa.table(
        {
            "subj": batch["subj"],
            "pred": batch["pred"],
            "obj": batch["obj"],
            "packed": pa.array(packed, pa.string()),
        }
    )


def _unpack_pick(batch: pa.Table) -> pa.Table:
    conv_ids, scores = [], []
    for p in batch["packed"].to_pylist():
        conv_id, inv = p.rsplit(_SEP, 1)
        conv_ids.append(conv_id)
        scores.append(None if inv == "101" else 100 - int(inv))
    return pa.table(
        {
            "subj": batch["subj"],
            "pred": batch["pred"],
            "obj": batch["obj"],
            "conv_id": pa.array(conv_ids, pa.string()),
            "score": pa.array(scores, pa.int32()),
        }
    )


def dedup_triples(triples: ray.data.Dataset) -> ray.data.Dataset:
    """Distinct (subj,pred,obj) keeping min conv_id then max score:
    per-batch combiner → packed-key groupby Min (vectorized) → unpack."""
    from ray.data.aggregate import Min

    combined = triples.map_batches(_dedup_batch, batch_format="pyarrow")
    packed = combined.map_batches(_pack_pick, batch_format="pyarrow")
    agg = packed.groupby(["subj", "pred", "obj"]).aggregate(Min("packed", alias_name="packed"))
    return agg.map_batches(_unpack_pick, batch_format="pyarrow")
