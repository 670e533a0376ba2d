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

    Output rows are tagged by ``table`` ∈ {'triples','links','edges',
    'failures'} so one streamed pass produces all four logical tables;
    callers filter by tag (or use the convenience splitters below).
    """

    def __init__(self, index_ref):
        self._idx = ray.get(index_ref) if isinstance(index_ref, ray.ObjectRef) else index_ref

    def __call__(self, batch: pa.Table) -> pa.Table:
        triples, links, edges, failures = [], [], [], []
        for rec in batch.to_pylist():
            # invalid extractions are routed HERE into the fused output as
            # table='failures' rows (not via a separate filter operator), so
            # this stage's plan is Input→ActorPool only AND the streamed plan
            # yields the failures table in the SAME single pass — no
            # re-execution of assemble+extract to read failures
            if rec.get("valid") is False:
                failures.append(rec)
                continue
            decision_date = extract_date_from_ecli(rec.get("self_ecli") or "") or None
            doc_links = link_document(rec, self._idx, decision_date)
            links.extend(doc_links)
            triples.extend(emit_triples(rec, doc_links))
            edges.extend((rec["conv_id"], s, d) for s, d in canonical_edges(doc_links))

        # columnar assembly (15 narrow columns; list-of-dicts would cost a
        # python dict per row)
        nt, nl, ne, nf = len(triples), len(links), len(edges), len(failures)
        n = nt + nl + ne + nf
        none_t, none_l, none_e, none_f = [None] * nt, [None] * nl, [None] * ne, [None] * nf
        cols = {
            "part_key": [t["conv_id"] for t in triples]
            + [l["conv_id"] for l in links]
            + [e[0] for e in edges]
            + [f["conv_id"] for f in failures],
            "table": ["triples"] * nt + ["links"] * nl + ["edges"] * ne + ["failures"] * nf,
            "subj": [t["subj"] for t in triples] + none_l + none_e + none_f,
            "pred": [t["pred"] for t in triples] + none_l + none_e + none_f,
            "obj": [t["obj"] for t in triples] + none_l + none_e + none_f,
            "conv_id": [t["conv_id"] for t in triples]
            + [l["conv_id"] for l in links]
            + none_e
            + [f["conv_id"] for f in failures],
            "score": [t["score"] for t in triples] + [l["score"] for l in links] + none_e + none_f,
            "mention_internal_id": none_t + [l["mention_internal_id"] for l in links] + none_e + none_f,
            "kind": none_t + [l["kind"] for l in links] + none_e + none_f,
            "method": none_t + [l["method"] for l in links] + none_e + none_f,
            "matched_entity": none_t + [l["matched_entity"] for l in links] + none_e + none_f,
            "src": none_t + none_l + [e[1] for e in edges] + none_f,
            "dst": none_t + none_l + [e[2] for e in edges] + none_f,
            "failure_reason": none_t + none_l + none_e
            + [f.get("failure_reason") for f in failures],
            "failure_error": none_t + none_l + none_e
            + [f.get("failure_error") for f in failures],
        }
        assert n == len(cols["part_key"])
        return pa.table(
            {f.name: pa.array(cols[f.name], f.type) for f in _FUSED_SCHEMA}
        )


_FUSED_SCHEMA = pa.schema(
    [
        ("part_key", pa.string()),  # originating conv_id — checkpoint partition key
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
        ("failure_reason", pa.string()),
        ("failure_error", pa.string()),
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


def fused_failures(fused: ray.data.Dataset) -> ray.data.Dataset:
    """fused tagged rows → failures view (conv_id, failure_reason,
    failure_error) — read from the materialized fused table, never by
    re-running the extraction."""
    return fused.filter(expr="table == 'failures'").select_columns(
        ["conv_id", "failure_reason", "failure_error"]
    )


_SEP = "\x01"


def _pack_pick(batch: pa.Table) -> pa.Table:
    """Fully vectorized pack: one group key spo = subj\\x01pred\\x01obj and one
    pick key packed = conv_id\\x01lpad(100-score) (None score → 101, sorts
    last) — the keep-rule (min conv_id, then max score) becomes a plain
    groupby Min over strings."""
    import pyarrow.compute as pc

    spo = pc.binary_join_element_wise(batch["subj"], batch["pred"], batch["obj"], _SEP)
    inv = pc.subtract(pa.scalar(100, pa.int32()), pc.fill_null(batch["score"], pa.scalar(-1, pa.int32())))
    inv_str = pc.utf8_lpad(pc.cast(inv, pa.string()), 3, "0")
    packed = pc.binary_join_element_wise(batch["conv_id"], inv_str, _SEP)
    return pa.table({"spo": spo, "packed": packed})


def _unpack_pick(batch: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    spo = pc.split_pattern(batch["spo"], _SEP)
    # conv_id never contains the separator, so a plain split is unambiguous
    parts = pc.split_pattern(batch["packed"], _SEP)
    conv = pc.list_element(parts, 0)
    inv = pc.cast(pc.list_element(parts, 1), pa.int32())
    score = pc.subtract(pa.scalar(100, pa.int32()), inv)
    score = pc.if_else(pc.equal(inv, 101), pa.scalar(None, pa.int32()), score)
    return pa.table(
        {
            "subj": pc.list_element(spo, 0),
            "pred": pc.list_element(spo, 1),
            "obj": pc.list_element(spo, 2),
            "conv_id": conv,
            "score": score,
        }
    )


def dedup_triples(triples: ray.data.Dataset, num_partitions: int | None = None) -> ray.data.Dataset:
    """Distinct (subj,pred,obj) keeping min conv_id then max score:
    vectorized pack → per-batch combiner (Arrow C++ hash aggregate — dups
    that co-occur in a batch never enter the shuffle) → vectorized
    hash-partition (polars, no Python loop) → per-partition aggregate →
    vectorized unpack. The pid cogroup caps its partition count at the CPU
    count (same choice as assembly — see the shuffle note in
    stages/assemble.py: this is still Ray's sort-based shuffle; the true
    hash-shuffle strategy stalls against the pipeline's actor pools)."""
    from ..functions.hashing import bucket_ids

    if num_partitions is None:
        num_partitions = max(16, int(ray.cluster_resources().get("CPU", 8)) * 4) if ray.is_initialized() else 64

    def _min_per_spo(group: pa.Table) -> pa.Table:
        # Arrow C++ hash aggregate — no pandas string boxing
        out = pa.TableGroupBy(group.select(["spo", "packed"]), "spo").aggregate(
            [("packed", "min")]
        )
        # rename by NAME — aggregate's key/value column order has varied
        # across pyarrow versions
        remap = {"packed_min": "packed"}
        out = out.rename_columns([remap.get(c, c) for c in out.column_names])
        return out.select(["spo", "packed"])

    def _pack_combine_pid(batch: pa.Table) -> pa.Table:
        combined = _min_per_spo(_pack_pick(batch))
        return combined.append_column("pid", bucket_ids(combined["spo"], num_partitions))

    import os

    hash_parts = None
    if os.environ.get("DKG_ASSEMBLY_SHUFFLE", "hash") != "sort" and ray.is_initialized():
        hash_parts = max(2, min(int(ray.cluster_resources().get("CPU", 8)), 64))

    # batch_size=None → one combiner call per block: the combiner's value
    # scales with batch size (dups must co-occur in a batch to be pre-merged)
    # and the Arrow hash aggregate amortizes over large batches
    packed = triples.map_batches(_pack_combine_pid, batch_format="pyarrow", batch_size=None)
    grouped = (
        packed.groupby("pid", num_partitions=hash_parts) if hash_parts else packed.groupby("pid")
    )
    reduced = grouped.map_groups(_min_per_spo, batch_format="pyarrow")
    return reduced.map_batches(_unpack_pick, batch_format="pyarrow")
