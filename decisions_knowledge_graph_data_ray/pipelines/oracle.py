"""Serial single-process oracle for the KG-construction pipeline.

Runs the IDENTICAL shared per-document functions (functions/document.py)
over a plain sorted list — no Ray, no parallelism, no shuffles. The e2e
test asserts set-equality of the triples emitted by the Ray pipeline vs
this oracle (P/R >= 0.95; deterministic extractors ⇒ expected exactly 1.0),
per FIXTURES.md F6.
"""

from __future__ import annotations

from collections import defaultdict

import pyarrow as pa

from ..functions.document import (
    assemble_document,
    canonical_edges,
    emit_triples,
    extract_document,
    link_document,
)
from ..functions.linking import LinkerIndex
from ..functions.normalize import extract_date_from_ecli


def build_linker_index(world: dict) -> LinkerIndex:
    return LinkerIndex.build(
        acts=world["acts"],
        articles=world["articles"],
        alias_popular=world["alias_popular"],
        code_families=world["code_families"],
        decisions=world["decisions"],
        missing_courts=world["missing_courts"],
    )


class UnionFind:
    def __init__(self):
        self.parent: dict[str, str] = {}

    def find(self, x: str) -> str:
        self.parent.setdefault(x, x)
        root = x
        while self.parent[root] != root:
            root = self.parent[root]
        while self.parent[x] != root:
            self.parent[x], x = root, self.parent[x]
        return root

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        # deterministic: smaller label becomes the root
        if rb < ra:
            ra, rb = rb, ra
        self.parent[rb] = ra


def canonicalize_serial(edges: list[tuple[str, str]]) -> dict[str, str]:
    """node → lexicographically-smallest label of its connected component."""
    uf = UnionFind()
    for a, b in edges:
        uf.union(a, b)
    return {node: uf.find(node) for node in uf.parent}


def dedup_triples(triples: list[dict]) -> list[dict]:
    """Distinct (subj,pred,obj); keep min conv_id then max score; sorted."""
    best: dict[tuple, dict] = {}
    for t in triples:
        key = (t["subj"], t["pred"], t["obj"])
        cur = best.get(key)
        if (
            cur is None
            or t["conv_id"] < cur["conv_id"]
            or (t["conv_id"] == cur["conv_id"] and (t["score"] or -1) > (cur["score"] or -1))
        ):
            best[key] = t
    return [best[k] for k in sorted(best)]


def run_oracle(transcripts: pa.Table, world: dict) -> dict:
    """transcripts table → {'documents','extractions','links','triples',
    'canonical'} — all plain python lists, fully deterministic."""
    idx = build_linker_index(world)

    by_conv: dict[str, list[tuple[int, str, str]]] = defaultdict(list)
    conv_col = transcripts["conv_id"].to_pylist()
    turn_col = transcripts["turn_idx"].to_pylist()
    role_col = transcripts["role"].to_pylist()
    text_col = transcripts["text"].to_pylist()
    for cid, tix, role, text in zip(conv_col, turn_col, role_col, text_col):
        by_conv[cid].append((tix, role, text))

    documents, extractions, links, triples, edges = [], [], [], [], []
    for cid in sorted(by_conv):
        turns = by_conv[cid]
        doc = assemble_document(
            cid, [t[0] for t in turns], [t[1] for t in turns], [t[2] for t in turns]
        )
        documents.append(doc)
        extraction = extract_document(doc)
        extractions.append(extraction)
        decision_date = extract_date_from_ecli(doc["self_ecli"]) if doc["self_ecli"] else None
        doc_links = link_document(extraction, idx, decision_date)
        links.extend(doc_links)
        triples.extend(emit_triples(extraction, doc_links))
        edges.extend(canonical_edges(doc_links))

    canonical = canonicalize_serial(edges)
    for node, rep in sorted(canonical.items()):
        if node != rep:
            triples.append(
                {"subj": node, "pred": "canonical_rep", "obj": rep, "conv_id": "", "score": None}
            )

    return {
        "documents": documents,
        "extractions": extractions,
        "links": links,
        "triples": dedup_triples(triples),
        "canonical": canonical,
    }
