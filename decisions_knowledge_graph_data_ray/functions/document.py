"""Per-document logic shared verbatim by the Ray pipeline and the serial oracle.

Document assembly, the self-ECLI derivation rule, per-document extraction,
per-document linking, and triple emission. Keeping this in ONE place is what
makes the P/R-vs-oracle gate meaningful: the Ray pipeline distributes these
functions; the oracle runs them serially over a sorted list.

Assembly rule (FIXTURES.md F3): turns sorted by turn_idx, rendered as
"{role}: {text}" joined with "\\n". Template texts contain no newlines, so
re-exploding the document by line reproduces every (conv_id, turn_idx, text)
exactly — the per-turn text-equality invariant (tested in tests/test_assembly).
"""

from __future__ import annotations

import re

from .extract import (
    extract_cited_decisions,
    extract_cited_provisions,
    extract_keywords,
    micro_summary,
)
from .linking import (
    LinkerIndex,
    link_cited_decision,
    link_provision_code,
    link_provision_no_date,
    link_provision_standard,
    provision_bucket,
    top_match,
)
from .normalize import length_category
from .reference_extractor import extract_references

# self-identity rule: the first ECLI introduced by the case marker phrase.
# Data-driven analogue of the reference's decision_id input column.
_SELF_ECLI_RE = re.compile(
    r"\bDeze zaak\s+(ECLI:[A-Z]{2}:[A-Z0-9]+:\d{4}:[A-Z0-9.\-]+)", re.IGNORECASE
)


def derive_self_ecli(text: str) -> str:
    m = _SELF_ECLI_RE.search(text)
    return m.group(1) if m else ""


def assemble_text(roles: list[str], texts: list[str]) -> str:
    """Render ordered turns as the document text."""
    return "\n".join(f"{r}: {t}" for r, t in zip(roles, texts))


def explode_text(doc_text: str) -> list[tuple[str, str]]:
    """Inverse of assemble_text: [(role, text)] per line."""
    out = []
    for line in doc_text.split("\n"):
        role, _, text = line.partition(": ")
        out.append((role, text))
    return out


def assemble_document(conv_id: str, turn_idxs, roles, texts) -> dict:
    """One assembled document record from (possibly unsorted) turn arrays."""
    order = sorted(range(len(turn_idxs)), key=lambda i: turn_idxs[i])
    doc_text = assemble_text([roles[i] for i in order], [texts[i] for i in order])
    return {
        "conv_id": conv_id,
        "text": doc_text,
        "n_turns": len(order),
        "text_len": len(doc_text),
        "length_category": length_category(len(doc_text)),
        "self_ecli": derive_self_ecli(doc_text),
    }


def extract_document(doc: dict) -> dict:
    """Full deterministic extraction for one assembled document."""
    from .parties import classify_outcome, extract_parties
    from .teachings import extract_legal_teachings

    conv_id, text = doc["conv_id"], doc["text"]
    refs = extract_references(text)
    provisions = extract_cited_provisions(text, conv_id)
    decisions = extract_cited_decisions(text, conv_id, doc.get("self_ecli", ""))
    return {
        "conv_id": conv_id,
        "self_ecli": doc.get("self_ecli", ""),
        "cited_provisions": provisions,
        "cited_decisions": decisions,
        "references": refs,
        "keywords": extract_keywords(text),
        "micro_summary": micro_summary(text),
        "legal_teachings": extract_legal_teachings(text, conv_id, provisions, decisions),
        "parties": extract_parties(text, conv_id),
        "outcome": classify_outcome(text),
    }


def link_document(extraction: dict, idx: LinkerIndex, decision_date: str | None = None) -> list[dict]:
    """Entity linking for one document's mentions → link records.

    One record per mention: {mention_internal_id, kind, method, matched_entity,
    score} (matched_entity/score None when no match survives the >=80 gate).
    """
    links: list[dict] = []
    for p in extraction["cited_provisions"]:
        bucket = provision_bucket(p)
        if bucket == "standard":
            res = link_provision_standard(p, idx)
        elif bucket == "code":
            res = link_provision_code(p, idx, decision_date)
        else:
            res = link_provision_no_date(p, idx, decision_date)
        top = top_match(res["matches"])
        links.append(
            {
                "conv_id": extraction["conv_id"],
                "mention_internal_id": p["internal_parent_act_id"],
                "kind": f"provision_{bucket}",
                "method": res["method"],
                "matched_entity": top["document_number"] if top else None,
                "score": top["score"] if top else None,
            }
        )
    for d in extraction["cited_decisions"]:
        res = link_cited_decision(d, idx)
        top = top_match(res["matches"])
        links.append(
            {
                "conv_id": extraction["conv_id"],
                "mention_internal_id": d["internal_decision_id"],
                "kind": "decision",
                "method": res["method"],
                "matched_entity": top["document_number"] if top else None,
                "score": top["score"] if top else None,
            }
        )
    return links


def emit_triples(extraction: dict, links: list[dict]) -> list[dict]:
    """(subj, pred, obj) triples for one document (pre-dedup, pre-canonical).

    Preds: cites_provision, of_act, cites_decision, treatment:<T>, links_to,
    has_celex, has_numac, has_file_number, has_eu_url, has_be_url, has_keyword,
    has_teaching, teaching_cites_provision, teaching_cites_decision,
    refines, exception_to, conflicts_with, has_party, party_role:<R>,
    party_type:<T>, has_outcome.
    """
    conv_id = extraction["conv_id"]
    triples: list[dict] = []

    def t(subj: str, pred: str, obj: str, score: int | None = None):
        triples.append({"subj": subj, "pred": pred, "obj": obj, "conv_id": conv_id, "score": score})

    for p in extraction["cited_provisions"]:
        t(conv_id, "cites_provision", p["internal_provision_id"])
        t(p["internal_provision_id"], "of_act", p["internal_parent_act_id"])
    for d in extraction["cited_decisions"]:
        t(conv_id, "cites_decision", d["internal_decision_id"])
        t(d["internal_decision_id"], f"treatment:{d['treatment']}", d["ecli"] or "UNKNOWN")
    for link in links:
        if link["matched_entity"] is not None:
            t(link["mention_internal_id"], "links_to", link["matched_entity"], link["score"])
    refs = extraction["references"]
    for c in refs["eu_verified"]:
        t(conv_id, "has_celex", c)
    for n in refs["be_verified_numac"]:
        t(conv_id, "has_numac", n)
    for f in refs["be_verified_file_number"]:
        t(conv_id, "has_file_number", f)
    for u in refs["url_eu"]:
        t(conv_id, "has_eu_url", u)
    for u in refs["url_be"]:
        t(conv_id, "has_be_url", u)
    for w in extraction["keywords"]:
        t(conv_id, "has_keyword", w)
    # teaching entity family (ref extract-legal-teachings/schema.ts:101-142,189-197)
    for teach in extraction.get("legal_teachings", ()):
        tid = teach["teaching_id"]
        t(conv_id, "has_teaching", tid)
        for pid in teach["related_provision_ids"]:
            t(tid, "teaching_cites_provision", pid)
        for did in teach["related_decision_ids"]:
            t(tid, "teaching_cites_decision", did)
        if teach["refines_parent"]:
            t(tid, "refines", teach["refines_parent"])
        if teach["exception_to"]:
            t(tid, "exception_to", teach["exception_to"])
        for other in teach["conflicts_with"]:
            # symmetric relation: emit each unordered pair once (min side)
            if tid < other:
                t(tid, "conflicts_with", other)
            else:
                t(other, "conflicts_with", tid)
    # parties (ref extract-comprehensive/config.ts:204-283)
    for party in extraction.get("parties", ()):
        pid = party["internal_party_id"]
        t(conv_id, "has_party", pid)
        t(pid, f"party_role:{party['procedural_role']}", conv_id)
        t(pid, f"party_type:{party['party_type']}", party["name"])
    outcome = extraction.get("outcome", "")
    if outcome:
        t(conv_id, "has_outcome", outcome)
    return triples


def canonical_edges(links: list[dict]) -> list[tuple[str, str]]:
    """Union-find input edges: mention ↔ canonical entity (ENT: namespace)."""
    return [
        (link["mention_internal_id"], f"ENT:{link['matched_entity']}")
        for link in links
        if link["matched_entity"] is not None
    ]
