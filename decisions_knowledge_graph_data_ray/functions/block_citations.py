"""Block-based citation enrichment — the deterministic analogue of the
reference's Agent 2D (enrich-provision-citations) and Agent 5B
(enrich-teaching-citations) jobs.

Semantics rebuilt from the reference schemas/configs:
- per entity (provision / decision / teaching): ``citations`` =
  [(block_id, relevant_snippet)] for every HTML block where the entity
  appears (src/jobs/enrich-provision-citations/schema.ts:44-70 — blockId
  "{doc}:block-NNN" + relevantSnippet);
- ``related_provision_ids``: for provisions the FIRST element is the
  provision's own id (mandatory self-reference,
  enrich-provision-citations/schema.ts:71-78), then other provisions sharing
  >=1 block, deduplicated in block order;
- ``related_decision_ids``: decisions sharing >=1 block
  (schema.ts:79-86);
- teachings: relationship claims are VALIDATED — related ids that do not
  cite any block of the document are dropped (the reference "validates that
  provisions and decisions mentioned in teachings actually appear in
  citations", enrich-teaching-citations/config.ts:11-30);
- blocks come from PRE-transformed HTML with data-id attributes, read back
  with the inverse reader (config.ts:17-19 loads full_html instead of
  re-running pandoc) — here each transcript turn is one block.

Where the reference asks an LLM whether a block "substantively discusses"
an entity, this engine applies the deterministic containment rules below
(documented per entity kind); the same rules run in the serial oracle, so
the P/R gate stays meaningful.
"""

from __future__ import annotations

import re

from .html import extract_blocks_from_transformed
from .normalize import pad3

_SNIPPET_CAP = 240  # reference has no hard cap; keep mention-sized payloads

_WS_RE = re.compile(r"\s+")


def turns_to_transformed_html(conv_id: str, text: str) -> str:
    """Assembled document → pre-transformed HTML, one <p data-id> block per
    turn line (the transcript analogue of decision_fulltext1.full_html)."""
    parts = []
    seq = 0
    for line in text.split("\n"):
        line = line.strip()
        if not line:
            continue
        # number EMITTED blocks so ids are contiguous 1..n (matching
        # transform_html_blocks and the reference's block-id scheme) —
        # skipped empty lines must not leave gaps
        seq += 1
        parts.append(f'<p data-id="{conv_id}:block-{pad3(seq)}">{line}</p>')
    return "\n".join(parts)


def _norm(s: str) -> str:
    return _WS_RE.sub(" ", (s or "").lower()).strip()


def _snippet(block_text: str, needle: str) -> str:
    """Excerpt of the block's plain text centred on the first match of
    ``needle`` (case-insensitive); the whole block when it is short."""
    if len(block_text) <= _SNIPPET_CAP:
        return block_text
    pos = block_text.lower().find(needle.lower()) if needle else -1
    if pos < 0:
        return block_text[:_SNIPPET_CAP]
    start = max(0, pos - (_SNIPPET_CAP - len(needle)) // 2)
    return block_text[start : start + _SNIPPET_CAP]


def _provision_needles(p: dict) -> list[str]:
    num = _norm(p.get("provision_number", ""))
    return [f"article {num}", f"artikel {num}", f"art. {num}"] if num else []


def _provision_in_block(p: dict, blk_norm: str) -> str | None:
    """Containment rule for provisions: the block must contain the article
    token (FR/NL/abbrev) AND, when the mention has a parent act name, that
    act name — both were regex-extracted from one source line, so the line's
    block contains both."""
    for needle in _provision_needles(p):
        if needle in blk_norm:
            act = _norm(p.get("parent_act_name", ""))
            if act and act not in blk_norm:
                continue
            return needle
    return None


def _decision_in_block(d: dict, blk_norm: str) -> str | None:
    """Containment rule for decisions, by the citation-finder priority
    (map-cited-decisions/citation-finder.ts:179-246): ECLI > case number >
    court name + date co-occurrence."""
    ecli = _norm(d.get("ecli", ""))
    if ecli:
        return ecli if ecli in blk_norm else None
    case_no = _norm(d.get("case_number", ""))
    if case_no and case_no in blk_norm:
        return case_no
    court = _norm(d.get("court_name", ""))
    date = _norm(d.get("date", ""))
    if court and court in blk_norm and date and date in blk_norm:
        return court
    return None


def _teaching_in_block(t: dict, blk_norm: str) -> str | None:
    """A teaching cites the block holding its verbatim source sentence."""
    verbatim = _norm(t.get("court_verbatim", ""))
    if verbatim and verbatim in blk_norm:
        return verbatim[:80]
    return None


def enrich_block_citations(conv_id: str, text: str, extraction: dict) -> list[dict]:
    """One document → flat per-entity enrichment rows.

    Row schema (strings keep the Arrow schema flat; lists are '|'-joined in
    citation/relationship order):
      conv_id, kind ('provision'|'decision'|'teaching'), entity_id,
      n_citations, block_ids, first_snippet,
      related_provision_ids, related_decision_ids
    """
    html = turns_to_transformed_html(conv_id, text)
    blocks = extract_blocks_from_transformed(html)
    blk_norms = [_norm(b["plain_text"]) for b in blocks]

    provisions = extraction.get("cited_provisions") or []
    decisions = extraction.get("cited_decisions") or []
    teachings = extraction.get("legal_teachings") or []

    # entity → [block index]; block index → entity ids (for co-occurrence)
    cites: dict[str, list[tuple[int, str]]] = {}
    block_provs: dict[int, list[str]] = {}
    block_decs: dict[int, list[str]] = {}

    def scan(entities, id_key, matcher, block_index):
        for e in entities:
            eid = e[id_key]
            for bi, blk_norm in enumerate(blk_norms):
                needle = matcher(e, blk_norm)
                if needle is None:
                    continue
                cites.setdefault(eid, []).append((bi, needle))
                if block_index is not None:
                    block_index.setdefault(bi, []).append(eid)

    scan(provisions, "internal_provision_id", _provision_in_block, block_provs)
    scan(decisions, "internal_decision_id", _decision_in_block, block_decs)
    scan(teachings, "teaching_id", _teaching_in_block, None)

    def related(eid: str, own_blocks: list[int], index: dict[int, list[str]],
                self_first: bool) -> list[str]:
        out = [eid] if self_first else []
        for bi in own_blocks:
            for other in index.get(bi, []):
                if other != eid and other not in out:
                    out.append(other)
        return out

    cited_dec_ids = {d for ids in block_decs.values() for d in ids}
    cited_prov_ids = {p for ids in block_provs.values() for p in ids}

    rows: list[dict] = []

    def emit(kind: str, eid: str, rel_prov: list[str], rel_dec: list[str]):
        hits = cites.get(eid, [])
        rows.append(
            {
                "conv_id": conv_id,
                "kind": kind,
                "entity_id": eid,
                "n_citations": len(hits),
                "block_ids": "|".join(blocks[bi]["block_id"] for bi, _ in hits),
                "first_snippet": _snippet(blocks[hits[0][0]]["plain_text"], hits[0][1])
                if hits
                else "",
                "related_provision_ids": "|".join(rel_prov),
                "related_decision_ids": "|".join(rel_dec),
            }
        )

    for p in provisions:
        eid = p["internal_provision_id"]
        own = [bi for bi, _ in cites.get(eid, [])]
        emit(
            "provision",
            eid,
            related(eid, own, block_provs, self_first=True),  # self-ref FIRST
            related(eid, own, block_decs, self_first=False),
        )
    for d in decisions:
        eid = d["internal_decision_id"]
        own = [bi for bi, _ in cites.get(eid, [])]
        emit(
            "decision",
            eid,
            related(eid, own, block_provs, self_first=False),
            related(eid, own, block_decs, self_first=False),
        )
    for t in teachings:
        eid = t["teaching_id"]
        # 5B validation: keep only relationship claims whose target actually
        # has a block citation in this document
        rel_p = [x for x in (t.get("related_provision_ids") or []) if x in cited_prov_ids]
        rel_d = [x for x in (t.get("related_decision_ids") or []) if x in cited_dec_ids]
        emit("teaching", eid, rel_p, rel_d)

    return rows
