"""Legal-teaching extraction: the TEACH- entity family.

Rebuilds the reference's extract-legal-teachings job (Agent 5) as a
deterministic rule-based extractor over assembled transcript documents:

  - teaching IDs   TEACH-{conv_id}-{seq:03d}
    (/root/reference/src/jobs/extract-legal-teachings/schema.ts:37-40)
  - hierarchy edges refines / exception / conflicts between teachings of
    the same document (schema.ts:101-142)
  - teaching→provision (relatedCitedProvisionsId, ART- ids) and
    teaching→decision (relatedCitedDecisionsId, DEC- ids) links
    (schema.ts:189-197), resolved against the SAME document's extracted
    provision/decision mention lists
  - principle-type / legal-area / court-level closed sets (schema.ts:71-99,
    155-158) via deterministic bilingual phrase lexicons — the analogue of
    the reference LLM's semantic classification; a real LLM extractor slots
    into the same stage via the injectable extract_fn.

A line is a teaching iff it carries one of the explicit bilingual principle
markers below. Hierarchy markers reference "the previous principle" — the
immediately preceding teaching in document order (null when none exists,
matching validationChecks.allHierarchyReferencesValid semantics).

Field-length deltas vs the reference schema (minLength 100 on text /
verbatim) are relaxed to fit the synthetic corpus' shorter turns; the
pattern and enum constraints are kept verbatim.
"""

from __future__ import annotations

import re

from .extract import extract_cited_provisions
from .normalize import pad3

PRINCIPLE_TYPES = (
    "INTERPRETATION_RULE", "APPLICATION_STANDARD", "LEGAL_TEST", "BURDEN_PROOF",
    "BALANCING_TEST", "PROCEDURAL_RULE", "REMEDIAL_PRINCIPLE",
)
LEGAL_AREAS = (
    "DISCRIMINATION_LAW", "DATA_PROTECTION", "EMPLOYMENT_LAW", "CONTRACT_LAW",
    "CIVIL_LIABILITY", "ADMINISTRATIVE_LAW", "PROCEDURAL_LAW", "COMPETITION_LAW",
    "INTELLECTUAL_PROPERTY", "FAMILY_LAW", "OTHER",
)
COURT_LEVELS = ("CASSATION", "APPEAL", "FIRST_INSTANCE")

# explicit new-principle markers (EXPLICIT clarity)
_EXPLICIT_MARKERS = [
    re.compile(r"énonce le principe suivant\s*:\s*", re.IGNORECASE),
    re.compile(r"stelt het volgende beginsel voorop\s*:\s*", re.IGNORECASE),
]
# hierarchy markers referencing the previous teaching (IMPLICIT clarity)
_HIER_MARKERS = [
    ("refines", re.compile(r"en précisant le principe précédent\s*,?\s*", re.IGNORECASE)),
    ("refines", re.compile(r"ter verfijning van het voorgaande beginsel\s*,?\s*", re.IGNORECASE)),
    ("exception", re.compile(r"par exception au principe précédent\s*,?\s*", re.IGNORECASE)),
    (
        "exception",
        re.compile(r"bij wijze van uitzondering op het voorgaande beginsel\s*,?\s*", re.IGNORECASE),
    ),
    ("conflicts", re.compile(r"contrairement au principe précédent\s*,?\s*", re.IGNORECASE)),
    ("conflicts", re.compile(r"in strijd met het voorgaande beginsel\s*,?\s*", re.IGNORECASE)),
]

_TYPE_LEXICON = [
    ("BURDEN_PROOF", ("charge de la preuve", "bewijslast")),
    ("BALANCING_TEST", ("mise en balance", "belangenafweging")),
    ("INTERPRETATION_RULE", ("doit être interprété", "moet worden uitgelegd")),
    ("LEGAL_TEST", ("suppose une faute", "vereist een fout", "critère", "criterium")),
    ("PROCEDURAL_RULE", ("procédure", "rechtspleging", "termijn", "délai")),
    ("REMEDIAL_PRINCIPLE", ("réparation", "schadevergoeding", "herstel")),
]
_AREA_LEXICON = [
    ("DISCRIMINATION_LAW", ("discrimination", "discriminatie")),
    ("DATA_PROTECTION", ("données", "persoonsgegevens", "vie privée")),
    ("EMPLOYMENT_LAW", ("travail", "arbeidsovereenkomst")),
    ("CONTRACT_LAW", ("contrat", "overeenkomst")),
    ("CIVIL_LIABILITY", ("responsab", "aansprakelijk", "dommage", "schade")),
    ("PROCEDURAL_LAW", ("procédure", "rechtspleging", "pourvoi")),
]

_NL_CUES = (" het ", " beginsel", "artikel ", " wordt ", " rust op ")


def _detect_language(line: str) -> str:
    low = f" {line.lower()} "
    return "NL" if any(c in low for c in _NL_CUES) else "FR"


def _classify_principle_type(clause: str) -> str:
    low = clause.lower()
    for ptype, cues in _TYPE_LEXICON:
        if any(c in low for c in cues):
            return ptype
    return "APPLICATION_STANDARD"


def _classify_legal_area(clause: str) -> str:
    low = clause.lower()
    for area, cues in _AREA_LEXICON:
        if any(c in low for c in cues):
            return area
    return "OTHER"


_CASSATION_RE = re.compile(r"cassatieberoep|pourvoi|\bCass\.", re.IGNORECASE)
_APPEAL_RE = re.compile(r"cour d'appel|hof van beroep", re.IGNORECASE)


def detect_court_level(doc_text: str) -> str:
    """Court level from document cues (ref schema.ts:155-158 extracts it
    from the markdown; same deterministic cue rule on both oracle + Ray)."""
    if _CASSATION_RE.search(doc_text):
        return "CASSATION"
    if _APPEAL_RE.search(doc_text):
        return "APPEAL"
    return "FIRST_INSTANCE"


def _related_provision_ids(line: str, conv_id: str, provisions: list[dict]) -> list[str]:
    """ART- ids of the document's provisions mentioned in THIS line: the
    line is re-parsed with the same provision extractor and matched by
    (provision_number_key, parent act prefix)."""
    local = extract_cited_provisions(line, conv_id)
    if not local:
        return []
    global_by_key = {
        (p["provision_number_key"], p["parent_act_name"].lower()): p["internal_provision_id"]
        for p in provisions
    }
    out = []
    for lp in local:
        pid = global_by_key.get((lp["provision_number_key"], lp["parent_act_name"].lower()))
        if pid is not None and pid not in out:
            out.append(pid)
    return out


def _related_decision_ids(line: str, decisions: list[dict]) -> list[str]:
    """DEC- ids of the document's cited decisions referenced in THIS line
    (by ECLI or case-number substring)."""
    out = []
    for d in decisions:
        needle = d.get("ecli") or d.get("case_number")
        if needle and needle in line and d["internal_decision_id"] not in out:
            out.append(d["internal_decision_id"])
    return out


def extract_legal_teachings(
    text: str, conv_id: str, provisions: list[dict], decisions: list[dict]
) -> list[dict]:
    """All legal teachings of one assembled document, in turn order.

    Returns records with the engine's flat analogue of the reference's
    teaching schema: ids, clauses, closed-set classifications, hierarchy
    references (to earlier teachings of the SAME document or None) and
    related ART-/DEC- id lists.
    """
    court_level = detect_court_level(text)
    teachings: list[dict] = []
    for line in text.split("\n"):
        verbatim = line.partition(": ")[2] or line
        marker_m = None
        clarity = None
        hier_kind = None
        for rx in _EXPLICIT_MARKERS:
            m = rx.search(verbatim)
            if m:
                marker_m, clarity = m, "EXPLICIT"
                break
        if marker_m is None:
            for kind, rx in _HIER_MARKERS:
                m = rx.search(verbatim)
                if m:
                    marker_m, clarity, hier_kind = m, "IMPLICIT", kind
                    break
        if marker_m is None:
            continue

        clause = verbatim[marker_m.end():].strip() or verbatim
        seq = len(teachings) + 1
        teaching_id = f"TEACH-{conv_id}-{pad3(seq)}"
        prev_id = teachings[-1]["teaching_id"] if teachings else None

        refines_parent = prev_id if hier_kind == "refines" else None
        exception_to = prev_id if hier_kind == "exception" else None
        conflicts_with = [prev_id] if (hier_kind == "conflicts" and prev_id) else []
        # reverse edges on the referenced (previous) teaching
        if prev_id is not None and hier_kind == "refines":
            teachings[-1]["refined_by"] = teachings[-1]["refined_by"] + [teaching_id]
        if prev_id is not None and hier_kind == "exception":
            teachings[-1]["excepted_by"] = teachings[-1]["excepted_by"] + [teaching_id]
        if prev_id is not None and hier_kind == "conflicts":
            teachings[-1]["conflicts_with"] = teachings[-1]["conflicts_with"] + [teaching_id]

        teachings.append(
            {
                "teaching_seq": seq,
                "teaching_id": teaching_id,
                "text": clause,
                "court_verbatim": verbatim,
                "court_verbatim_language": _detect_language(verbatim),
                "factual_trigger": ("applies when " + clause)[:300],
                "relevant_factual_context": ("in casu: " + verbatim)[:500],
                "principle_type": _classify_principle_type(clause),
                "legal_area": _classify_legal_area(clause),
                "court_level": court_level,
                "binding": court_level == "CASSATION",
                "clarity": clarity,
                "novel_principle": clarity == "EXPLICIT",
                "refines_parent": refines_parent,
                "refined_by": [],
                "exception_to": exception_to,
                "excepted_by": [],
                "conflicts_with": conflicts_with,
                "related_provision_ids": _related_provision_ids(verbatim, conv_id, provisions),
                "related_decision_ids": _related_decision_ids(verbatim, decisions),
                "source_author": "RULE_BASED",
            }
        )
    return teachings


def hierarchy_reference_errors(teachings: list[dict]) -> list[str]:
    """validationChecks.allHierarchyReferencesValid analogue: every
    hierarchy reference must name a teaching id of the same document."""
    ids = {t["teaching_id"] for t in teachings}
    errors = []
    for t in teachings:
        refs = (
            [t["refines_parent"], t["exception_to"]]
            + t["refined_by"] + t["excepted_by"] + t["conflicts_with"]
        )
        for r in refs:
            if r is not None and r not in ids:
                errors.append(f"{t['teaching_id']}: dangling hierarchy ref {r}")
    return errors
