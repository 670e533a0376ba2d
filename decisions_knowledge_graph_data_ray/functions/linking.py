"""Entity-linking logic: candidate generation, fast paths, scoring, top-match.

Behavioral port of the reference's 4-step mapping pipeline
(/root/reference/src/pipeline/mapping/steps.ts:924-929) with the LLM
disambiguation replaced by a deterministic scorer over the same candidate
sets (the reference's exact-match fast paths are ported verbatim; the fuzzy
middle is trigram-similarity scoring, the same signal its SQL candidate
generation uses via pg_trgm similarity()).

Fast paths (all ported):
  - popular-law alias exact match → confidence 1.0 / score 100, skip
    disambiguation                                   (steps.ts:301-322)
  - exact ECLI among date candidates → score 100     (steps.ts:599-621 analog :826-846)
  - known-missing court → NO_MATCH skip              (steps.ts:793-800)
  - null/invalid date → NO_MATCH skip                (steps.ts:803-811)

Thresholding: per mention keep the top-scored match iff score >= 80
(src/scripts/aggregate-provision-mappings.ts:22,87-104).

The LinkerIndex holds the canonical entity tables as in-memory hash/date
indexes — this is the build side of the broadcast hash join (T2/T3/T5 in
SURVEY.md §2.3); stages/linking.py ships it to actors via ray.put.
"""

from __future__ import annotations

import re

from dataclasses import dataclass, field

from .normalize import (
    map_to_document_type,
    normalize_court_name,
    normalize_string,
    trigram_set,
    trigram_similarity,
)

MIN_SCORE = 80
MAX_CANDIDATES = 200


@dataclass
class LinkerIndex:
    """Broadcastable candidate indexes built once from the entity tables.

    acts_by_date:   dossier date prefix 'YYYY-MM-DD' → [act dict]   (J3)
    acts_by_number: document_number → act dict
    articles:       (document_number, article_number) → True        (J2/T2)
    alias_popular:  normalized name → document_number               (T3)
    code_families:  code family name → [document_number]            (T4/J4)
    decisions_by_date: 'YYYY-MM-DD' → [decision dict]               (J6)
    missing_courts: set of normalized court names                   (T5)
    """

    acts_by_date: dict[str, list[dict]] = field(default_factory=dict)
    acts_by_number: dict[str, dict] = field(default_factory=dict)
    articles: set[tuple[str, str]] = field(default_factory=set)
    acts_by_article: dict[str, list[str]] = field(default_factory=dict)
    alias_popular: dict[str, str] = field(default_factory=dict)
    code_families: dict[str, list[str]] = field(default_factory=dict)
    decisions_by_date: dict[str, list[dict]] = field(default_factory=dict)
    missing_courts: set[str] = field(default_factory=set)
    all_acts: list[dict] = field(default_factory=list)
    # precomputed candidate-title trigram sets (the J3/J5 similarity build
    # side — computed once at index build, shared by every lookup)
    title_trigrams: dict[str, frozenset] = field(default_factory=dict)

    def title_sim(self, query_trigrams: frozenset, document_number: str) -> float:
        tb = self.title_trigrams.get(document_number)
        if not query_trigrams or not tb:
            return 0.0
        inter = len(query_trigrams & tb)
        union = len(query_trigrams) + len(tb) - inter
        return inter / union if union else 0.0

    @classmethod
    def build(
        cls,
        acts: list[dict],
        articles: list[dict],
        alias_popular: dict[str, str],
        code_families: dict[str, list[str]],
        decisions: list[dict],
        missing_courts: list[str],
    ) -> "LinkerIndex":
        idx = cls()
        for a in acts:
            date = (a.get("dossier_number") or "")[:10]
            idx.acts_by_date.setdefault(date, []).append(a)
            idx.acts_by_number[a["document_number"]] = a
            idx.all_acts.append(a)
            idx.title_trigrams[a["document_number"]] = frozenset(trigram_set(a.get("title", "")))
        for art in articles:
            key = (art["document_number"], str(art["article_number"]))
            idx.articles.add(key)
            idx.acts_by_article.setdefault(str(art["article_number"]), []).append(
                art["document_number"]
            )
        idx.alias_popular = {normalize_string(k): v for k, v in alias_popular.items()}
        idx.code_families = dict(code_families)
        for d in decisions:
            idx.decisions_by_date.setdefault(str(d["decision_date"])[:10], []).append(d)
        idx.missing_courts = {normalize_court_name(c) for c in missing_courts}
        return idx


def _result(method: str, matches: list[dict], no_match_reason: str | None = None) -> dict:
    return {"method": method, "matches": matches, "no_match_reason": no_match_reason}


def _score_act_candidates(idx: "LinkerIndex", name: str, candidates: list[dict], method: str) -> dict:
    """Deterministic disambiguation: trigram similarity of candidate title vs
    the cited act name → score 0..100, top-3, stable tie-break by id.
    Candidate title trigrams come precomputed from the index."""
    qset = frozenset(trigram_set(name))
    scored = []
    for c in candidates:
        sim = idx.title_sim(qset, c["document_number"])
        scored.append(
            {"document_number": c["document_number"], "score": int(round(sim * 100)), "confidence": sim}
        )
    scored.sort(key=lambda m: (-m["score"], m["document_number"]))
    if not scored:
        return _result("NO_MATCH", [], "No candidates found matching date")
    return _result(method, scored[:3])


def identify_code_families(act_name: str, code_families: dict[str, list[str]]) -> list[str]:
    """Deterministic pass-1: code families whose normalized name has trigram
    similarity >= 0.3 with the act name OR containment either way (replaces
    the LLM code-family identification, steps.ts:393-416)."""
    norm = normalize_string(act_name)
    out = []
    for family in code_families:
        fam_norm = normalize_string(family)
        if fam_norm in norm or norm in fam_norm or trigram_similarity(fam_norm, norm) >= 0.3:
            out.append(family)
    return sorted(out)


def link_provision_standard(item: dict, idx: LinkerIndex) -> dict:
    """Standard (dated act) provision mapping (steps.ts:288-368)."""
    name = item.get("parent_act_name") or ""
    fast = idx.alias_popular.get(normalize_string(name))
    if fast:
        return _result("FAST_PATH", [{"document_number": fast, "score": 100, "confidence": 1.0}])

    search_date = item.get("parent_act_date") or ""
    strict_types = map_to_document_type(item.get("parent_act_type"))
    candidates = [
        a for a in idx.acts_by_date.get(search_date, []) if a.get("document_type") in strict_types
    ]
    if len(candidates) > MAX_CANDIDATES:
        qset = frozenset(trigram_set(name))
        candidates = sorted(
            candidates,
            key=lambda a: (-idx.title_sim(qset, a["document_number"]), a["document_number"]),
        )[:MAX_CANDIDATES]
    return _score_act_candidates(idx, name, candidates, "DISAMBIGUATED")


def link_provision_code(item: dict, idx: LinkerIndex, decision_date: str | None) -> dict:
    """Code-family provision mapping: family lookup → docs → article-existence
    left join + as-of cutoff (steps.ts:374-475)."""
    name = item.get("parent_act_name") or ""
    families = identify_code_families(name, idx.code_families)
    if not families:
        return _result("NO_MATCH", [], "No code family identified")

    doc_numbers: list[str] = []
    for fam in families:
        doc_numbers.extend(idx.code_families.get(fam, []))
    if not doc_numbers:
        return _result("NO_MATCH", [], "No document numbers for identified codes")

    article = item.get("provision_number_key") or item.get("provision_number") or ""
    candidates = []
    for num in dict.fromkeys(doc_numbers):
        act = idx.acts_by_number.get(num)
        if act is None:
            continue
        act_date = (act.get("dossier_number") or "")[:10]
        if decision_date and act_date and not act_date < decision_date:
            continue  # as-of cutoff: act must pre-date the citing decision
        has_article = (num, article) in idx.articles
        candidates.append({**act, "has_article": has_article})
    if not candidates:
        return _result("NO_MATCH", [], "No candidate documents found")

    qset = frozenset(trigram_set(name))
    scored = []
    for c in candidates:
        sim = idx.title_sim(qset, c["document_number"])
        score = int(round(sim * 60)) + (40 if c["has_article"] else 0)
        scored.append({"document_number": c["document_number"], "score": score, "confidence": sim})
    scored.sort(key=lambda m: (-m["score"], m["document_number"]))
    return _result("DISAMBIGUATED", scored[:3])


def link_provision_no_date(item: dict, idx: LinkerIndex, decision_date: str | None) -> dict:
    """No-date provision mapping: alias fast path, else similarity>=0.15 +
    article-number equality + optional as-of + type filter (steps.ts:589-700)."""
    name = item.get("parent_act_name") or ""
    fast = idx.alias_popular.get(normalize_string(name))
    if fast:
        return _result("FAST_PATH", [{"document_number": fast, "score": 100, "confidence": 1.0}])

    article = item.get("provision_number_key") or item.get("provision_number")
    if not article:
        return _result("NO_MATCH", [], "No article number available")

    target_types = map_to_document_type(item.get("parent_act_type"))
    use_types = bool(target_types) and "unknown" not in target_types

    # M14: Dutch act names are translated (memoized) before similarity so the
    # French candidate titles can match (mapping/steps.ts:643-651)
    search_name = (
        translate_act_name_to_french(name)
        if (looks_dutch(name) or looks_german(name))
        else name
    )
    qset = frozenset(trigram_set(search_name))
    scored = []
    # inverted article index: only acts actually containing the article are
    # scanned (the SQL JOIN article_contents ON article_number equality)
    for doc_number in idx.acts_by_article.get(str(article), ()):  # J5
        act = idx.acts_by_number[doc_number]
        sim = idx.title_sim(qset, doc_number)
        if sim < 0.15:
            continue
        act_date = (act.get("dossier_number") or "")[:10]
        if decision_date and act_date and not act_date < decision_date:
            continue
        if use_types and act.get("document_type") not in target_types:
            continue
        scored.append(
            {"document_number": doc_number, "score": int(round(sim * 100)), "confidence": sim}
        )
    scored.sort(key=lambda m: (-m["score"], m["document_number"]))
    return _result("DISAMBIGUATED", scored[:MAX_CANDIDATES][:3])


def _case_norm(s: str | None) -> str:
    return str(s or "").replace(" ", "").replace(".", "").replace("-", "").lower()


def link_cited_decision(item: dict, idx: LinkerIndex) -> dict:
    """Cited-decision mapping (steps.ts:784-929): missing-court skip, date
    validation, date-keyed candidates, exact-ECLI fast path, else scored
    disambiguation (court trigram sim 60% + case evidence 40%).

    M10 wiring (map-cited-decisions/citation-finder.ts:335-365): the
    mention's extraction-time ``snippet`` is the disambiguation context —
    a candidate whose ECLI occurs in the snippet is an exact match even
    when the mention's ecli attribute was lost to region merging, and a
    candidate case number co-occurring in the snippet counts as case
    evidence alongside attribute equality."""
    court = item.get("court_name")
    if court and normalize_court_name(court) in idx.missing_courts:
        return _result("NO_MATCH", [], f'Court "{court}" is not in database')

    date = item.get("date") or ""
    if not date:
        return _result("NO_MATCH", [], "cited_date is null or invalid")

    candidates = idx.decisions_by_date.get(date, [])
    if not candidates:
        return _result("NO_MATCH", [], f"No decisions found for date {date}")

    snippet = item.get("snippet") or ""
    snippet_low = snippet.lower()
    snippet_case = _case_norm(snippet)

    ecli = item.get("ecli")
    if ecli:
        for c in candidates:
            if c["decision_id"].lower() == ecli.lower():
                return _result(
                    "EXACT_ECLI",
                    [{"document_number": c["decision_id"], "score": 100, "confidence": 1.0}],
                )
    elif snippet_low:
        for c in candidates:
            if c["decision_id"].lower() in snippet_low:
                return _result(
                    "SNIPPET_ECLI",
                    [{"document_number": c["decision_id"], "score": 100, "confidence": 1.0}],
                )

    case_number = _case_norm(item.get("case_number"))
    scored = []
    for c in candidates:
        sim = trigram_similarity(c.get("court_name", ""), court or "")
        cand_case = _case_norm(c.get("case_number"))
        case_hit = bool(case_number and case_number == cand_case) or bool(
            cand_case and snippet_case and cand_case in snippet_case
        )
        score = int(round(sim * 60)) + (40 if case_hit else 0)
        scored.append({"document_number": c["decision_id"], "score": score, "confidence": sim})
    scored.sort(key=lambda m: (-m["score"], m["document_number"]))
    return _result("DISAMBIGUATED", scored[:3])


def top_match(matches: list[dict], min_score: int = MIN_SCORE) -> dict | None:
    """Sort by score desc, take top, keep iff score >= min_score
    (aggregate-provision-mappings.ts:87-104)."""
    if not matches:
        return None
    top = max(matches, key=lambda m: (m.get("score") or 0, m.get("document_number", "")))
    if (top.get("score") or 0) < min_score:
        return None
    return {"document_number": top["document_number"], "score": top["score"]}


def provision_bucket(item: dict) -> str:
    """standard / code / no_date routing (mapping/data-loader.ts:69-83)."""
    if item.get("parent_act_type") == "CODE":
        return "code"
    if item.get("parent_act_date"):
        return "standard"
    return "no_date"


# ---------------------------------------------------------------------------
# M14: act-name translation (NL/DE → FR) with memo cache
# ---------------------------------------------------------------------------
# The reference translates non-French act names via an LLM with a per-run
# memo Map (mapping/steps.ts:545-584). Our deterministic engine ships a
# fixed trilingual dictionary (NL/DE → FR, longest phrase first) plus month
# translation so date-carrying act names ("wet van 10 mei 2007") line up
# with the FR-keyed entity index; a real translator slots into the same
# memo-cache hook.

_TRANSLATION_PHRASES = [
    # NL (longest first — replacement is sequential)
    ("burgerlijk wetboek", "code civil"),
    ("strafwetboek", "code pénal"),
    ("gerechtelijk wetboek", "code judiciaire"),
    ("wetboek van koophandel", "code de commerce"),
    ("wetboek van strafvordering", "code d'instruction criminelle"),
    ("grondwet", "constitution"),
    ("koninklijk besluit", "arrêté royal"),
    ("ministerieel besluit", "arrêté ministériel"),
    ("tot wijziging van", "modifiant"),
    ("decreet van", "décret du"),
    ("ordonnantie van", "ordonnance du"),
    ("besluit van", "arrêté du"),
    ("wet van", "loi du"),
    ("betreffende", "relatif à"),
    ("houdende", "portant"),
    ("inzake", "en matière de"),
    ("decreet", "décret"),
    ("ordonnantie", "ordonnance"),
    ("besluit", "arrêté"),
    ("wetboek", "code"),
    ("wet", "loi"),
    # DE
    ("bürgerliches gesetzbuch", "code civil"),
    ("strafgesetzbuch", "code pénal"),
    ("königlicher erlass", "arrêté royal"),
    ("gesetz vom", "loi du"),
    ("gesetzbuch", "code"),
    ("gesetz", "loi"),
    ("erlass", "arrêté"),
    ("verfassung", "constitution"),
]

# NL and DE month names → FR (inside "loi du 10 mei 2007" style names)
_MONTHS_TO_FR = {
    "januari": "janvier", "februari": "février", "maart": "mars",
    "april": "avril", "mei": "mai", "juni": "juin", "juli": "juillet",
    "augustus": "août", "september": "septembre", "oktober": "octobre",
    "november": "novembre", "december": "décembre",
    "januar": "janvier", "februar": "février", "märz": "mars", "marz": "mars",
    "august": "août", "dezember": "décembre",
}
_MONTH_TOKEN_RE = re.compile(
    r"\b(" + "|".join(sorted(_MONTHS_TO_FR, key=len, reverse=True)) + r")\b"
)
# "arrêté royal van 25 ..." — a NL/DE date connective left over after the
# act-type phrase was consumed by a longer replacement
_DATE_CONNECTIVE_RE = re.compile(r"\b(van|vom)\b(?=\s+\d)")

_translation_cache: dict[str, str] = {}


def translate_act_name_to_french(name: str) -> str:
    """Phrase-level NL/DE→FR act-name translation, memoized per process."""
    if not name or not name.strip():
        return name
    key = normalize_string(name)
    cached = _translation_cache.get(key)
    if cached is not None:
        return cached
    out = key
    for src, fr in _TRANSLATION_PHRASES:
        out = out.replace(src, fr)
    out = _DATE_CONNECTIVE_RE.sub("du", out)
    out = _MONTH_TOKEN_RE.sub(lambda m: _MONTHS_TO_FR[m.group(1)], out)
    _translation_cache[key] = out
    return out


_NL_MARKERS = ("wet", "wetboek", "besluit", "grondwet", "artikel", "decreet", "ordonnantie")
_DE_MARKERS = ("gesetz", "erlass", "verfassung", "artikel")


def looks_dutch(name: str) -> bool:
    norm = normalize_string(name)
    return any(marker in norm for marker in _NL_MARKERS)


def looks_german(name: str) -> bool:
    norm = normalize_string(name)
    return any(marker in norm for marker in _DE_MARKERS)
