"""Deterministic structured extraction: document text → validated records.

The reference's extraction steps are LLM jobs with strict JSON-schema
outputs (/root/reference/src/pipeline/steps.ts:155-263,648-661). Our engine
treats the extractor as an injectable per-batch function with an enforced
output schema; THIS module is the deterministic rule-based implementation
that ships with the engine (a real LLM client can be slotted into the same
actor-pool stage). It composes the ported deterministic primitives:

  - citation regions (region_detector, ref regex-extractor.ts)
  - provision snippets (snippet_extractor, ref provisionSnippetExtractor.ts)
  - legal references (reference_extractor, ref referenceExtractorN8N.ts)
  - ID construction ART-/ACT-/DEC-{id}-{seq:03d}    (ref steps.ts:202-213)
  - self-citation filter by ECLI date + re-sequence (ref steps.ts:226-263)

Sequence determinism under parallelism: sequences are assigned by
first-occurrence order in the assembled (turn_idx-sorted) document text,
never by global row position (SURVEY.md §4 determinism notes).
"""

from __future__ import annotations

import re

from .normalize import extract_date_from_ecli, normalize_string, pad3
from .region_detector import Region, detect_citation_regions
from .snippet_extractor import PATTERN_ARTICLE_WITH_SOURCE, PATTERN_EU_INSTRUMENT, PATTERN_TREATY
from .text_stats import ALL_STOPWORDS, letter_words

# ---------------------------------------------------------------------------
# cited decisions
# ---------------------------------------------------------------------------

_MONTHS = {
    "januari": 1, "februari": 2, "maart": 3, "april": 4, "mei": 5, "juni": 6,
    "juli": 7, "augustus": 8, "september": 9, "oktober": 10, "november": 11,
    "december": 12,
    "janvier": 1, "février": 2, "mars": 3, "avril": 4, "mai": 5, "juin": 6,
    "juillet": 7, "août": 8, "septembre": 9, "octobre": 10, "novembre": 11,
    "décembre": 12,
}

_NUM_DATE_RE = re.compile(r"^(\d{1,2})[-/.](\d{1,2})[-/.](\d{2,4})$")
_NAME_DATE_RE = re.compile(r"^(\d{1,2})\s+([a-zéûà]+)\s+(\d{4})$", re.IGNORECASE)

TREATMENTS = ("FOLLOWED", "DISTINGUISHED", "OVERRULED", "CITED", "UNCERTAIN")
_TREATMENT_KEYWORDS = [
    ("FOLLOWED", re.compile(r"\b(followed|gevolgd|suivi|conform(?:e|ément)?)\b", re.IGNORECASE)),
    ("DISTINGUISHED", re.compile(r"\b(distinguished|onderscheiden|distingué)\b", re.IGNORECASE)),
    ("OVERRULED", re.compile(r"\b(overruled|teruggekomen|revirement)\b", re.IGNORECASE)),
]


def parse_trigger_date(text: str) -> str | None:
    """Trigger-matched date string → ISO YYYY-MM-DD (None if unparseable)."""
    text = text.strip()
    m = _NUM_DATE_RE.match(text)
    if m:
        d, mo, y = int(m.group(1)), int(m.group(2)), m.group(3)
        year = int(y) if len(y) == 4 else (2000 + int(y) if int(y) < 50 else 1900 + int(y))
        if 1 <= mo <= 12 and 1 <= d <= 31:
            return f"{year:04d}-{mo:02d}-{d:02d}"
        return None
    m = _NAME_DATE_RE.match(text)
    if m:
        mo = _MONTHS.get(m.group(2).lower())
        if mo:
            return f"{int(m.group(3)):04d}-{mo:02d}-{int(m.group(1)):02d}"
    return None


def detect_treatment(region_text: str) -> str:
    """First matching treatment keyword in the region window, else CITED."""
    for treatment, rx in _TREATMENT_KEYWORDS:
        if rx.search(region_text):
            return treatment
    return "CITED"


def _region_citations(region: Region) -> list[dict]:
    """Citations from one region. HIGH → one per distinct ECLI; MEDIUM → one
    court+date citation; LOW regions emit nothing (our deterministic rule —
    the reference routes LOW regions to LLM stage 2)."""
    courts = [t for t in region.triggers if t.type == "COURT"]
    dates = [t for t in region.triggers if t.type == "DATE"]
    cases = [t for t in region.triggers if t.type == "CASE_NUMBER"]
    treatment = detect_treatment(region.text)
    court_name = courts[0].text if courts else None
    case_number = cases[0].text if cases else None

    out = []
    if region.confidence == "HIGH":
        for t in region.triggers:
            if t.type != "ECLI":
                continue
            date = extract_date_from_ecli(t.text)
            if date is None and dates:
                date = parse_trigger_date(dates[0].text)
            out.append(
                {
                    "ecli": t.text,
                    "court_name": court_name,
                    "date": date,
                    "case_number": case_number,
                    "treatment": treatment,
                    "type": "DECISION",
                    "jurisdiction": region.jurisdiction,
                    "confidence": region.confidence,
                }
            )
    elif region.confidence == "MEDIUM":
        date = parse_trigger_date(dates[0].text) if dates else None
        out.append(
            {
                "ecli": None,
                "court_name": court_name,
                "date": date,
                "case_number": case_number,
                "treatment": treatment,
                "type": "DECISION",
                "jurisdiction": region.jurisdiction,
                "confidence": region.confidence,
            }
        )
    return out


def extract_cited_decisions(text: str, conv_id: str, self_ecli: str) -> list[dict]:
    """Full cited-decision extraction with self-citation filter + IDs.

    Mirrors extract-cited-decisions postProcess (steps.ts:226-263): citations
    whose date equals the source's ECLI-derived date are dropped, remaining
    ones renumbered 1..n, then DEC-{conv_id}-{seq:03d} ids attached.
    """
    regions = detect_citation_regions(text, self_ecli)
    citations: list[dict] = []
    seen: set[tuple] = set()
    for region in regions:
        for c in _region_citations(region):
            key = (c["ecli"], c["court_name"], c["date"], c["case_number"])
            if key in seen:
                continue
            seen.add(key)
            c["_region"] = region  # private: snippet search scope (popped below)
            citations.append(c)

    self_date = extract_date_from_ecli(self_ecli)
    if self_date:
        citations = [c for c in citations if c["date"] != self_date]

    # M10 wiring: locate each citation's snippet in the source text AT
    # EXTRACTION TIME (text is resident here; linking stages never re-ship
    # the document — the snippet travels as a <=600-char mention field).
    # Ref map-cited-decisions/citation-finder.ts:335-365: the snippet is the
    # disambiguation context for the mapping step. The pattern search runs
    # over the citation's SOURCE REGION (<=1.2KB window), not the whole
    # document — O(1) per citation regardless of document length; the
    # snippet itself is then sentence-aligned against the full text.
    from .citation_finder import extract_snippet, find_citation_position

    for i, c in enumerate(citations):
        c["decision_seq"] = i + 1
        c["internal_decision_id"] = f"DEC-{conv_id}-{pad3(i + 1)}"
        region = c.pop("_region")
        match = find_citation_position(
            region.text, c.get("ecli"), c.get("case_number"), c.get("court_name"), c.get("date")
        )
        if match is None:
            c["snippet"], c["snippet_matched_on"] = "", ""
        else:
            c["snippet"] = extract_snippet(text, region.position + match.position)
            c["snippet_matched_on"] = match.match_type
    return citations


# ---------------------------------------------------------------------------
# cited provisions
# ---------------------------------------------------------------------------

_ARTICLE_NUM_RE = re.compile(
    r"(art\.?|artikel|articles?|artikelen?|article)\s*([0-9][0-9a-zA-Z./-]*)", re.IGNORECASE
)
_ACT_NAME_CONT_RE = re.compile(r"^[\w'’ .\-]{0,60}", re.UNICODE)
_ACT_DATE_RE = re.compile(
    r"(?:loi\s+du|wet\s+van)\s+(\d{1,2})\s+(\w+)\s+(\d{4})", re.IGNORECASE
)

# source keyword → bilingual act type (feeds map_to_document_type for linking)
_ACT_TYPE_MAP = [
    (re.compile(r"^loi\b", re.IGNORECASE), "LOI"),
    (re.compile(r"^wet\b", re.IGNORECASE), "WET"),
    (re.compile(r"^grondwet", re.IGNORECASE), "GRONDWET"),
    (re.compile(r"^constitution", re.IGNORECASE), "CONSTITUTION"),
    (re.compile(r"^(k\.?b\.?|koninklijk\s+besluit)", re.IGNORECASE), "KONINKLIJK_BESLUIT"),
    (re.compile(r"^(a\.?r\.?|arr[êe]t[ée]?)$", re.IGNORECASE), "ARRETE_ROYAL"),
    (re.compile(r"^(code|c\.)", re.IGNORECASE), "CODE"),
    (re.compile(r"^(b\.w\.|sw\.|w\.?\s*sv\.|ger\.?\s*w\.|gw\.|venw\.|wib|btw-wetboek)", re.IGNORECASE), "CODE"),
    (re.compile(r"^(verordening|r[eè]glement|regulation)", re.IGNORECASE), "EU_REGULATION"),
    (re.compile(r"^(richtlijn|directive)", re.IGNORECASE), "EU_DIRECTIVE"),
    (re.compile(r"^(cedh|evrm|tfue|tfeu|tue|vweu)", re.IGNORECASE), "TREATY"),
]


def _act_type_for(name: str) -> str:
    for rx, act_type in _ACT_TYPE_MAP:
        if rx.search(name.strip()):
            return act_type
    return "OTHER"


def _full_act_name(full_text: str, kw_start: int) -> str:
    """Act name = source keyword + following word run (<=60 chars, trimmed).

    The reference's pattern stops AT the source keyword (the LLM reads the
    full name from context); our deterministic extractor extends the keyword
    through the adjacent word characters so alias lookup has a usable name.
    """
    m = _ACT_NAME_CONT_RE.match(full_text[kw_start : kw_start + 80])
    name = m.group(0) if m else full_text[kw_start : kw_start + 20]
    name = re.split(r"[.,;\n]", name)[0]
    # cut before a following article clause ("... et l'article 10 de la X")
    m2 = re.search(r"\s+(?:et|en)\s+(?:l['’])?\s*(?:art\.?|artikel|article)\b", name, re.IGNORECASE)
    if m2:
        name = name[: m2.start()]
    return re.sub(r"\s+", " ", name).strip()


def provision_number_key(provision_number: str) -> str:
    """Lookup key for article joins: lowercase, drop trailing punctuation."""
    return re.sub(r"[^0-9a-z]+$", "", provision_number.lower())


def extract_cited_provisions(text: str, conv_id: str) -> list[dict]:
    """Provision mentions with deterministic sequences + ART/ACT ids.

    One record per distinct (provision_number_key, normalized act name);
    provisionSequence by first occurrence, parentActSequence by first
    occurrence of the act name (ref steps.ts:188-214 ID construction).
    """
    records: list[dict] = []
    seen: set[tuple[str, str]] = set()
    act_seq_by_name: dict[str, int] = {}

    matches = []
    for rgx in (PATTERN_ARTICLE_WITH_SOURCE, PATTERN_TREATY, PATTERN_EU_INSTRUMENT):
        matches.extend(rgx.finditer(text))
    matches.sort(key=lambda m: m.start())

    for m in matches:
        frag = m.group(0)
        art = _ARTICLE_NUM_RE.search(frag)
        if rgx_is_eu_instrument := (art is None):
            # EU-instrument pattern has no article keyword: act-only mention
            provision_number = ""
        else:
            provision_number = art.group(2)

        # locate the source keyword: last capture group that matched
        groups = [g for g in range(m.lastindex or 0, 0, -1) if m.group(g)]
        if groups:
            kw_group = groups[0]
            act_name = _full_act_name(text, m.start(kw_group))
        else:
            act_name = frag.strip()
        if not act_name:
            continue
        if rgx_is_eu_instrument:
            act_name = re.sub(r"\s+", " ", frag.split("\n")[0]).strip()

        norm_name = normalize_string(act_name)
        key = (provision_number_key(provision_number), norm_name)
        if key in seen:
            continue
        seen.add(key)

        if norm_name not in act_seq_by_name:
            act_seq_by_name[norm_name] = len(act_seq_by_name) + 1
        act_seq = act_seq_by_name[norm_name]
        prov_seq = len(records) + 1

        date_m = _ACT_DATE_RE.search(act_name)
        act_date = None
        if date_m:
            mo = _MONTHS.get(date_m.group(2).lower())
            if mo:
                act_date = f"{int(date_m.group(3)):04d}-{mo:02d}-{int(date_m.group(1)):02d}"

        records.append(
            {
                "provision_seq": prov_seq,
                "act_seq": act_seq,
                "provision_number": provision_number,
                "provision_number_key": provision_number_key(provision_number),
                "parent_act_name": act_name,
                "parent_act_type": _act_type_for(act_name),
                "parent_act_date": act_date,
                "internal_provision_id": f"ART-{conv_id}-{pad3(prov_seq)}",
                "internal_parent_act_id": f"ACT-{conv_id}-{pad3(act_seq)}",
            }
        )
    return records


# ---------------------------------------------------------------------------
# keywords + micro summary (deterministic analogues of steps 4-5)
# ---------------------------------------------------------------------------


def extract_keywords(text: str, top_n: int = 5) -> list[str]:
    """Top-N most frequent non-stopword letter words (len>=4); ties broken
    alphabetically. Deterministic analogue of the extract-keywords LLM job."""
    counts: dict[str, int] = {}
    for w in letter_words(text):
        if len(w) >= 4 and w not in ALL_STOPWORDS:
            counts[w] = counts.get(w, 0) + 1
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    return [w for w, _ in ranked[:top_n]]


def micro_summary(text: str, max_chars: int = 150) -> str:
    """First sentence-ish prefix, whitespace-normalized, capped."""
    head = re.sub(r"\s+", " ", text[: max_chars * 2]).strip()
    return head[:max_chars]
