"""Citation-snippet finder: locate one known citation in source text.

Behavioral port of /root/reference/src/jobs/map-cited-decisions/citation-finder.ts:
  - pattern builders for ECLI (flexible colons), case numbers (exact /
    flexible separators / Cassation-core), dates (FR-NL month names,
    numeric with flexible padding, short year), court names (flexible
    whitespace, optional dots)                                   (:48-146)
  - search priority ECLI > CASE_NUMBER > COURT_DATE (date within
    -100..+200 chars of a court hit) > COURT_ONLY                (:179-246)
  - sentence-aligned ~600-char snippet with ellipses             (:255-313)
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from functools import lru_cache

from .normalize import js_escape_regex

DEFAULT_SNIPPET_SIZE = 600

MONTH_PATTERNS = {
    1: r"(?:janvier|januari|jan\.?)",
    2: r"(?:février|februari|feb\.?)",
    3: r"(?:mars|maart|mar\.?)",
    4: r"(?:avril|april|apr\.?)",
    5: r"(?:mai|mei)",
    6: r"(?:juin|juni|jun\.?)",
    7: r"(?:juillet|juli|jul\.?)",
    8: r"(?:août|augustus|aug\.?)",
    9: r"(?:septembre|september|sept?\.?)",
    10: r"(?:octobre|oktober|oct\.?|okt\.?)",
    11: r"(?:novembre|november|nov\.?)",
    12: r"(?:décembre|december|dec\.?)",
}


@lru_cache(maxsize=4096)  # pattern compilation is 40% of extraction CPU
def build_ecli_pattern(ecli: str | None) -> re.Pattern | None:
    if not ecli:
        return None
    parts = ecli.split(":")
    if len(parts) < 5:
        return None
    return re.compile(r"\s*:\s*".join(js_escape_regex(p) for p in parts), re.IGNORECASE)


@lru_cache(maxsize=4096)
def build_case_number_patterns(case_number: str | None) -> tuple[re.Pattern, ...]:
    if not case_number:
        return ()
    patterns = [re.compile(js_escape_regex(case_number), re.IGNORECASE)]

    flex = r"[\s.\-\/]*".join(
        js_escape_regex(p) for p in re.split(r"[\s.\-/]+", case_number) if p
    )
    if flex != js_escape_regex(case_number):
        patterns.append(re.compile(flex, re.IGNORECASE))

    m = re.match(r"^([A-Z])\.?(\d{2,4})\.?(\d{1,5})\.?([A-Z])$", case_number, re.IGNORECASE)
    if m:
        letter, year, num, lang = m.groups()
        patterns.append(
            re.compile(rf"{letter}[\s.\-]*{year}[\s.\-]*0*{num}[\s.\-]*{lang}", re.IGNORECASE)
        )
    return tuple(patterns)


@lru_cache(maxsize=4096)
def build_date_patterns(iso_date: str | None) -> tuple[re.Pattern, ...]:
    if not iso_date:
        return ()
    m = re.match(r"^(\d{4})-(\d{2})-(\d{2})$", iso_date)
    if not m:
        return ()
    year, month_str, day_str = m.groups()
    month, day = int(month_str), int(day_str)

    patterns: list[re.Pattern] = []
    day_pat = f"0?{day}" if day < 10 else str(day)
    month_num_pat = f"0?{month}" if month < 10 else str(month)
    month_pat = MONTH_PATTERNS.get(month)

    if month_pat:
        patterns.append(re.compile(rf"{day_pat}(?:er|ère)?\s+{month_pat}\s+{year}", re.IGNORECASE))
    patterns.append(
        re.compile(rf"{day_pat}\s*[\/\-\.]\s*{month_num_pat}\s*[\/\-\.]\s*{year}", re.IGNORECASE)
    )
    short_year = year[2:]
    patterns.append(
        re.compile(rf"{day_pat}\s*[\/\-\.]\s*{month_num_pat}\s*[\/\-\.]\s*{short_year}\b", re.IGNORECASE)
    )
    return tuple(patterns)


@lru_cache(maxsize=4096)
def build_court_pattern(court_name: str | None) -> re.Pattern | None:
    if not court_name:
        return None
    escaped = js_escape_regex(court_name)
    normalized = escaped.replace("\\s\\+", "\\s+")
    normalized = re.sub(r"\s+", r"\\s+", normalized)
    normalized = normalized.replace("\\.", "\\.?")
    return re.compile(normalized, re.IGNORECASE)


@dataclass
class CitationMatch:
    position: int
    matched_text: str
    match_type: str  # ECLI | CASE_NUMBER | COURT_DATE | COURT_ONLY


def find_citation_position(
    full_md: str,
    ecli: str | None,
    case_number: str | None,
    court_name: str | None,
    iso_date: str | None,
) -> CitationMatch | None:
    if ecli:
        pat = build_ecli_pattern(ecli)
        if pat:
            m = pat.search(full_md)
            if m:
                return CitationMatch(m.start(), m.group(0), "ECLI")

    if case_number:
        for pat in build_case_number_patterns(case_number):
            m = pat.search(full_md)
            if m:
                return CitationMatch(m.start(), m.group(0), "CASE_NUMBER")

    if court_name and iso_date:
        court_pat = build_court_pattern(court_name)
        date_pats = build_date_patterns(iso_date)
        if court_pat and date_pats:
            for cm in court_pat.finditer(full_md):
                start = max(0, cm.start() - 100)
                end = min(len(full_md), cm.start() + len(cm.group(0)) + 200)
                window = full_md[start:end]
                if any(dp.search(window) for dp in date_pats):
                    return CitationMatch(cm.start(), cm.group(0), "COURT_DATE")

    if court_name:
        pat = build_court_pattern(court_name)
        if pat:
            m = pat.search(full_md)
            if m:
                return CitationMatch(m.start(), m.group(0), "COURT_ONLY")

    return None


def _find_sentence_start(text: str, position: int) -> int:
    position = min(position, len(text))  # JS charAt beyond end is '' — clamp
    for i in range(position - 1, max(0, position - 300) - 1, -1):
        nxt = text[i + 1] if i + 1 < len(text) else ""
        if text[i] == "." and nxt in (" ", "\n"):
            return i + 2
        if text[i] == "\n" and nxt == "\n":
            return i + 2
    return max(0, position - 300)


def _find_sentence_end(text: str, position: int) -> int:
    for i in range(position, min(len(text), position + 300)):
        nxt = text[i + 1] if i + 1 < len(text) else ""
        at_end = i + 1 >= len(text)
        if text[i] == "." and (nxt in (" ", "\n") or at_end):
            return i + 1
        if text[i] == "\n" and nxt == "\n":
            return i
    return min(len(text), position + 300)


def extract_snippet(full_md: str, position: int, window_size: int = DEFAULT_SNIPPET_SIZE) -> str:
    half = window_size // 2
    start = max(0, position - half)
    end = min(len(full_md), position + half)

    sentence_start = _find_sentence_start(full_md, start + 50)
    sentence_end = _find_sentence_end(full_md, end - 50)
    if sentence_start > start - 100:
        start = sentence_start
    if sentence_end < end + 100:
        end = sentence_end

    snippet = full_md[start:end].strip()
    if start > 0:
        snippet = "..." + snippet
    if end < len(full_md):
        snippet = snippet + "..."
    return snippet


def find_citation_snippet(
    full_md: str | None,
    cited_court_name: str | None,
    cited_date: str | None,
    cited_case_number: str | None,
    cited_ecli: str | None,
) -> dict:
    """Main API: {'snippet','matched_on','position'} (Nones when not found)."""
    if not full_md:
        return {"snippet": None, "matched_on": None, "position": None}
    match = find_citation_position(full_md, cited_ecli, cited_case_number, cited_court_name, cited_date)
    if not match:
        return {"snippet": None, "matched_on": None, "position": None}
    return {
        "snippet": extract_snippet(full_md, match.position),
        "matched_on": match.match_type,
        "position": match.position,
    }
