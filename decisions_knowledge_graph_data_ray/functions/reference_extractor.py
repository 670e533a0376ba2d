"""Legal reference extractor (CELEX / NUMAC / Belgian file numbers / URLs).

Behavioral port of the reference's production regex extractor
(/root/reference/src/utils/referenceExtractorN8N.ts):
  - text normalization: URL de-spacing + broken-word collapse   (:77-87)
  - CELEX bare + prefixed patterns, format validation           (:59-60, :94-118)
  - NUMAC bare/prefixed/ELI/etaamb patterns, calendar-aware
    validation (year 1789..current, month letter 0-9A-E)        (:61-64, :127-153)
  - Belgian file numbers YYYY-MM-DD-XX with calendar validation (:65, :160-202)
  - EU / BE URL extraction with content gating                  (:67-69, :282-320)
  - output: deduplicated sorted lists                           (:367-384)

Deviation: the reference uses wall-clock current year for the year-range
upper bound; we pin ``REFERENCE_YEAR`` for determinism.
"""

from __future__ import annotations

import re

REFERENCE_YEAR = 2026

CELEX_RE = re.compile(r"\b([1-9CE0][12][90][0-9]{2}[A-Z][0-9A-Z()_-]+)\b", re.IGNORECASE)
CELEX_PREFIX_RE = re.compile(r"CELEX\s*[:\s]\s*([0-9CE][0-9A-Z()_-]+)", re.IGNORECASE)
NUMAC_RE = re.compile(r"\b([12][7890][0-9]{2}[0-9ABCDE][0-9]{5})\b")
NUMAC_PREFIX_RE = re.compile(r"numac[_\s]*[=:\s]\s*([0-9A-E]{10})", re.IGNORECASE)
ELI_RE = re.compile(r"/eli/[^/]+/[^/]+/[^/]+/([0-9]{10})", re.IGNORECASE)
ETAAMB_RE = re.compile(r"etaamb\.openjustice\.be/[^_]+_n([0-9]{10})", re.IGNORECASE)
FILE_NUMBER_RE = re.compile(r"\b([12][7890][0-9]{2}[-/\s]?[01][0-9][-/\s]?[0123][0-9][-/\s]?[0-9]{2})\b")
EJUSTICE_RE = re.compile(r"ejustice\.just\.fgov\.be[^\s]*[?&]cn[_\s]*search=([0-9]{10})", re.IGNORECASE)
URL_EU_RE = re.compile(r"https?://[^\s<>\"{}|\\^`\[\]]*europa\.eu[^\s<>\"{}|\\^`\[\]]*", re.IGNORECASE)
URL_BE_EJUSTICE_RE = re.compile(r"https?://[^\s<>\"{}|\\^`\[\]]*ejustice\.just\.fgov\.be[^\s<>\"{}|\\^`\[\]]*", re.IGNORECASE)
URL_BE_ETAAMB_RE = re.compile(r"https?://[^\s<>\"{}|\\^`\[\]]*etaamb\.openjustice\.be[^\s<>\"{}|\\^`\[\]]*", re.IGNORECASE)

_URL_DESPACE_RE = re.compile(r"(https?://[\S\s]+?)(?=\s+https?://|\s{2,}|\Z)")
_BROKEN_WORD_RE = re.compile(r"(\w)\s+(\w)(?=\S{0,2}\s+\w|\S{0,2}[^\w\s])", re.ASCII)
_WS = re.compile(r"\s+")

_DAYS_IN_MONTH = {1: 31, 2: 29, 3: 31, 4: 30, 5: 31, 6: 30, 7: 31, 8: 31, 9: 30, 10: 31, 11: 30, 12: 31}


def normalize_text(text: str) -> str:
    """URL de-spacing + broken-word collapse (referenceExtractorN8N.ts:77-87)."""
    if not text:
        return ""
    text = _URL_DESPACE_RE.sub(lambda m: _WS.sub("", m.group(0)), text)
    text = _BROKEN_WORD_RE.sub(r"\1\2", text)
    return text


def validate_celex(candidate: str) -> bool:
    if not candidate or len(candidate) < 7:
        return False
    u = candidate.upper()
    return (
        u[0] in "1234567890CE"
        and u[1] in "12"
        and u[2] in "90"
        and u[3].isdigit()
        and u[4].isdigit()
        and u[5].isalpha()
        and u[5].isascii()
        and u[5].isupper()
    )


def validate_numac(candidate: str) -> bool:
    if not candidate:
        return False
    c = re.sub(r"[^0-9A-E]", "", candidate.upper())
    if len(c) != 10:
        return False
    if c[0] not in "12" or c[1] not in "7890":
        return False
    if not (c[2].isdigit() and c[3].isdigit()):
        return False
    if c[4] not in "0123456789ABCDE":
        return False
    if not re.fullmatch(r"[0-9]{5}", c[5:]):
        return False
    year = int(c[:4])
    return 1789 <= year <= REFERENCE_YEAR


def validate_file_number(candidate: str) -> bool:
    if not candidate:
        return False
    c = re.sub(r"[-/\s]", "", candidate)
    if len(c) != 10 or not c.isdigit():
        return False
    if c[0] not in "12" or c[1] not in "7890":
        return False
    if c[4] not in "01" or c[6] not in "0123":
        return False
    year, month, day = int(c[:4]), int(c[4:6]), int(c[6:8])
    if not (1789 <= year <= REFERENCE_YEAR):
        return False
    if not (1 <= month <= 12) or not (1 <= day <= 31):
        return False
    return day <= _DAYS_IN_MONTH[month]


def extract_reference_candidates(text: str) -> tuple[list[str], list[str], list[str]]:
    """(celex, numac, file_number) candidate lists (insertion-ordered, deduped)."""
    norm = normalize_text(text)
    celex: dict[str, None] = {}
    numac: dict[str, None] = {}
    file_num: dict[str, None] = {}

    for m in CELEX_RE.finditer(norm):
        celex.setdefault(m.group(1).upper())
    for m in CELEX_PREFIX_RE.finditer(norm):
        celex.setdefault(m.group(1).upper())
    for m in NUMAC_RE.finditer(norm):
        numac.setdefault(m.group(1))
    for m in NUMAC_PREFIX_RE.finditer(norm):
        numac.setdefault(m.group(1).upper())
    for m in ELI_RE.finditer(norm):
        numac.setdefault(m.group(1))
    for m in ETAAMB_RE.finditer(norm):
        numac.setdefault(m.group(1))
    for m in FILE_NUMBER_RE.finditer(norm):
        c = re.sub(r"[-/\s]", "", m.group(1))
        if len(c) == 10 and c.isdigit():
            file_num.setdefault(c)
    for m in EJUSTICE_RE.finditer(norm):
        file_num.setdefault(m.group(1))

    return list(celex), list(numac), list(file_num)


def extract_urls(text: str) -> tuple[list[str], list[str]]:
    """(eu_urls, be_urls) with content gating (referenceExtractorN8N.ts:282-320)."""
    norm = normalize_text(text)
    eu: dict[str, None] = {}
    be: dict[str, None] = {}

    for m in URL_EU_RE.finditer(norm):
        url = m.group(0)
        if re.search(r"CELEX", url, re.IGNORECASE) or any(validate_celex(p) for p in url.split("/")):
            eu.setdefault(url)
    for m in URL_BE_EJUSTICE_RE.finditer(norm):
        url = m.group(0)
        parts = re.split(r"[/?&=]", url)
        if any(len(p) == 10 and (p.isdigit() or validate_numac(p)) for p in parts):
            be.setdefault(url)
    for m in URL_BE_ETAAMB_RE.finditer(norm):
        url = m.group(0)
        if "_n" in url:
            be.setdefault(url)

    return list(eu), list(be)


def extract_references(text: str) -> dict:
    """Full extraction result: validated + sorted, same shape as the reference."""
    celex_c, numac_c, file_c = extract_reference_candidates(text)
    eu_urls, be_urls = extract_urls(text)

    eu_verified = [c for c in celex_c if validate_celex(c)]
    eu_extracted = [c for c in celex_c if not validate_celex(c)]
    be_numac = [c for c in numac_c if validate_numac(c)]
    be_file = [c for c in file_c if validate_file_number(c)]
    be_extracted = [c for c in numac_c if not validate_numac(c)] + [
        c for c in file_c if not validate_file_number(c)
    ]

    return {
        "url_eu": sorted(set(eu_urls)),
        "url_be": sorted(set(be_urls)),
        "eu_extracted": sorted(set(eu_extracted)),
        "eu_verified": sorted(set(eu_verified)),
        "be_extracted": sorted(set(be_extracted)),
        "be_verified_numac": sorted(set(be_numac)),
        "be_verified_file_number": sorted(set(be_file)),
    }
