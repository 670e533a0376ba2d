"""Scalar normalizers and helpers.

Behavioral ports of the reference's deterministic scalar functions
(SURVEY.md §2.8). These shape triple identity, so the Ray pipeline and the
serial oracle both import exactly these implementations.

Reference parity (file:line cites are into /root/reference):
- normalize_string            src/pipeline/mapping/steps.ts:60-62
- normalize_court_name        src/pipeline/mapping/steps.ts:95-98
- map_to_citation_type        src/pipeline/mapping/steps.ts:64-74
- map_to_document_type        src/pipeline/mapping/steps.ts:76-84
- format_date                 src/pipeline/mapping/steps.ts:86-93
- extract_date_from_ecli      src/pipeline/steps.ts:141-150
- sanitize_filename           src/concurrent/ConcurrentProcessor.ts:860-878
- pad3 / pad4 sequence ids    src/pipeline/steps.ts:204-206, src/core/BatchJobGenerator.ts:160-163
- js_escape_regex             src/jobs/map-cited-decisions/citation-finder.ts:41-43
- estimate_tokens             src/core/BatchJobGenerator.ts:392-399
"""

from __future__ import annotations

import datetime as _dt
import re
import zlib

# ---------------------------------------------------------------------------
# string normalizers
# ---------------------------------------------------------------------------

_WS_RE = re.compile(r"\s+")
_CURLY_APOS_RE = re.compile("[‘’]")


def normalize_string(s: str | None) -> str:
    """lowercase + trim; '' for None."""
    return s.lower().strip() if s else ""


def normalize_court_name(name: str | None) -> str:
    """lowercase, trim, collapse whitespace, normalize curly apostrophes."""
    if not name:
        return ""
    out = name.lower().strip()
    out = _WS_RE.sub(" ", out)
    return _CURLY_APOS_RE.sub("'", out)


# ---------------------------------------------------------------------------
# enum maps (bilingual act-type → canonical enums)
# ---------------------------------------------------------------------------


def map_to_citation_type(parent_act_type: str | None) -> str:
    t = (parent_act_type or "").upper()
    if t in ("LOI", "WET"):
        return "LAW"
    if t in ("DECRET", "DECREET"):
        return "DECREE"
    if t in ("ORDONNANCE", "ORDONNANTIE"):
        return "ORDINANCE"
    if t in ("ARRETE_ROYAL", "KONINKLIJK_BESLUIT"):
        return "ROYAL_DECREE"
    if t in ("BESLUIT_VAN_DE_REGERING", "ARRETE_GOUVERNEMENT"):
        return "GOVERNMENT_DECREE"
    if t in ("ARRETE_MINISTERIEL", "MINISTERIEEL_BESLUIT"):
        return "MINISTERIAL_DECREE"
    if "COORDONNE" in t or "GECOORDINEERD" in t:
        return "COORDINATED"
    return "OTHER"


def map_to_document_type(parent_act_type: str | None) -> list[str]:
    t = (parent_act_type or "").upper()
    if t in ("LOI", "WET"):
        return ["LOI"]
    if t in ("DECRET", "DECREET"):
        return ["DECRET"]
    if t in ("ORDONNANCE", "ORDONNANTIE"):
        return ["ORDONNANCE"]
    if t in (
        "ARRETE_ROYAL",
        "KONINKLIJK_BESLUIT",
        "BESLUIT_VAN_DE_REGERING",
        "ARRETE_GOUVERNEMENT",
    ):
        return ["ARRETE"]
    if t in ("GRONDWET", "CONSTITUTION"):
        return ["CONSTITUTION"]
    return ["unknown"]


# ---------------------------------------------------------------------------
# dates
# ---------------------------------------------------------------------------


def format_date(date) -> str:
    """UTC YYYY-MM-DD; '' for falsy/unparseable (mirrors the JS Date path)."""
    if not date:
        return ""
    if isinstance(date, _dt.datetime):
        d = date
    elif isinstance(date, _dt.date):
        return f"{date.year:04d}-{date.month:02d}-{date.day:02d}"
    else:
        s = str(date).strip()
        # ISO date or ISO datetime prefix
        m = re.match(r"^(\d{4})-(\d{2})-(\d{2})", s)
        if m:
            return f"{m.group(1)}-{m.group(2)}-{m.group(3)}"
        try:
            d = _dt.datetime.fromisoformat(s)
        except ValueError:
            return ""
    return f"{d.year:04d}-{d.month:02d}-{d.day:02d}"


def extract_date_from_ecli(ecli: str | None) -> str | None:
    """ECLI 5th segment's 8-digit run → 'YYYY-MM-DD', else None."""
    if not ecli or not ecli.startswith("ECLI:"):
        return None
    parts = ecli.split(":")
    if len(parts) < 5:
        return None
    m = re.search(r"(\d{8})", parts[4])
    if not m:
        return None
    s = m.group(1)
    return f"{s[0:4]}-{s[4:6]}-{s[6:8]}"


# ---------------------------------------------------------------------------
# ids / filenames
# ---------------------------------------------------------------------------


def pad3(n: int) -> str:
    return str(n).rjust(3, "0")


def pad4(n: int) -> str:
    return str(n).rjust(4, "0")


def js_string_hash(s: str) -> int:
    """The classic JS 32-bit string hash ((h<<5)-h+c per char, int32 wrap)."""
    h = 0
    for ch in s:
        h = (h * 31 + ord(ch)) & 0xFFFFFFFF
        if h >= 0x80000000:
            h -= 0x100000000
    return h


_UNSAFE_RE = re.compile(r"[^a-zA-Z0-9._-]+")


def sanitize_filename(name: str) -> str:
    """Replace unsafe chars with '_'; >200 chars → truncate@190 + hex hash suffix."""
    sanitized = _UNSAFE_RE.sub("_", name)
    if len(sanitized) > 200:
        suffix = format(abs(js_string_hash(name)), "x")
        return f"{sanitized[:190]}_{suffix}"
    return sanitized


_JS_REGEX_SPECIAL = re.compile(r"[.*+?^${}()|\[\]\\]")


def js_escape_regex(s: str) -> str:
    """JS-style regex escape (only the chars the reference escapes)."""
    return _JS_REGEX_SPECIAL.sub(lambda m: "\\" + m.group(0), s)


# ---------------------------------------------------------------------------
# misc
# ---------------------------------------------------------------------------


def estimate_tokens(text: str) -> int:
    """chars/4 cost estimate (ceil)."""
    return (len(text) + 3) // 4


def length_category(md_length: int | None) -> str:
    """Bucket thresholds from extract-comprehensive/config.ts:110-124."""
    if not md_length:
        return "unknown"
    if md_length < 10_000:
        return "short"
    if md_length < 30_000:
        return "medium"
    if md_length < 60_000:
        return "long"
    return "very_long"


def stable_hash32(s: str) -> int:
    """Deterministic unsigned 32-bit hash (crc32) for salting/partitioning.

    NOT Python's salted builtin hash — stable across processes and runs.
    """
    return zlib.crc32(s.encode("utf-8")) & 0xFFFFFFFF


def trigram_set(s: str) -> set[str]:
    """Character trigrams of the normalized string (pg_trgm-style padding)."""
    s = " " + normalize_string(s) + " "
    if len(s) < 3:
        return set()
    return {s[i : i + 3] for i in range(len(s) - 2)}


def trigram_similarity(a: str, b: str) -> float:
    """Jaccard similarity of padded char trigrams — cheap stand-in for
    PostgreSQL similarity() used by candidate generation (mapping/steps.ts:336)."""
    ta, tb = trigram_set(a), trigram_set(b)
    if not ta or not tb:
        return 0.0
    inter = len(ta & tb)
    union = len(ta | tb)
    return inter / union if union else 0.0
