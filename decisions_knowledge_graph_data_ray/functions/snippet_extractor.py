"""Provision snippet extractor.

Behavioral port of /root/reference/src/utils/provisionSnippetExtractor.ts:44-104:
three regex families (article+source with <=160-char lookahead to a legal
source keyword; treaty refs; EU instruments), ±200-char context windows,
whitespace normalization, dedupe-by-snippet-text keep-first.

The character classes are copied verbatim — including the reference's
``/-°`` range inside pattern 1 — so match behavior is identical.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

PATTERN_ARTICLE_WITH_SOURCE = re.compile(
    r"(?:(art\.?|artikel|articles?|artikelen?|article)\s*[0-9][0-9a-zA-Z./-°]*"
    r"(?:\s*(?:§+|§|par(?:a|.)?graphe?|lid|alin[eé]a)\s*\d+)?"
    r"(?:\s*,?\s*(?:§+|§|par(?:a|.)?graphe?|lid|alin[eé]a)\s*\d+)?"
    r"(?:\s*(?:,|\bet\b|\ben\b)\s*[0-9][0-9a-zA-Z./-°]*"
    r"(?:\s*(?:§+|§|par(?:a|.)?graphe?|lid|alin[eé]a)\s*\d+)?)*"
    r"[^.\n]{0,160}?"
    r"(Code|Wet|Loi|Grondwet|Constitution|C\.C\.|C\.P\.|C\.I\.C\.|C\.J\.|C\.Com\.|"
    r"C\.\s*Const\.|B\.W\.|Sw\.|W\.?\s*Sv\.|Ger\.?\s*W\.|Gw\.|VenW\.|AR|A\.R\.|K\.B\.|KB|"
    r"Koninklijk\s+besluit|Arr[êe]t|Arrêt[ée]?|Verordening|R[eè]glement|Regulation|"
    r"Richtlijn|Directive|CEDH|EVRM|TFUE|TFEU|TUE|VWEU|WIB|Btw-Wetboek|"
    r"loi\s+du\s+\d{1,2}\s+\w+\s+\d{4}|wet\s+van\s+\d{1,2}\s+\w+\s+\d{4}|loi\s+spéciale))",
    re.IGNORECASE | re.MULTILINE,
)

PATTERN_TREATY = re.compile(
    r"(?:(art\.?|artikel|articles?|artikelen?|article)\s*[0-9][0-9a-zA-Z()./-]*"
    r"(?:\s*,?\s*§\s*\d+)?\s*(CEDH|EVRM|TFUE|TFEU|TUE|VWEU))",
    re.IGNORECASE | re.MULTILINE,
)

PATTERN_EU_INSTRUMENT = re.compile(
    r"((Verordening|R[eè]glement|Regulation)[^.\n]{0,40}?(?:\((?:EU|UE|EG|CE)\))?"
    r"[^.\n]{0,15}?(?:nr\.?|n°)?\s*\d{2,4}/\d{2,4}"
    r"|(Richtlijn|Directive)\s+\d{2,4}/\d{2,4}/[A-Z]{2,5})",
    re.IGNORECASE | re.MULTILINE,
)

_WS = re.compile(r"\s+")


@dataclass
class Snippet:
    snippet: str
    char_start: int
    char_end: int


def extract_candidate_snippets(full_text: str, context_window: int = 200) -> list[Snippet]:
    """All unique provision-context snippets in pattern order, keep-first dedupe."""
    snippets: list[Snippet] = []
    for rgx in (PATTERN_ARTICLE_WITH_SOURCE, PATTERN_TREATY, PATTERN_EU_INSTRUMENT):
        for m in rgx.finditer(full_text):
            start, end = m.start(), m.end()
            left = max(0, start - context_window)
            right = min(len(full_text), end + context_window)
            snippet = _WS.sub(" ", full_text[left:right].strip())
            if snippet:
                snippets.append(Snippet(snippet, start, end))

    seen: set[str] = set()
    unique: list[Snippet] = []
    for s in snippets:
        if s.snippet not in seen:
            seen.add(s.snippet)
            unique.append(s)
    return unique
