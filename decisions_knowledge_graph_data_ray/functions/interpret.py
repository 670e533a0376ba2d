"""Provision interpretation extraction — deterministic analogue of the
reference's interpret-provisions job (Agent 2C).

Output protocol (interpret-provisions/config.ts:360-435): per provision only
a MATCHING KEY (`provision_seq`) plus two nullable enrichment fields —
``provision_interpretation`` (100-1000 chars) and
``relevant_factual_context`` (50-500 chars) — joined back to the provision
record by sequence, never by echoing complex ids (the reference's
ID-corruption-avoidance design).

Detection rules (interpret-provisions/prompt.ts:60-130), rebuilt as
deterministic sentence classification:
- interpretation IS: meaning/scope/test/elements statements — "l'article X
  signifie que", "il résulte de l'article X que", "cette disposition
  impose/requiert/vise", "s'applique lorsque", "la cour estime que
  l'article X", NL "artikel X betekent dat", "uit artikel X volgt dat",
  "deze bepaling vereist", "is van toepassing wanneer", "het hof oordeelt
  dat artikel X";
- NOT interpretation (→ null): formal citation ("vu l'article", "gelet op
  artikel"), party arguments ("soutient que", "stelt dat"), verbatim
  quotation ("selon l'article X:"), and anything shorter than the schema's
  100-char minimum ("too brief to extract meaningful interpretation",
  prompt.ts:245);
- factual context: an "en l'espèce"/"in casu" sentence mentioning the
  provision, 50-500 chars.
"""

from __future__ import annotations

import re

_SENT_SPLIT_RE = re.compile(r"(?<=[.!?;])\s+")

# court-interpretation markers; {art} is the provision's article token
_INTERP_MARKERS = [
    r"signifie que",
    r"il résulte de l'article {art}",
    r"cette disposition (?:impose|requiert|vise)",
    r"l'article {art} (?:impose|requiert|exige)",
    r"s'applique lorsque",
    r"la cour estime que l'article {art}",
    r"les conditions de l'article {art}",
    r"betekent dat",
    r"uit artikel {art} volgt dat",
    r"deze bepaling (?:vereist|legt op|beoogt)",
    r"artikel {art} (?:vereist|legt op)",
    r"is van toepassing wanneer",
    r"het hof oordeelt dat artikel {art}",
]
# sentence-level disqualifiers (formal citation / party argument / quotation)
_NEGATIVE_RES = [
    re.compile(r"\bvu l'article\b", re.IGNORECASE),
    re.compile(r"\bgelet op artikel\b", re.IGNORECASE),
    re.compile(r"\b(?:soutient|soutiennent) que\b", re.IGNORECASE),
    re.compile(r"\b(?:stelt|stellen) dat\b", re.IGNORECASE),
    re.compile(r"\bselon l'article [^:]{0,20}:", re.IGNORECASE),
]
_FACT_RES = [
    re.compile(r"\ben l'espèce\b", re.IGNORECASE),
    re.compile(r"\bin casu\b", re.IGNORECASE),
]

_MIN_INTERP, _MAX_INTERP = 100, 1000
_MIN_FACT, _MAX_FACT = 50, 500


def _article_tokens(provision_number: str) -> list[str]:
    num = re.escape((provision_number or "").strip().lower())
    return [f"article {num}", f"artikel {num}", f"art\\. {num}"] if num else []


def split_sentences(text: str) -> list[str]:
    return [s.strip() for s in _SENT_SPLIT_RE.split(text) if s.strip()]


def _mentions_provision(sentence_lower: str, tokens: list[str]) -> bool:
    return any(re.search(t + r"(?!\d)", sentence_lower) for t in tokens)


def interpret_provision(sentences: list[str], provision_number: str) -> dict:
    """Classify one provision's sentences → the two nullable 2C fields."""
    tokens = _article_tokens(provision_number)
    interp = None
    fact = None
    for s in sentences:
        sl = s.lower()
        if not _mentions_provision(sl, tokens):
            continue
        if any(neg.search(s) for neg in _NEGATIVE_RES):
            continue
        if interp is None:
            for marker in _INTERP_MARKERS:
                pat = marker.replace("{art}", re.escape(provision_number.strip().lower()))
                if re.search(pat, sl):
                    if len(s) >= _MIN_INTERP:  # too-brief → null (prompt.ts:245)
                        interp = s[:_MAX_INTERP]
                    break
        if fact is None and any(fr.search(s) for fr in _FACT_RES):
            if len(s) >= _MIN_FACT:
                fact = s[:_MAX_FACT]
        if interp is not None and fact is not None:
            break
    return {"provision_interpretation": interp, "relevant_factual_context": fact}


def interpret_provisions(text: str, provisions: list[dict]) -> list[dict]:
    """All provisions of one document → 2C rows keyed by provision_seq."""
    sentences = split_sentences(text)
    out = []
    for p in provisions:
        rec = interpret_provision(sentences, p.get("provision_number", ""))
        out.append({"provision_seq": p["provision_seq"], **rec})
    return out
