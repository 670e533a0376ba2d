"""Comprehensive-extraction currentInstance block: facts / requests /
arguments / courtOrder / outcome.

Deterministic analogue of the reference's comprehensive job
(/root/reference/src/jobs/extract-comprehensive/config.ts:285-455:
``currentInstance`` requires facts, requests, arguments, courtOrder,
outcome). The reference's LLM synthesizes these; our rule-based extractor
derives them from stable cues, and a real LLM slots into the same
injectable-extractor stage:

  - facts: the factual narrative — first user-turn text(s) (the reference
    allows synthesis; we take the opening narrative verbatim)
  - requests: sentences carrying request cues (demande / vordering /
    verzoek / pourvoi / cassatieberoep)
  - arguments: sentences carrying plea cues (le moyen / het middel /
    soutient / voert aan / fait valoir / betoogt)
  - court_order: the dispositif sentence — the line containing the LAST
    outcome phrase (verbatim, matching the courtOrder minLength-verbatim
    requirement)
  - outcome: functions/parties.classify_outcome (closed enum)
"""

from __future__ import annotations

import re

from .parties import _OUTCOME_PHRASES, classify_outcome

_REQUEST_CUES = re.compile(
    r"demande|sollicite|pourvoi|vordering|verzoek|cassatieberoep", re.IGNORECASE
)
_ARGUMENT_CUES = re.compile(
    r"le moyen|het middel|soutient|fait valoir|voert aan|betoogt", re.IGNORECASE
)


def _turn_lines(text: str) -> list[tuple[str, str]]:
    out = []
    for line in text.split("\n"):
        role, _, content = line.partition(": ")
        out.append((role, content or line))
    return out


def extract_facts(text: str, max_chars: int = 2000) -> str:
    """Opening factual narrative: the first user turns, concatenated."""
    facts = [c for role, c in _turn_lines(text) if role == "user"]
    return " ".join(facts)[:max_chars]


def extract_requests(text: str, cap: int = 10) -> list[str]:
    out = []
    for _, content in _turn_lines(text):
        if _REQUEST_CUES.search(content) and content not in out:
            out.append(content)
        if len(out) >= cap:
            break
    return out


def extract_arguments(text: str, cap: int = 10) -> list[str]:
    out = []
    for _, content in _turn_lines(text):
        if _ARGUMENT_CUES.search(content) and content not in out:
            out.append(content)
        if len(out) >= cap:
            break
    return out


def extract_court_order(text: str) -> str:
    """The dispositif: the line containing the LAST outcome phrase
    (verbatim — no synthesis, config.ts courtOrder contract)."""
    low = text.lower()
    best_pos = -1
    for phrase, _ in _OUTCOME_PHRASES:
        pos = low.rfind(phrase)
        if pos > best_pos:
            best_pos = pos
    if best_pos < 0:
        return ""
    # sentence containing the phrase (". " boundaries within the line)
    sent_start = max(
        text.rfind("\n", 0, best_pos) + 1, text.rfind(". ", 0, best_pos) + 2
    )
    sent_end = text.find(".", best_pos)
    sentence = text[sent_start : sent_end + 1 if sent_end != -1 else len(text)]
    return (sentence.partition(": ")[2] or sentence).strip()


def extract_current_instance(doc: dict) -> dict:
    """One currentInstance record per assembled document."""
    text = doc["text"]
    return {
        "conv_id": doc["conv_id"],
        "facts": extract_facts(text),
        "requests": extract_requests(text),
        "arguments": extract_arguments(text),
        "court_order": extract_court_order(text),
        "outcome": classify_outcome(text),
    }
