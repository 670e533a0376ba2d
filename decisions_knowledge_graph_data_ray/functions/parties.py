"""Party extraction (PARTY- ids) and outcome classification.

Rebuilds the reference's comprehensive-extraction party block and outcome
enum (/root/reference/src/jobs/extract-comprehensive/config.ts:204-283 for
parties, :393-455 for the bilingual outcome enum) as deterministic rules:

  - PARTY-{conv_id}-{seq:03d} ids, party type + procedural role from the
    reference's closed enums
  - outcome: one label from the reference's full bilingual closed set,
    classified from the dispositif phrase bank; the LAST outcome phrase in
    document order wins (the dispositif ends a decision)

``VALID_OUTCOMES`` is the closed code set used by the
validate-with-retry classification stage (stages/classify.py), the
analogue of classify-legal-issues' ULIT code validation
(/root/reference/src/jobs/classify-legal-issues/validation.ts:19-103).
"""

from __future__ import annotations

import re

from .normalize import pad3

PARTY_TYPES = (
    "NATURAL_PERSON", "LEGAL_ENTITY", "PUBLIC_AUTHORITY",
    "DE_FACTO_ASSOCIATION", "OTHER", "UNCLEAR",
)

# procedural-role surface form → reference enum value
# (config.ts:237-276; FR + NL, cassation-specific variants first)
_ROLE_MAP = [
    ("demanderesse en cassation", "DEMANDEUR_EN_CASSATION"),
    ("demandeur en cassation", "DEMANDEUR_EN_CASSATION"),
    ("défenderesse en cassation", "DEFENDEUR_EN_CASSATION"),
    ("défendeur en cassation", "DEFENDEUR_EN_CASSATION"),
    ("demanderesse", "DEMANDEUR"),
    ("demandeur", "DEMANDEUR"),
    ("défenderesse", "DEFENDEUR"),
    ("défendeur", "DEFENDEUR"),
    ("partie civile", "PARTIE_CIVILE"),
    ("prévenu", "PREVENU"),
    ("appelante", "APPELANT"),
    ("appelant", "APPELANT"),
    ("intimée", "INTIME"),
    ("intimé", "INTIME"),
    ("ministère public", "MINISTERE_PUBLIC"),
    ("eiseres tot cassatie", "EISER_IN_CASSATIE"),
    ("eiser tot cassatie", "EISER_IN_CASSATIE"),
    ("verweerster in cassatie", "VERWEERDER_IN_CASSATIE"),
    ("verweerder in cassatie", "VERWEERDER_IN_CASSATIE"),
    ("eiseres", "EISER"),
    ("eiser", "EISER"),
    ("verweerster", "VERWEERDER"),
    ("verweerder", "VERWEERDER"),
    ("appellante", "APPELLANT"),
    ("appellant", "APPELLANT"),
    ("geïntimeerde", "GEÏNTIMEERDE"),
    ("burgerlijke partij", "BURGERLIJKE_PARTIJ"),
    ("beklaagde", "BEKLAAGDE"),
    ("openbaar ministerie", "OPENBAAR_MINISTERIE"),
]
_ROLE_ALTERNATION = "|".join(re.escape(s) for s, _ in _ROLE_MAP)

_PARTY_BLOCK_RES = [
    re.compile(
        rf"En cause\s*:\s*(?P<p1>[^,]+),\s*(?P<r1>{_ROLE_ALTERNATION})\s*,\s*"
        rf"contre\s*(?P<p2>[^,]+),\s*(?P<r2>{_ROLE_ALTERNATION})",
        re.IGNORECASE,
    ),
    re.compile(
        rf"In zake\s*:\s*(?P<p1>[^,]+),\s*(?P<r1>{_ROLE_ALTERNATION})\s*,\s*"
        rf"tegen\s*(?P<p2>[^,]+),\s*(?P<r2>{_ROLE_ALTERNATION})",
        re.IGNORECASE,
    ),
]

_LEGAL_ENTITY_RE = re.compile(
    r"^(la |de |het )?(s\.?a\.?|n\.?v\.?|s\.?p\.?r\.?l\.?|b\.?v\.?b\.?a\.?|b\.?v\.?|asbl|vzw)\b",
    re.IGNORECASE,
)
_PUBLIC_AUTHORITY_RE = re.compile(
    r"(état belge|belgische staat|la ville de|de stad|la commune|de gemeente|la région|het gewest)",
    re.IGNORECASE,
)
_DE_FACTO_RE = re.compile(r"association de fait|feitelijke vereniging", re.IGNORECASE)


def classify_party_type(name: str) -> str:
    n = name.strip()
    if _DE_FACTO_RE.search(n):
        return "DE_FACTO_ASSOCIATION"
    if _PUBLIC_AUTHORITY_RE.search(n):
        return "PUBLIC_AUTHORITY"
    if _LEGAL_ENTITY_RE.search(n):
        return "LEGAL_ENTITY"
    if re.match(r"^(m\.|mme|dhr\.|mevr\.|[A-Z]\.\s)", n):
        return "NATURAL_PERSON"
    return "NATURAL_PERSON" if len(n.split()) <= 3 else "UNCLEAR"


def _role_enum(surface: str) -> str:
    low = surface.lower()
    for s, enum in _ROLE_MAP:
        if s == low:
            return enum
    return "AUTRE"


def extract_parties(text: str, conv_id: str) -> list[dict]:
    """All parties of one assembled document, in mention order, with
    deterministic PARTY-{conv_id}-{seq:03d} ids (config.ts:214-218)."""
    parties: list[dict] = []
    seen: set[str] = set()
    hits = []
    for rx in _PARTY_BLOCK_RES:
        hits.extend(rx.finditer(text))
    hits.sort(key=lambda m: m.start())
    for m in hits:
        for pg, rg in (("p1", "r1"), ("p2", "r2")):
            name = re.sub(r"\s+", " ", m.group(pg)).strip()
            if not name or name.lower() in seen:
                continue
            seen.add(name.lower())
            seq = len(parties) + 1
            parties.append(
                {
                    "party_seq": seq,
                    "internal_party_id": f"PARTY-{conv_id}-{pad3(seq)}",
                    "name": name,
                    "party_type": classify_party_type(name),
                    "procedural_role": _role_enum(m.group(rg)),
                }
            )
    return parties


# full bilingual outcome enum, verbatim from config.ts:393-455
VALID_OUTCOMES = frozenset(
    [
        "FONDE", "NON_FONDE", "RECEVABILITE", "IRRECEVABILITE", "REJET",
        "CONDAMNATION", "ACQUITTEMENT",
        "CONFIRMATION", "CONFIRMATION_PARTIELLE", "REFORMATION",
        "ANNULATION", "ANNULATION_PARTIELLE",
        "CASSATION", "CASSATION_PARTIELLE", "RENVOI",
        "DECHEANCE", "DESSAISISSEMENT", "DESISTEMENT", "RETRAIT", "SUSPENSION",
        "RADIATION", "NON_LIEU_A_STATUER", "REVOCATION", "AUTRE",
        "GEGROND", "ONGEGROND", "ONTVANKELIJKHEID", "NIET_ONTVANKELIJKHEID",
        "AFWIJZING", "VEROORDELING", "VRIJSPRAAK",
        "BEVESTIGING", "GEDEELTELIJKE_BEVESTIGING", "HERVORMING",
        "VERNIETIGING", "GEDEELTELIJKE_VERNIETIGING",
        "CASSATIE", "GEDEELTELIJKE_CASSATIE", "VERWIJZING",
        "VERVAL", "ONTZEGGING_VAN_RECHTSMACHT", "AFSTAND", "INTREKKING",
        "SCHORSING", "DOORHALING", "GEEN_AANLEIDING_TOT_UITSPRAAK",
        "HERROEPING", "ANDERE",
    ]
)

# dispositif phrase → outcome label; longest-phrase-first within a match
_OUTCOME_PHRASES = [
    ("casse partiellement", "CASSATION_PARTIELLE"),
    ("rejette le pourvoi", "REJET"),
    ("casse l'arrêt", "CASSATION"),
    ("renvoie la cause", "RENVOI"),
    ("confirme le jugement", "CONFIRMATION"),
    ("déclare le moyen non fondé", "NON_FONDE"),
    ("déclare le moyen fondé", "FONDE"),
    ("déclare la demande irrecevable", "IRRECEVABILITE"),
    ("condamne", "CONDAMNATION"),
    ("verklaart het middel ongegrond", "ONGEGROND"),
    ("verklaart het middel gegrond", "GEGROND"),
    ("vernietigt het bestreden arrest", "VERNIETIGING"),
    ("wijst de vordering af", "AFWIJZING"),
    ("verwijst de zaak", "VERWIJZING"),
    ("bevestigt het vonnis", "BEVESTIGING"),
]

_NL_DOC_RE = re.compile(r"\b(het|wordt|zaak|arrest)\b", re.IGNORECASE)


def classify_outcome(text: str) -> str:
    """Outcome label for one document: the LAST dispositif phrase in
    document order wins; no phrase → AUTRE/ANDERE by dominant language."""
    low = text.lower()
    best_pos, best_label = -1, None
    for phrase, label in _OUTCOME_PHRASES:
        pos = low.rfind(phrase)
        if pos > best_pos:
            best_pos, best_label = pos, label
    if best_label is not None:
        return best_label
    return "ANDERE" if _NL_DOC_RE.search(text) else "AUTRE"


def validate_outcome(outcome: str) -> list[str]:
    """Closed-set validation (validation.ts:19-103 analogue): [] if valid,
    else error strings suitable as retry feedback."""
    if outcome in VALID_OUTCOMES:
        return []
    hint = "; ".join(sorted(VALID_OUTCOMES)[:5])
    return [f"Invalid outcome: {outcome!r} is not in the closed outcome set (e.g. {hint}, …)"]
