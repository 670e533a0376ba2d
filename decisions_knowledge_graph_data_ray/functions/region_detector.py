"""Citation-region detector (deterministic stage-1 of cited-decision extraction).

Behavioral port of the reference's regex region detector
(/root/reference/src/jobs/extract-cited-decisions/regex-extractor.ts):
  - 5 trigger families: ECLI (with exact self-reference filter), 60+ court
    patterns with jurisdictions, FR/NL/numeric dates, case numbers (with
    paragraph-reference exclusion), bibliographic references  (:236-408)
  - single-linkage clustering of triggers at <=500 chars           (:425-475)
  - 1200-char windows centered on each cluster                     (:481-497)
  - confidence HIGH (ECLI) / MEDIUM (court+date) / LOW             (:505-511)
  - primary trigger type priority ECLI>COURT>BIBLIO>DATE           (:517-524)
  - jurisdiction hint from ECLI country code, else court patterns  (:174-226)

All regexes are compiled once at module import (per Ray worker process), so
the per-batch path is pure matching.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

CLUSTER_DISTANCE = 500
WINDOW_SIZE = 1200

# --------------------------------------------------------------------------
# court token patterns (regex-extractor.ts:57-151)
# --------------------------------------------------------------------------

_APOS = "['’]"

COURT_TOKENS: dict[str, dict] = {
    "CASS": {"jurisdiction": "BE", "patterns": [r"Cass\.?", r"Cassatie", r"Hof\s+van\s+Cassatie", r"Cour\s+de\s+cassation", r"Arr\.\s*Cass\.?"]},
    "GHCC": {"jurisdiction": "BE", "patterns": [r"GwH", r"Grondwettelijk\s+Hof", r"Het\s+Grondwettelijk\s+Hof", r"C\.\s*Const\.?", r"Cour\s+constitutionnelle", r"Const\.?", r"A\.C\.C\.?"]},
    "RVSCE": {"jurisdiction": "BE", "patterns": [r"C\.\s*E\.?", r"RvS", r"Conseil\s+d" + _APOS + r"État", r"Raad\s+van\s+State", r"C\.\s*Etat"]},
    "ARBH": {"jurisdiction": "BE", "patterns": [r"Arbh\.?", r"Arbeidshof", r"C\.\s*trav\.?", r"Cour\s+du\s+travail"]},
    "ARBRB": {"jurisdiction": "BE", "patterns": [r"Arbrb\.?", r"Arbeidsrechtbank", r"Trib\.\s*trav\.?", r"Tribunal\s+du\s+travail"]},
    "COMM": {"jurisdiction": "BE", "patterns": [r"Comm\.?", r"Kh\.?", r"Trib\.\s*entr\.?", r"Tribunal\s+de\s+l" + _APOS + r"entreprise", r"Ondernemingsrechtbank", r"Tribunal\s+de\s+commerce"]},
    "TPI": {"jurisdiction": "BE", "patterns": [r"TPI", r"Trib\.?", r"Rb\.?", r"Rechtbank\s+van\s+Eerste\s+Aanleg", r"Tribunal\s+de\s+première\s+instance"]},
    "APPEL": {"jurisdiction": "BE", "patterns": [r"C\.\s*appel", r"Cour\s+d" + _APOS + r"appel", r"Hof\s+van\s+Beroep"]},
    "ASSISES": {"jurisdiction": "BE", "patterns": [r"Cour\s+ass\.?", r"Cour\s+d" + _APOS + r"assises", r"Hof\s+van\s+Assisen", r"Ass\.?", r"Assis\.?"]},
    "POLICE": {"jurisdiction": "BE", "patterns": [r"Pol\.?", r"Tribunal\s+de\s+police", r"Politierechtbank"]},
    "PAIX": {"jurisdiction": "BE", "patterns": [r"JP", r"J\.P\.?", r"Justice\s+de\s+paix", r"Vredegerecht", r"Vred\.?"]},
    "KI": {"jurisdiction": "BE", "patterns": [r"KI", r"mis\.\s*acc\.?", r"Chambre\s+des\s+mises\s+en\s+accusation", r"Kamer\s+van\s+inbeschuldigingstelling"]},
    "CONSEIL": {"jurisdiction": "BE", "patterns": [r"ch\.\s*cons\.?", r"Chambre\s+du\s+conseil", r"Raadkamer"]},
    "CORR": {"jurisdiction": "BE", "patterns": [r"Trib\.\s*corr\.?", r"Corr\.\s*rb\.?", r"Tribunal\s+correctionnel", r"Correctionele\s+rechtbank"]},
    "CJUE": {"jurisdiction": "EU", "patterns": [r"CJUE", r"HvJ", r"Cour\s+de\s+justice", r"Hof\s+van\s+Justitie", r"C\.J\.U\.E\.?", r"Court\s+of\s+Justice", r"ECJ"]},
    "TUE": {"jurisdiction": "EU", "patterns": [r"TUE", r"Tribunal\s+de\s+l" + _APOS + r"UE", r"Gerecht\s+van\s+de\s+EU", r"General\s+Court"]},
    "TFUE": {"jurisdiction": "EU", "patterns": [r"TFUE", r"Tribunal\s+de\s+la\s+fonction\s+publique", r"Gerecht\s+voor\s+ambtenarenzaken"]},
    "CEDH": {"jurisdiction": "INT", "patterns": [r"CEDH", r"EHRM", r"Cour\s+européenne\s+des\s+droits\s+de\s+l" + _APOS + r"homme", r"Europees\s+Hof\s+voor\s+de\s+Rechten\s+van\s+de\s+Mens", r"European\s+Court\s+of\s+Human\s+Rights", r"ECtHR"]},
    "CIJ": {"jurisdiction": "INT", "patterns": [r"CIJ", r"ICJ", r"Cour\s+internationale\s+de\s+justice", r"Internationaal\s+Gerechtshof", r"International\s+Court\s+of\s+Justice"]},
    "CPI": {"jurisdiction": "INT", "patterns": [r"CPI", r"ICC", r"Cour\s+pénale\s+internationale", r"Internationaal\s+Strafhof", r"International\s+Criminal\s+Court"]},
    "BENELUX": {"jurisdiction": "INT", "patterns": [r"Jur\.\s*Ben\.?", r"BenGH", r"Cour\s+de\s+justice\s+Benelux", r"Benelux-Gerechtshof"]},
    "TAS": {"jurisdiction": "INT", "patterns": [r"TAS", r"CAS", r"Tribunal\s+arbitral\s+du\s+sport", r"Hof\s+van\s+Arbitrage\s+voor\s+Sport", r"Court\s+of\s+Arbitration\s+for\s+Sport"]},
}

LOCATIONS = [
    "Antwerpen", "Anvers", "Bergen", "Mons", "Brussel", "Bruxelles", "Gent", "Gand",
    "Luik", "Liège", "Leuven", "Louvain", "Namen", "Namur", "Hasselt", "Tongeren",
    "Dendermonde", "Mechelen", "Turnhout", "Oudenaarde", "Charleroi", "Eupen",
    "Hainaut", "Henegouwen", "Brabant Wallon", "Waals-Brabant", "Brabant",
    "Limburg", "Limbourg", "Luxembourg", "Luxemburg", "Oost-Vlaanderen", "West-Vlaanderen",
    "Flandre Orientale", "Flandre Occidentale",
]

_COURT_PATTERN_LIST = [p for info in COURT_TOKENS.values() for p in info["patterns"]]
COURT_REGEX = re.compile(r"\b(" + "|".join(_COURT_PATTERN_LIST) + r")\b", re.IGNORECASE)
_COURT_SINGLE = [
    (re.compile(p, re.IGNORECASE), info["jurisdiction"])
    for info in COURT_TOKENS.values()
    for p in info["patterns"]
]

ECLI_PATTERNS = [
    re.compile(r"ECLI:[A-Z]{2}:[A-Z0-9]+:\d{4}:[A-Z0-9.\-]+", re.IGNORECASE),
    re.compile(r"ECLI\s*:\s*[A-Z]{2}\s*:\s*[A-Z0-9]+\s*:\s*\d{4}\s*:\s*[A-Z0-9.\-]+", re.IGNORECASE),
    re.compile(r"\bECLI[-\s]*[A-Z]{2}[-\s]*[A-Z0-9]+[-\s]*\d{4}[-\s]*[A-Z0-9.\-]+\b", re.IGNORECASE),
]

DATE_PATTERNS = [
    re.compile(r"\b(\d{1,2})[-/.](\d{1,2})[-/.](\d{4})\b"),
    re.compile(r"\b(\d{1,2})[-/.](\d{1,2})[-/.](\d{2})\b"),
    re.compile(r"\b(\d{1,2})\s+(januari|februari|maart|april|mei|juni|juli|augustus|september|oktober|november|december)\s+(\d{4})\b", re.IGNORECASE),
    re.compile(r"\b(\d{1,2})\s+(janvier|février|mars|avril|mai|juin|juillet|août|septembre|octobre|novembre|décembre)\s+(\d{4})\b", re.IGNORECASE),
]

CASE_PATTERNS = [
    re.compile(r"[A-Z]\.\d{2}\.\d{4}\.[A-Z]"),
    re.compile(r"[CTF]-\d+/\d{2}"),
    re.compile(r"\b(?:nr\.|n°|nummer|numéro)\s*\d+[-/]?\d{2,4}", re.IGNORECASE),
    re.compile(r"\b(?:rol|rôle)\s*(?:nr\.|n°)?\s*\d+", re.IGNORECASE),
    re.compile(r"\b(?:zaak|affaire|case)\s+\d+[-/]\d{2,4}", re.IGNORECASE),
    re.compile(r"\b(?:arrest|arrêt)\s+(?:nr\.|n°)?\s*\d+[-/]\d{2,4}", re.IGNORECASE),
]
_CASE_SKIP = [
    re.compile(r"^[AB]\.\d+(\.\d+)?$"),
    re.compile(r"^§\s*\d+"),
    re.compile(r"^art\.\s*\d+", re.IGNORECASE),
]

BIBLIO_PATTERNS = [
    re.compile(r"\b(?:Arr\.Cass\.|J\.T\.|Pas\.|R\.W\.|T\.B\.P\.|Rev\.dr\.pén\.|R\.A\.B\.G\.)\s*\d{4}", re.IGNORECASE),
    re.compile(r"\b(?:Bull\.|Recueil)\s*\d{4}", re.IGNORECASE),
    re.compile(r"\b(?:Jur\.|Jurispr\.)\s*\d{4}", re.IGNORECASE),
]

_WS = re.compile(r"\s+")


@dataclass
class Trigger:
    type: str  # ECLI | COURT | DATE | CASE_NUMBER | BIBLIO
    text: str
    position: int


@dataclass
class Region:
    region_id: int
    text: str
    position: int
    trigger_position: int
    trigger_type: str  # ECLI | COURT_KEYWORD | DATE_PATTERN | BIBLIOGRAPHIC
    triggers: list[Trigger] = field(default_factory=list)
    confidence: str = "LOW"  # HIGH | MEDIUM | LOW
    jurisdiction: str = "UNKNOWN"  # BE | EU | INT | UNKNOWN


def jurisdiction_from_ecli(ecli: str) -> str:
    if not ecli:
        return "UNKNOWN"
    parts = ecli.split(":")
    if len(parts) < 2:
        return "UNKNOWN"
    country = parts[1]
    if country == "BE":
        return "BE"
    if country in ("EU", "CE"):
        return "EU"
    if country in ("XX", "INT"):
        return "INT"
    return "UNKNOWN"


def jurisdiction_from_court(court_name: str) -> str:
    if not court_name:
        return "UNKNOWN"
    for rx, jurisdiction in _COURT_SINGLE:
        if rx.search(court_name):
            return jurisdiction
    upper = court_name.upper()
    if "EUROP" in upper and "RECHT" not in upper and "DROIT" not in upper:
        return "EU"
    if "INTERNATIONAL" in upper or "INTERNATIONA" in upper:
        return "INT"
    lower = court_name.lower()
    for loc in LOCATIONS:
        if loc.lower() in lower:
            return "BE"
    return "UNKNOWN"


def find_ecli_triggers(text: str, self_id: str) -> list[Trigger]:
    """ECLI hits, whitespace-normalized, exact self-reference filtered, deduped."""
    triggers: list[Trigger] = []
    seen: set[str] = set()
    for rx in ECLI_PATTERNS:
        for m in rx.finditer(text):
            ecli = _WS.sub("", m.group(0))
            if ecli == self_id:
                continue
            if ecli not in seen:
                seen.add(ecli)
                triggers.append(Trigger("ECLI", ecli, m.start()))
    return triggers


def find_court_triggers(text: str) -> list[Trigger]:
    return [Trigger("COURT", m.group(0), m.start()) for m in COURT_REGEX.finditer(text)]


def find_date_triggers(text: str) -> list[Trigger]:
    out = []
    for rx in DATE_PATTERNS:
        out.extend(Trigger("DATE", m.group(0), m.start()) for m in rx.finditer(text))
    return out


def find_case_number_triggers(text: str) -> list[Trigger]:
    out = []
    for rx in CASE_PATTERNS:
        for m in rx.finditer(text):
            s = m.group(0)
            if any(skip.match(s) for skip in _CASE_SKIP):
                continue
            out.append(Trigger("CASE_NUMBER", s, m.start()))
    return out


def find_biblio_triggers(text: str) -> list[Trigger]:
    out = []
    for rx in BIBLIO_PATTERNS:
        out.extend(Trigger("BIBLIO", m.group(0), m.start()) for m in rx.finditer(text))
    return out


def _cluster(triggers: list[Trigger]) -> list[list[Trigger]]:
    """Single-linkage clustering: consecutive (by position) triggers <=500 apart."""
    if not triggers:
        return []
    ordered = sorted(triggers, key=lambda t: t.position)
    clusters: list[list[Trigger]] = []
    current = [ordered[0]]
    for prev, curr in zip(ordered, ordered[1:]):
        if curr.position - prev.position <= CLUSTER_DISTANCE:
            current.append(curr)
        else:
            clusters.append(current)
            current = [curr]
    clusters.append(current)
    return clusters


def _confidence(triggers: list[Trigger]) -> str:
    types = {t.type for t in triggers}
    if "ECLI" in types:
        return "HIGH"
    if "COURT" in types and "DATE" in types:
        return "MEDIUM"
    return "LOW"


def _primary_type(triggers: list[Trigger]) -> str:
    types = [t.type for t in triggers]
    if "ECLI" in types:
        return "ECLI"
    if "COURT" in types:
        return "COURT_KEYWORD"
    if "BIBLIO" in types:
        return "BIBLIOGRAPHIC"
    return "DATE_PATTERN"


def _jurisdiction(triggers: list[Trigger]) -> str:
    for t in triggers:
        if t.type == "ECLI":
            j = jurisdiction_from_ecli(t.text)
            if j != "UNKNOWN":
                return j
    for t in triggers:
        if t.type == "COURT":
            j = jurisdiction_from_court(t.text)
            if j != "UNKNOWN":
                return j
    return "UNKNOWN"


def detect_citation_regions(text: str, self_id: str) -> list[Region]:
    """Full region detection: triggers → clusters → 1200-char windows + metadata."""
    triggers = (
        find_ecli_triggers(text, self_id)
        + find_court_triggers(text)
        + find_date_triggers(text)
        + find_case_number_triggers(text)
        + find_biblio_triggers(text)
    )
    regions: list[Region] = []
    for i, cluster in enumerate(_cluster(triggers)):
        positions = [t.position for t in cluster]
        center = (min(positions) + max(positions)) // 2
        half = WINDOW_SIZE // 2
        start = max(0, center - half)
        end = min(len(text), center + half)
        primary = cluster[0]
        regions.append(
            Region(
                region_id=i + 1,
                text=text[start:end],
                position=start,
                trigger_position=primary.position,
                trigger_type=_primary_type(cluster),
                triggers=cluster,
                confidence=_confidence(cluster),
                jurisdiction=_jurisdiction(cluster),
            )
        )
    return regions
