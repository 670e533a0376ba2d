"""Deterministic synthetic canonical-entity / alias tables (linking side inputs).

Analogue of the reference's PostgreSQL lookup tables and JSON alias files
(FIXTURES.md F2): `documents`→acts, `article_contents`→articles,
popular-laws.json→alias_popular, code-mapping.json→code_families,
`decisions1`→decisions, missing-courts.json→missing_courts.

Everything is a pure function of (seed, size) — no wall clock, no RNG state:
field values derive from the row index so generation is order-independent
and identical in every process.
"""

from __future__ import annotations

from functools import lru_cache

from ..functions.normalize import stable_hash32

_MONTH_FR = [
    "janvier", "février", "mars", "avril", "mai", "juin",
    "juillet", "août", "septembre", "octobre", "novembre", "décembre",
]

TOPICS = [
    "la protection des données", "les baux commerciaux", "la discrimination",
    "les marchés publics", "la circulation routière", "le droit du travail",
    "les sociétés commerciales", "la fiscalité des revenus", "l'environnement",
    "la procédure pénale", "le droit de la famille", "les assurances",
]

TOPICS_NL = [
    "gegevensbescherming", "handelshuur", "discriminatie", "overheidsopdrachten",
    "wegverkeer", "arbeidsrecht", "vennootschappen", "inkomstenbelasting",
    "milieu", "strafvordering", "familierecht", "verzekeringen",
]

# Codes: (family name used in code_families/aliases, canonical title)
CODES = [
    ("code civil", "Code civil"),
    ("code pénal", "Code pénal"),
    ("code judiciaire", "Code judiciaire"),
    ("code de commerce", "Code de commerce"),
    ("burgerlijk wetboek", "Burgerlijk Wetboek"),
    ("strafwetboek", "Strafwetboek"),
    ("gerechtelijk wetboek", "Gerechtelijk Wetboek"),
    ("code d'instruction criminelle", "Code d'instruction criminelle"),
]

# (ecli court code, FR name, NL name) — names chosen to hit COURT_TOKENS patterns
COURTS = [
    ("CASS", "Cour de cassation", "Hof van Cassatie"),
    ("GHCC", "Cour constitutionnelle", "Grondwettelijk Hof"),
    ("RSCE", "Conseil d'État", "Raad van State"),
    ("CTLIE", "Cour du travail", "Arbeidshof"),
    ("CABRL", "Cour d'appel", "Hof van Beroep"),
    ("CTBRL", "Tribunal du travail", "Arbeidsrechtbank"),
]

MISSING_COURTS = ["Tribunal de Lilliput", "Vredegerecht Atlantis"]


def _act_date(i: int) -> str:
    h = stable_hash32(f"act-date-{i}")
    year = 1950 + (h % 75)  # 1950..2024
    month = 1 + (h // 97) % 12
    day = 1 + (h // 11) % 28
    return f"{year:04d}-{month:02d}-{day:02d}"


def _decision_date(i: int) -> str:
    h = stable_hash32(f"dec-date-{i}")
    year = 1990 + (h % 35)  # 1990..2024
    month = 1 + (h // 13) % 12
    day = 1 + (h // 7) % 28
    return f"{year:04d}-{month:02d}-{day:02d}"


@lru_cache(maxsize=8)
def make_entity_world(n_acts: int = 400, n_decisions: int = 600) -> dict:
    """Build the full consistent entity world.

    Returns dict of plain-python tables:
      acts: [{document_number,title,document_type,dossier_number}]
      articles: [{document_number, article_number}]
      alias_popular: {name: document_number}
      code_families: {family: [document_number]}
      decisions: [{decision_id,court_code,court_name,decision_date,case_number}]
      missing_courts: [str]
    """
    acts: list[dict] = []
    articles: list[dict] = []
    alias_popular: dict[str, str] = {}
    code_families: dict[str, list[str]] = {}

    # code acts first (stable document numbers)
    for ci, (family, title) in enumerate(CODES):
        date = _act_date(1000 + ci)
        doc_num = f"{date}/{30 + ci:02d}"
        acts.append(
            {
                "document_number": doc_num,
                "title": title,
                "document_type": "LOI",
                "dossier_number": f"{date}-{1000 + ci:05d}",
            }
        )
        code_families[family] = [doc_num]
        alias_popular[family] = doc_num
        # famous article numbers + a dense low range
        art_numbers = [str(n) for n in range(1, 31)] + ["1382", "1383", "544", "174", "6"]
        for an in art_numbers:
            articles.append({"document_number": doc_num, "article_number": an})

    # the constitution (dual-language alias)
    const_date = _act_date(2000)
    const_num = f"{const_date}/99"
    acts.append(
        {
            "document_number": const_num,
            "title": "La Constitution coordonnée",
            "document_type": "CONSTITUTION",
            "dossier_number": f"{const_date}-02000",
        }
    )
    alias_popular["grondwet"] = const_num
    alias_popular["constitution"] = const_num
    for an in [str(n) for n in range(1, 201)]:
        articles.append({"document_number": const_num, "article_number": an})

    # ordinary dated acts
    type_cycle = ["LOI", "DECRET", "ORDONNANCE", "ARRETE", "LOI"]
    for i in range(n_acts):
        date = _act_date(i)
        doc_type = type_cycle[i % len(type_cycle)]
        doc_num = f"{date}/{i % 90:02d}"
        y, m, d = date.split("-")
        topic = TOPICS[i % len(TOPICS)]
        kw = {"LOI": "Loi", "DECRET": "Décret", "ORDONNANCE": "Ordonnance", "ARRETE": "Arrêté royal"}[doc_type]
        title = f"{kw} du {int(d)} {_MONTH_FR[int(m) - 1]} {y} relative à {topic}"
        acts.append(
            {
                "document_number": doc_num,
                "title": title,
                "document_type": doc_type,
                "dossier_number": f"{date}-{i:05d}",
            }
        )
        for an in range(1, 4 + (i % 12)):
            articles.append({"document_number": doc_num, "article_number": str(an)})
        # a handful of popular dated laws get aliases usable by templates
        if i % 37 == 5:
            alias_popular[f"loi du {int(d)} {_MONTH_FR[int(m) - 1]} {y} relative à {topic}"] = doc_num

    decisions = []
    for i in range(n_decisions):
        code, fr, nl = COURTS[i % len(COURTS)]
        date = _decision_date(i)
        y = date[:4]
        compact = date.replace("-", "")
        case_number = f"C.{y[2:]}.{i % 10000:04d}.{'FN'[i % 2]}"
        decisions.append(
            {
                "decision_id": f"ECLI:BE:{code}:{y}:ARR.{compact}.{1 + i % 9}",
                "court_code": code,
                "court_name": fr if i % 2 == 0 else nl,
                "decision_date": date,
                "case_number": case_number,
            }
        )

    return {
        "acts": acts,
        "articles": articles,
        "alias_popular": alias_popular,
        "code_families": code_families,
        "decisions": decisions,
        "missing_courts": list(MISSING_COURTS),
    }
