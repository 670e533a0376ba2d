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


def world_parquet_dir() -> str:
    """Write (once, cached) the entity world as parquet files so the DuckDB
    oracle can read the SAME linking side inputs the Ray pipeline broadcasts
    (the oracle twin of build_index_ref's LinkerIndex — see pipelines/kg.py).

    Files: acts / articles / decisions / alias_popular (alias already
    normalize_string-ed, as LinkerIndex.build stores it) / code_families
    (one row per (family, doc_pos, document_number) so SQL can replicate the
    family→docs expansion order) / missing_courts (normalize_court_name-ed,
    as the index stores it). Atomic publish like transcripts_path_for_n.
    """
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..functions.normalize import normalize_court_name, normalize_string

    out_dir = "/tmp/dkg_world/v2"
    done = os.path.join(out_dir, "_DONE")
    if os.path.exists(done):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    w = make_entity_world()

    def write(name: str, rows: list[dict], schema: pa.Schema) -> None:
        tmp = os.path.join(out_dir, name + ".tmp")
        pq.write_table(pa.Table.from_pylist(rows, schema=schema), tmp)
        os.replace(tmp, os.path.join(out_dir, name + ".parquet"))

    s = pa.string()
    write("acts", w["acts"], pa.schema(
        [("document_number", s), ("title", s), ("document_type", s), ("dossier_number", s)]
    ))
    write("articles", w["articles"], pa.schema(
        [("document_number", s), ("article_number", s)]
    ))
    # dec_idx = generation order = decisions_by_date insertion order: the
    # linker's first-candidate semantics (EXACT/SNIPPET ECLI return the first
    # hit in list order) need it as an explicit sort key in SQL
    write("decisions", [
        {**d, "dec_idx": i} for i, d in enumerate(w["decisions"])
    ], pa.schema(
        [("decision_id", s), ("court_code", s), ("court_name", s),
         ("decision_date", s), ("case_number", s), ("dec_idx", pa.int32())]
    ))
    write("alias_popular", [
        {"alias": normalize_string(k), "document_number": v}
        for k, v in w["alias_popular"].items()
    ], pa.schema([("alias", s), ("document_number", s)]))
    write("code_families", [
        {"family": fam, "doc_pos": i, "document_number": d}
        for fam, docs in w["code_families"].items()
        for i, d in enumerate(docs)
    ], pa.schema([("family", s), ("doc_pos", pa.int32()), ("document_number", s)]))
    write("missing_courts", [
        {"court": normalize_court_name(c)} for c in w["missing_courts"]
    ], pa.schema([("court", s)]))
    with open(done + ".tmp", "w") as f:
        f.write("ok")
    os.replace(done + ".tmp", done)
    return out_dir
