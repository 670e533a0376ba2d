"""Deterministic synthetic transcript corpus (the mandated input table).

Schema (BASELINE.json input_hint / FIXTURES.md F1):
    conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
    ts:timestamp[us]

Generation rules (seed-stable, order-independent — every field is a pure
function of (conv index, turn index)):
  - conversation c has n_c = 3 + (c*7 % 12) turns; conversation 0 is the
    HOT KEY with 50x the median turn count (exercises salted assembly);
  - turns are WRITTEN OUT OF ORDER (deterministic shuffle) to exercise the
    explicit turn_idx sort;
  - each turn's text comes from a ~15-entry template bank with slot fills
    drawn from the synthetic entity world (sources/entities.py), embedding
    the reference's trigger patterns: ECLIs, court+date+case mentions,
    article+act provisions, CELEX/NUMAC, EU instruments, biblio refs,
    self-ECLI (must be filtered), same-date citations (must be filtered),
    and plain chatter as negative control.
"""

from __future__ import annotations

import datetime as _dt
import os

import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.normalize import stable_hash32
from .entities import COURTS, MISSING_COURTS, TOPICS_NL, make_entity_world

_MONTH_FR = [
    "janvier", "février", "mars", "avril", "mai", "juin",
    "juillet", "août", "septembre", "octobre", "novembre", "décembre",
]
_MONTH_NL = [
    "januari", "februari", "maart", "april", "mei", "juni",
    "juli", "augustus", "september", "oktober", "november", "december",
]

_BASE_TS = _dt.datetime(2026, 1, 1, 0, 0, 0)

HOT_KEY_FACTOR = 50


def conv_id_for(c: int) -> str:
    return f"CONV:BE:{c:06d}"


def self_ecli_for(c: int) -> str:
    h = stable_hash32(f"self-{c}")
    year = 2015 + (h % 11)
    month = 1 + (h // 31) % 12
    day = 1 + (h // 301) % 28
    return f"ECLI:BE:CASS:{year}:ARR.{year:04d}{month:02d}{day:02d}.{1 + c % 9}"


def n_turns_for(c: int, n_conv: int) -> int:
    if c == 0 and n_conv >= 20:
        return (3 + 11 // 2) * HOT_KEY_FACTOR  # 50x the median (median n_c ≈ 8)
    return 3 + (c * 7) % 12


def _fr_date(iso: str) -> str:
    y, m, d = iso.split("-")
    return f"{int(d)} {_MONTH_FR[int(m) - 1]} {y}"


def _nl_date(iso: str) -> str:
    y, m, d = iso.split("-")
    return f"{int(d)} {_MONTH_NL[int(m) - 1]} {y}"


_TEACHING_CLAUSES_FR = [
    # (clause, expected principle_type cue) — feeds functions/teachings lexicon
    "la charge de la preuve du manquement incombe à la partie qui l'invoque",
    "le juge doit procéder à une mise en balance des intérêts en présence",
    "cette disposition doit être interprété de manière restrictive",
    "la responsabilité suppose une faute, un dommage et un lien causal",
    "la réparation du dommage doit être intégrale et en nature lorsque c'est possible",
]
_TEACHING_CLAUSES_NL = [
    "de bewijslast van de tekortkoming rust op de partij die ze aanvoert",
    "de rechter moet een belangenafweging maken tussen de betrokken belangen",
]
_HIER_MARKERS_FR = [
    "En précisant le principe précédent",
    "Par exception au principe précédent",
    "Contrairement au principe précédent",
]
_PARTY_COMPANIES = [
    "S.A. Alpha Invest", "N.V. Beta Industries", "S.P.R.L. Gamma Conseil",
    "B.V.B.A. Delta Bouw", "l'État belge", "association de fait Epsilon",
]
_PARTY_PERSONS = ["M. Dupont", "Mme Lemaire", "Dhr. Janssens", "Mevr. Peeters", "M. Garcia"]
_OUTCOME_PHRASES_FR = [
    "La cour rejette le pourvoi.",
    "La cour casse l'arrêt attaqué.",
    "La cour casse partiellement la décision entreprise.",
    "La cour renvoie la cause devant la cour d'appel autrement composée.",
    "La cour confirme le jugement entrepris.",
    "La cour condamne la partie défenderesse aux dépens.",
]
_OUTCOME_PHRASES_NL = [
    "Het hof verklaart het middel ongegrond.",
    "Het hof verklaart het middel gegrond.",
    "Het hof vernietigt het bestreden arrest.",
    "Het hof wijst de vordering af.",
]


def render_turn_text(c: int, t: int, world: dict) -> str:
    """Template bank (FIXTURES.md F5). Pure function of (c, t, world)."""
    h = stable_hash32(f"{conv_id_for(c)}:{t}")
    decisions = world["decisions"]
    acts = world["acts"]
    alias_names = world["_alias_names"]
    dec = decisions[h % len(decisions)]
    k = h % 18

    if k == 0:
        # plain chatter — negative control, no triggers
        return (
            "Please summarize the procedural history and outline the remaining "
            "obligations for each party in plain language."
        )
    if k == 1:
        # HIGH-confidence ECLI citation, FOLLOWED treatment, exact-ECLI linkable
        return f"See {dec['decision_id']}, followed by the court below."
    if k == 2:
        # MEDIUM court+date+case (NL), linkable by date
        return (
            f"zoals beslist door het {dec['court_name']} op {_nl_date(dec['decision_date'])}, "
            f"zaaknummer {dec['case_number']}, werd het middel verworpen."
        )
    if k == 3:
        # provision with popular alias (code) — FAST_PATH link
        art = [1382, 544, 6, 17, 29][h // 16 % 5]
        return (
            f"En application de l'article {art} du Code civil, toute personne est "
            "responsable du dommage causé par sa faute."
        )
    if k == 4:
        # dated law provision — standard path candidate generation; a
        # deterministic minority of these carry an Agent-2C interpretation
        # sentence + an en-l'espèce factual-context clause (functions/interpret)
        loi_acts = world["_loi_acts"]
        act = loi_acts[h // 16 % len(loi_acts)]
        title = act["title"]
        art = 1 + (h // 64) % 3
        base = f"conformément à l'article {art} de la {title[0].lower()}{title[1:]}, le moyen est fondé."
        if h // 512 % 3 == 0:
            base += (
                f" La cour estime que l'article {art} impose une obligation stricte dont "
                "la méconnaissance entraîne la cassation de la décision attaquée; "
                f"en l'espèce, l'application de l'article {art} n'était pas justifiée "
                "par le juge du fond."
            )
        return base
    if k == 5:
        # treaty reference
        return "Le tribunal rappelle l'article 6, §1 EVRM relatif au droit à un procès équitable."
    if k == 6:
        # CELEX + NUMAC references
        celex = f"3{2000 + h % 26}R{(h // 7) % 2000:04d}"
        numac = f"{1990 + h % 36}{'0123456789A'[h // 11 % 11]}{(h // 13) % 100000:05d}"
        return f"CELEX: {celex} / numac {numac} werd gepubliceerd in het Belgisch Staatsblad."
    if k == 7:
        # EU instrument
        return "De Verordening (EG) nr. 261/2004 betreffende compensatie bij instapweigering is van toepassing."
    if k == 8:
        # bibliographic reference (LOW region)
        return f"Zie Arr.Cass. {1990 + h % 30}, p. {1 + h % 900}, voor een overzicht."
    if k == 9:
        # self-ECLI — must be filtered as self-reference
        return f"Deze zaak {self_ecli_for(c)} betreft een cassatieberoep tegen het bestreden arrest."
    if k == 10:
        # court+date (FR) with DISTINGUISHED treatment
        return (
            f"comme décidé par la {dec['court_name']} le {_fr_date(dec['decision_date'])}, "
            f"{dec['case_number']}, mais distingué en l'espèce."
        )
    if k == 11:
        # Belgian file-number URL
        fn = f"{1990 + h % 36}{1 + h // 5 % 12:02d}{1 + h // 60 % 28:02d}{h % 100:02d}"
        return (
            "Voir https://www.ejustice.just.fgov.be/cgi_loi/change_lg.pl?language=fr&cn_search="
            f"{fn} pour le texte intégral."
        )
    if k == 12:
        # abbreviated court + numeric date + case, FOLLOWED (NL keyword)
        y, m, d = dec["decision_date"].split("-")
        return f"Cass. {int(d)}/{int(m)}/{y}, {dec['case_number']}, gevolgd."
    if k == 13:
        # Grondwet provision — alias fast path
        art = 10 + (h // 32) % 180
        return f"overeenkomstig artikel {art} van de Grondwet is het beginsel van toepassing."
    if k == 14:
        # popular dated-law alias mention (provision fast path on dated alias)
        name = alias_names[h // 8 % len(alias_names)]
        art = 1 + (h // 128) % 3
        return f"Sur la base de l'article {art} de la {name}, la cour décide ce qui suit."
    if k == 15:
        # legal teaching with an in-sentence provision citation (TEACH- + ART- link)
        if h // 32 % 4 == 0:
            clause = _TEACHING_CLAUSES_NL[h // 128 % len(_TEACHING_CLAUSES_NL)]
            art = 10 + (h // 64) % 180
            return (
                f"Het hof stelt het volgende beginsel voorop: overeenkomstig artikel {art} "
                f"van de Grondwet, {clause}."
            )
        clause = _TEACHING_CLAUSES_FR[h // 128 % len(_TEACHING_CLAUSES_FR)]
        art = [1382, 544, 6, 17, 29][h // 64 % 5]
        return (
            f"La cour énonce le principe suivant: en application de l'article {art} "
            f"du Code civil, {clause}."
        )
    if k == 16:
        # hierarchy teaching (refines/exception/conflicts the PREVIOUS teaching
        # if any) with an in-sentence decision citation (TEACH- ↔ DEC- link)
        marker = _HIER_MARKERS_FR[h // 32 % len(_HIER_MARKERS_FR)]
        clause = _TEACHING_CLAUSES_FR[h // 256 % len(_TEACHING_CLAUSES_FR)]
        # ECLI citation (HIGH region → one DEC- record per distinct ECLI) so
        # the teaching→decision link resolves even when regions merge
        return f"{marker}, {clause}, comme l'a décidé l'arrêt {dec['decision_id']}."
    if k == 17:
        # parties block + dispositif outcome phrase (PARTY- ids + outcome enum)
        company = _PARTY_COMPANIES[h // 32 % len(_PARTY_COMPANIES)]
        person = _PARTY_PERSONS[h // 256 % len(_PARTY_PERSONS)]
        if h // 16 % 3 == 0:
            outcome = _OUTCOME_PHRASES_NL[h // 512 % len(_OUTCOME_PHRASES_NL)]
            return (
                f"In zake: de {company}, eiser tot cassatie, tegen {person}, "
                f"verweerder in cassatie. {outcome}"
            )
        outcome = _OUTCOME_PHRASES_FR[h // 512 % len(_OUTCOME_PHRASES_FR)]
        return (
            f"En cause: la {company}, demanderesse en cassation, contre {person}, "
            f"défendeur en cassation. {outcome}"
        )
    raise AssertionError("unreachable")


_MISSING_COURT_TEMPLATE = (
    "comme décidé par le {court} le {date}, l'argument est rejeté."
)


def render_tool_text(c: int, t: int) -> str:
    h = stable_hash32(f"tool:{conv_id_for(c)}:{t}")
    return f'{{"status": "ok", "hits": {h % 10}, "elapsed_ms": {h % 900}}}'


def generate_transcripts_table(n_conv: int, world: dict | None = None) -> pa.Table:
    """The transcripts table as one pyarrow Table (sorted by a deterministic
    out-of-order permutation — NOT by (conv_id, turn_idx))."""
    if world is None:
        world = get_world()

    conv_ids: list[str] = []
    turn_idxs: list[int] = []
    roles: list[str] = []
    texts: list[str] = []
    tools: list[str] = []
    tss: list[_dt.datetime] = []

    for c in range(n_conv):
        cid = conv_id_for(c)
        nt = n_turns_for(c, n_conv)
        for t in range(nt):
            role = ("user", "assistant", "tool")[t % 3]
            if role == "tool":
                text = render_tool_text(c, t)
                tool = ("search", "db_lookup", "fetch_document")[stable_hash32(f"tn:{c}:{t}") % 3]
            else:
                text = render_turn_text(c, t, world)
                tool = ""
                # rare: missing-court mention (exercises the skip fast path)
                if stable_hash32(f"mc:{c}:{t}") % 97 == 13:
                    text = _MISSING_COURT_TEMPLATE.format(
                        court=MISSING_COURTS[c % len(MISSING_COURTS)],
                        date=_fr_date("2001-03-15"),
                    )
            conv_ids.append(cid)
            turn_idxs.append(t)
            roles.append(role)
            texts.append(text)
            tools.append(tool)
            tss.append(_BASE_TS + _dt.timedelta(hours=c % 100000, minutes=t))

    n = len(conv_ids)
    # deterministic out-of-order permutation (exercises the explicit sort)
    order = sorted(range(n), key=lambda i: stable_hash32(f"perm:{conv_ids[i]}:{turn_idxs[i]}"))
    table = pa.table(
        {
            "conv_id": pa.array([conv_ids[i] for i in order], pa.string()),
            "turn_idx": pa.array([turn_idxs[i] for i in order], pa.int32()),
            "role": pa.array([roles[i] for i in order], pa.string()),
            "text": pa.array([texts[i] for i in order], pa.string()),
            "tool": pa.array([tools[i] for i in order], pa.string()),
            "ts": pa.array([tss[i] for i in order], pa.timestamp("us")),
        }
    )
    return table


_WORLD_CACHE: dict | None = None


def get_world() -> dict:
    """The shared entity world with the private _alias_names list attached."""
    global _WORLD_CACHE
    if _WORLD_CACHE is None:
        world = dict(make_entity_world())
        world["_alias_names"] = sorted(
            n for n in world["alias_popular"] if n.startswith("loi du ")
        )
        world["_loi_acts"] = [
            a for a in world["acts"] if a["document_type"] == "LOI" and a["title"].startswith("Loi du ")
        ]
        _WORLD_CACHE = world
    return _WORLD_CACHE


GEN_VERSION = "v4"  # bump to invalidate /tmp caches when generation rules change


def n_conversations_for_sf_dir(sf_dir: str) -> int:
    """Scale the corpus with the driver's sf dir: one conversation per ~12
    lineitem rows (500 / 5k / 50k at sf 0.001 / 0.01 / 0.1 — lineitem is the
    only table that scales linearly with sf in the driver's testdata)."""
    li = os.path.join(sf_dir, "lineitem.parquet")
    if os.path.exists(li):
        return max(100, pq.read_metadata(li).num_rows // 12)
    return 500


def transcripts_path_for_n(n_conv: int, label: str = "n") -> str:
    """Generate (once, cached) the transcripts parquet for an explicit
    conversation count; returns the parquet path."""
    out_dir = f"/tmp/dkg_transcripts/{GEN_VERSION}/{label}_{n_conv}"
    out_path = os.path.join(out_dir, "transcripts.parquet")
    if not os.path.exists(out_path):
        os.makedirs(out_dir, exist_ok=True)
        table = generate_transcripts_table(n_conv)
        tmp = out_path + ".tmp"
        pq.write_table(table, tmp, row_group_size=65536)
        os.replace(tmp, out_path)  # atomic publish
    return out_path


def transcripts_path(sf_dir: str) -> str:
    """Transcripts parquet scaled to an sf dir (cache key = basename+count)."""
    n_conv = n_conversations_for_sf_dir(sf_dir)
    base = os.path.basename(os.path.normpath(sf_dir)) or "default"
    return transcripts_path_for_n(n_conv, label=base)
