"""Legal-teaching (TEACH-) and party (PARTY-) entity families + outcome
classification with closed-set validation and retry-with-feedback.

Mirrors the reference's ID/edge rules:
  - extract-legal-teachings/schema.ts:37-40 (TEACH id pattern),
    101-142 (hierarchy), 189-197 (provision/decision references)
  - extract-comprehensive/config.ts:214-218 (PARTY ids), 237-276 (roles),
    393-455 (outcome enum)
  - classify-legal-issues/validation.ts:19-103 + stages.ts:437-557
    (closed-set validation, retry with error feedback, temp-0 fallback)
"""

import re

import pytest

from decisions_knowledge_graph_data_ray.functions.document import emit_triples, extract_document
from decisions_knowledge_graph_data_ray.functions.parties import (
    VALID_OUTCOMES,
    classify_outcome,
    classify_party_type,
    extract_parties,
    validate_outcome,
)
from decisions_knowledge_graph_data_ray.functions.teachings import (
    extract_legal_teachings,
    hierarchy_reference_errors,
)

_TEACH_RE = re.compile(r"^TEACH-[a-zA-Z0-9:.]+-\d{3}$")
_PARTY_RE = re.compile(r"^PARTY-[a-zA-Z0-9:.]+-\d{3}$")

_DOC = "\n".join(
    [
        "user: Deze zaak betreft een cassatieberoep tegen het bestreden arrest.",
        "assistant: La cour énonce le principe suivant: en application de "
        "l'article 1382 du Code civil, la charge de la preuve du manquement "
        "incombe à la partie qui l'invoque.",
        "assistant: Par exception au principe précédent, la réparation du "
        "dommage doit être intégrale, comme l'a décidé l'arrêt "
        "ECLI:BE:CASS:2010:ARR.20100115.3.",
        "assistant: En précisant le principe précédent, le juge doit procéder "
        "à une mise en balance des intérêts en présence.",
        "assistant: En cause: la S.A. Alpha Invest, demanderesse en cassation, "
        "contre M. Dupont, défendeur en cassation. La cour rejette le pourvoi.",
    ]
)


def _extract(conv_id="CONV:BE:000042"):
    return extract_document({"conv_id": conv_id, "text": _DOC, "self_ecli": ""})


def test_teaching_ids_and_sequencing():
    rec = _extract()
    teachings = rec["legal_teachings"]
    assert len(teachings) == 3
    for i, te in enumerate(teachings):
        assert _TEACH_RE.match(te["teaching_id"])
        assert te["teaching_seq"] == i + 1
    assert teachings[0]["teaching_id"] == "TEACH-CONV:BE:000042-001"
    assert teachings[2]["teaching_id"] == "TEACH-CONV:BE:000042-003"


def test_teaching_classifications():
    t1, t2, t3 = _extract()["legal_teachings"]
    assert t1["principle_type"] == "BURDEN_PROOF"
    assert t1["clarity"] == "EXPLICIT" and t1["novel_principle"]
    assert t2["principle_type"] == "REMEDIAL_PRINCIPLE"
    assert t2["clarity"] == "IMPLICIT"
    assert t3["principle_type"] == "BALANCING_TEST"
    # cassatieberoep cue → CASSATION level, binding
    assert all(t["court_level"] == "CASSATION" and t["binding"] for t in (t1, t2, t3))
    assert t1["court_verbatim_language"] == "FR"


def test_teaching_hierarchy_edges():
    t1, t2, t3 = _extract()["legal_teachings"]
    # t2 is an exception to t1 (forward + reverse)
    assert t2["exception_to"] == t1["teaching_id"]
    assert t1["excepted_by"] == [t2["teaching_id"]]
    # t3 refines t2 ("the previous principle")
    assert t3["refines_parent"] == t2["teaching_id"]
    assert t2["refined_by"] == [t3["teaching_id"]]
    assert hierarchy_reference_errors([t1, t2, t3]) == []


def test_teaching_hierarchy_first_teaching_has_no_refs():
    doc = "assistant: Par exception au principe précédent, la réparation est due."
    teachings = extract_legal_teachings(doc, "C1", [], [])
    assert len(teachings) == 1
    assert teachings[0]["exception_to"] is None  # no previous → null, not dangling


def test_dangling_hierarchy_ref_detected():
    teachings = extract_legal_teachings(
        "assistant: La cour énonce le principe suivant: la charge de la preuve incombe au demandeur.",
        "C1", [], [],
    )
    teachings[0]["refines_parent"] = "TEACH-C1-099"
    errors = hierarchy_reference_errors(teachings)
    assert len(errors) == 1 and "TEACH-C1-099" in errors[0]


def test_teaching_provision_and_decision_links():
    rec = _extract()
    t1, t2, _ = rec["legal_teachings"]
    prov_ids = {p["internal_provision_id"] for p in rec["cited_provisions"]}
    dec_ids = {d["internal_decision_id"] for d in rec["cited_decisions"]}
    # teaching 1 cites art. 1382 Code civil — resolved to the document's ART- id
    assert len(t1["related_provision_ids"]) == 1
    assert t1["related_provision_ids"][0] in prov_ids
    # teaching 2 cites an ECLI — resolved to the document's DEC- id
    assert len(t2["related_decision_ids"]) == 1
    assert t2["related_decision_ids"][0] in dec_ids


def test_teaching_and_party_triples():
    rec = _extract()
    preds = {t["pred"] for t in emit_triples(rec, [])}
    assert {"has_teaching", "teaching_cites_provision", "teaching_cites_decision",
            "exception_to", "refines", "has_party", "has_outcome"} <= preds
    tri = emit_triples(rec, [])
    teach_subjects = {t["obj"] for t in tri if t["pred"] == "has_teaching"}
    assert all(_TEACH_RE.match(x) for x in teach_subjects)


def test_party_extraction_fr_nl():
    rec = _extract()
    parties = rec["parties"]
    assert len(parties) == 2
    p1, p2 = parties
    assert _PARTY_RE.match(p1["internal_party_id"])
    assert p1["internal_party_id"] == "PARTY-CONV:BE:000042-001"
    assert p1["party_type"] == "LEGAL_ENTITY"
    assert p1["procedural_role"] == "DEMANDEUR_EN_CASSATION"
    assert p2["party_type"] == "NATURAL_PERSON"
    assert p2["procedural_role"] == "DEFENDEUR_EN_CASSATION"

    nl = extract_parties(
        "In zake: de N.V. Beta Industries, eiser tot cassatie, tegen "
        "Dhr. Janssens, verweerder in cassatie. Het hof verklaart het middel gegrond.",
        "C9",
    )
    assert [p["procedural_role"] for p in nl] == ["EISER_IN_CASSATIE", "VERWEERDER_IN_CASSATIE"]
    assert nl[0]["party_type"] == "LEGAL_ENTITY"


def test_party_type_classification():
    assert classify_party_type("la S.A. Alpha") == "LEGAL_ENTITY"
    assert classify_party_type("l'État belge") == "PUBLIC_AUTHORITY"
    assert classify_party_type("l'association de fait Epsilon") == "DE_FACTO_ASSOCIATION"
    assert classify_party_type("M. Dupont") == "NATURAL_PERSON"


def test_outcome_last_phrase_wins_and_closed_set():
    text = (
        "assistant: La cour confirme le jugement entrepris.\n"
        "assistant: La cour rejette le pourvoi."
    )
    assert classify_outcome(text) == "REJET"
    assert classify_outcome("Het hof verklaart het middel ongegrond.") == "ONGEGROND"
    # no dispositif phrase → language-dependent catch-all
    assert classify_outcome("nothing juridique ici") == "AUTRE"
    assert classify_outcome("het arrest wordt besproken") == "ANDERE"
    assert validate_outcome("REJET") == []
    assert validate_outcome("NOT_A_LABEL") != []
    assert "CASSATION" in VALID_OUTCOMES and "GEGROND" in VALID_OUTCOMES


def test_classify_stage_retry_and_fallback(ray_session):
    import ray.data as rd

    from decisions_knowledge_graph_data_ray.stages.classify import classify_outcomes

    docs = rd.from_items(
        [
            {"conv_id": "GOOD", "text": "La cour rejette le pourvoi."},
            {"conv_id": "RETRY", "text": "retry-me La cour casse l'arrêt attaqué."},
            {"conv_id": "BROKEN", "text": "broken-forever text"},
        ]
    )

    def flaky(text, feedback):
        if "retry-me" in text and feedback is None:
            return "BOGUS_LABEL"  # violates the closed set on first attempt
        if "broken-forever" in text:
            return "ALWAYS_WRONG"  # never self-corrects
        return classify_outcome(text)

    out = (
        classify_outcomes(docs, classify_fn=flaky, concurrency=1)
        .to_pandas()
        .set_index("conv_id")
    )
    assert out.loc["GOOD", "review_tier"] == "auto_accept"
    assert out.loc["GOOD", "outcome"] == "REJET"
    # invalid first attempt, feedback retry fixes it
    assert out.loc["RETRY", "review_tier"] == "expedited_review"
    assert out.loc["RETRY", "outcome"] == "CASSATION"
    assert bool(out.loc["RETRY", "retried"]) and not bool(out.loc["RETRY", "used_fallback"])
    # never valid → deterministic fallback label + mandatory review
    assert out.loc["BROKEN", "review_tier"] == "mandatory_review"
    assert out.loc["BROKEN", "outcome"] in {"AUTRE", "ANDERE"}
    assert bool(out.loc["BROKEN", "used_fallback"])
    assert out["valid"].all()  # fallback always lands in the closed set


def test_teachings_flow_through_kg_pipeline(ray_session):
    """e2e: TEACH-/PARTY- triples survive extraction → linking → dedup."""
    import ray.data as rd

    from decisions_knowledge_graph_data_ray.pipelines.kg import KGConfig, run_kg_pipeline
    from decisions_knowledge_graph_data_ray.sources.transcripts import (
        generate_transcripts_table,
    )

    transcripts = rd.from_arrow(generate_transcripts_table(40))
    res = run_kg_pipeline(
        transcripts,
        config=KGConfig(extract_concurrency=(1, 2), link_concurrency=(1, 2)),
    )
    preds = set(res["triples"].to_pandas()["pred"])
    assert "has_teaching" in preds
    assert "has_party" in preds
    assert "has_outcome" in preds
    assert preds & {"teaching_cites_provision", "teaching_cites_decision"}
    assert preds & {"refines", "exception_to", "conflicts_with"}


def test_comprehensive_current_instance():
    from decisions_knowledge_graph_data_ray.functions.comprehensive import (
        extract_current_instance,
    )

    text = "\n".join(
        [
            "user: Le litige porte sur un accident de la circulation survenu en 2019.",
            "assistant: La partie demanderesse demande la réparation intégrale du dommage.",
            "assistant: Le moyen soutient que l'article 1382 du Code civil a été violé.",
            "assistant: La cour rejette le pourvoi.",
        ]
    )
    ci = extract_current_instance({"conv_id": "C1", "text": text})
    assert ci["facts"].startswith("Le litige porte")
    assert len(ci["requests"]) >= 1 and "demande" in ci["requests"][0]
    assert len(ci["arguments"]) >= 1 and "moyen" in ci["arguments"][0].lower()
    assert ci["court_order"] == "La cour rejette le pourvoi."
    assert ci["outcome"] == "REJET"


def test_comprehensive_no_dispositif():
    from decisions_knowledge_graph_data_ray.functions.comprehensive import (
        extract_court_order,
    )

    assert extract_court_order("user: nothing here") == ""
