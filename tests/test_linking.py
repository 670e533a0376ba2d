"""Tests for linking fast paths, candidate generation, scoring, top-match."""

from decisions_knowledge_graph_data_ray.functions import linking as L
from decisions_knowledge_graph_data_ray.pipelines.oracle import build_linker_index
from decisions_knowledge_graph_data_ray.sources.transcripts import get_world


def _idx():
    return build_linker_index(get_world())


def test_popular_alias_fast_path():
    idx = _idx()
    res = L.link_provision_standard(
        {"parent_act_name": "Code civil", "parent_act_type": "LOI", "parent_act_date": None}, idx
    )
    assert res["method"] == "FAST_PATH"
    assert res["matches"][0]["score"] == 100
    assert res["matches"][0]["confidence"] == 1.0


def test_standard_candidates_by_date_and_type():
    idx = _idx()
    world = get_world()
    act = world["_loi_acts"][0]
    date = act["dossier_number"][:10]
    item = {
        "parent_act_name": act["title"],
        "parent_act_type": "LOI",
        "parent_act_date": date,
    }
    res = L.link_provision_standard(item, idx)
    assert res["method"] == "DISAMBIGUATED"
    top = L.top_match(res["matches"])
    assert top is not None
    assert top["document_number"] == act["document_number"]
    assert top["score"] >= 80


def test_standard_no_candidates():
    idx = _idx()
    res = L.link_provision_standard(
        {"parent_act_name": "Zzz onbekend", "parent_act_type": "LOI", "parent_act_date": "1800-01-01"},
        idx,
    )
    assert res["method"] == "NO_MATCH"
    assert L.top_match(res["matches"]) is None


def test_code_path_article_existence():
    idx = _idx()
    item = {
        "parent_act_name": "code civil belge",
        "parent_act_type": "CODE",
        "provision_number": "1382",
        "provision_number_key": "1382",
    }
    res = L.link_provision_code(item, idx, decision_date=None)
    assert res["method"] == "DISAMBIGUATED"
    assert res["matches"][0]["score"] >= 40  # article exists → +40


def test_code_path_no_family():
    idx = _idx()
    res = L.link_provision_code(
        {"parent_act_name": "volstrekt onbekende tekst", "parent_act_type": "CODE",
         "provision_number": "1", "provision_number_key": "1"},
        idx, None,
    )
    assert res["method"] == "NO_MATCH"
    assert res["no_match_reason"] == "No code family identified"


def test_no_date_path_requires_article():
    idx = _idx()
    res = L.link_provision_no_date(
        {"parent_act_name": "X", "parent_act_type": "OTHER", "provision_number": "",
         "provision_number_key": ""},
        idx, None,
    )
    assert res["no_match_reason"] == "No article number available"


def test_decision_exact_ecli_fast_path():
    idx = _idx()
    dec = get_world()["decisions"][0]
    res = L.link_cited_decision(
        {"ecli": dec["decision_id"].lower(), "court_name": dec["court_name"],
         "date": dec["decision_date"], "case_number": None},
        idx,
    )
    assert res["method"] == "EXACT_ECLI"
    assert res["matches"][0]["document_number"] == dec["decision_id"]


def test_decision_missing_court_skip():
    idx = _idx()
    res = L.link_cited_decision(
        {"ecli": None, "court_name": "Tribunal de Lilliput", "date": "2001-03-15",
         "case_number": None},
        idx,
    )
    assert res["method"] == "NO_MATCH"
    assert "not in database" in res["no_match_reason"]


def test_decision_null_date_skip():
    idx = _idx()
    res = L.link_cited_decision({"ecli": None, "court_name": "Hof van Cassatie", "date": None,
                                 "case_number": None}, idx)
    assert res["no_match_reason"] == "cited_date is null or invalid"


def test_decision_court_date_case_disambiguation():
    idx = _idx()
    dec = get_world()["decisions"][1]
    res = L.link_cited_decision(
        {"ecli": None, "court_name": dec["court_name"], "date": dec["decision_date"],
         "case_number": dec["case_number"]},
        idx,
    )
    top = L.top_match(res["matches"])
    assert top is not None and top["document_number"] == dec["decision_id"]


def test_top_match_threshold():
    # F4: [{85},{92},{79}] → 92; all <80 → None
    matches = [{"document_number": "a", "score": 85}, {"document_number": "b", "score": 92},
               {"document_number": "c", "score": 79}]
    assert L.top_match(matches)["score"] == 92
    assert L.top_match([{"document_number": "c", "score": 79}]) is None
    assert L.top_match([]) is None


def test_provision_bucket_routing():
    assert L.provision_bucket({"parent_act_type": "CODE"}) == "code"
    assert L.provision_bucket({"parent_act_type": "LOI", "parent_act_date": "2000-01-01"}) == "standard"
    assert L.provision_bucket({"parent_act_type": "LOI", "parent_act_date": None}) == "no_date"


# ---------------------------------------------------------------------------
# M10 wiring: snippet context in decision disambiguation
# (map-cited-decisions/citation-finder.ts:335-365)
# ---------------------------------------------------------------------------


def _some_decision():
    return get_world()["decisions"][0]


def test_snippet_ecli_fast_path_when_attr_lost():
    """Mention lost its ecli attribute (region merging) but the snippet
    contains the ECLI → exact match via SNIPPET_ECLI."""
    idx = _idx()
    dec = _some_decision()
    item = {
        "ecli": None,
        "court_name": None,
        "date": str(dec["decision_date"])[:10],
        "case_number": None,
        "snippet": f"...comme l'a décidé l'arrêt {dec['decision_id']}, le moyen est fondé...",
    }
    res = L.link_cited_decision(item, idx)
    assert res["method"] == "SNIPPET_ECLI"
    assert res["matches"][0]["document_number"] == dec["decision_id"]
    assert res["matches"][0]["score"] == 100


def test_snippet_case_number_cooccurrence_scores_case_evidence():
    """No case_number attribute; the candidate's case number inside the
    snippet supplies the 40-point case evidence."""
    idx = _idx()
    dec = _some_decision()
    base = {
        "ecli": None,
        "court_name": dec["court_name"],
        "date": str(dec["decision_date"])[:10],
        "case_number": None,
    }
    without = L.link_cited_decision({**base, "snippet": ""}, idx)
    with_snip = L.link_cited_decision(
        {**base, "snippet": f"zoals beslist in zaak {dec['case_number']} door het hof"}, idx
    )
    top_without = {m["document_number"]: m["score"] for m in without["matches"]}
    top_with = {m["document_number"]: m["score"] for m in with_snip["matches"]}
    assert top_with[dec["decision_id"]] == top_without.get(dec["decision_id"], 0) + 40
    assert L.top_match(with_snip["matches"])["document_number"] == dec["decision_id"]


def test_extraction_attaches_snippets():
    from decisions_knowledge_graph_data_ray.functions.extract import extract_cited_decisions

    dec = _some_decision()
    text = (
        "assistant: irrelevant preamble about the case history.\n"
        f"assistant: See {dec['decision_id']}, followed by the court below.\n"
        "assistant: closing remarks."
    )
    cites = extract_cited_decisions(text, "C1", "")
    assert len(cites) == 1
    assert cites[0]["snippet_matched_on"] == "ECLI"
    assert dec["decision_id"] in cites[0]["snippet"]
