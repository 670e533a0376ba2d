"""Tests for deterministic structured extraction: IDs, self-citation filter,
re-sequencing, treatment detection, keywords (FIXTURES.md F4)."""

from decisions_knowledge_graph_data_ray.functions import extract as E


def test_cited_decision_ids_and_sequences():
    text = (
        "See ECLI:BE:CASS:2019:ARR.20190101.1, followed."
        + " " * 600
        + "See ECLI:BE:GHCC:2020:ARR.20200202.2, cited here."
    )
    out = E.extract_cited_decisions(text, "CONV:X", "")
    assert [c["decision_seq"] for c in out] == [1, 2]
    assert out[0]["internal_decision_id"] == "DEC-CONV:X-001"
    assert out[1]["internal_decision_id"] == "DEC-CONV:X-002"
    assert out[0]["treatment"] == "FOLLOWED"


def test_self_citation_filter_and_resequence():
    # self date = 2019-01-01; first citation shares that date → dropped,
    # second renumbered to 1
    self_ecli = "ECLI:BE:CASS:2019:ARR.20190101.9"
    text = (
        "See ECLI:BE:GHCC:2019:ARR.20190101.1, cited."
        + " " * 600
        + "See ECLI:BE:CASS:2020:ARR.20200505.1, cited."
    )
    out = E.extract_cited_decisions(text, "CONV:X", self_ecli)
    assert len(out) == 1
    assert out[0]["ecli"] == "ECLI:BE:CASS:2020:ARR.20200505.1"
    assert out[0]["decision_seq"] == 1
    assert out[0]["internal_decision_id"] == "DEC-CONV:X-001"


def test_medium_region_court_date_citation():
    text = "zoals beslist door het Hof van Cassatie op 12 maart 2015, zaaknummer C.15.0123.N"
    out = E.extract_cited_decisions(text, "C", "")
    assert len(out) == 1
    c = out[0]
    assert c["ecli"] is None
    assert c["date"] == "2015-03-12"
    assert c["case_number"] == "C.15.0123.N"
    assert c["confidence"] == "MEDIUM"


def test_low_region_emits_nothing():
    out = E.extract_cited_decisions("Zie Arr.Cass. 2001, p. 5.", "C", "")
    assert out == []


def test_parse_trigger_date():
    assert E.parse_trigger_date("12 maart 2015") == "2015-03-12"
    assert E.parse_trigger_date("1 janvier 1999") == "1999-01-01"
    assert E.parse_trigger_date("05/03/2022") == "2022-03-05"
    assert E.parse_trigger_date("5.3.99") == "1999-03-05"
    assert E.parse_trigger_date("5.3.12") == "2012-03-05"
    assert E.parse_trigger_date("99/99/9999") is None


def test_treatment_detection():
    assert E.detect_treatment("this was followed by") == "FOLLOWED"
    assert E.detect_treatment("gevolgd door het hof") == "FOLLOWED"
    assert E.detect_treatment("mais distingué en l'espèce") == "DISTINGUISHED"
    assert E.detect_treatment("een revirement van rechtspraak") == "OVERRULED"
    assert E.detect_treatment("neutral mention") == "CITED"


def test_provision_extraction_ids_and_act_dedup():
    text = (
        "En application de l'article 1382 du Code civil, la faute est établie. "
        "Voir aussi l'article 1383 du Code civil et l'article 10 de la Grondwet."
    )
    out = E.extract_cited_provisions(text, "CONV:Y")
    assert len(out) >= 2
    first = out[0]
    assert first["provision_number"] == "1382"
    assert first["internal_provision_id"] == "ART-CONV:Y-001"
    assert first["internal_parent_act_id"] == "ACT-CONV:Y-001"
    # same act ("Code civil") must reuse act_seq 1
    code_civil = [p for p in out if p["parent_act_name"].lower().startswith("code civil")]
    assert len(code_civil) == 2
    assert {p["internal_parent_act_id"] for p in code_civil} == {"ACT-CONV:Y-001"}


def test_provision_dated_law_parses_date_and_type():
    text = "conformément à l'article 3 de la loi du 10 mai 2007 relative à la discrimination, ..."
    out = E.extract_cited_provisions(text, "C")
    assert out
    p = out[0]
    assert p["parent_act_type"] == "LOI"
    assert p["parent_act_date"] == "2007-05-10"
    assert p["parent_act_name"].startswith("loi du 10 mai 2007")


def test_provision_number_key():
    assert E.provision_number_key("1382") == "1382"
    assert E.provision_number_key("31,") == "31"
    assert E.provision_number_key("6.") == "6"


def test_keywords_deterministic():
    text = "alpha alpha alpha beta beta gamma gamma gamma delta the of and"
    kws = E.extract_keywords(text, top_n=3)
    assert kws == ["alpha", "gamma", "beta"]


def test_micro_summary_cap():
    s = E.micro_summary("word " * 100)
    assert len(s) <= 150
