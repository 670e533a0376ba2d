"""Escalation routing (failed rows → fallback extractor pool) and M14
act-name translation."""

import ray.data as rd

from decisions_knowledge_graph_data_ray.functions.document import extract_document
from decisions_knowledge_graph_data_ray.functions.linking import (
    looks_dutch,
    looks_german,
    translate_act_name_to_french,
)
from decisions_knowledge_graph_data_ray.stages.extract import extract_with_escalation


def test_translate_act_name():
    assert translate_act_name_to_french("Burgerlijk Wetboek") == "code civil"
    assert translate_act_name_to_french("wet van 10 mei 2007") == "loi du 10 mai 2007"
    assert translate_act_name_to_french("Grondwet") == "constitution"
    assert translate_act_name_to_french("") == ""
    # memoized: repeated call returns identical object semantics
    assert translate_act_name_to_french("Strafwetboek") == translate_act_name_to_french(
        "Strafwetboek"
    )


def test_translate_act_name_extended_vocab():
    assert (
        translate_act_name_to_french("Decreet van 18 juli 2003 betreffende het waterbeleid")
        == "décret du 18 juillet 2003 relatif à het waterbeleid"
    )
    assert (
        translate_act_name_to_french("Koninklijk besluit van 25 augustus 2012")
        == "arrêté royal du 25 août 2012"
    )
    assert (
        translate_act_name_to_french("wet houdende diverse bepalingen")
        == "loi portant diverse bepalingen"
    )


def test_translate_act_name_german():
    assert translate_act_name_to_french("Gesetz vom 31. Dezember 1983") == (
        "loi du 31. décembre 1983"
    )
    assert translate_act_name_to_french("Strafgesetzbuch") == "code pénal"


def test_looks_dutch():
    assert looks_dutch("Burgerlijk Wetboek")
    assert looks_dutch("wet van 10 mei 2007")
    assert not looks_dutch("Code civil")


def test_looks_german():
    assert looks_german("Gesetz vom 31. Dezember 1983")
    assert not looks_german("Code civil")


def test_escalation_routes_failures_to_fallback(ray_session):
    """Primary crashes on some docs; the fallback (real extractor) rescues
    them; union covers every document exactly once."""

    def flaky_primary(doc):
        if doc["conv_id"].endswith(("1", "3")):
            raise RuntimeError("primary model failure")
        return extract_document(doc)

    docs = rd.from_items(
        [
            {"conv_id": f"C{i}", "text": "En application de l'article 1382 du Code civil.", "self_ecli": ""}
            for i in range(6)
        ]
    )
    out = extract_with_escalation(docs, primary_fn=flaky_primary).to_pandas()
    assert len(out) == 6
    assert sorted(out["conv_id"]) == [f"C{i}" for i in range(6)]
    assert out["valid"].all()  # fallback (default extractor) rescued C1/C3


def test_escalation_no_failures_short_circuit(ray_session):
    docs = rd.from_items(
        [{"conv_id": "A", "text": "plain text with nothing special", "self_ecli": ""}]
    )
    out = extract_with_escalation(docs).to_pandas()
    assert len(out) == 1 and out["valid"].all()


def test_escalation_double_failure_stays_failed(ray_session):
    def always_fail(doc):
        raise RuntimeError("nope")

    docs = rd.from_items([{"conv_id": "A", "text": "x", "self_ecli": ""}])
    out = extract_with_escalation(docs, primary_fn=always_fail, fallback_fn=always_fail).to_pandas()
    assert len(out) == 1
    assert not out["valid"].iloc[0]
