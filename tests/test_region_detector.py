"""Golden tests for the citation-region detector (FIXTURES.md F4 / M7)."""

from decisions_knowledge_graph_data_ray.functions import region_detector as R


def test_ecli_trigger_high_confidence():
    text = "As held in ECLI:BE:CASS:2019:ARR.20190101.1, the claim fails."
    regions = R.detect_citation_regions(text, "ECLI:BE:XXXX:2000:NONE")
    assert len(regions) == 1
    r = regions[0]
    assert r.confidence == "HIGH"
    assert r.trigger_type == "ECLI"
    assert r.jurisdiction == "BE"
    assert any(t.type == "ECLI" and t.text == "ECLI:BE:CASS:2019:ARR.20190101.1" for t in r.triggers)


def test_self_ecli_filtered():
    self_id = "ECLI:BE:CASS:2019:ARR.20190101.1"
    text = f"This case {self_id} follows earlier rulings."
    regions = R.detect_citation_regions(text, self_id)
    assert all(t.type != "ECLI" for r in regions for t in r.triggers)


def test_spaced_ecli_normalized_and_deduped():
    # faithful to the reference: [A-Z0-9.\-]+ greedily eats a sentence-ending
    # dot, so the second occurrence yields a '...1.' variant; the spaced one
    # normalizes clean; exact-string dedupe keeps both distinct forms
    text = "See ECLI : BE : CASS : 2019 : ARR.20190101.1 and ECLI:BE:CASS:2019:ARR.20190101.1."
    regions = R.detect_citation_regions(text, "")
    eclis = {t.text for r in regions for t in r.triggers if t.type == "ECLI"}
    assert eclis == {
        "ECLI:BE:CASS:2019:ARR.20190101.1",
        "ECLI:BE:CASS:2019:ARR.20190101.1.",
    }
    # mid-sentence (comma-followed) ECLI is extracted clean
    clean = R.detect_citation_regions("See ECLI:BE:CASS:2019:ARR.20190101.1, followed.", "")
    assert [t.text for r in clean for t in r.triggers if t.type == "ECLI"] == [
        "ECLI:BE:CASS:2019:ARR.20190101.1"
    ]


def test_court_and_date_medium_confidence():
    text = "zoals beslist door het Hof van Cassatie op 12 maart 2015 in deze zaak"
    regions = R.detect_citation_regions(text, "")
    assert len(regions) == 1
    assert regions[0].confidence == "MEDIUM"
    assert regions[0].trigger_type == "COURT_KEYWORD"
    assert regions[0].jurisdiction == "BE"


def test_case_number_trigger():
    text = "In case C.17.0234.F the court decided differently." + " " * 600 + "unrelated"
    regions = R.detect_citation_regions(text, "")
    hits = [t for r in regions for t in r.triggers if t.type == "CASE_NUMBER"]
    assert any(t.text == "C.17.0234.F" for t in hits)


def test_paragraph_reference_excluded():
    text = "Zie B.12.3 en § 4 hierboven."  # paragraph refs, not case numbers
    regions = R.detect_citation_regions(text, "")
    assert all(t.type != "CASE_NUMBER" for r in regions for t in r.triggers)


def test_biblio_trigger_low_confidence():
    text = "Zie Arr.Cass. 2001, p. 15."
    regions = R.detect_citation_regions(text, "")
    assert len(regions) == 1
    # 'Arr. Cass' also matches a COURT pattern → still no DATE → LOW
    assert regions[0].confidence == "LOW"


def test_cluster_merge_and_split_at_500():
    base = "Cass. 12 maart 2015"
    # 400 chars apart → same cluster; 900 apart → separate clusters
    merged = base + ("x" * 400) + "GwH 1 april 2016"
    split = base + ("x" * 900) + "GwH 1 april 2016"
    assert len(R.detect_citation_regions(merged, "")) == 1
    assert len(R.detect_citation_regions(split, "")) == 2


def test_window_is_1200_chars_max():
    text = "y" * 3000 + " ECLI:BE:CASS:2019:ARR.20190101.1 " + "z" * 3000
    regions = R.detect_citation_regions(text, "")
    assert len(regions) == 1
    assert len(regions[0].text) <= 1200


def test_jurisdiction_from_ecli_codes():
    assert R.jurisdiction_from_ecli("ECLI:EU:C:2020:123") == "EU"
    assert R.jurisdiction_from_ecli("ECLI:CE:X:2020:1") == "EU"
    assert R.jurisdiction_from_ecli("ECLI:XX:Y:2020:1") == "INT"
    assert R.jurisdiction_from_ecli("ECLI:FR:CASS:2020:1") == "UNKNOWN"
    assert R.jurisdiction_from_ecli("garbage") == "UNKNOWN"


def test_jurisdiction_from_court_fallbacks():
    assert R.jurisdiction_from_court("Cour de cassation") == "BE"
    assert R.jurisdiction_from_court("CJUE") == "EU"
    assert R.jurisdiction_from_court("CEDH") == "INT"
    # location fallback
    assert R.jurisdiction_from_court("rechtbank te Antwerpen") == "BE"
    assert R.jurisdiction_from_court("Unknown forum") == "UNKNOWN"


def test_negative_control_no_triggers():
    text = (
        "Please summarize the procedural history and outline the remaining "
        "obligations for each party in plain language."
    )
    assert R.detect_citation_regions(text, "") == []
