"""Golden unit tests for the scalar normalizers (SURVEY.md §2.8, FIXTURES F4)."""

from decisions_knowledge_graph_data_ray.functions import normalize as N


def test_normalize_string():
    assert N.normalize_string("  Code CIVIL  ") == "code civil"
    assert N.normalize_string(None) == ""
    assert N.normalize_string("") == ""


def test_normalize_court_name():
    assert N.normalize_court_name("Cour  de   cassation ") == "cour de cassation"
    assert N.normalize_court_name("Conseil d’État") == "conseil d'état"
    assert N.normalize_court_name(None) == ""


def test_map_to_citation_type():
    assert N.map_to_citation_type("LOI") == "LAW"
    assert N.map_to_citation_type("wet") == "LAW"
    assert N.map_to_citation_type("DECREET") == "DECREE"
    assert N.map_to_citation_type("KONINKLIJK_BESLUIT") == "ROYAL_DECREE"
    assert N.map_to_citation_type("ARRETE_GOUVERNEMENT") == "GOVERNMENT_DECREE"
    assert N.map_to_citation_type("MINISTERIEEL_BESLUIT") == "MINISTERIAL_DECREE"
    assert N.map_to_citation_type("LOIS_COORDONNEES") == "COORDINATED"
    assert N.map_to_citation_type("whatever") == "OTHER"
    assert N.map_to_citation_type(None) == "OTHER"


def test_map_to_document_type():
    assert N.map_to_document_type("WET") == ["LOI"]
    assert N.map_to_document_type("ORDONNANTIE") == ["ORDONNANCE"]
    assert N.map_to_document_type("BESLUIT_VAN_DE_REGERING") == ["ARRETE"]
    assert N.map_to_document_type("GRONDWET") == ["CONSTITUTION"]
    assert N.map_to_document_type("???") == ["unknown"]


def test_format_date():
    import datetime

    assert N.format_date("2024-01-15") == "2024-01-15"
    assert N.format_date("2024-01-15T23:59:59") == "2024-01-15"
    assert N.format_date(datetime.date(1999, 2, 3)) == "1999-02-03"
    assert N.format_date(datetime.datetime(1999, 2, 3, 12, 0)) == "1999-02-03"
    assert N.format_date(None) == ""
    assert N.format_date("not a date") == ""


def test_extract_date_from_ecli():
    assert N.extract_date_from_ecli("ECLI:BE:CASS:2019:ARR.20190101.1") == "2019-01-01"
    assert N.extract_date_from_ecli("ECLI:BE:CASS:2019:XYZ") is None
    assert N.extract_date_from_ecli("not-an-ecli") is None
    assert N.extract_date_from_ecli(None) is None
    assert N.extract_date_from_ecli("ECLI:BE:CASS") is None


def test_sanitize_filename_short():
    assert N.sanitize_filename("ECLI:BE:CASS:2024:ARR.1_FR") == "ECLI_BE_CASS_2024_ARR.1_FR"


def test_sanitize_filename_long_hash_suffix():
    name = "X" * 250 + ":end"
    out = N.sanitize_filename(name)
    assert len(out) <= 200
    assert out.startswith("X" * 190 + "_")
    # deterministic hash suffix (JS 32-bit string hash)
    assert out == N.sanitize_filename(name)


def test_js_string_hash_known_values():
    # h = h*31 + ord(c), int32 wrap — "abc" → 96354 (classic Java/JS value)
    assert N.js_string_hash("abc") == 96354
    assert N.js_string_hash("") == 0


def test_pads():
    assert N.pad3(7) == "007"
    assert N.pad3(1234) == "1234"
    assert N.pad4(7) == "0007"


def test_length_category():
    assert N.length_category(None) == "unknown"
    assert N.length_category(0) == "unknown"
    assert N.length_category(9_999) == "short"
    assert N.length_category(10_000) == "medium"
    assert N.length_category(29_999) == "medium"
    assert N.length_category(30_000) == "long"
    assert N.length_category(60_000) == "very_long"


def test_trigram_similarity():
    assert N.trigram_similarity("code civil", "code civil") == 1.0
    assert N.trigram_similarity("", "x") == 0.0
    a = N.trigram_similarity("loi du 10 mai 2007", "Loi du 10 mai 2007 relative à la discrimination")
    assert 0.0 < a < 1.0


def test_estimate_tokens():
    assert N.estimate_tokens("") == 0
    assert N.estimate_tokens("abcd") == 1
    assert N.estimate_tokens("abcde") == 2


def test_stable_hash32_is_stable():
    assert N.stable_hash32("CONV:BE:000001") == N.stable_hash32("CONV:BE:000001")
    assert 0 <= N.stable_hash32("x") < 2**32
