"""Golden tests for CELEX/NUMAC/file-number/URL extraction (F4 / M8)."""

from decisions_knowledge_graph_data_ray.functions import reference_extractor as X


def test_validate_celex():
    assert X.validate_celex("32016R0679")  # GDPR
    assert X.validate_celex("52020DC0066")
    assert not X.validate_celex("32016")  # too short
    assert not X.validate_celex("3X016R0679")  # bad year digit
    assert not X.validate_celex("32616R0679")  # year digit 3 must be 9/0
    assert not X.validate_celex("3201600679")  # type code must be letter
    assert not X.validate_celex("")


def test_validate_numac():
    assert X.validate_numac("2007A23456")  # month letter
    assert X.validate_numac("1995090301")
    assert not X.validate_numac("3007A23456")  # millennium
    assert not X.validate_numac("2107A23456")  # century
    assert not X.validate_numac("2007F23456")  # month indicator F invalid
    assert not X.validate_numac("1788090301")  # year < 1789
    assert not X.validate_numac("2007A2345")  # 9 chars


def test_validate_file_number_calendar_aware():
    assert X.validate_file_number("2024-01-15-02")
    assert X.validate_file_number("2024011502")
    assert not X.validate_file_number("2024-13-15-02")  # month 13
    assert not X.validate_file_number("2023-02-30-01")  # Feb 30
    assert X.validate_file_number("2023-02-29-01")  # ref allows 29 in any year
    assert not X.validate_file_number("2024-00-15-02")  # month 0
    assert not X.validate_file_number("1788-01-15-02")  # year too old


def test_extract_references_full():
    # NOTE: the reference's broken-word collapse glues "NN word" sequences
    # (normalizeText, referenceExtractorN8N.ts:84), so codes must be followed
    # by punctuation to survive — faithful port, exercised here.
    text = (
        "CELEX: 32016R0679 applies. numac 2007A23456. file 2024-01-15-02. "
        "invalid 2024-13-15-02. not in the verified list."
    )
    res = X.extract_references(text)
    assert "32016R0679" in res["eu_verified"]
    assert "2007A23456" in res["be_verified_numac"]
    assert "2024011502" in res["be_verified_file_number"]
    # outputs are sorted + deduplicated
    assert res["be_verified_numac"] == sorted(set(res["be_verified_numac"]))


def test_eli_and_etaamb_numac_sources():
    text = (
        "https://www.ejustice.just.fgov.be/eli/loi/2007/05/10/2007002099 and "
        "https://etaamb.openjustice.be/nl/wet-van-10-mei-2007_n2007002099"
    )
    _, numac, _ = X.extract_reference_candidates(text)
    assert "2007002099" in numac


def test_ejustice_cn_search_file_number():
    text = "https://www.ejustice.just.fgov.be/cgi_loi/x.pl?language=fr&cn_search=2024011502"
    _, _, files = X.extract_reference_candidates(text)
    assert "2024011502" in files


def test_url_gating():
    # europa.eu URL without CELEX content is NOT kept
    res = X.extract_references("see https://europa.eu/something/general for info")
    assert res["url_eu"] == []
    res2 = X.extract_references("see https://eur-lex.europa.eu/legal-content/?uri=CELEX:32016R0679")
    assert len(res2["url_eu"]) == 1


def test_normalize_text_url_despacing():
    broken = "https://etaamb.openjustice.be/nl/wet_n2007002099  trailing"
    assert "etaamb.openjustice.be" in X.normalize_text(broken)


def test_deterministic_year_pin():
    # REFERENCE_YEAR is pinned — future years rejected deterministically
    assert not X.validate_numac(f"{X.REFERENCE_YEAR + 1}012345"[:4] + "A12345")
