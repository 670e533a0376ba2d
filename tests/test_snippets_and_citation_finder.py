"""Golden tests for snippet extraction (M9) and the citation finder (M10).

The sample texts are the reference's own embedded FR/NL test samples
(provisionSnippetExtractor.ts:112-130).
"""

from decisions_knowledge_graph_data_ray.functions import citation_finder as C
from decisions_knowledge_graph_data_ray.functions import snippet_extractor as S

SAMPLE_FR = """La Cour constate que l'article 31, § 2, alinéa 1er, de la loi du 10 mai 2007
tendant à lutter contre certaines formes de discrimination dispose que le Centre
peut agir en justice.

En application de l'article 1382 du Code civil, toute personne est responsable
du dommage qu'elle cause par sa faute.

Le tribunal rappelle les dispositions de l'article 6, §1 EVRM relatif au droit
à un procès équitable.

La Verordening (EG) nr. 261/2004 betreffende compensatie bij instapweigering
est applicable en l'espèce."""

SAMPLE_NL = """Het hof verwijst naar artikel 174, §1 van de Grondwet en artikel 1322 van het
Burgerlijk Wetboek. De Richtlijn 2004/38/EG inzake vrij verkeer is van toepassing."""


def test_french_sample_finds_all_families():
    snippets = [s.snippet for s in S.extract_candidate_snippets(SAMPLE_FR, 75)]
    assert any("article 31" in s for s in snippets)  # dated law
    assert any("article 1382" in s and "Code" in s for s in snippets)  # code
    assert any("EVRM" in s for s in snippets)  # treaty
    assert any("261/2004" in s for s in snippets)  # EU instrument


def test_dutch_sample():
    snippets = [s.snippet for s in S.extract_candidate_snippets(SAMPLE_NL, 75)]
    assert any("artikel 174" in s for s in snippets)
    assert any("2004/38" in s for s in snippets)


def test_dedupe_keep_first_and_whitespace_normalized():
    text = "article 6, §1 EVRM ... and again article 6, §1 EVRM"
    # identical context → identical normalized snippet → deduped
    res = S.extract_candidate_snippets(text, 5)
    assert len({s.snippet for s in res}) == len(res)
    assert all("\n" not in s.snippet for s in res)


# ---------------------------------------------------------------------------
# citation finder
# ---------------------------------------------------------------------------


def test_ecli_with_flexible_spacing():
    md = "the court in ECLI : BE : CASS : 2019 : ARR.20190101.1 held that..."
    res = C.find_citation_snippet(md, None, None, None, "ECLI:BE:CASS:2019:ARR.20190101.1")
    assert res["matched_on"] == "ECLI"
    assert res["position"] == md.index("ECLI")


def test_case_number_flexible_separators():
    md = "arrest nr. C 17 0234 F van het hof"
    res = C.find_citation_snippet(md, None, None, "C.17.0234.F", None)
    assert res["matched_on"] == "CASE_NUMBER"


def test_court_date_within_window():
    md = "De zaak werd beslist door het Hof van Cassatie op 15 maart 2022 na beraad."
    res = C.find_citation_snippet(md, "Hof van Cassatie", "2022-03-15", None, None)
    assert res["matched_on"] == "COURT_DATE"


def test_court_only_fallback():
    md = "Het Hof van Cassatie oordeelde anders."
    res = C.find_citation_snippet(md, "Hof van Cassatie", "1999-01-01", None, None)
    assert res["matched_on"] == "COURT_ONLY"


def test_not_found_and_null_text():
    assert C.find_citation_snippet("nothing here", "Onbekend Hof", None, None, None)["snippet"] is None
    assert C.find_citation_snippet(None, "X", None, None, None) == {
        "snippet": None,
        "matched_on": None,
        "position": None,
    }


def test_date_patterns_flexible_padding():
    pats = C.build_date_patterns("2022-03-05")
    texts = ["5 mars 2022", "05/03/2022", "5-3-2022", "05.03.22"]
    for t in texts:
        assert any(p.search(t) for p in pats), t


def test_snippet_sentence_alignment_and_ellipses():
    md = ("A first sentence here. " * 30) + "The C.17.0234.F citation. " + ("Tail text. " * 30)
    res = C.find_citation_snippet(md, None, None, "C.17.0234.F", None)
    assert res["snippet"].startswith("...")
    assert res["snippet"].endswith("...")
    assert "C.17.0234.F" in res["snippet"]
