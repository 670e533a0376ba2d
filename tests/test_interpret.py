"""Agent-2C interpretation rules (functions/interpret): positive markers,
the null taxonomy (formal citation / party argument / quotation / too
brief), length clamps, and the sequence-keyed join protocol."""

from __future__ import annotations

from decisions_knowledge_graph_data_ray.functions.interpret import (
    interpret_provision,
    interpret_provisions,
    split_sentences,
)


def _one(text: str, num: str = "2") -> dict:
    return interpret_provision(split_sentences(text), num)


PAD = " la cour précise encore la portée exacte de cette exigence en droit interne."


class TestPositive:
    def test_meaning_marker_extracts(self):
        s = "La cour estime que l'article 2 impose une obligation stricte" + PAD
        out = _one(s)
        assert out["provision_interpretation"] is not None
        assert out["provision_interpretation"].startswith("La cour estime")

    def test_scope_marker_nl(self):
        s = ("Uit artikel 2 volgt dat de werkgever de bewijslast draagt voor elke "
             "tekortkoming die hij aanvoert tegen de werknemer in deze procedure.")
        assert _one(s)["provision_interpretation"] is not None

    def test_factual_context_requires_provision_mention(self):
        good = ("en l'espèce, l'application de l'article 2 n'était pas justifiée "
                "par le juge du fond.")
        assert _one(good)["relevant_factual_context"] is not None
        bare = "en l'espèce, la demande est rejetée pour d'autres motifs déjà exposés."
        assert _one(bare)["relevant_factual_context"] is None

    def test_interpretation_clamped_to_1000(self):
        s = "La cour estime que l'article 2 impose " + "une obligation très stricte " * 60
        out = _one(s.strip())
        assert out["provision_interpretation"] is not None
        assert len(out["provision_interpretation"]) <= 1000


class TestNullTaxonomy:
    def test_formal_citation_null(self):
        assert _one("Vu l'article 2 de la loi du 3 juillet 1978, la cour statue" + PAD)[
            "provision_interpretation"
        ] is None

    def test_party_argument_null(self):
        s = "La demanderesse soutient que l'article 2 signifie que le contrat est nul" + PAD
        assert _one(s)["provision_interpretation"] is None

    def test_too_brief_null(self):
        assert _one("L'article 2 signifie que c'est nul.")["provision_interpretation"] is None

    def test_mere_usage_null(self):
        s = "Sur la base de l'article 2, la cour ordonne la réouverture des débats" + PAD
        assert _one(s)["provision_interpretation"] is None

    def test_wrong_article_number_null(self):
        s = "La cour estime que l'article 23 impose une obligation stricte" + PAD
        assert _one(s, num="2")["provision_interpretation"] is None


class TestJoinProtocol:
    def test_rows_keyed_by_sequence(self):
        text = ("user: conformément à l'article 2 de la loi du 3 juillet 1978, le moyen "
                "est fondé. La cour estime que l'article 2 impose une obligation stricte "
                "dont la méconnaissance entraîne la cassation de la décision attaquée; "
                "en l'espèce, l'application de l'article 2 n'était pas justifiée par le "
                "juge du fond.")
        provisions = [
            {"provision_seq": 1, "provision_number": "2"},
            {"provision_seq": 2, "provision_number": "99"},
        ]
        rows = interpret_provisions(text, provisions)
        assert [r["provision_seq"] for r in rows] == [1, 2]
        assert rows[0]["provision_interpretation"] is not None
        assert rows[0]["relevant_factual_context"] is not None
        assert rows[1]["provision_interpretation"] is None


class TestCorpus:
    def test_corpus_yields_nonnull_interpretations(self, ray_session, tiny_transcripts):
        import ray.data as rd

        from decisions_knowledge_graph_data_ray.functions.extract import (
            extract_cited_provisions,
        )
        from decisions_knowledge_graph_data_ray.stages.assemble import (
            assemble_documents_salted,
        )

        docs = assemble_documents_salted(rd.from_arrow(tiny_transcripts)).to_pandas()
        n_interp = 0
        n_total = 0
        for _, row in docs.iterrows():
            provs = extract_cited_provisions(row["text"], row["conv_id"])
            rows = interpret_provisions(row["text"], provs)
            n_total += len(rows)
            n_interp += sum(1 for r in rows if r["provision_interpretation"])
        assert n_total > 0
        assert 0 < n_interp < n_total  # null-heavy by design, but not all-null
