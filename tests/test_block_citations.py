"""Block-citation enrichment (Agents 2D/5B analogue): containment rules,
mandatory self-reference ordering, co-occurrence arrays, teaching
relationship validation."""

from __future__ import annotations

import pandas as pd
import pytest

from decisions_knowledge_graph_data_ray.functions.block_citations import (
    enrich_block_citations,
    turns_to_transformed_html,
)
from decisions_knowledge_graph_data_ray.functions.document import extract_document
from decisions_knowledge_graph_data_ray.functions.html import extract_blocks_from_transformed


def _doc(conv_id: str, lines: list[str]) -> dict:
    text = "\n".join(lines)
    return {"conv_id": conv_id, "text": text, "self_ecli": ""}


def _rows(doc: dict) -> list[dict]:
    return enrich_block_citations(doc["conv_id"], doc["text"], extract_document(doc))


class TestBlocks:
    def test_one_block_per_turn_with_sequential_ids(self):
        html = turns_to_transformed_html("C1", "user: bonjour\nassistant: salut")
        blocks = extract_blocks_from_transformed(html)
        assert [b["block_id"] for b in blocks] == ["C1:block-001", "C1:block-002"]
        assert blocks[0]["plain_text"] == "user: bonjour"


class TestProvisionCitations:
    def test_provision_cited_in_its_own_line_block(self):
        doc = _doc(
            "C1",
            [
                "user: que dit l'article 31 du Code civil ?",
                "assistant: rien à signaler ici",
            ],
        )
        rows = [r for r in _rows(doc) if r["kind"] == "provision"]
        assert len(rows) == 1
        assert rows[0]["block_ids"] == "C1:block-001"
        assert rows[0]["n_citations"] == 1
        assert "article 31" in rows[0]["first_snippet"].lower()

    def test_self_reference_is_first_related_provision(self):
        doc = _doc("C1", ["user: l'article 31 du Code civil et l'article 7 du Code civil"])
        rows = {r["entity_id"]: r for r in _rows(doc) if r["kind"] == "provision"}
        for eid, r in rows.items():
            rel = r["related_provision_ids"].split("|")
            assert rel[0] == eid  # mandatory self-reference (schema.ts:71-78)
            assert set(rel) == set(rows)  # co-occurring provision present too

    def test_act_name_disambiguates_blocks(self):
        doc = _doc(
            "C1",
            [
                "user: l'article 31 du Code civil est clair",
                "assistant: l'article 31 de la loi du 15 juin 1935 aussi",
            ],
        )
        rows = [r for r in _rows(doc) if r["kind"] == "provision"]
        assert len(rows) == 2
        by_block = {r["block_ids"] for r in rows}
        # same article number, different acts → different single blocks
        assert by_block == {"C1:block-001", "C1:block-002"}


class TestDecisionAndTeaching:
    def test_decision_matched_by_ecli_and_cooccurrence_with_provision(self):
        doc = _doc(
            "C1",
            [
                "user: voir ECLI:BE:CASS:2019:ARR.20190101.4 et l'article 5 du Code pénal",
            ],
        )
        rows = {r["kind"]: r for r in _rows(doc)}
        dec = rows["decision"]
        assert dec["n_citations"] == 1
        assert dec["related_provision_ids"] != ""  # provision shares the block
        prov = rows["provision"]
        assert dec["entity_id"] in prov["related_decision_ids"].split("|")

    def test_teaching_cites_its_verbatim_block_and_validates_relations(self):
        doc = _doc(
            "C1",
            [
                "user: contexte préalable",
                "assistant: La cour énonce le principe suivant : la charge de la preuve "
                "du manquement incombe à la partie qui l'invoque (article 8 du Code civil)",
            ],
        )
        rows = [r for r in _rows(doc) if r["kind"] == "teaching"]
        assert len(rows) >= 1
        t = rows[0]
        assert t["n_citations"] == 1
        assert t["block_ids"] == "C1:block-002"
        # validation: every surviving related provision has block citations
        cited_provs = {
            r["entity_id"] for r in _rows(doc) if r["kind"] == "provision" and r["n_citations"]
        }
        for pid in filter(None, t["related_provision_ids"].split("|")):
            assert pid in cited_provs


class TestStage:
    def test_stage_over_tiny_corpus(self, ray_session, tiny_transcripts):
        import ray.data as rd

        from decisions_knowledge_graph_data_ray.stages.assemble import (
            assemble_documents_salted,
        )
        from decisions_knowledge_graph_data_ray.stages.enrich import block_citation_rows

        docs = assemble_documents_salted(rd.from_arrow(tiny_transcripts))
        out = block_citation_rows(docs).to_pandas()
        assert set(out["kind"]) <= {"provision", "decision", "teaching"}
        assert len(out) > 0
        # every entity of every kind appears exactly once per document
        assert not out.duplicated(["conv_id", "entity_id"]).any()
        # cited blocks exist and are well-formed
        cited = out[out["n_citations"] > 0]
        assert cited["block_ids"].str.match(r"^CONV:BE:\d{6}:block-\d{3}(\|CONV:BE:\d{6}:block-\d{3})*$").all()
        # provisions always self-reference first
        provs = out[out["kind"] == "provision"]
        assert (
            provs["related_provision_ids"].str.split("|").str[0] == provs["entity_id"]
        ).all()
