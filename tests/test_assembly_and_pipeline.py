"""Ray-side tests: assembly invariants, schema validation routing, e2e P/R
vs the serial oracle, determinism under repartitioning."""

import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from decisions_knowledge_graph_data_ray import schemas
from decisions_knowledge_graph_data_ray.pipelines.kg import run_kg_pipeline
from decisions_knowledge_graph_data_ray.pipelines.oracle import run_oracle
from decisions_knowledge_graph_data_ray.stages.assemble import (
    assemble_documents,
    assemble_documents_salted,
    explode_documents,
)
from decisions_knowledge_graph_data_ray.stages.extract import ExtractorActor, extract_documents


def _triples_set(ds):
    out = set()
    for b in ds.iter_batches(batch_format="pyarrow"):
        for r in b.to_pylist():
            out.add((r["subj"], r["pred"], r["obj"]))
    return out


def test_assembly_per_turn_text_equality(ray_session, tiny_transcripts):
    """The load-bearing invariant: assemble → explode reproduces every
    (conv_id, turn_idx, role, text) exactly, despite shuffled input order."""
    ds = rd.from_arrow(tiny_transcripts)
    docs = assemble_documents_salted(ds)
    exploded = explode_documents(docs).to_pandas()
    original = tiny_transcripts.select(["conv_id", "turn_idx", "role", "text"]).to_pandas()
    key = ["conv_id", "turn_idx"]
    exploded = exploded.sort_values(key).reset_index(drop=True)
    original = original.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(exploded, original[exploded.columns])


def test_salted_equals_plain_assembly(ray_session, tiny_transcripts):
    ds = rd.from_arrow(tiny_transcripts)
    a = assemble_documents(ds).to_pandas().sort_values("conv_id").reset_index(drop=True)
    b = assemble_documents_salted(ds).to_pandas().sort_values("conv_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b[a.columns])


def test_hot_key_present(tiny_transcripts):
    counts = pd.Series(tiny_transcripts["conv_id"].to_pylist()).value_counts()
    assert counts.iloc[0] >= 50 * counts.median() / 2  # hot key is ~50x median


def test_extraction_schema_validation_routes_failures(ray_session):
    """An extractor that emits schema-invalid output must land in failures
    with reason 'Schema Validation' — the AJV-analogue gate."""

    def broken_extractor(doc):
        return {"conv_id": doc["conv_id"], "self_ecli": "", "cited_provisions": [],
                "cited_decisions": [{"bad": True}], "references": {
                    k: [] for k in ("url_eu", "url_be", "eu_extracted", "eu_verified",
                                    "be_extracted", "be_verified_numac", "be_verified_file_number")},
                "keywords": [], "micro_summary": ""}

    docs = rd.from_items(
        [{"conv_id": "C1", "text": "hello", "self_ecli": ""}]
    )
    out = extract_documents(docs, extract_fn=broken_extractor, concurrency=1).to_pandas()
    assert len(out) == 1
    assert not out["valid"].iloc[0]
    assert out["failure_reason"].iloc[0] == schemas.REASON_SCHEMA_VALIDATION


def test_extractor_crash_routes_request_error(ray_session):
    def crashing(doc):
        raise RuntimeError("boom")

    docs = rd.from_items([{"conv_id": "C1", "text": "x", "self_ecli": ""}])
    out = extract_documents(docs, extract_fn=crashing, concurrency=1).to_pandas()
    assert out["failure_reason"].iloc[0] == schemas.REASON_REQUEST_ERROR
    assert "boom" in out["failure_error"].iloc[0]


def test_extractor_actor_direct_smoke():
    """Actor __init__ exceptions surface late in Ray — smoke it directly."""
    actor = ExtractorActor()
    batch = pa.table({"conv_id": ["C"], "text": ["See ECLI:BE:CASS:2019:ARR.20190101.1, followed."],
                      "self_ecli": [""]})
    out = actor(batch)
    rec = out.to_pylist()[0]
    assert rec["valid"]
    assert rec["cited_decisions"][0]["internal_decision_id"] == "DEC-C-001"


def test_e2e_triples_match_oracle(ray_session, tiny_transcripts, world, oracle_tiny):
    """Set-equality of triples: P/R == 1.0 (gate is >= 0.95)."""
    res = run_kg_pipeline(rd.from_arrow(tiny_transcripts))
    ray_triples = _triples_set(res["triples"])
    oracle_triples = {(t["subj"], t["pred"], t["obj"]) for t in oracle_tiny["triples"]}
    inter = ray_triples & oracle_triples
    precision = len(inter) / max(1, len(ray_triples))
    recall = len(inter) / max(1, len(oracle_triples))
    assert precision >= 0.95 and recall >= 0.95
    assert ray_triples == oracle_triples  # deterministic extractors ⇒ exact
    assert res["failures"].count() == 0


def test_e2e_links_match_oracle(ray_session, tiny_transcripts, oracle_tiny):
    res = run_kg_pipeline(rd.from_arrow(tiny_transcripts))
    got = res["links"].to_pandas()
    got = got.sort_values(["conv_id", "mention_internal_id", "kind"]).reset_index(drop=True)
    want = pd.DataFrame(oracle_tiny["links"])
    want = want.sort_values(["conv_id", "mention_internal_id", "kind"]).reset_index(drop=True)
    want["score"] = want["score"].astype("float").astype(got["score"].dtype, errors="ignore")
    assert len(got) == len(want)
    assert (got["mention_internal_id"] == want["mention_internal_id"]).all()
    assert (got["method"] == want["method"]).all()
    assert got["matched_entity"].fillna("§").tolist() == want["matched_entity"].fillna("§").tolist()


def test_determinism_under_repartition(ray_session, tiny_transcripts):
    """Row shuffling / repartitioning never changes the triple set."""
    ds1 = rd.from_arrow(tiny_transcripts).repartition(13)
    ds2 = rd.from_arrow(tiny_transcripts).random_shuffle(seed=7).repartition(3)
    t1 = _triples_set(run_kg_pipeline(ds1)["triples"])
    t2 = _triples_set(run_kg_pipeline(ds2)["triples"])
    assert t1 == t2


def test_triples_schema(ray_session, tiny_transcripts):
    res = run_kg_pipeline(rd.from_arrow(tiny_transcripts))
    sch = res["triples"].schema()
    assert set(sch.names) == {"subj", "pred", "obj", "conv_id", "score"}


def test_hot_aware_assembly_equals_salted(ray_session, tiny_transcripts):
    """hot-aware routing must reproduce the salted output exactly — both on
    a corpus with no heavy hitters (pure single-shuffle path) and with a
    forced low threshold that routes the hot conversation through the
    salted branch."""
    import pandas as pd
    import ray.data as rd

    from decisions_knowledge_graph_data_ray.stages.assemble import (
        assemble_documents_hot_aware,
        assemble_documents_salted,
    )

    ds = rd.from_arrow(tiny_transcripts)
    want = (
        assemble_documents_salted(ds).to_pandas().sort_values("conv_id").reset_index(drop=True)
    )
    for threshold in (10_000, 100):  # no hot convs / hot conv 0 routed salted
        got = (
            assemble_documents_hot_aware(rd.from_arrow(tiny_transcripts),
                                         hot_threshold=threshold)
            .to_pandas()
            .sort_values("conv_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want)


def test_streamed_pipeline_surfaces_failures_from_fused_pass(ray_session, tiny_transcripts):
    """In the streamed default plan, invalid extractions ride the fused
    output as table='failures' rows — the failures view must be readable
    WITHOUT re-running assemble+extract, and must carry the reason taxonomy.
    Forced here by monkeypatching the extractor to fail for one conv_id."""
    import ray.data as rd2

    from decisions_knowledge_graph_data_ray.pipelines.kg import KGConfig, run_kg_pipeline
    from decisions_knowledge_graph_data_ray.stages import extract as X

    orig = X.extract_document

    def flaky(doc):
        if doc["conv_id"].endswith("0"):
            raise RuntimeError("synthetic failure")
        return orig(doc)

    # inject via the ExtractorActor's default path by passing extract_fn
    # through a config-free pipeline run is not exposed; run the stage pair
    # directly instead: extraction with the flaky fn, then the fused stage
    from decisions_knowledge_graph_data_ray.pipelines.kg import build_index_ref
    from decisions_knowledge_graph_data_ray.stages.assemble import assemble_documents_hot_aware
    from decisions_knowledge_graph_data_ray.stages.extract import extract_documents
    from decisions_knowledge_graph_data_ray.stages.triples import (
        LinkTripleActor,
        fused_failures,
    )

    docs = assemble_documents_hot_aware(rd2.from_arrow(tiny_transcripts))
    extractions = extract_documents(docs, extract_fn=flaky, concurrency=1)
    fused = extractions.map_batches(
        LinkTripleActor,
        fn_constructor_kwargs={"index_ref": build_index_ref()},
        batch_format="pyarrow",
        concurrency=1,
    ).materialize()
    failures = fused_failures(fused).to_pandas()
    assert len(failures) >= 1
    assert all(c.endswith("0") for c in failures["conv_id"])
    assert (failures["failure_reason"] == "Request Error").all()
    assert failures["failure_error"].str.contains("synthetic failure").all()
    # triples still produced for the healthy documents
    n_triples = fused.filter(expr="table == 'triples'").count()
    assert n_triples > 0
