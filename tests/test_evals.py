"""Eval harness: fixed-corpus deterministic judge (evals/types.ts:10-63,
evaluation-runner.ts:47-120 analogue). The shipped extractor must score
P/R 1.0 / all PASS; a deliberately degraded extractor must be caught with
missing / hallucinated counts and FAIL/REVIEW verdicts."""

import ray.data as rd

from decisions_knowledge_graph_data_ray.evals import (
    evaluate_extractor,
    judge_document,
    summarize_evaluation,
)
from decisions_knowledge_graph_data_ray.functions.document import extract_document
from decisions_knowledge_graph_data_ray.sources.transcripts import generate_transcripts_table
from decisions_knowledge_graph_data_ray.stages.assemble import assemble_documents_salted


def _docs(n=25):
    return assemble_documents_salted(rd.from_arrow(generate_transcripts_table(n)))


def test_judge_document_counts():
    doc = {
        "conv_id": "C1",
        "text": "assistant: En application de l'article 1382 du Code civil, la cour décide.",
        "self_ecli": "",
    }
    expected = extract_document(doc)
    # candidate drops the provision and hallucinates a keyword
    cand = dict(expected)
    cand["cited_provisions"] = []
    cand["keywords"] = expected["keywords"] + ["bogus"]
    rows = {r["dimension"]: r for r in judge_document(expected, cand)}
    assert rows["provisions"]["missing"] == 1
    assert rows["provisions"]["verdict"] == "FAIL"
    assert rows["keywords"]["hallucinated"] == 1
    assert rows["keywords"]["verdict"] in ("REVIEW_REQUIRED", "FAIL")
    assert rows["decisions"]["verdict"] == "PASS"


def test_reference_extractor_scores_perfect(ray_session):
    report = summarize_evaluation(evaluate_extractor(_docs(), sample_size=25))
    assert report["pass_rate"] == 1.0
    for dim, stats in report["dimensions"].items():
        assert stats["precision"] == 1.0 and stats["recall"] == 1.0, dim


def test_broken_extractor_is_caught(ray_session):
    def broken(doc):
        rec = extract_document(doc)
        rec["cited_provisions"] = rec["cited_provisions"][::2]
        rec["keywords"] = rec["keywords"] + ["hallucinated-term"]
        return rec

    report = summarize_evaluation(
        evaluate_extractor(_docs(), candidate_fn=broken, sample_size=25)
    )
    assert report["pass_rate"] < 1.0
    assert report["dimensions"]["provisions"]["recall"] < 1.0
    assert report["dimensions"]["keywords"]["precision"] < 1.0
    # untouched dimensions stay clean
    assert report["dimensions"]["decisions"]["precision"] == 1.0


def test_crashing_extractor_yields_error_rows(ray_session):
    def crashing(doc):
        raise RuntimeError("model down")

    df = evaluate_extractor(_docs(5), candidate_fn=crashing, sample_size=5).to_pandas()
    assert (df[df["dimension"] == "__error__"]["verdict"] == "FAIL").all()
    assert len(df[df["dimension"] == "__error__"]) == 5


def test_csv_testset_roundtrip(ray_session, tmp_path):
    from decisions_knowledge_graph_data_ray.evals import (
        load_testset_ids,
        summarize_evaluation,
        write_testset_csv,
    )

    docs = _docs(30)
    path = str(tmp_path / "testset.csv")
    n = write_testset_csv(docs, path, n=10)
    assert n == 10
    ids = load_testset_ids(path)
    assert len(ids) == 10 and all(i.startswith("CONV:BE:") for i in ids)
    # evaluation restricted to the CSV test set
    report = summarize_evaluation(
        evaluate_extractor(docs, testset_csv=path, sample_size=None)
    )
    assert report["n_documents"] == 10
    assert report["pass_rate"] == 1.0
