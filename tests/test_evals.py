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


def test_parse_judge_response_cascade():
    """gpt5-judge-scorer.ts parsing: code block → brace boundary → error;
    required-field and verdict-enum validation."""
    import json

    import pytest

    from decisions_knowledge_graph_data_ray.evals import parse_judge_response

    full = {
        "verdict": "REVIEW_REQUIRED", "score": 82.5,
        "criticalIssues": [], "majorIssues": ["m1"], "minorIssues": [],
        "recommendation": "REVIEW_MANUALLY", "confidence": "MEDIUM",
        "summary": "mixed",
    }
    # markdown code block
    out = parse_judge_response("preamble\n```json\n" + json.dumps(full) + "\n```")
    assert out["verdict"] == "REVIEW_REQUIRED" and out["score"] == 82.5
    # bare JSON with surrounding prose (brace-boundary path)
    out = parse_judge_response("verdict below\n" + json.dumps(full) + "\nthanks")
    assert out["majorIssues"] == ["m1"]
    # non-list issue fields coerce to [] (parseJudgeResponse behavior)
    loose = dict(full, criticalIssues="not-a-list")
    out = parse_judge_response(json.dumps(loose))
    assert out["criticalIssues"] == []
    # invalid verdict
    with pytest.raises(ValueError, match="Invalid verdict"):
        parse_judge_response(json.dumps(dict(full, verdict="MAYBE")))
    # missing required field (summary alone defaults to '' like the
    # reference's `parsed.summary || ''` — confidence does not)
    bad = {k: v for k, v in full.items() if k != "confidence"}
    with pytest.raises(ValueError, match="Missing required field"):
        parse_judge_response(json.dumps(bad))
    # unparseable
    with pytest.raises(ValueError, match="Failed to parse"):
        parse_judge_response("no json here")


def test_format_judge_prompt_placeholders():
    from decisions_knowledge_graph_data_ray.evals import format_judge_prompt

    tmpl = "id={ecli} lang={proceduralLanguage}\ndoc:{original_document}\nout:{extracted_output}"
    got = format_judge_prompt(tmpl, "conv:1", "the doc", {"keywords": ["k"], "language": "NL"})
    assert "id=conv:1" in got and "lang=NL" in got
    assert "doc:the doc" in got and '"keywords"' in got


def test_llm_judge_actor_rows_and_error_routing(ray_session):
    """A canned judge_fn yields parsed verdict rows; a raising judge yields
    a FAIL row with the error recorded — the pass never dies."""
    import json

    import ray.data as rd

    from decisions_knowledge_graph_data_ray.evals import evaluate_extractor_llm

    docs = rd.from_items(
        [{"conv_id": f"conv:{i}", "text": f"user: hi {i}", "self_ecli": ""} for i in range(3)]
    )

    def judge_fn(prompt):
        if "conv:2" in prompt:
            raise RuntimeError("judge outage")
        return json.dumps(
            {
                "verdict": "PASS", "score": 91, "criticalIssues": [],
                "majorIssues": [], "minorIssues": [], "recommendation": "ACCEPT",
                "confidence": "HIGH", "summary": "ok",
            }
        )

    rows = (
        evaluate_extractor_llm(
            docs, judge_fn, "{ecli}: {original_document} -> {extracted_output}",
            sample_size=None, concurrency=1,
        )
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    assert list(rows["verdict"]) == ["PASS", "PASS", "FAIL"]
    assert rows.loc[2, "judge_error"] and "judge outage" in rows.loc[2, "judge_error"]
    assert rows.loc[0, "score"] == 91.0
