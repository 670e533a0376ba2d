"""Evaluation harness: fixed-corpus extractor scoring with a deterministic judge.

Rebuilds the reference's eval layer (/root/reference/evals/types.ts:10-63,
evals/runners/evaluation-runner.ts:47-120) Ray-Data-first:

  - a FIXED eval corpus (the first ``sample_size`` conversations of the
    deterministic synthetic corpus — the analogue of the reference's
    197-decision ground-truth set);
  - a per-document, per-dimension judge producing
    ``{expected, extracted, matched, missing, hallucinated}`` counts plus a
    0-100 score and a PASS / FAIL / REVIEW_REQUIRED verdict with an
    ACCEPT / REJECT / REVIEW_MANUALLY recommendation (types.ts:10-63);
  - the judge is DETERMINISTIC: ground truth comes from the engine's serial
    reference extractor (functions/document.extract_document) run beside the
    candidate in the same batch — no network judge, same semantics.

Run it over any candidate ``extract_fn`` (e.g. a new LLM extractor) to get
the per-dimension precision/recall gate the reference's judges provide.
Distributed shape: one actor-pool ``map_batches`` pass over assembled
documents; both extractors and the judge run co-resident per batch, so the
eval of a 10^12-turn corpus shuffles nothing but the verdict rows.
"""

from __future__ import annotations

from typing import Callable

import pyarrow as pa

import ray.data

from .functions.document import extract_document
from .functions.normalize import normalize_string

VERDICTS = ("PASS", "FAIL", "REVIEW_REQUIRED")
EVAL_SAMPLE_SIZE = 197  # mirrors the reference's 197-decision eval corpus


def _provision_keys(rec: dict) -> set:
    return {
        (p["provision_number_key"], normalize_string(p["parent_act_name"]))
        for p in rec.get("cited_provisions", [])
    }


def _decision_keys(rec: dict) -> set:
    return {
        (d.get("ecli"), d.get("court_name"), d.get("date"), d.get("case_number"))
        for d in rec.get("cited_decisions", [])
    }


def _teaching_keys(rec: dict) -> set:
    return {t["court_verbatim"] for t in rec.get("legal_teachings", [])}


def _party_keys(rec: dict) -> set:
    return {(p["name"], p["procedural_role"]) for p in rec.get("parties", [])}


def _keyword_keys(rec: dict) -> set:
    return set(rec.get("keywords", []))


def _outcome_keys(rec: dict) -> set:
    out = rec.get("outcome", "")
    return {out} if out else set()


DIMENSIONS: dict[str, Callable[[dict], set]] = {
    "provisions": _provision_keys,
    "decisions": _decision_keys,
    "teachings": _teaching_keys,
    "parties": _party_keys,
    "keywords": _keyword_keys,
    "outcome": _outcome_keys,
}


def judge_document(expected: dict, extracted: dict, dimensions=None) -> list[dict]:
    """Deterministic judge: one verdict row per evaluated dimension
    (types.ts counts block: expected/extracted/matched/missing/hallucinated)."""
    dims = dimensions or list(DIMENSIONS)
    rows = []
    for dim in dims:
        key_fn = DIMENSIONS[dim]
        want, got = key_fn(expected), key_fn(extracted)
        matched = want & got
        missing = want - got
        hallucinated = got - want
        denom = len(want | got)
        score = 100.0 if denom == 0 else round(100.0 * len(matched) / denom, 2)
        if not missing and not hallucinated:
            verdict, recommendation = "PASS", "ACCEPT"
        elif score >= 80.0:
            verdict, recommendation = "REVIEW_REQUIRED", "REVIEW_MANUALLY"
        else:
            verdict, recommendation = "FAIL", "REJECT"
        rows.append(
            {
                "conv_id": expected["conv_id"],
                "dimension": dim,
                "expected": len(want),
                "extracted": len(got),
                "matched": len(matched),
                "missing": len(missing),
                "hallucinated": len(hallucinated),
                "score": score,
                "verdict": verdict,
                "recommendation": recommendation,
                "missing_samples": "; ".join(sorted(str(m) for m in missing)[:3]),
                "hallucinated_samples": "; ".join(sorted(str(h) for h in hallucinated)[:3]),
            }
        )
    return rows


_EVAL_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("dimension", pa.string()),
        ("expected", pa.int64()),
        ("extracted", pa.int64()),
        ("matched", pa.int64()),
        ("missing", pa.int64()),
        ("hallucinated", pa.int64()),
        ("score", pa.float64()),
        ("verdict", pa.string()),
        ("recommendation", pa.string()),
        ("missing_samples", pa.string()),
        ("hallucinated_samples", pa.string()),
    ]
)


class JudgeActor:
    """Ground-truth extractor + candidate extractor + judge, co-resident:
    the eval pass shuffles only verdict rows."""

    def __init__(self, candidate_fn=None, reference_fn=None, dimensions=None):
        self._candidate = candidate_fn or extract_document
        self._reference = reference_fn or extract_document
        self._dimensions = dimensions

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        for rec in batch.to_pylist():
            doc = {"conv_id": rec["conv_id"], "text": rec["text"],
                   "self_ecli": rec.get("self_ecli", "")}
            expected = self._reference(doc)
            try:
                extracted = self._candidate(doc)
            except Exception as e:
                extracted = {"conv_id": doc["conv_id"]}  # total extraction loss
                rows.append(
                    {
                        "conv_id": doc["conv_id"], "dimension": "__error__",
                        "expected": 0, "extracted": 0, "matched": 0,
                        "missing": 0, "hallucinated": 0, "score": 0.0,
                        "verdict": "FAIL", "recommendation": "REJECT",
                        "missing_samples": "", "hallucinated_samples": str(e)[:200],
                    }
                )
            rows.extend(judge_document(expected, extracted, self._dimensions))
        return pa.Table.from_pylist(rows, schema=_EVAL_SCHEMA)


def write_testset_csv(docs: ray.data.Dataset, path: str, n: int = EVAL_SAMPLE_SIZE) -> int:
    """Persist the fixed eval corpus as a CSV test-set file (S9 — the
    reference's CSV test-set loader surface). One row per document:
    conv_id,text_len. Returns the row count."""
    import csv

    rows = docs.sort("conv_id").limit(n).select_columns(["conv_id", "text"]).take_all()
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["conv_id", "text_len"])
        for r in rows:
            w.writerow([r["conv_id"], len(r["text"])])
    return len(rows)


def load_testset_ids(path: str) -> set[str]:
    """CSV test-set → conv_id set (stock ray.data.read_csv)."""
    ds = ray.data.read_csv(path)
    return {r["conv_id"] for r in ds.take_all()}


def evaluate_extractor(
    docs: ray.data.Dataset,
    candidate_fn=None,
    reference_fn=None,
    dimensions=None,
    sample_size: int | None = EVAL_SAMPLE_SIZE,
    concurrency: int | tuple = (1, 8),
    testset_csv: str | None = None,
) -> ray.data.Dataset:
    """Per-(document, dimension) verdict rows for a candidate extractor over
    the fixed eval corpus (first ``sample_size`` docs by conv_id, or the
    conv_ids named in ``testset_csv``)."""
    if testset_csv:
        import ray as _ray

        ids_ref = _ray.put(load_testset_ids(testset_csv))

        def _in_testset(batch: pa.Table) -> pa.Table:
            ids = _ray.get(ids_ref)
            mask = pa.array([c in ids for c in batch["conv_id"].to_pylist()])
            return batch.filter(mask)

        docs = docs.map_batches(_in_testset, batch_format="pyarrow")
    elif sample_size:
        docs = docs.sort("conv_id").limit(sample_size)
    return docs.map_batches(
        JudgeActor,
        fn_constructor_kwargs={
            "candidate_fn": candidate_fn,
            "reference_fn": reference_fn,
            "dimensions": dimensions,
        },
        batch_format="pyarrow",
        batch_size=32,
        concurrency=concurrency,
    )


# ---------------------------------------------------------------------------
# LLM-judge variant (evals/scorers/gpt5-judge-scorer.ts,
# claude-judge-scorer.ts + evals/utils/prompt-loader.ts): an injectable
# text-completion client scores each (document, extraction) pair and returns
# the reference's EvaluationResult protocol. Compose the client with
# stages.rate_limit.RateLimitedClient for the 429/backoff envelope and
# stages.http_provider.OpenAICompatibleClient for a real HTTP judge.
# ---------------------------------------------------------------------------

JUDGE_REQUIRED_FIELDS = (
    "verdict", "score", "criticalIssues", "majorIssues", "minorIssues",
    "recommendation", "confidence", "summary",
)  # gpt5-judge-scorer.ts validateEvaluationResult:186-204


def format_judge_prompt(template: str, decision_id: str, document: str, extracted: dict) -> str:
    """prompt-loader.ts formatJudgePrompt common replacements (:217-238):
    single-occurrence replace of {original_document}, {extracted_output}
    (pretty JSON), {ecli}, {proceduralLanguage}."""
    import json as _json

    language = extracted.get("language") or extracted.get("language_metadata") or "FR"
    return (
        template.replace("{original_document}", document, 1)
        .replace("{extracted_output}", _json.dumps(extracted, indent=2, default=str), 1)
        .replace("{ecli}", decision_id, 1)
        .replace("{proceduralLanguage}", str(language), 1)
    )


def parse_judge_response(response_text: str) -> dict:
    """gpt5-judge-scorer.ts parseJudgeResponse (:96-180): JSON from a
    ```json code block, else the outermost {...} span, else raise; then the
    required-field + verdict-enum validation (validateEvaluationResult)."""
    import json as _json
    import re as _re

    text = response_text.strip()
    m = _re.search(r"```(?:json)?\s*(\{[\s\S]*?\})\s*```", text)
    if m:
        text = m.group(1)
    else:
        m = _re.search(r"\{[\s\S]*\}", text)
        if m:
            text = m.group(0)
    try:
        parsed = _json.loads(text)
    except _json.JSONDecodeError as e:
        raise ValueError(
            f"Failed to parse judge response as JSON: {e}\n"
            f"Response preview: {response_text[:500]}..."
        ) from e
    evaluation = {
        "verdict": parsed.get("verdict"),
        "score": float(parsed["score"]) if "score" in parsed else None,
        "criticalIssues": parsed.get("criticalIssues") if isinstance(parsed.get("criticalIssues"), list) else [],
        "majorIssues": parsed.get("majorIssues") if isinstance(parsed.get("majorIssues"), list) else [],
        "minorIssues": parsed.get("minorIssues") if isinstance(parsed.get("minorIssues"), list) else [],
        "recommendation": parsed.get("recommendation"),
        "confidence": parsed.get("confidence"),
        "summary": parsed.get("summary") or "",
    }
    for field in JUDGE_REQUIRED_FIELDS:
        if evaluation.get(field) is None:
            raise ValueError(f"Missing required field in evaluation: {field}")
    if evaluation["verdict"] not in VERDICTS:
        raise ValueError(
            f"Invalid verdict: {evaluation['verdict']}. Must be one of: {', '.join(VERDICTS)}"
        )
    return evaluation


_LLM_JUDGE_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("verdict", pa.string()),
        ("score", pa.float64()),
        ("recommendation", pa.string()),
        ("confidence", pa.string()),
        ("n_critical", pa.int64()),
        ("n_major", pa.int64()),
        ("n_minor", pa.int64()),
        ("summary", pa.string()),
        ("judge_error", pa.string()),
    ]
)


class LLMJudgeActor:
    """Candidate extractor + LLM judge, co-resident per batch: the judge
    pass shuffles only verdict rows (same distributed shape as JudgeActor).

    ``judge_fn``: ``prompt str → response text str`` — any injectable
    client (e.g. ``RateLimitedClient(llm_text_fn(OpenAICompatibleClient(
    ...)), limiter=bucket)``). A judge call that raises after its retry
    envelope yields a FAIL row with the error recorded — one bad document
    never kills the eval pass."""

    def __init__(self, judge_fn, prompt_template: str, candidate_fn=None):
        self._judge = judge_fn
        self._template = prompt_template
        self._candidate = candidate_fn or extract_document

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        for rec in batch.to_pylist():
            doc = {"conv_id": rec["conv_id"], "text": rec["text"],
                   "self_ecli": rec.get("self_ecli", "")}
            extracted = self._candidate(doc)
            prompt = format_judge_prompt(
                self._template, doc["conv_id"], doc["text"], extracted
            )
            try:
                evaluation = parse_judge_response(self._judge(prompt))
                rows.append(
                    {
                        "conv_id": doc["conv_id"],
                        "verdict": evaluation["verdict"],
                        "score": evaluation["score"],
                        "recommendation": evaluation["recommendation"],
                        "confidence": evaluation["confidence"],
                        "n_critical": len(evaluation["criticalIssues"]),
                        "n_major": len(evaluation["majorIssues"]),
                        "n_minor": len(evaluation["minorIssues"]),
                        "summary": evaluation["summary"],
                        "judge_error": None,
                    }
                )
            except Exception as e:  # noqa: BLE001 — judged-row error routing
                rows.append(
                    {
                        "conv_id": doc["conv_id"], "verdict": "FAIL",
                        "score": 0.0, "recommendation": "REJECT",
                        "confidence": None, "n_critical": 0, "n_major": 0,
                        "n_minor": 0, "summary": "",
                        "judge_error": str(e)[:500],
                    }
                )
        return pa.Table.from_pylist(rows, schema=_LLM_JUDGE_SCHEMA)


def evaluate_extractor_llm(
    docs: ray.data.Dataset,
    judge_fn,
    prompt_template: str,
    candidate_fn=None,
    sample_size: int | None = EVAL_SAMPLE_SIZE,
    concurrency: int | tuple = (1, 8),
) -> ray.data.Dataset:
    """Per-document LLM-judge verdict rows over the fixed eval corpus —
    the reference's scoreExtraction loop as one actor-pool pass."""
    if sample_size:
        docs = docs.sort("conv_id").limit(sample_size)
    return docs.map_batches(
        LLMJudgeActor,
        fn_constructor_kwargs={
            "judge_fn": judge_fn,
            "prompt_template": prompt_template,
            "candidate_fn": candidate_fn,
        },
        batch_format="pyarrow",
        batch_size=32,
        concurrency=concurrency,
    )


def summarize_evaluation(verdict_rows: ray.data.Dataset) -> dict:
    """Aggregate report: per-dimension micro P/R/F1 + verdict histogram
    (the reference's experiment summary, evaluation-runner.ts tail)."""
    df = verdict_rows.to_pandas()
    report: dict = {"dimensions": {}, "n_documents": int(df["conv_id"].nunique())}
    for dim, g in df.groupby("dimension"):
        tp = int(g["matched"].sum())
        fp = int(g["hallucinated"].sum())
        fn = int(g["missing"].sum())
        precision = tp / (tp + fp) if tp + fp else 1.0
        recall = tp / (tp + fn) if tp + fn else 1.0
        f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
        report["dimensions"][dim] = {
            "precision": round(precision, 4),
            "recall": round(recall, 4),
            "f1": round(f1, 4),
            "verdicts": g["verdict"].value_counts().to_dict(),
        }
    overall = df["verdict"].value_counts().to_dict()
    report["verdicts"] = overall
    report["pass_rate"] = round(overall.get("PASS", 0) / max(1, len(df)), 4)
    return report
