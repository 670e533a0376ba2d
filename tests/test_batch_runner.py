"""Batch-job lifecycle state machine (BatchJobRunner.ts:54-230 analogue):
status transitions, already-running guard, kill-and-resume polling, and the
round-trip guarantee — batch results == inline extractor results."""

import json
import tempfile

import pytest
import ray.data as rd

from decisions_knowledge_graph_data_ray.functions.document import extract_document
from decisions_knowledge_graph_data_ray.stages.batch_runner import (
    BatchJobRunner,
    LocalFileProvider,
)

_DOCS = [
    {"conv_id": f"C{i}", "text": f"En application de l'article 1382 du Code civil, point {i}.",
     "self_ecli": ""}
    for i in range(8)
]


def _extract_response(req: dict) -> str:
    """Fake model: runs the REAL extractor on the request's document."""
    conv_id = req["custom_id"].split("-", 2)[2]
    text = json.loads(req["body"])["messages"][0]["content"]
    return json.dumps(extract_document({"conv_id": conv_id, "text": text, "self_ecli": ""}),
                      sort_keys=True)


def test_lifecycle_and_roundtrip(ray_session):
    with tempfile.TemporaryDirectory() as work:
        provider = LocalFileProvider(work + "/p", response_fn=_extract_response, latency_polls=2)
        runner = BatchJobRunner("extract", work, provider=provider)
        meta = runner.run(rd.from_items(_DOCS), wait=True)
        assert meta["status"] == "COMPLETED"
        assert meta["history"][:3] == ["PENDING", "GENERATING", "SUBMITTED"]
        assert "IN_PROGRESS" in meta["history"]  # latency_polls=2 → seen in flight
        assert meta["n_requests"] == 8

        results = runner.results().to_pandas()
        assert len(results) == 8 and results["ok"].all()
        # round-trip: parsed batch output == inline extraction
        for _, row in results.iterrows():
            conv_id = row["custom_id"].split("-", 2)[2]
            doc = next(d for d in _DOCS if d["conv_id"] == conv_id)
            assert json.loads(row["data_json"]) == json.loads(
                json.dumps(extract_document(doc), sort_keys=True)
            )


def test_already_running_guard(ray_session):
    with tempfile.TemporaryDirectory() as work:
        runner = BatchJobRunner("j", work)
        runner.run(rd.from_items(_DOCS[:2]), wait=False)  # leaves status SUBMITTED
        with pytest.raises(RuntimeError, match="already running"):
            runner.run(rd.from_items(_DOCS[:2]))


def test_resume_polling_after_restart(ray_session):
    """A new runner over the same work_dir resumes from SUBMITTED and
    completes (the reference's status-command flow)."""
    with tempfile.TemporaryDirectory() as work:
        provider = LocalFileProvider(work + "/p", latency_polls=1)
        runner = BatchJobRunner("j", work, provider=provider)
        runner.run(rd.from_items(_DOCS[:3]), wait=False)
        assert runner.load()["status"] == "SUBMITTED"

        resumed = BatchJobRunner("j", work, provider=provider)  # "restart"
        meta = resumed.poll_to_completion()
        assert meta["status"] == "COMPLETED"
        assert resumed.results().count() == 3


def test_failed_responses_are_flagged(ray_session):
    with tempfile.TemporaryDirectory() as work:
        provider = LocalFileProvider(work + "/p", response_fn=lambda r: "not json at all {",
                                     latency_polls=0)
        runner = BatchJobRunner("j", work, provider=provider)
        runner.run(rd.from_items(_DOCS[:2]), wait=True)
        results = runner.results().to_pandas()
        assert (~results["ok"]).all()
        assert (results["error"] == "unparseable JSON").all()
