"""Batch-job lifecycle: generate → submit → poll → download → process.

The thin state machine over the S3/S4 JSONL plumbing (stages/batch_api),
rebuilding /root/reference/src/core/BatchJobRunner.ts:54-230 and
JobStatusTracker.ts: per-job metadata JSON with status transitions
(PENDING → GENERATING → SUBMITTED → IN_PROGRESS → COMPLETED | FAILED),
already-running guard, poll loop with provider-status mapping, and
download+parse on completion. Metadata writes are atomic (tmp + rename)
so a killed runner resumes from its last recorded state.

The provider is injectable (submit/status/download) — a real batch-LLM
service slots in; the shipped ``LocalFileProvider`` is a deterministic
in-sandbox stand-in that "serves" a batch by applying a response_fn to
each request line (default: echo of the request body as a valid JSON
object), which makes the full lifecycle executable and testable offline.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable

import ray.data

from .batch_api import parse_batch_responses, to_batch_requests

STATUSES = ("PENDING", "GENERATING", "SUBMITTED", "IN_PROGRESS", "COMPLETED", "FAILED")

# provider status → job status (BatchJobRunner.ts:193-201)
_PROVIDER_STATUS_MAP = {
    "validating": "SUBMITTED",
    "in_progress": "IN_PROGRESS",
    "finalizing": "IN_PROGRESS",
    "completed": "COMPLETED",
    "failed": "FAILED",
    "expired": "FAILED",
    "cancelled": "FAILED",
}


class LocalFileProvider:
    """Deterministic offline batch provider: completes after ``latency_polls``
    status checks, then serves responses = response_fn(request line)."""

    def __init__(self, work_dir: str, response_fn: Callable[[dict], str] | None = None,
                 latency_polls: int = 1):
        self._dir = work_dir
        self._response_fn = response_fn or (lambda req: req["body"])
        self._latency = latency_polls
        self._polls: dict[str, int] = {}

    def submit(self, requests_path: str) -> str:
        batch_id = f"batch-{abs(hash(requests_path)) % 10**8:08d}"
        os.makedirs(os.path.join(self._dir, batch_id), exist_ok=True)
        with open(os.path.join(self._dir, batch_id, "input.jsonl"), "w") as out:
            for fname in sorted(os.listdir(requests_path)):
                with open(os.path.join(requests_path, fname)) as f:
                    out.write(f.read())
        return batch_id

    def status(self, batch_id: str) -> str:
        n = self._polls.get(batch_id, 0) + 1
        self._polls[batch_id] = n
        return "completed" if n > self._latency else "in_progress"

    def download(self, batch_id: str) -> str:
        in_path = os.path.join(self._dir, batch_id, "input.jsonl")
        out_path = os.path.join(self._dir, batch_id, "output.jsonl")
        with open(in_path) as f, open(out_path, "w") as out:
            for line in f:
                if not line.strip():
                    continue
                req = json.loads(line)
                out.write(
                    json.dumps(
                        {
                            "custom_id": req["custom_id"],
                            "content": self._response_fn(req),
                            "finish_reason": "stop",
                        }
                    )
                    + "\n"
                )
        return out_path


class BatchJobRunner:
    """File-backed batch-job state machine (one job per work_dir)."""

    def __init__(self, job_id: str, work_dir: str, provider=None):
        self.job_id = job_id
        self.work_dir = work_dir
        os.makedirs(work_dir, exist_ok=True)
        self.provider = provider or LocalFileProvider(os.path.join(work_dir, "provider"))
        self._meta_path = os.path.join(work_dir, "status.json")

    # -- metadata (JobStatusTracker analogue) --------------------------------

    def load(self) -> dict | None:
        if not os.path.exists(self._meta_path):
            return None
        with open(self._meta_path) as f:
            return json.load(f)

    def _save(self, meta: dict) -> None:
        tmp = self._meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f, indent=2, sort_keys=True)
        os.replace(tmp, self._meta_path)  # atomic publish

    def _transition(self, meta: dict, status: str, **extra) -> dict:
        assert status in STATUSES, status
        meta["status"] = status
        meta["history"] = meta.get("history", []) + [status]
        meta.update(extra)
        self._save(meta)
        return meta

    def is_running(self) -> bool:
        meta = self.load()
        return bool(meta) and meta["status"] not in ("COMPLETED", "FAILED")

    # -- lifecycle (BatchJobRunner.run analogue) -----------------------------

    def run(
        self,
        docs: ray.data.Dataset,
        prompt_template: str = "{text}",
        wait: bool = True,
        poll_interval_s: float = 0.0,
        max_polls: int = 120,
    ) -> dict:
        """Generate + submit (+ optionally poll to completion). Returns the
        final metadata; results via ``results()``."""
        if self.is_running():
            raise RuntimeError(
                f"Job {self.job_id} is already running "
                "(check status or wait for completion before starting a new job)"
            )
        meta = {"job_id": self.job_id, "status": "PENDING", "history": ["PENDING"]}
        self._save(meta)
        try:
            meta = self._transition(meta, "GENERATING")
            requests_dir = os.path.join(self.work_dir, "requests")
            requests = to_batch_requests(docs, self.job_id, prompt_template)
            n_requests = requests.count()
            requests.write_json(requests_dir)

            batch_id = self.provider.submit(requests_dir)
            meta = self._transition(meta, "SUBMITTED", batch_id=batch_id, n_requests=n_requests)
            if wait:
                meta = self.poll_to_completion(poll_interval_s, max_polls)
            return meta
        except Exception as e:
            self._transition(meta, "FAILED", error=str(e)[:500])
            raise

    def check_status(self) -> dict:
        """One provider poll; updates local status if it changed."""
        meta = self.load()
        if meta is None:
            raise RuntimeError(f"No job metadata for {self.job_id}")
        if meta["status"] in ("COMPLETED", "FAILED"):
            return meta
        provider_status = self.provider.status(meta["batch_id"])
        mapped = _PROVIDER_STATUS_MAP.get(provider_status)
        if mapped and mapped != meta["status"]:
            extra = {}
            if mapped == "COMPLETED":
                extra["output_path"] = self.provider.download(meta["batch_id"])
            meta = self._transition(meta, mapped, provider_status=provider_status, **extra)
        return meta

    def poll_to_completion(self, poll_interval_s: float = 0.0, max_polls: int = 120) -> dict:
        meta = self.load()
        for _ in range(max_polls):
            meta = self.check_status()
            if meta["status"] in ("COMPLETED", "FAILED"):
                return meta
            if poll_interval_s:
                time.sleep(poll_interval_s)
        return self._transition(meta, "FAILED", error=f"not complete after {max_polls} polls")

    def results(self) -> ray.data.Dataset:
        """Parsed response rows (custom_id, ok, data_json, error) of a
        COMPLETED job."""
        meta = self.load()
        if meta is None or meta["status"] != "COMPLETED":
            raise RuntimeError(f"Job {self.job_id} is not COMPLETED")
        return parse_batch_responses(ray.data.read_json(meta["output_path"]))
