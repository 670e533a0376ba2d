"""Batch-API request/response plumbing (SURVEY.md S3/S4).

The reference writes rows as BatchRequestItem JSONL (+ a metadata sidecar)
for an external batch inference service, then parses the per-line responses
back and validates them (src/core/BatchJobGenerator.ts:149-330,
src/core/ResultProcessor.ts:300-317). Our engine keeps the same logical
operators so a real batch-LLM provider can be slotted in:

- ``to_batch_requests``: documents → request structs. custom_id is a
  DETERMINISTIC content key ``{job}-{hash(conv_id)}-{conv_id}`` — never the
  positional index the reference uses (BatchJobGenerator.ts:160-163), which
  breaks under parallel re-ordering (SURVEY.md §4 determinism note c).
- ``write_batch_requests`` / ``read_batch_responses``: JSONL sink/source.
- ``parse_batch_responses``: structural validation + JSON salvage parse
  (direct → ```json block → first {...}, 100KB cap — validators.ts:191-226).
"""

from __future__ import annotations

import json
import re

import pyarrow as pa

import ray.data

from ..functions.normalize import stable_hash32

MAX_PARSE_BYTES = 100_000

_JSON_BLOCK_RE = re.compile(r"```json\s*(.*?)```", re.DOTALL)


def salvage_parse_json(text: str) -> dict | None:
    """Parse model output: direct JSON → fenced ```json block → first {...};
    inputs above 100KB are rejected (validators.ts:191-226)."""
    if not text or len(text) > MAX_PARSE_BYTES:
        return None
    try:
        out = json.loads(text)
        return out if isinstance(out, dict) else None
    except json.JSONDecodeError:
        pass
    m = _JSON_BLOCK_RE.search(text)
    if m:
        try:
            out = json.loads(m.group(1))
            if isinstance(out, dict):
                return out
        except json.JSONDecodeError:
            pass
    start = text.find("{")
    end = text.rfind("}")
    if start != -1 and end > start:
        try:
            out = json.loads(text[start : end + 1])
            if isinstance(out, dict):
                return out
        except json.JSONDecodeError:
            pass
    return None


def custom_id_for(job: str, conv_id: str) -> str:
    """Deterministic, order-independent request id."""
    return f"{job}-{stable_hash32(conv_id):08x}-{conv_id}"


def to_batch_requests(
    docs: ray.data.Dataset, job: str, prompt_template: str = "{text}"
) -> ray.data.Dataset:
    """documents → batch request rows (custom_id, method, body JSON)."""

    def _req(batch: pa.Table) -> pa.Table:
        ids, bodies = [], []
        for rec in batch.to_pylist():
            ids.append(custom_id_for(job, rec["conv_id"]))
            prompt = prompt_template.format(**{k: rec.get(k, "") for k in ("conv_id", "text")})
            bodies.append(
                json.dumps(
                    {
                        "messages": [{"role": "user", "content": prompt}],
                        "response_format": {"type": "json_object"},
                    }
                )
            )
        return pa.table(
            {
                "custom_id": pa.array(ids, pa.string()),
                "method": pa.array(["POST"] * len(ids), pa.string()),
                "body": pa.array(bodies, pa.string()),
            }
        )

    return docs.map_batches(_req, batch_format="pyarrow")


def write_batch_requests(requests: ray.data.Dataset, out_dir: str) -> None:
    requests.write_json(out_dir)


def read_batch_responses(path: str) -> ray.data.Dataset:
    return ray.data.read_json(path)


def parse_batch_responses(responses: ray.data.Dataset) -> ray.data.Dataset:
    """Response rows → (custom_id, ok, data_json, error). A response is a
    row with custom_id + content (the model text)."""

    def _parse(batch: pa.Table) -> pa.Table:
        ids, oks, datas, errors = [], [], [], []
        for rec in batch.to_pylist():
            cid = rec.get("custom_id", "")
            content = rec.get("content", "")
            finish = rec.get("finish_reason", "stop")
            ids.append(cid)
            if finish == "length":  # truncated output is a failure (M16)
                oks.append(False)
                datas.append("")
                errors.append("finish_reason=length")
                continue
            parsed = salvage_parse_json(content)
            if parsed is None:
                oks.append(False)
                datas.append("")
                errors.append("unparseable JSON")
            else:
                oks.append(True)
                datas.append(json.dumps(parsed, sort_keys=True))
                errors.append("")
        return pa.table(
            {
                "custom_id": pa.array(ids, pa.string()),
                "ok": pa.array(oks, pa.bool_()),
                "data_json": pa.array(datas, pa.string()),
                "error": pa.array(errors, pa.string()),
            }
        )

    return responses.map_batches(_parse, batch_format="pyarrow")
