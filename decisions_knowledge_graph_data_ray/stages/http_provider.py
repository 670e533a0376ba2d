"""OpenAI-compatible HTTP provider adapter (stdlib-only, no SDK).

Completes the provider surface on top of the rate-limit envelope
(stages/rate_limit): a concrete client speaking the OpenAI Responses API
shape over plain HTTP, injectable as ``extract_fn`` (via
``llm_extract_fn``) and as a ``BatchJobRunner`` provider
(``HTTPBatchProvider``). Behavioral parity targets:

- request body / structured output and the output-parsing cascade
  (output_parsed → output_text → stitched output[] text pieces):
  /root/reference/src/concurrent/OpenAIConcurrentClient.ts:126-350
- 429 classification + Retry-After extraction (the retry/backoff itself
  lives in RateLimitedClient, :225-283 of the same file)
- batch upload → create → poll → download lifecycle:
  /root/reference/src/core/providers/OpenAIBatchProvider.ts

Design notes for the Ray deployment: the client is a small picklable
value object (plain attributes, one urllib request per call, no pooled
session), so each extraction-pool actor carries its own copy while ONE
``TokenBucket`` actor paces the whole pool against the shared provider
quota. No provider SDK exists in the sandbox, so the wire layer is
``urllib.request``; tests exercise it against a local ``http.server``
fake — never the network.
"""

from __future__ import annotations

import json
import os
import socket
import urllib.error
import urllib.request
from typing import Callable

from .batch_api import salvage_parse_json
from .rate_limit import RateLimitError


class ProviderHTTPError(Exception):
    """Non-429 provider failure (carries status for caller taxonomy)."""

    def __init__(self, status: int, body: str):
        super().__init__(f"HTTP {status}: {body[:300]}")
        self.status = status


def _post_json(url: str, payload: dict, headers: dict, timeout_s: float) -> dict:
    req = urllib.request.Request(
        url,
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json", **headers},
        method="POST",
    )
    return _do_request(req, timeout_s)


def _get_raw(url: str, headers: dict, timeout_s: float) -> bytes:
    req = urllib.request.Request(url, headers=headers, method="GET")
    try:
        with urllib.request.urlopen(req, timeout=timeout_s) as resp:
            return resp.read()
    except urllib.error.HTTPError as e:
        _raise_for(e)
    except (socket.timeout, TimeoutError) as e:
        raise TimeoutError(f"provider request timed out after {timeout_s}s: {url}") from e
    except urllib.error.URLError as e:
        if isinstance(e.reason, (socket.timeout, TimeoutError)):
            raise TimeoutError(f"provider request timed out after {timeout_s}s: {url}") from e
        raise


def _do_request(req: urllib.request.Request, timeout_s: float) -> dict:
    try:
        with urllib.request.urlopen(req, timeout=timeout_s) as resp:
            return json.loads(resp.read().decode() or "{}")
    except urllib.error.HTTPError as e:
        _raise_for(e)
    except (socket.timeout, TimeoutError) as e:
        raise TimeoutError(
            f"provider request timed out after {timeout_s}s: {req.full_url}"
        ) from e
    except urllib.error.URLError as e:
        if isinstance(e.reason, (socket.timeout, TimeoutError)):
            raise TimeoutError(
                f"provider request timed out after {timeout_s}s: {req.full_url}"
            ) from e
        raise


def _raise_for(e: urllib.error.HTTPError) -> None:
    body = ""
    try:
        body = e.read().decode(errors="replace")
    except Exception:  # noqa: BLE001 — body is best-effort diagnostics
        pass
    if e.code == 429:
        # translate into the envelope's signal; RateLimitedClient honors
        # retry_after / falls back to exponential backoff
        raise RateLimitError("provider rate limited", retry_after=_retry_after(e))
    raise ProviderHTTPError(e.code, body)


def _retry_after(e: urllib.error.HTTPError) -> float | None:
    ra = e.headers.get("Retry-After") if e.headers else None
    try:
        return float(ra) if ra is not None else None
    except (TypeError, ValueError):
        return None  # HTTP-date form → exponential fallback, like the reference


class OpenAICompatibleClient:
    """Responses-API structured-output client over plain HTTP.

    ``complete(messages, response_format, **settings)`` returns the
    reference's transformed shape::

        {"choices": [{"message": {"content": str}, "finish_reason": "stop"}],
         "usage": {"prompt_tokens", "completion_tokens", "total_tokens"}}

    Raises ``RateLimitError`` on 429 (compose with ``RateLimitedClient``
    for retries + cluster pacing), ``TimeoutError`` on timeouts, and
    ``ProviderHTTPError`` otherwise — only 429 is retryable, matching the
    reference's retry policy.
    """

    def __init__(
        self,
        base_url: str,
        model: str,
        api_key: str | None = None,
        timeout_s: float = 120.0,
        max_output_tokens: int | None = None,
        reasoning_effort: str | None = None,
        verbosity: str | None = None,
        temperature: float | None = None,
        top_p: float | None = None,
    ):
        self.base_url = base_url.rstrip("/")
        self.model = model
        self.api_key = api_key
        self.timeout_s = timeout_s
        self.settings = {
            "max_output_tokens": max_output_tokens,
            "reasoning_effort": reasoning_effort,
            "verbosity": verbosity,
            "temperature": temperature,
            "top_p": top_p,
        }

    def _headers(self) -> dict:
        return {"Authorization": f"Bearer {self.api_key}"} if self.api_key else {}

    def build_request_body(self, messages: list[dict], response_format: dict | None) -> dict:
        """OpenAIConcurrentClient.ts:293-349 — Responses-API body shape."""
        body: dict = {
            "model": self.model,
            "input": [
                {
                    "role": m["role"],
                    "content": [{"type": "input_text", "text": m["content"]}],
                }
                for m in messages
            ],
        }
        if response_format and response_format.get("type") == "json_schema":
            inner = response_format.get("json_schema", {})
            body["text"] = {
                "format": {
                    "type": "json_schema",
                    "name": response_format.get("name")
                    or inner.get("name")
                    or "ComprehensiveExtraction",
                    "schema": inner.get("schema"),
                    "strict": inner.get("strict", True),
                }
            }
        else:
            body["text"] = {"format": {"type": "json_object"}}
        s = self.settings
        if s["max_output_tokens"]:
            body["max_output_tokens"] = s["max_output_tokens"]
        if s["reasoning_effort"]:
            body["reasoning"] = {"effort": s["reasoning_effort"]}
        if s["verbosity"]:
            body["text"]["verbosity"] = s["verbosity"]
        if s["temperature"] is not None:
            body["temperature"] = s["temperature"]
        if s["top_p"] is not None:
            body["top_p"] = s["top_p"]
        return body

    @staticmethod
    def extract_content(response: dict) -> str:
        """The reference's parsing cascade (ts:153-172): output_parsed →
        output_text → stitch output[] text pieces."""
        if response.get("output_parsed") is not None:
            return json.dumps(response["output_parsed"])
        if response.get("output_text"):
            return response["output_text"]
        pieces: list[str] = []
        for item in response.get("output") or []:
            for c in item.get("content") or []:
                if isinstance(c, dict) and c.get("type") == "output_text" and isinstance(c.get("text"), str):
                    pieces.append(c["text"])
        return "".join(pieces)

    def complete(self, messages: list[dict], response_format: dict | None = None) -> dict:
        body = self.build_request_body(messages, response_format)
        resp = _post_json(f"{self.base_url}/responses", body, self._headers(), self.timeout_s)
        usage = resp.get("usage") or {}
        # the Responses API signals truncation via status='incomplete'
        # (+ incomplete_details.reason='max_output_tokens'); surface it as
        # finish_reason='length' so llm_extract_fn's truncation gate (and
        # parse_batch_responses' M16 filter) actually fires — a truncated
        # JSON prefix can salvage-parse into a silently partial record
        finish = "length" if resp.get("status") == "incomplete" else "stop"
        return {
            "choices": [
                {
                    "message": {"content": self.extract_content(resp)},
                    "finish_reason": finish,
                }
            ],
            "usage": {
                "prompt_tokens": usage.get("input_tokens", 0),
                "completion_tokens": usage.get("output_tokens", 0),
                "total_tokens": usage.get("input_tokens", 0) + usage.get("output_tokens", 0),
            },
        }


def llm_extract_fn(
    client: OpenAICompatibleClient,
    prompt_template: str = "{text}",
    system_prompt: str | None = None,
    response_format: dict | None = None,
) -> Callable[[dict], dict]:
    """Adapt the HTTP client into the extraction pool's ``extract_fn``
    contract: ``doc dict → extraction record dict``.

    The model's salvage-parsed JSON is merged over the empty-extraction
    defaults so ExtractorActor's schema validation always sees the full
    record shape; document identity (conv_id / self_ecli) stays
    authoritative from the input row, never from model output.
    Unparseable output raises (→ the actor's Request Error failure row).
    Compose with RateLimitedClient for retries/pacing::

        fn = RateLimitedClient(llm_extract_fn(client, tmpl), limiter=bucket)
        extract_documents(docs, extract_fn=fn)
    """
    from .extract import _EMPTY_EXTRACTION

    def _fn(doc: dict) -> dict:
        messages = []
        if system_prompt:
            messages.append({"role": "system", "content": system_prompt})
        prompt = prompt_template.format(
            **{k: doc.get(k, "") for k in ("conv_id", "text", "self_ecli")}
        )
        messages.append({"role": "user", "content": prompt})
        out = client.complete(messages, response_format)
        content = out["choices"][0]["message"]["content"]
        if out["choices"][0].get("finish_reason") == "length":
            raise ValueError("finish_reason=length (truncated output)")
        parsed = salvage_parse_json(content)
        if parsed is None:
            raise ValueError(f"unparseable model output: {content[:200]!r}")
        return {
            **_EMPTY_EXTRACTION,
            **parsed,
            "conv_id": doc["conv_id"],
            "self_ecli": doc.get("self_ecli", ""),
        }

    return _fn


def llm_text_fn(
    client: OpenAICompatibleClient,
    system_prompt: str | None = None,
) -> Callable[[str], str]:
    """Adapt the HTTP client into a plain ``prompt str → response text``
    callable — the judge-client contract of evals.LLMJudgeActor (the
    reference's callAzureJudge, evals/config/openai.ts). Truncated output
    raises (finish_reason='length' would silently cut the judge's JSON).
    Compose with RateLimitedClient for the 429/backoff envelope::

        judge = RateLimitedClient(llm_text_fn(client), limiter=bucket)
        evaluate_extractor_llm(docs, judge, template)
    """

    def _fn(prompt: str) -> str:
        messages = []
        if system_prompt:
            messages.append({"role": "system", "content": system_prompt})
        messages.append({"role": "user", "content": prompt})
        out = client.complete(messages, None)
        if out["choices"][0].get("finish_reason") == "length":
            raise ValueError("finish_reason=length (truncated judge output)")
        return out["choices"][0]["message"]["content"]

    return _fn


class HTTPBatchProvider:
    """OpenAI Batch API lifecycle over HTTP, pluggable into BatchJobRunner.

    submit: concat the request shards → one JSONL of batch lines
    ({custom_id, method, url, body}) → multipart upload (POST /files,
    purpose=batch, 100 MB refusal like OpenAIBatchProvider.ts:42-47) →
    POST /batches. status: GET /batches/{id} → provider status string
    (BatchJobRunner maps it). download: output_file_id → GET
    /files/{fid}/content, translated to the engine's response-line shape
    (custom_id, content, finish_reason) for parse_batch_responses.
    """

    MAX_UPLOAD_BYTES = 100 * 1024 * 1024
    endpoint = "/v1/responses"

    def __init__(
        self,
        base_url: str,
        work_dir: str,
        api_key: str | None = None,
        completion_window: str = "24h",
        timeout_s: float = 60.0,
    ):
        self.base_url = base_url.rstrip("/")
        self.work_dir = work_dir
        self.api_key = api_key
        self.completion_window = completion_window
        self.timeout_s = timeout_s
        os.makedirs(work_dir, exist_ok=True)

    def _headers(self) -> dict:
        return {"Authorization": f"Bearer {self.api_key}"} if self.api_key else {}

    # -- BatchJobRunner provider protocol ------------------------------------

    def submit(self, requests_path: str) -> str:
        lines = []
        for fname in sorted(os.listdir(requests_path)):
            with open(os.path.join(requests_path, fname)) as f:
                for line in f:
                    if not line.strip():
                        continue
                    row = json.loads(line)
                    lines.append(
                        json.dumps(
                            {
                                "custom_id": row["custom_id"],
                                "method": row.get("method", "POST"),
                                "url": self.endpoint,
                                "body": json.loads(row["body"])
                                if isinstance(row.get("body"), str)
                                else row.get("body", {}),
                            }
                        )
                    )
        data = ("\n".join(lines) + "\n").encode()
        if len(data) > self.MAX_UPLOAD_BYTES:
            raise ValueError(
                f"batch upload is {len(data) / 1e6:.1f} MB > 100 MB provider "
                "limit; shard the job into smaller batches"
            )
        file_id = self._upload(data)
        created = _post_json(
            f"{self.base_url}/batches",
            {
                "input_file_id": file_id,
                "endpoint": self.endpoint,
                "completion_window": self.completion_window,
            },
            self._headers(),
            self.timeout_s,
        )
        return created["id"]

    def status(self, batch_id: str) -> str:
        meta = _do_request(
            urllib.request.Request(
                f"{self.base_url}/batches/{batch_id}", headers=self._headers(), method="GET"
            ),
            self.timeout_s,
        )
        return meta.get("status", "in_progress")

    def download(self, batch_id: str) -> str:
        meta = _do_request(
            urllib.request.Request(
                f"{self.base_url}/batches/{batch_id}", headers=self._headers(), method="GET"
            ),
            self.timeout_s,
        )
        fid = meta["output_file_id"]
        raw = _get_raw(f"{self.base_url}/files/{fid}/content", self._headers(), self.timeout_s)
        out_path = os.path.join(self.work_dir, f"{batch_id}.output.jsonl")
        with open(out_path, "w") as out:
            for line in raw.decode().splitlines():
                if not line.strip():
                    continue
                out.write(json.dumps(self._translate_line(json.loads(line))) + "\n")
        return out_path

    # -- wire helpers ---------------------------------------------------------

    def _upload(self, data: bytes) -> str:
        boundary = "----kgdata" + os.urandom(8).hex()
        parts = [
            f"--{boundary}\r\n"
            'Content-Disposition: form-data; name="purpose"\r\n\r\nbatch\r\n'
            f"--{boundary}\r\n"
            'Content-Disposition: form-data; name="file"; filename="batch.jsonl"\r\n'
            "Content-Type: application/jsonl\r\n\r\n"
        ]
        body = parts[0].encode() + data + f"\r\n--{boundary}--\r\n".encode()
        req = urllib.request.Request(
            f"{self.base_url}/files",
            data=body,
            headers={
                "Content-Type": f"multipart/form-data; boundary={boundary}",
                **self._headers(),
            },
            method="POST",
        )
        return _do_request(req, self.timeout_s)["id"]

    @staticmethod
    def _translate_line(line: dict) -> dict:
        """Provider batch output line → engine response line
        (custom_id, content, finish_reason) for parse_batch_responses."""
        resp = line.get("response") or {}
        body = resp.get("body") or {}
        if "error" in line and line["error"]:
            return {
                "custom_id": line.get("custom_id", ""),
                "content": "",
                "finish_reason": "error",
            }
        content = OpenAICompatibleClient.extract_content(body)
        if not content and body.get("choices"):
            choice = body["choices"][0]
            content = (choice.get("message") or {}).get("content", "")
            finish = choice.get("finish_reason", "stop")
        else:
            finish = "length" if body.get("status") == "incomplete" else "stop"
        return {
            "custom_id": line.get("custom_id", ""),
            "content": content,
            "finish_reason": finish,
        }
