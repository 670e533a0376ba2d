"""HTTP provider adapter tests against a local fake OpenAI-compatible
server (http.server; no network). Exercises the 429/Retry-After, timeout,
and batch-lifecycle paths end-to-end through extract_with_escalation and
BatchJobRunner, per the reference envelope
(src/concurrent/OpenAIConcurrentClient.ts, src/core/providers/OpenAIBatchProvider.ts).
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
import ray.data as rd

from decisions_knowledge_graph_data_ray.stages.batch_runner import BatchJobRunner
from decisions_knowledge_graph_data_ray.stages.extract import (
    extract_documents,
    extract_with_escalation,
)
from decisions_knowledge_graph_data_ray.stages.http_provider import (
    HTTPBatchProvider,
    OpenAICompatibleClient,
    ProviderHTTPError,
    llm_extract_fn,
)
from decisions_knowledge_graph_data_ray.stages.rate_limit import (
    RateLimitedClient,
    RateLimitError,
)

GOOD_EXTRACTION = {"keywords": ["http"], "micro_summary": "via http"}


class _State:
    def __init__(self):
        self.lock = threading.Lock()
        self.flaky_calls = 0
        self.judge_calls = 0
        self.batch_polls = 0
        self.uploaded_lines: list[dict] = []
        self.last_request_body: dict | None = None


class _Handler(BaseHTTPRequestHandler):
    state: _State  # set by fixture

    def log_message(self, *a):  # silence
        pass

    def _json(self, code: int, payload: dict, headers: dict | None = None):
        try:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            for k, v in (headers or {}).items():
                self.send_header(k, v)
            self.end_headers()
            self.wfile.write(body)
        except (BrokenPipeError, ConnectionError):
            pass  # client timed out and hung up

    def _read_body(self) -> bytes:
        n = int(self.headers.get("Content-Length", 0))
        return self.rfile.read(n) if n else b""

    def do_POST(self):
        st = self.state
        raw = self._read_body()
        if self.path == "/ok/v1/responses":
            with st.lock:
                st.last_request_body = json.loads(raw)
            self._json(
                200,
                {
                    "output_text": json.dumps(GOOD_EXTRACTION),
                    "usage": {"input_tokens": 7, "output_tokens": 3},
                },
            )
        elif self.path == "/flaky/v1/responses":
            with st.lock:
                st.flaky_calls += 1
                n = st.flaky_calls
            if n % 3 in (1, 2):  # two 429s, then success, repeating
                self._json(429, {"error": "rate_limit_exceeded"}, {"Retry-After": "0.01"})
            else:
                self._json(200, {"output_parsed": GOOD_EXTRACTION})
        elif self.path == "/always429/v1/responses":
            self._json(429, {"error": "rate_limit_exceeded"}, {"Retry-After": "0.01"})
        elif self.path == "/slow/v1/responses":
            time.sleep(1.0)
            self._json(200, {"output_text": "{}"})
        elif self.path == "/boom/v1/responses":
            self._json(500, {"error": "internal"})
        elif self.path == "/judge/v1/responses":
            # LLM judge: one 429 then a markdown-code-block verdict, repeating
            with st.lock:
                st.judge_calls += 1
                n = st.judge_calls
            if n % 2 == 1:
                self._json(429, {"error": "rate_limit_exceeded"}, {"Retry-After": "0.01"})
            else:
                verdict = {
                    "verdict": "PASS", "score": 97,
                    "criticalIssues": [], "majorIssues": [],
                    "minorIssues": ["tone"], "recommendation": "ACCEPT",
                    "confidence": "HIGH", "summary": "looks right",
                }
                self._json(
                    200,
                    {"output_text": "Here is my evaluation:\n```json\n"
                     + json.dumps(verdict) + "\n```\n"},
                )
        elif self.path == "/v1/files":
            # crude multipart parse: JSONL lines live between the file-part
            # header blank line and the closing boundary
            text = raw.decode(errors="replace")
            chunk = text.split("Content-Type: application/jsonl\r\n\r\n", 1)[-1]
            chunk = chunk.split("\r\n--", 1)[0]
            with self.state.lock:
                self.state.uploaded_lines = [
                    json.loads(ln) for ln in chunk.splitlines() if ln.strip()
                ]
            self._json(200, {"id": "file-in-1"})
        elif self.path == "/v1/batches":
            self._json(200, {"id": "batch-1", "status": "validating"})
        else:
            self._json(404, {"error": f"no route {self.path}"})

    def do_GET(self):
        st = self.state
        if self.path == "/v1/batches/batch-1":
            with st.lock:
                st.batch_polls += 1
                n = st.batch_polls
            if n == 1:
                self._json(200, {"id": "batch-1", "status": "in_progress"})
            else:
                self._json(
                    200,
                    {"id": "batch-1", "status": "completed", "output_file_id": "file-out-1"},
                )
        elif self.path == "/v1/files/file-out-1/content":
            lines = [
                json.dumps(
                    {
                        "custom_id": req["custom_id"],
                        "response": {
                            "status_code": 200,
                            "body": {"output_text": json.dumps({"echo": req["custom_id"]})},
                        },
                    }
                )
                for req in st.uploaded_lines
            ]
            body = ("\n".join(lines) + "\n").encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/jsonl")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        else:
            self._json(404, {"error": f"no route {self.path}"})


@pytest.fixture(scope="module")
def fake_server():
    state = _State()
    handler = type("Handler", (_Handler,), {"state": state})
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    srv.daemon_threads = True
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", state
    srv.shutdown()


def _docs(n=6):
    return rd.from_items(
        [
            {"conv_id": f"conv:{i:04d}", "text": f"user: hello {i}", "self_ecli": ""}
            for i in range(n)
        ]
    )


def test_structured_output_request_and_parse(fake_server):
    base, state = fake_server
    client = OpenAICompatibleClient(
        f"{base}/ok/v1", model="test-model", api_key="k", temperature=0.1,
        max_output_tokens=256, reasoning_effort="low",
    )
    schema = {"type": "object", "properties": {"keywords": {"type": "array"}}}
    out = client.complete(
        [{"role": "system", "content": "sys"}, {"role": "user", "content": "doc text"}],
        response_format={"type": "json_schema", "json_schema": {"name": "X", "schema": schema}},
    )
    assert json.loads(out["choices"][0]["message"]["content"]) == GOOD_EXTRACTION
    assert out["usage"]["total_tokens"] == 10
    body = state.last_request_body
    # Responses-API body shape (OpenAIConcurrentClient.ts buildRequestBody)
    assert body["model"] == "test-model"
    assert body["input"][0]["content"][0]["type"] == "input_text"
    assert body["text"]["format"] == {
        "type": "json_schema", "name": "X", "schema": schema, "strict": True,
    }
    assert body["max_output_tokens"] == 256
    assert body["reasoning"] == {"effort": "low"}
    assert body["temperature"] == 0.1


def test_output_parsing_cascade():
    ec = OpenAICompatibleClient.extract_content
    assert ec({"output_parsed": {"a": 1}}) == '{"a": 1}'
    assert ec({"output_text": "hello"}) == "hello"
    assert (
        ec({"output": [{"content": [{"type": "output_text", "text": "a"},
                                    {"type": "other", "text": "x"},
                                    {"type": "output_text", "text": "b"}]}]})
        == "ab"
    )
    assert ec({}) == ""


def test_429_retry_through_rate_limited_client(fake_server):
    base, state = fake_server
    client = OpenAICompatibleClient(f"{base}/flaky/v1", model="m")
    with state.lock:
        state.flaky_calls = 0
    sleeps = []
    wrapped = RateLimitedClient(
        lambda msgs: client.complete(msgs), max_retries=5, sleep_fn=sleeps.append
    )
    out = wrapped([{"role": "user", "content": "x"}])
    assert json.loads(out["choices"][0]["message"]["content"]) == GOOD_EXTRACTION
    assert state.flaky_calls == 3  # two 429s consumed by retries
    # Retry-After header (0.01s) was honored over exponential backoff
    assert sleeps == [0.01, 0.01]


def test_timeout_raises(fake_server):
    base, _ = fake_server
    client = OpenAICompatibleClient(f"{base}/slow/v1", model="m", timeout_s=0.2)
    with pytest.raises(TimeoutError, match="timed out"):
        client.complete([{"role": "user", "content": "x"}])


def test_non_429_is_not_retryable(fake_server):
    base, _ = fake_server
    client = OpenAICompatibleClient(f"{base}/boom/v1", model="m")
    calls = {"n": 0}

    def fn(arg):
        calls["n"] += 1
        return client.complete(arg)

    wrapped = RateLimitedClient(fn, max_retries=5, sleep_fn=lambda s: None)
    with pytest.raises(ProviderHTTPError, match="HTTP 500"):
        wrapped([{"role": "user", "content": "x"}])
    assert calls["n"] == 1  # 500s don't retry (reference retries 429 only)


def test_llm_extract_fn_through_actor_pool(fake_server, ray_session):
    base, _ = fake_server
    client = OpenAICompatibleClient(f"{base}/ok/v1", model="m")
    fn = llm_extract_fn(client, prompt_template="Extract from {conv_id}: {text}")
    out = extract_documents(_docs(5), extract_fn=fn, concurrency=2).to_pandas()
    assert len(out) == 5
    assert bool(out["valid"].all())
    assert set(out["micro_summary"]) == {"via http"}
    # doc identity stays authoritative from the input row
    assert sorted(out["conv_id"]) == [f"conv:{i:04d}" for i in range(5)]


def test_exhausted_429s_escalate_to_fallback(fake_server, ray_session):
    base, _ = fake_server
    primary = RateLimitedClient(
        llm_extract_fn(OpenAICompatibleClient(f"{base}/always429/v1", model="m")),
        max_retries=1,
        sleep_fn=lambda s: None,
    )
    fallback = llm_extract_fn(OpenAICompatibleClient(f"{base}/ok/v1", model="m"))
    out = extract_with_escalation(_docs(4), primary_fn=primary, fallback_fn=fallback).to_pandas()
    assert len(out) == 4
    assert bool(out["valid"].all())
    assert set(out["micro_summary"]) == {"via http"}


def test_batch_lifecycle_over_http(fake_server, ray_session, tmp_path):
    base, state = fake_server
    with state.lock:
        state.batch_polls = 0
    provider = HTTPBatchProvider(f"{base}/v1", work_dir=str(tmp_path / "dl"), api_key="k")
    runner = BatchJobRunner("job-http", str(tmp_path / "job"), provider=provider)
    meta = runner.run(_docs(6), prompt_template="summarize: {text}", wait=True)
    assert meta["status"] == "COMPLETED"
    assert meta["batch_id"] == "batch-1"
    assert meta["history"][:3] == ["PENDING", "GENERATING", "SUBMITTED"]
    # uploaded lines carry the OpenAI batch-line shape
    assert len(state.uploaded_lines) == 6
    line = state.uploaded_lines[0]
    assert set(line) == {"custom_id", "method", "url", "body"}
    assert line["url"] == "/v1/responses"
    assert line["body"]["messages"][0]["role"] == "user"
    res = runner.results().to_pandas()
    assert len(res) == 6
    assert bool(res["ok"].all())
    assert all(json.loads(d)["echo"] for d in res["data_json"])


def test_upload_size_refusal(tmp_path):
    provider = HTTPBatchProvider("http://127.0.0.1:9", work_dir=str(tmp_path))
    provider.MAX_UPLOAD_BYTES = 64
    reqs = tmp_path / "reqs"
    reqs.mkdir()
    (reqs / "part0.json").write_text(
        json.dumps({"custom_id": "c1", "method": "POST", "body": json.dumps({"x": "y" * 200})})
        + "\n"
    )
    with pytest.raises(ValueError, match="100 MB|provider limit"):
        provider.submit(str(reqs))


def test_incomplete_status_maps_to_finish_reason_length():
    """Responses API signals truncation via status='incomplete'; the client
    must surface finish_reason='length' so llm_extract_fn raises instead of
    salvage-parsing a truncated-JSON prefix into a silently partial record."""
    body = {"status": "incomplete", "output_text": '{"keywords": ["a"'}
    # unit-level: translate a batch output line
    line = {"custom_id": "c1", "response": {"status_code": 200, "body": body}}
    out = HTTPBatchProvider._translate_line(line)
    assert out["finish_reason"] == "length"


def test_llm_judge_over_http_with_rate_limits(fake_server, ray_session):
    """The full offline LLM-judge path (gpt5-judge-scorer.ts protocol):
    assembled docs → candidate extraction → judge prompt → HTTP client
    (429 then code-block verdict, through RateLimitedClient) → parsed
    verdict rows. No network; every judge call pays one 429 retry."""
    from decisions_knowledge_graph_data_ray.evals import evaluate_extractor_llm
    from decisions_knowledge_graph_data_ray.stages.http_provider import llm_text_fn

    base, state = fake_server
    client = OpenAICompatibleClient(f"{base}/judge/v1", model="judge-model", api_key="k", timeout_s=5)
    judge = RateLimitedClient(llm_text_fn(client), max_retries=3)
    rows = evaluate_extractor_llm(
        _docs(4), judge, "Judge {ecli}:\n{original_document}\n{extracted_output}",
        sample_size=None, concurrency=1,
    ).to_pandas()
    assert len(rows) == 4
    assert (rows["verdict"] == "PASS").all()
    assert (rows["score"] == 97.0).all()
    assert (rows["n_minor"] == 1).all()
    assert rows["judge_error"].isna().all()
