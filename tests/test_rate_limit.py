"""Rate-limit envelope: pacing, Retry-After, backoff, escalation flow."""

import time

import pytest
import ray

from decisions_knowledge_graph_data_ray.stages.rate_limit import (
    RateLimitedClient,
    RateLimitError,
    TokenBucket,
    is_rate_limit_error,
    retry_after_of,
)


def test_classification_duck_typing():
    assert is_rate_limit_error(RateLimitError())

    class SDKErr(Exception):
        status = 429

    class SDKErr2(Exception):
        code = "rate_limit_exceeded"

    assert is_rate_limit_error(SDKErr())
    assert is_rate_limit_error(SDKErr2())
    assert not is_rate_limit_error(ValueError("x"))
    assert retry_after_of(RateLimitError(retry_after=3)) == 3.0

    class HdrErr(Exception):
        headers = {"retry-after": "7"}

    assert retry_after_of(HdrErr()) == 7.0

    class DateErr(Exception):
        headers = {"retry-after": "Wed, 21 Oct 2026 07:28:00 GMT"}

    assert retry_after_of(DateErr()) is None  # HTTP-date → exponential path


def test_retry_after_honored_then_success():
    sleeps = []
    calls = {"n": 0}

    def flaky(doc):
        calls["n"] += 1
        if calls["n"] <= 2:
            raise RateLimitError(retry_after=0.25)
        return {"ok": doc}

    c = RateLimitedClient(flaky, sleep_fn=sleeps.append)
    assert c("x") == {"ok": "x"}
    assert calls["n"] == 3
    assert sleeps == [0.25, 0.25]


def test_exponential_backoff_capped_and_exhausted():
    sleeps = []

    def always(doc):
        raise RateLimitError()  # no retry_after → exponential

    c = RateLimitedClient(always, max_retries=5, sleep_fn=sleeps.append)
    with pytest.raises(RateLimitError):
        c("x")
    # 5 backoffs (the 6th failure re-raises): 2^(n+1) + jitter, capped 60
    assert len(sleeps) == 5
    for i, s in enumerate(sleeps):
        assert 2.0 ** (i + 1) <= s <= min(2.0 ** (i + 1) + 2.0, 60.0)


def test_non_rate_limit_errors_propagate_immediately():
    calls = {"n": 0}

    def broken(doc):
        calls["n"] += 1
        raise ValueError("boom")

    c = RateLimitedClient(broken, sleep_fn=lambda s: None)
    with pytest.raises(ValueError):
        c("x")
    assert calls["n"] == 1


def test_token_bucket_paces_globally(ray_session):
    bucket = TokenBucket.remote(rps=50)
    calls = []

    def fn(doc):
        calls.append(time.monotonic())
        return doc

    c = RateLimitedClient(fn, limiter=bucket)
    t0 = time.monotonic()
    for i in range(20):
        c(i)
    elapsed = time.monotonic() - t0
    # 20 requests at 50 rps need >= 19/50 = 0.38s of schedule
    assert elapsed >= 0.38
    stats = ray.get(bucket.stats.remote())
    assert stats["granted"] == 20
    assert stats["inflight"] == 0
    # telemetry: pacing forced real cumulative waiting, visible as a
    # number. The counter records the RETURNED waits — net of the RPC
    # round-trip time that burns part of each 1/rps interval naturally —
    # so it is positive but smaller than the 0.38s schedule length.
    assert stats["paced_wait_seconds"] > 0.03
    assert stats["refused"] == 0


def test_inflight_cap_blocks_until_finish(ray_session):
    bucket = TokenBucket.remote(max_inflight=1)
    granted, wait = ray.get(bucket.acquire.remote())
    assert granted
    refused, poll = ray.get(bucket.acquire.remote())
    assert not refused and poll > 0
    ray.get(bucket.finish.remote())
    granted2, _ = ray.get(bucket.acquire.remote())
    assert granted2
    # the refused grant is counted
    assert ray.get(bucket.stats.remote())["refused"] == 1


def test_rate_limited_hits_reported_to_bucket(ray_session):
    """Each provider 429 a client retries is recorded on the shared bucket
    with its backoff, so saturation shows up in stats(), not as silence."""
    bucket = TokenBucket.remote(rps=1000)
    attempts = {"n": 0}

    def flaky(doc):
        attempts["n"] += 1
        if attempts["n"] <= 3:
            raise RateLimitError(retry_after=0.01)
        return doc

    c = RateLimitedClient(flaky, limiter=bucket)
    assert c("doc") == "doc"
    # telemetry RPCs are fire-and-forget; stats() through the same actor
    # serializes behind them
    stats = ray.get(bucket.stats.remote())
    assert stats["rate_limited_hits"] == 3
    assert 0.02 <= stats["backoff_seconds"] <= 1.0
    assert stats["granted"] == 4  # 1 success + 3 retried attempts


def test_flaky_client_through_escalation(ray_session):
    """A primary extractor that always rate-limits past its retries fails
    rows to the escalation path; the wrapped fallback (flaky but
    recovering) completes every document — bounded RPS, eventual success."""
    import ray.data as rd

    from decisions_knowledge_graph_data_ray.functions.document import extract_document
    from decisions_knowledge_graph_data_ray.stages.extract import extract_with_escalation

    docs = rd.from_items(
        [
            {"conv_id": f"conv:{i:04d}", "text": f"user: hello {i}", "self_ecli": ""}
            for i in range(8)
        ]
    )

    def exhausted(doc):
        raise RateLimitError(retry_after=0.001)

    primary = RateLimitedClient(exhausted, max_retries=1, sleep_fn=lambda s: None)

    class FlakyOnce:
        """Rate-limits the first time it sees each doc (per-process state)."""

        def __init__(self):
            self.seen = set()

        def __call__(self, doc):
            if doc["conv_id"] not in self.seen:
                self.seen.add(doc["conv_id"])
                raise RateLimitError(retry_after=0.001)
            return extract_document(doc)

    bucket = TokenBucket.remote(rps=500)
    fallback = RateLimitedClient(FlakyOnce(), limiter=bucket, max_retries=3)

    out = extract_with_escalation(docs, primary_fn=primary, fallback_fn=fallback).to_pandas()
    assert len(out) == 8
    assert bool(out["valid"].all())
    assert ray.get(bucket.stats.remote())["granted"] >= 16  # ≥2 attempts/doc


def test_jitter_rng_not_shared_across_pickled_copies():
    """Pickled copies shipped to different actors must not share one fixed
    jitter seed (synchronized retry bursts). The RNG is seeded lazily per
    process from pid+urandom, so two fresh copies produce different jitter."""
    import pickle

    base = RateLimitedClient(str)
    a = pickle.loads(pickle.dumps(base))
    b = pickle.loads(pickle.dumps(base))
    # os.urandom in the lazy seed makes collision astronomically unlikely
    assert a._jitter() != b._jitter()
    # explicit rng stays deterministic for tests
    import random

    c = RateLimitedClient(lambda x: x, rng=random.Random(7))
    d = RateLimitedClient(lambda x: x, rng=random.Random(7))
    assert c._jitter() == d._jitter()


def test_inflight_poll_backs_off():
    """When the in-flight cap refuses grants, the re-poll interval grows
    exponentially (capped) instead of hammering the pacing actor at 50ms."""
    from decisions_knowledge_graph_data_ray.stages.rate_limit import (
        POLL_BASE_SECONDS,
        POLL_MAX_SECONDS,
    )

    class FakeLimiter:
        """Duck-types the TokenBucket handle: refuses N times, then grants."""

        def __init__(self, refusals):
            self.left = refusals
            outer = self

            class _Acquire:
                def remote(self):
                    if outer.left > 0:
                        outer.left -= 1
                        return _Ref((False, 0.05))
                    return _Ref((True, 0.0))

            class _Finish:
                def remote(self):
                    return _Ref(None)

            self.acquire = _Acquire()
            self.finish = _Finish()

    def _Ref(value):
        """Passthrough: ray.get is patched to identity below."""
        return value

    sleeps = []
    limiter = FakeLimiter(refusals=8)
    client = RateLimitedClient(lambda x: x, limiter=limiter, sleep_fn=sleeps.append)
    # ray.get on a non-ObjectRef raises, so monkeypatch is avoided by using
    # the real ray.get only with real handles elsewhere; here we call _pace's
    # logic through the public __call__ path with ray.get patched.
    import decisions_knowledge_graph_data_ray.stages.rate_limit as rl

    orig_get = rl.ray.get
    rl.ray.get = lambda v: v
    try:
        assert client(41) == 41
    finally:
        rl.ray.get = orig_get
    waits = [s for s in sleeps if s > 0]
    assert len(waits) == 8
    assert waits == sorted(waits)  # monotone non-decreasing backoff
    assert waits[0] == max(0.05, POLL_BASE_SECONDS)
    assert waits[-1] <= POLL_MAX_SECONDS
    assert waits[-1] > waits[0]
