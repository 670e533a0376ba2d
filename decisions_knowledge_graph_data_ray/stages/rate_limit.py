"""Rate-limited client envelope for injected extractors/classifiers.

Rebuilds the reference's concurrent-client protections
(/root/reference/src/concurrent/OpenAIConcurrentClient.ts) as Ray-native
pieces that compose with the injectable ``extract_fn`` /
``classify_fn`` surfaces:

  - global RPS pacing            (:61-116  pLimit + minDelayMs mutex)
  - max in-flight call cap       (:61-66   maxConcurrentApiCalls)
  - 429 retry with backoff       (:225-283 retryWithBackoff: Retry-After
    header honored when parseable as seconds, else exponential
    2^(attempt+1) + jitter, capped at 60s, max 5 retries)

The reference enforces these inside ONE Node process; an actor-pool
extraction stage has N worker processes sharing one provider quota, so the
pacing state lives in a tiny ``num_cpus=0`` Ray actor (``TokenBucket``)
that every pool actor talks to. The bucket only computes the caller's
sleep duration — callers sleep in their own process, so the bucket never
blocks and adds one sub-millisecond RPC per request.

Usage::

    bucket = TokenBucket.remote(rps=10, max_inflight=200)
    fn = RateLimitedClient(flaky_llm_fn, limiter=bucket)
    extract_documents(docs, extract_fn=fn)          # or extract_with_escalation
"""

from __future__ import annotations

import os
import random
import time
from typing import Any, Callable

import ray

MAX_BACKOFF_SECONDS = 60.0  # reference caps waits at the 60s token window
POLL_BASE_SECONDS = 0.05  # first in-flight-cap re-poll
POLL_MAX_SECONDS = 1.0  # cap so a saturated bucket isn't busy-polled


class RateLimitError(Exception):
    """Provider rate-limit signal for injected clients.

    ``retry_after`` mirrors the Retry-After header (seconds). Clients that
    raise provider-native errors are also recognized via ``status == 429``
    or ``code == 'rate_limit_exceeded'`` attributes (the same duck-typing
    the reference applies to its SDK errors).
    """

    def __init__(self, message: str = "rate limited", retry_after: float | None = None):
        super().__init__(message)
        self.status = 429
        self.retry_after = retry_after


def is_rate_limit_error(e: BaseException) -> bool:
    return (
        getattr(e, "status", None) == 429
        or getattr(e, "code", None) == "rate_limit_exceeded"
    )


def retry_after_of(e: BaseException) -> float | None:
    """Retry-After in seconds when the error carries a parseable one."""
    ra = getattr(e, "retry_after", None)
    if ra is None:
        headers = getattr(e, "headers", None) or {}
        ra = headers.get("retry-after") if isinstance(headers, dict) else None
    if ra is None:
        return None
    try:
        return float(ra)
    except (TypeError, ValueError):
        return None  # HTTP-date form → caller falls back to exponential


@ray.remote(num_cpus=0)
class TokenBucket:
    """Cluster-global pacing + in-flight cap (one per provider/job).

    ``acquire()`` grants a start slot on the pacing schedule (one request
    per 1/rps seconds, like the reference's minDelayMs mutex — globalized
    across the actor pool) and returns how long the caller must sleep
    before actually issuing its request. When the in-flight cap is
    reached the grant is refused and the caller polls again after the
    returned delay.
    """

    def __init__(self, rps: float | None = None, max_inflight: int | None = None):
        self._min_delay = (1.0 / rps) if rps else 0.0
        self._max_inflight = max_inflight
        self._next_free = 0.0
        self._inflight = 0
        # telemetry: a saturated provider must show up in run summaries as
        # numbers, not as silent latency (round-4 VERDICT action item)
        self._granted = 0
        self._refused = 0
        self._paced_wait_seconds = 0.0
        self._rate_limited_hits = 0
        self._backoff_seconds = 0.0

    def acquire(self) -> tuple[bool, float]:
        """→ (granted, sleep_seconds)."""
        now = time.monotonic()
        if self._max_inflight is not None and self._inflight >= self._max_inflight:
            self._refused += 1
            return False, 0.05  # poll again; finish() frees a slot
        scheduled = max(now, self._next_free)
        self._next_free = scheduled + self._min_delay
        self._inflight += 1
        self._granted += 1
        wait = max(0.0, scheduled - now)
        self._paced_wait_seconds += wait
        return True, wait

    def finish(self) -> None:
        self._inflight = max(0, self._inflight - 1)

    def record_rate_limited(self, backoff_seconds: float) -> None:
        """Clients report each provider 429 + the backoff they will sleep,
        so the cluster-wide 429 pressure is readable from one place."""
        self._rate_limited_hits += 1
        self._backoff_seconds += backoff_seconds

    def stats(self) -> dict:
        return {
            "granted": self._granted,
            "refused": self._refused,
            "inflight": self._inflight,
            "min_delay": self._min_delay,
            "paced_wait_seconds": round(self._paced_wait_seconds, 3),
            "rate_limited_hits": self._rate_limited_hits,
            "backoff_seconds": round(self._backoff_seconds, 3),
        }


class RateLimitedClient:
    """Wrap an injectable ``fn(arg) -> result`` with the reference envelope.

    Picklable (ships into actor pools); the optional ``limiter`` is a
    ``TokenBucket`` actor handle shared by every copy. ``sleep_fn`` and
    ``rng`` are injectable for deterministic tests.
    """

    def __init__(
        self,
        fn: Callable[[Any], Any],
        limiter=None,
        max_retries: int = 5,
        sleep_fn: Callable[[float], None] = time.sleep,
        rng: random.Random | None = None,
    ):
        self._fn = fn
        self._limiter = limiter
        self._max_retries = max_retries
        self._sleep = sleep_fn
        # None → seeded lazily per process: a pickled copy shipped to every
        # pool actor must NOT share one fixed seed, or all workers compute
        # identical jitter and retry in synchronized bursts.
        self._rng = rng

    def _jitter(self) -> float:
        if self._rng is None:
            self._rng = random.Random(os.getpid() ^ int.from_bytes(os.urandom(4), "little"))
        return self._rng.random()

    def _pace(self) -> None:
        if self._limiter is None:
            return
        poll = POLL_BASE_SECONDS
        while True:
            granted, wait = ray.get(self._limiter.acquire.remote())
            if granted:
                if wait > 0:
                    self._sleep(wait)
                return
            # cap refused: back off the re-poll exponentially so a large
            # actor pool doesn't hammer the single pacing actor when the
            # system is already saturated.
            self._sleep(max(wait, poll))
            poll = min(poll * 2.0, POLL_MAX_SECONDS)

    def __call__(self, arg):
        last: BaseException | None = None
        for attempt in range(self._max_retries + 1):
            self._pace()
            try:
                return self._fn(arg)
            except Exception as e:  # noqa: BLE001 — classified below
                last = e
                if not is_rate_limit_error(e) or attempt == self._max_retries:
                    raise
                ra = retry_after_of(e)
                if ra is not None:
                    wait = ra
                else:
                    wait = 2.0 ** (attempt + 1) + self._jitter() * 2.0
                wait = min(wait, MAX_BACKOFF_SECONDS)
                if self._limiter is not None:
                    # fire-and-forget telemetry: 429 pressure is visible in
                    # TokenBucket.stats() instead of hiding as latency
                    self._limiter.record_rate_limited.remote(wait)
                self._sleep(wait)
            finally:
                if self._limiter is not None:
                    self._limiter.finish.remote()
        raise last  # pragma: no cover — loop either returns or raises above
