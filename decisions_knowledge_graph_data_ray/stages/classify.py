"""Classification stage: closed-set validation + retry-with-feedback.

Rebuilds classify-legal-issues' validate/retry flow as dataflow
(/root/reference/src/jobs/classify-legal-issues/validation.ts:19-103,
stages.ts:437-557):

  attempt → validate against the closed code set → on violation, RETRY the
  classifier with the validation errors as feedback → still invalid →
  strict fallback classifier (the reference's gpt-4.1 temperature-0
  fallback) → review-tier routing:

    auto_accept       — first attempt valid
    expedited_review  — valid only after the feedback retry
    mandatory_review  — fallback used (or still invalid)

The classifier is an injectable ``fn(text, feedback) -> label`` (the
reference's LLM call); the shipped default is the deterministic
``functions.parties.classify_outcome`` (ignores feedback — always valid on
first attempt). Validation is ``fn(label) -> [errors]`` over the closed
outcome enum. Runs as an actor pool so injected classifiers can hold
per-actor state (model clients, prompt caches).
"""

from __future__ import annotations

from typing import Callable

import pyarrow as pa

import ray.data

from ..functions.parties import classify_outcome, validate_outcome

OUT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("outcome", pa.string()),
        ("valid", pa.bool_()),
        ("retried", pa.bool_()),
        ("used_fallback", pa.bool_()),
        ("review_tier", pa.string()),
        ("errors", pa.string()),
    ]
)


def _default_classify(text: str, feedback: list[str] | None = None) -> str:
    return classify_outcome(text)


def _default_fallback(text: str) -> str:
    # strictest deterministic fallback: always a valid catch-all label
    from ..functions.parties import _NL_DOC_RE  # shared language cue

    return "ANDERE" if _NL_DOC_RE.search(text) else "AUTRE"


class OutcomeClassifierActor:
    """Per-document outcome classification with the validate/retry loop."""

    def __init__(
        self,
        classify_fn: Callable[[str, list[str] | None], str] | None = None,
        fallback_fn: Callable[[str], str] | None = None,
        validate_fn: Callable[[str], list[str]] | None = None,
    ):
        self._classify = classify_fn or _default_classify
        self._fallback = fallback_fn or _default_fallback
        self._validate = validate_fn or validate_outcome

    def _one(self, text: str) -> tuple[str, bool, bool, bool, str, str]:
        label = self._classify(text, None)
        errors = self._validate(label)
        retried = used_fallback = False
        if errors:
            retried = True
            label = self._classify(text, errors)  # retry WITH error feedback
            errors = self._validate(label)
            if errors:
                used_fallback = True
                label = self._fallback(text)
                errors = self._validate(label)
        tier = (
            "mandatory_review"
            if used_fallback or errors
            else ("expedited_review" if retried else "auto_accept")
        )
        return label, not errors, retried, used_fallback, tier, "; ".join(errors)

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        for conv_id, text in zip(batch["conv_id"].to_pylist(), batch["text"].to_pylist()):
            label, ok, retried, fb, tier, errs = self._one(text)
            rows.append(
                {
                    "conv_id": conv_id,
                    "outcome": label,
                    "valid": ok,
                    "retried": retried,
                    "used_fallback": fb,
                    "review_tier": tier,
                    "errors": errs,
                }
            )
        return pa.Table.from_pylist(rows, schema=OUT_SCHEMA)


def classify_outcomes(
    docs: ray.data.Dataset,
    classify_fn=None,
    fallback_fn=None,
    validate_fn=None,
    concurrency: int | tuple = (1, 8),
    batch_size: int = 256,
) -> ray.data.Dataset:
    """documents(conv_id, text) → validated outcome classification rows."""
    return docs.map_batches(
        OutcomeClassifierActor,
        fn_constructor_kwargs={
            "classify_fn": classify_fn,
            "fallback_fn": fallback_fn,
            "validate_fn": validate_fn,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
