"""Extraction stage: assembled documents → schema-validated extraction records.

The extractor is an injectable per-batch callable class with an enforced
output schema — the engine's analogue of the reference's JobConfig
(promptTemplate → JSON → AJV validate, /root/reference/src/jobs/JobConfig.ts:119-169).
The shipped default is the deterministic rule-based extractor
(functions/document.extract_document); a real LLM client slots into the
same actor-pool stage by overriding ``extract_fn``.

Runs as ``map_batches(ExtractorActor, concurrency=N)`` — an actor pool so
per-actor setup (jsonschema validator compilation, extractor construction)
happens once per actor, not per batch (SURVEY.md T1). Validation failures
don't kill the row silently: each output row carries ``valid`` /
``failure_reason`` / ``failure_error`` columns; the pipeline filters valid
rows downstream and routes the rest to the failures table with the
reference's reason taxonomy (ConcurrentProcessor.ts:758-777).
"""

from __future__ import annotations

from typing import Callable

import pyarrow as pa

import ray.data

from .. import schemas
from ..functions.document import extract_document

_EXTRACT_OUT_SCHEMA = pa.schema(
    list(schemas.EXTRACTIONS_SCHEMA)
    + [
        pa.field("valid", pa.bool_()),
        pa.field("failure_reason", pa.string()),
        pa.field("failure_error", pa.string()),
    ]
)

_EMPTY_EXTRACTION = {
    "cited_provisions": [],
    "cited_decisions": [],
    "references": {
        k: []
        for k in (
            "url_eu", "url_be", "eu_extracted", "eu_verified",
            "be_extracted", "be_verified_numac", "be_verified_file_number",
        )
    },
    "keywords": [],
    "micro_summary": "",
    "legal_teachings": [],
    "parties": [],
    "outcome": "",
}


class ExtractorActor:
    """Stateful extraction stage: validator compiled once per actor."""

    def __init__(self, extract_fn: Callable[[dict], dict] | None = None):
        from ..functions.validate import first_error_fn

        self._extract_fn = extract_fn or extract_document
        # compiled-closure validator (AJV-style compile-once); falls back to
        # jsonschema automatically for schemas outside the compiled subset
        self._first_error = first_error_fn(schemas.EXTRACTION_JSON_SCHEMA)

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        conv_ids = batch["conv_id"].to_pylist()
        texts = batch["text"].to_pylist()
        self_eclis = batch["self_ecli"].to_pylist()
        for conv_id, text, self_ecli in zip(conv_ids, texts, self_eclis):
            doc = {"conv_id": conv_id, "text": text, "self_ecli": self_ecli}
            try:
                rec = self._extract_fn(doc)
            except Exception as e:  # extractor crash → Request Error failure row
                rec = {"conv_id": conv_id, "self_ecli": self_ecli, **_EMPTY_EXTRACTION}
                rec.update(valid=False, failure_reason=schemas.REASON_REQUEST_ERROR, failure_error=str(e)[:500])
                rows.append(rec)
                continue
            err = self._first_error(rec)
            if err is not None:
                bad = {"conv_id": conv_id, "self_ecli": self_ecli, **_EMPTY_EXTRACTION}
                bad.update(
                    valid=False,
                    failure_reason=schemas.REASON_SCHEMA_VALIDATION,
                    failure_error=err[:500],
                )
                rows.append(bad)
                continue
            # cross-item check a JSON schema can't express: every hierarchy
            # ref must name a teaching of the SAME document (the reference's
            # validationChecks.allHierarchyReferencesValid,
            # extract-legal-teachings/schema.ts:288-301)
            from ..functions.teachings import hierarchy_reference_errors

            href_errors = hierarchy_reference_errors(rec.get("legal_teachings", []))
            if href_errors:
                bad = {"conv_id": conv_id, "self_ecli": self_ecli, **_EMPTY_EXTRACTION}
                bad.update(
                    valid=False,
                    failure_reason=schemas.REASON_POST_PROCESSING,
                    failure_error="; ".join(href_errors)[:500],
                )
                rows.append(bad)
            else:
                rows.append({**rec, "valid": True, "failure_reason": "", "failure_error": ""})
        return pa.Table.from_pylist(rows, schema=_EXTRACT_OUT_SCHEMA)


def extract_documents(
    docs: ray.data.Dataset,
    extract_fn: Callable[[dict], dict] | None = None,
    concurrency: int | tuple[int, int] = (1, 8),
    batch_size: int = 64,
) -> ray.data.Dataset:
    """Documents → extraction records (valid + failure rows interleaved)."""
    return docs.map_batches(
        ExtractorActor,
        fn_constructor_kwargs={"extract_fn": extract_fn},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def split_failures(extractions: ray.data.Dataset) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """(valid_extractions, failures) — two filtered views of the stage output."""
    valid = extractions.filter(expr="valid == True").drop_columns(
        ["valid", "failure_reason", "failure_error"]
    )

    def _to_failures(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        bad = batch.filter(pc.invert(batch["valid"]))
        return pa.table(
            {
                "conv_id": bad["conv_id"],
                "stage": pa.array(["extract"] * bad.num_rows, pa.string()),
                "reason": bad["failure_reason"],
                "error": bad["failure_error"],
            }
        )

    failures = extractions.map_batches(_to_failures, batch_format="pyarrow")
    return valid, failures


def extract_with_escalation(
    docs: ray.data.Dataset,
    primary_fn: Callable[[dict], dict] | None = None,
    fallback_fn: Callable[[dict], dict] | None = None,
    concurrency: int | tuple[int, int] = (1, 8),
    fallback_concurrency: int | tuple[int, int] = (1, 2),
    batch_size: int = 64,
) -> ray.data.Dataset:
    """Semantic retry with escalation as dataflow (SURVEY.md §7.4 item 6).

    The reference retries a failed step up to 3 times, switching to a
    stronger model on the final attempt (PipelineOrchestrator.ts:177-214).
    In a DAG that loop becomes a bounded second pass: run the primary
    extractor, route failed rows to a second actor pool running the
    fallback extractor, union the successes (failures that ALSO fail the
    fallback stay failures, with the fallback's reason).

    The docs input is materialized once so the failure branch doesn't
    recompute upstream.
    """
    docs = docs.materialize()
    first = extract_documents(
        docs, extract_fn=primary_fn, concurrency=concurrency, batch_size=batch_size
    ).materialize()
    ok = first.filter(expr="valid == True")

    # route failed rows back to docs WITHOUT collecting an unbounded id set
    # on the driver: small failure counts broadcast a set (fast path); a
    # misbehaving primary extractor (the case escalation exists for) can
    # fail most of the corpus, so above the threshold the routing becomes a
    # distributed bucketed semi-join.
    failed = first.filter(expr="valid == False").select_columns(["conv_id"]).materialize()
    n_failed = failed.count()
    if not n_failed:
        return ok

    if n_failed <= 200_000:
        import ray as _ray

        failed_ids = {
            c
            for b in failed.iter_batches(batch_format="pyarrow")
            for c in b["conv_id"].to_pylist()
        }
        ids_ref = _ray.put(failed_ids)

        class OnlyFailed:
            def __init__(self):
                self._ids = _ray.get(ids_ref)

            def __call__(self, batch: pa.Table) -> pa.Table:
                mask = pa.array([c in self._ids for c in batch["conv_id"].to_pylist()])
                return batch.filter(mask)

        retry_docs = docs.map_batches(OnlyFailed, batch_format="pyarrow", concurrency=(1, 2))
    else:
        from .joins import hash_bucket_join

        doc_schema = getattr(docs.schema(), "base_schema", None)
        retry_docs = hash_bucket_join(
            docs,
            failed,
            on="conv_id",
            output_columns=[f.name for f in doc_schema],
            how="left_semi",
            left_schema=doc_schema,
            right_schema=pa.schema([("conv_id", pa.string())]),
        )
    second = extract_documents(
        retry_docs,
        extract_fn=fallback_fn,
        concurrency=fallback_concurrency,
        batch_size=batch_size,
    )
    return ok.union(second)
