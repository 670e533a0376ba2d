"""Block-citation enrichment stage (Agents 2D/5B analogue).

The reference runs these as dependency-join jobs: blocks (pre-transformed
HTML) + the upstream extraction outputs are loaded per decision and merged
(enrich-teaching-citations/config.ts dependency list). Here the per-document
extraction is deterministic and ~3.5 ms, so the stage RECOMPUTES it inline
from the assembled document instead of shuffling three tables back together
— recompute-over-join is the right trade at this cost (the document text
would have to move into the join anyway, and it is the widest column).
An ``extractions`` dataset can still be joined upstream by callers that
already materialized one (checkpointed pipelines do); pass
``precomputed=True`` and provide rows carrying both ``text`` and the
extraction fields.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

_OUT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("kind", pa.string()),
        ("entity_id", pa.string()),
        ("n_citations", pa.int64()),
        ("block_ids", pa.string()),
        ("first_snippet", pa.string()),
        ("related_provision_ids", pa.string()),
        ("related_decision_ids", pa.string()),
    ]
)


def block_citation_rows(docs: ray.data.Dataset, precomputed: bool = False) -> ray.data.Dataset:
    """Assembled documents → flat per-entity block-citation rows."""

    def _enrich(batch: pa.Table) -> pa.Table:
        from ..functions.block_citations import enrich_block_citations
        from ..functions.document import extract_document

        rows = []
        for rec in batch.to_pylist():
            extraction = rec if precomputed else extract_document(rec)
            rows.extend(enrich_block_citations(rec["conv_id"], rec["text"], extraction))
        if not rows:
            return _OUT_SCHEMA.empty_table()
        return pa.Table.from_pylist(rows, schema=_OUT_SCHEMA)

    return docs.map_batches(_enrich, batch_format="pyarrow")
