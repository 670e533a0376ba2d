"""Linking stage: extraction records → link rows (+ candidate edges).

The broadcast hash join of SURVEY.md T2/T3/T5: the driver builds ONE
LinkerIndex from the canonical entity tables and ``ray.put``s it; every
linker actor fetches the shared object-store copy once in ``__init__``
(never re-shipped per batch / per task). At 100 TB scale with a lookup side
too big for one object, the same stage shards the index by
hash(document_number) across an actor pool and routes mention batches by
key hash — the alias tables here (~10^3..10^6 rows) broadcast whole.

Fast paths (popular-law alias, exact ECLI, missing-court skip, invalid-date
skip) short-circuit inside the actor before any candidate scoring — the
reference's _skipLLM routing (mapping/steps.ts:301-322,793-857) expressed as
per-row branch inside one vectorized batch pass.
"""

from __future__ import annotations

import pyarrow as pa

import ray
import ray.data

from .. import schemas
from ..functions.document import link_document
from ..functions.normalize import extract_date_from_ecli


class LinkerActor:
    """Entity-linking actor: index fetched from the object store once."""

    def __init__(self, index_ref):
        # ray.get on an ObjectRef inside actor __init__: zero-copy-ish shared
        # fetch of the broadcast index (one copy per node, not per actor).
        self._idx = ray.get(index_ref) if isinstance(index_ref, ray.ObjectRef) else index_ref

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for rec in batch.to_pylist():
            decision_date = extract_date_from_ecli(rec.get("self_ecli") or "") or None
            out.extend(link_document(rec, self._idx, decision_date))
        if not out:
            return schemas.LINKS_SCHEMA.empty_table()
        return pa.Table.from_pylist(out, schema=schemas.LINKS_SCHEMA)


def link_extractions(
    extractions: ray.data.Dataset,
    index_ref,
    concurrency: int | tuple[int, int] = (1, 8),
    batch_size: int = 128,
) -> ray.data.Dataset:
    return extractions.map_batches(
        LinkerActor,
        fn_constructor_kwargs={"index_ref": index_ref},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
