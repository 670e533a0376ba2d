"""Text-analysis stages over a documents table (doc_id, text, ...).

Vectorized ``map_batches`` transforms: language ID, quality scoring, token
counting, fingerprinting. Definitions live in functions/text_stats.py and
are mirrored by the DuckDB oracle SQL in __ray_entry__ where expressible.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..functions import text_stats as T


def _token_counts(batch: pa.Table) -> pa.Table:
    texts = batch["text"].to_pylist()
    return batch.append_column(
        "n_ws_tokens", pa.array([T.whitespace_token_count(t) for t in texts], pa.int64())
    ).append_column(
        "n_word_tokens", pa.array([T.word_token_count(t) for t in texts], pa.int64())
    )


def token_counts(docs: ray.data.Dataset) -> ray.data.Dataset:
    """doc_id + whitespace / BPE-ish token counts."""
    return docs.map_batches(_token_counts, batch_format="pyarrow")


def _lang_id(batch: pa.Table) -> pa.Table:
    return batch.append_column(
        "lang_pred", pa.array([T.detect_language(t) for t in batch["text"].to_pylist()], pa.string())
    )


def language_id(docs: ray.data.Dataset) -> ray.data.Dataset:
    return docs.map_batches(_lang_id, batch_format="pyarrow")


def _quality(batch: pa.Table) -> pa.Table:
    metrics = [T.quality_metrics(t) for t in batch["text"].to_pylist()]
    for name, typ in (
        ("n_chars", pa.int64()),
        ("n_tokens", pa.int64()),
        ("punct_ratio", pa.float64()),
        ("stop_ratio", pa.float64()),
        ("mean_token_len", pa.float64()),
        ("keep", pa.bool_()),
    ):
        batch = batch.append_column(name, pa.array([m[name] for m in metrics], typ))
    return batch


def quality_score(docs: ray.data.Dataset) -> ray.data.Dataset:
    return docs.map_batches(_quality, batch_format="pyarrow")


def _fingerprint(batch: pa.Table) -> pa.Table:
    fps = [T.document_fingerprint(t) for t in batch["text"].to_pylist()]
    return batch.append_column("fingerprint", pa.array([f & 0x7FFFFFFFFFFFFFFF for f in fps], pa.int64()))


def fingerprints(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Winnowing-style rolling-hash fingerprints (mod 2^63 to stay int64)."""
    return docs.map_batches(_fingerprint, batch_format="pyarrow")


def length_histogram(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Bucketed doc-length histogram — partial-aggregate inside map_batches
    (one row per bucket per batch), then a tiny groupby (A3 analogue)."""
    from ..functions.normalize import length_category

    def _partial(batch: pa.Table) -> pa.Table:
        cats = [length_category(len(t)) for t in batch["text"].to_pylist()]
        counts: dict[str, int] = {}
        for c in cats:
            counts[c] = counts.get(c, 0) + 1
        return pa.table(
            {"length_category": list(counts.keys()), "partial_n": list(counts.values())}
        )

    from ray.data.aggregate import Sum

    return (
        docs.map_batches(_partial, batch_format="pyarrow")
        .groupby("length_category")
        .aggregate(Sum("partial_n", alias_name="n_docs"))
    )


def event_type_histogram(events: ray.data.Dataset) -> ray.data.Dataset:
    """groupby(event_type).count() with per-batch pre-aggregation (A2/A4)."""
    from ray.data.aggregate import Sum

    def _partial(batch: pa.Table) -> pa.Table:
        import collections

        c = collections.Counter(batch["event_type"].to_pylist())
        return pa.table({"event_type": list(c.keys()), "partial_n": list(c.values())})

    return (
        events.map_batches(_partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("partial_n", alias_name="n_events"))
    )
