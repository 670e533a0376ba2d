"""Sinks + run summaries (SURVEY.md S5-S7, A1-A4, J9, D6, O4).

- ``write_triples``: partitioned parquet graph sink (resumable layout: one
  directory per shard; row identity is a column, never a filename —
  replaces the reference's one-JSON-per-result sink S5).
- ``run_summary``: counts / success-rate / failure histogram (A1/A2,
  ConcurrentProcessor.ts:486-533).
- ``citation_statistics``: type / treatment / jurisdiction histograms (A4,
  citationStatisticsAnalyzer.ts:12-80).
- ``upsert_latest``: retry-overlay merge — union + per-key keep-latest
  (J9, mergeRetryResults.ts / merge-by-teaching-id.ts:33-60).
- ``anti_join_processed``: resume anti-join against a processed-key set
  (D6, ConcurrentRunner.ts:194-263) via broadcast key set.
"""

from __future__ import annotations

import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Sum

from ..functions.normalize import stable_hash32


def write_triples(triples: ray.data.Dataset, out_dir: str, num_shards: int = 32) -> None:
    """Deduplicated (subj,pred,obj) parquet, hash-partitioned by subj so a
    rerun can skip finished shard directories."""

    def _shard(batch: pa.Table) -> pa.Table:
        shards = [stable_hash32(s) % num_shards for s in batch["subj"].to_pylist()]
        return batch.append_column("shard", pa.array(shards, pa.int32()))

    triples.map_batches(_shard, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["shard"]
    )


def run_summary(extractions: ray.data.Dataset) -> dict:
    """A1: totals, success rate, failure-reason histogram — partial counts
    per batch, tiny final combine on the driver."""

    def _partial(batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        ok = sum(1 for r in rows if r.get("valid"))
        reasons: dict[str, int] = {}
        for r in rows:
            if not r.get("valid"):
                reasons[r.get("failure_reason") or "unknown"] = (
                    reasons.get(r.get("failure_reason") or "unknown", 0) + 1
                )
        out = [{"key": "__total", "n": len(rows)}, {"key": "__ok", "n": ok}]
        out.extend({"key": f"reason:{k}", "n": v} for k, v in reasons.items())
        return pa.Table.from_pylist(out, schema=pa.schema([("key", pa.string()), ("n", pa.int64())]))

    counts = (
        extractions.map_batches(_partial, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    kv = dict(zip(counts["key"], counts["n"]))
    total = int(kv.pop("__total", 0))
    ok = int(kv.pop("__ok", 0))
    return {
        "total": total,
        "successful": ok,
        "failed": total - ok,
        "success_rate": (ok / total) if total else 0.0,
        "errors_by_type": {k.removeprefix("reason:"): int(v) for k, v in kv.items()},
    }


def citation_statistics(extractions: ray.data.Dataset) -> ray.data.Dataset:
    """A4: histogram over (dimension, value) for treatment / jurisdiction /
    confidence of cited decisions — partial counts per batch then one small
    groupby."""

    def _partial(batch: pa.Table) -> pa.Table:
        counts: dict[tuple[str, str], int] = {}
        for rec in batch.to_pylist():
            for c in rec.get("cited_decisions") or []:
                for dim in ("treatment", "jurisdiction", "confidence"):
                    key = (dim, str(c.get(dim)))
                    counts[key] = counts.get(key, 0) + 1
        return pa.table(
            {
                "dimension": [k[0] for k in counts],
                "value": [k[1] for k in counts],
                "partial_n": list(counts.values()),
            }
        )

    return (
        extractions.map_batches(_partial, batch_format="pyarrow")
        .groupby(["dimension", "value"])
        .aggregate(Sum("partial_n", alias_name="n"))
    )


def upsert_latest(
    base: ray.data.Dataset, overlay: ray.data.Dataset, key_col: str, ts_col: str,
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """J9 retry-merge: union both runs, keep one row per key — max ts wins,
    overlay wins ties (retry results overwrite originals).

    Hash-partitioned keep-latest: one pandas groupby per partition."""
    tagged_base = base.map_batches(
        lambda b: b.append_column("__src", pa.array([0] * b.num_rows, pa.int8())),
        batch_format="pyarrow",
    )
    tagged_overlay = overlay.map_batches(
        lambda b: b.append_column("__src", pa.array([1] * b.num_rows, pa.int8())),
        batch_format="pyarrow",
    )
    both = tagged_base.union(tagged_overlay)

    def _pid(batch: pa.Table) -> pa.Table:
        pids = [stable_hash32(str(k)) % num_partitions for k in batch[key_col].to_pylist()]
        return batch.append_column("__pid", pa.array(pids, pa.int32()))

    def _latest(group):
        g = group.sort_values([key_col, ts_col, "__src"], kind="stable")
        out = g.groupby(key_col, sort=False).tail(1)
        return out.drop(columns=["__pid", "__src"])

    return (
        both.map_batches(_pid, batch_format="pyarrow")
        .groupby("__pid")
        .map_groups(_latest, batch_format="pandas")
    )


def anti_join_processed(
    ds: ray.data.Dataset, processed_keys: set[str], key_col: str
) -> ray.data.Dataset:
    """D6 resume anti-join: drop rows whose key is already processed.
    The processed set is broadcast once via ray.put (or a Bloom filter at
    scale), then filtered vectorized per batch."""
    ref = ray.put(processed_keys)

    class Filter:
        def __init__(self):
            self._keys = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            mask = pa.array([str(k) not in self._keys for k in batch[key_col].to_pylist()])
            return batch.filter(mask)

    return ds.map_batches(Filter, batch_format="pyarrow", concurrency=(1, 4))
