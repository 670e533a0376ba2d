"""`ray job submit` entrypoint for the flagship KG-construction pipeline.

The north rule requires the pipeline to run as a submitted Ray job on a
fixed-size multi-node cluster (the reference's equivalent is its CLI runner,
/root/reference/src/runPipeline.ts). This module is that surface:

    ray job submit --working-dir . -- \
        python -m decisions_knowledge_graph_data_ray.job \
        --input  s3://bucket/transcripts/ \
        --output s3://bucket/kg-out/run1 \
        --checkpoint-dir s3://bucket/kg-out/run1/state

Semantics:
  - connects to the submitting cluster (`RAY_ADDRESS`, which the Ray job
    supervisor sets; `local` in this sandbox) — it never owns a nested init
    when a session already exists (library rule: only CLI entry points init).
  - streams transcripts → triples/links/failures as hash-sharded parquet
    under --output (one directory per shard; identity is a column, never a
    filename), the resumable layout write_triples established.
  - with --checkpoint-dir, runs the per-partition-lineage checkpointed plan
    (state/manifest.py): a rerun with the same input + dir skips completed
    partitions, and the emitted summary reports computed vs skipped counts.
  - row counts in the summary are read back from the WRITTEN parquet
    (metadata-only), so nothing is counted by re-executing the pipeline and
    nothing is materialized driver-side — the 100-TB shape.
  - prints ONE JSON line (the bench.py contract) and writes it to
    --output/summary.json so the job's artifacts are self-describing.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import ray
import ray.data


def _parse_concurrency(spec: str):
    """'auto' | 'N' | 'MIN,MAX' → the KGConfig concurrency forms."""
    if spec == "auto":
        return "auto"
    if "," in spec:
        lo, hi = spec.split(",", 1)
        return (int(lo), int(hi))
    return int(spec)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m decisions_knowledge_graph_data_ray.job",
        description="Run the KG-construction pipeline as a Ray job.",
    )
    p.add_argument("--input", required=True, help="transcripts parquet file/dir")
    p.add_argument("--output", required=True, help="output dir (parquet + summary.json)")
    p.add_argument(
        "--checkpoint-dir",
        default=None,
        help="enable the resumable per-partition plan; reruns skip finished partitions",
    )
    p.add_argument(
        "--mode",
        choices=["streamed", "barrier"],
        default="streamed",
        help="streamed (default; one pass over corpus text) or stage barriers",
    )
    p.add_argument("--extract-concurrency", default="auto", help="'auto', N, or MIN,MAX")
    p.add_argument("--link-concurrency", default="auto", help="'auto', N, or MIN,MAX")
    p.add_argument("--extract-batch-size", type=int, default=64)
    p.add_argument("--link-batch-size", type=int, default=128)
    p.add_argument(
        "--num-partitions",
        type=int,
        default=16,
        help="checkpoint lineage partitions (only with --checkpoint-dir)",
    )
    p.add_argument(
        "--triple-shards",
        type=int,
        default=32,
        help="hash shards for the triples/links/failures output layout",
    )
    return p


def _write_sharded(ds: ray.data.Dataset, out_dir: str, key_col: str, num_shards: int) -> None:
    """Hash-sharded parquet (shard dirs skippable on rerun, key as column)."""
    import pyarrow as pa

    from .functions.normalize import stable_hash32

    def _shard(batch: pa.Table) -> pa.Table:
        shards = [stable_hash32(str(v)) % num_shards for v in batch[key_col].to_pylist()]
        return batch.append_column("shard", pa.array(shards, pa.int32()))

    ds.map_batches(_shard, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["shard"]
    )


def _written_count(out_dir: str) -> int:
    """Row count from parquet metadata — no data read, no plan re-execution.
    An empty dataset writes no files; read_parquet then raises → 0 rows."""
    try:
        return ray.data.read_parquet(out_dir).count()
    except Exception:  # noqa: BLE001 — no files under out_dir
        return 0


def run_job(args: argparse.Namespace) -> dict:
    from .pipelines.kg import KGConfig, run_kg_pipeline, run_kg_pipeline_checkpointed
    from .stages.sinks import write_triples

    config = KGConfig(
        extract_concurrency=_parse_concurrency(args.extract_concurrency),
        link_concurrency=_parse_concurrency(args.link_concurrency),
        extract_batch_size=args.extract_batch_size,
        link_batch_size=args.link_batch_size,
        materialize_extractions=(args.mode == "barrier"),
    )

    t0 = time.perf_counter()
    transcripts = ray.data.read_parquet(args.input)
    counters: dict = {}
    if args.checkpoint_dir:
        results = run_kg_pipeline_checkpointed(
            transcripts,
            run_dir=args.checkpoint_dir,
            config=config,
            num_partitions=args.num_partitions,
            counters=counters,
        )
    else:
        results = run_kg_pipeline(transcripts, config=config)

    out = args.output.rstrip("/")
    write_triples(results["triples"], f"{out}/triples", num_shards=args.triple_shards)
    _write_sharded(results["links"], f"{out}/links", "conv_id", args.triple_shards)
    _write_sharded(results["failures"], f"{out}/failures", "conv_id", args.triple_shards)
    wall = time.perf_counter() - t0

    summary = {
        "metric": "kg_job",
        "value": round(wall, 3),
        "unit": "sec",
        "input": args.input,
        "output": out,
        "mode": "checkpointed" if args.checkpoint_dir else args.mode,
        "num_cpus": int(ray.cluster_resources().get("CPU", 0)),
        "rows": {
            "triples": _written_count(f"{out}/triples"),
            "links": _written_count(f"{out}/links"),
            "failures": _written_count(f"{out}/failures"),
        },
    }
    if counters:
        summary["partitions"] = {
            stage: {
                "computed": sum(1 for c in per_pid.values() if not c.get("skipped")),
                "skipped": sum(1 for c in per_pid.values() if c.get("skipped")),
            }
            for stage, per_pid in counters.items()
        }
    os.makedirs(out, exist_ok=True)
    with open(f"{out}/summary.json", "w") as f:
        json.dump(summary, f, indent=1)
    return summary


def main(argv: list[str] | None = None) -> dict:
    args = build_parser().parse_args(argv)
    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "auto"),
            include_dashboard=False,
            ignore_reinit_error=True,
        )
    try:
        summary = run_job(args)
    finally:
        if owns_session:
            ray.shutdown()
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()
