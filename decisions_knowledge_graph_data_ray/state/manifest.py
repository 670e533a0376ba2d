"""Per-partition checkpoint manifests + resume (north-rule requirement).

Design (SURVEY.md §4 'Checkpoint / resume'):
  run_dir/
    <stage>/
      partition=<pid>/part.parquet      # written atomically (tmp + rename)
      manifest/<pid>.json               # {partition_id, input_fingerprint,
                                        #  row_count, status, run_id}

A stage runs partition-wise: the input dataset is hash-partitioned into
``num_partitions`` by a key column; each partition whose manifest entry says
COMPLETE (with a matching input fingerprint) is SKIPPED on rerun — the
anti-join-vs-checkpoint pattern of the reference's --resume-from
(ConcurrentRunner.ts:194-236), expressed at partition granularity.

Fingerprints are order-insensitive: xor of row-hashes of the key column, so
upstream block order (which Ray does not guarantee) never invalidates a
completed partition.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from ..functions.normalize import stable_hash32


def partition_of(key: str, num_partitions: int) -> int:
    return stable_hash32(key) % num_partitions


def _fingerprint(keys: list[str]) -> str:
    acc = 0
    for k in keys:
        acc ^= stable_hash32("fp:" + k)
    return format(acc, "08x")


class StageCheckpoint:
    """Checkpointed execution of one stage over one partitioned input."""

    def __init__(self, run_dir: str, stage: str, num_partitions: int, run_id: str = "run"):
        self.stage_dir = os.path.join(run_dir, stage)
        self.manifest_dir = os.path.join(self.stage_dir, "manifest")
        os.makedirs(self.manifest_dir, exist_ok=True)
        self.num_partitions = num_partitions
        self.run_id = run_id
        self.stage = stage

    def _manifest_path(self, pid: int) -> str:
        return os.path.join(self.manifest_dir, f"{pid}.json")

    def _part_dir(self, pid: int) -> str:
        return os.path.join(self.stage_dir, f"partition={pid}")

    def load_manifest(self, pid: int) -> dict | None:
        path = self._manifest_path(pid)
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    def is_complete(self, pid: int, input_fingerprint: str) -> bool:
        m = self.load_manifest(pid)
        return bool(
            m
            and m.get("status") == "COMPLETE"
            and m.get("input_fingerprint") == input_fingerprint
            and os.path.exists(os.path.join(self._part_dir(pid), "part.parquet"))
        )

    def write_partition(self, pid: int, table: pa.Table, input_fingerprint: str) -> None:
        """Atomic write: parquet to tmp + rename, then manifest."""
        part_dir = self._part_dir(pid)
        os.makedirs(part_dir, exist_ok=True)
        final = os.path.join(part_dir, "part.parquet")
        tmp = final + ".tmp"
        pq.write_table(table, tmp)
        os.replace(tmp, final)
        manifest = {
            "stage": self.stage,
            "partition_id": pid,
            "input_fingerprint": input_fingerprint,
            "row_count": table.num_rows,
            "status": "COMPLETE",
            "run_id": self.run_id,
        }
        mtmp = self._manifest_path(pid) + ".tmp"
        with open(mtmp, "w") as f:
            json.dump(manifest, f)
        os.replace(mtmp, self._manifest_path(pid))

    def read_partition(self, pid: int) -> pa.Table:
        return pq.read_table(os.path.join(self._part_dir(pid), "part.parquet"))

    def completed_partitions(self) -> list[int]:
        out = []
        for pid in range(self.num_partitions):
            m = self.load_manifest(pid)
            if m and m.get("status") == "COMPLETE":
                out.append(pid)
        return out


def run_stage_checkpointed(
    input_ds: ray.data.Dataset,
    key_col: str,
    stage_fn,
    checkpoint: StageCheckpoint,
    counters: dict | None = None,
) -> ray.data.Dataset:
    """Run ``stage_fn(partition_ds) -> Dataset`` per hash partition of
    ``key_col``, skipping partitions already COMPLETE with an unchanged input
    fingerprint. Returns the union of all partition outputs (read back from
    the checkpoint — the durable source of truth).

    ``counters`` (optional dict) collects per-partition lineage metrics:
    {pid: {"rows_in", "rows_out", "skipped"}}.
    """
    num_partitions = checkpoint.num_partitions

    def _with_pid(batch: pa.Table) -> pa.Table:
        pids = [partition_of(str(k), num_partitions) for k in batch[key_col].to_pylist()]
        return batch.append_column("_pid", pa.array(pids, pa.int32()))

    partitioned = input_ds.map_batches(_with_pid, batch_format="pyarrow").materialize()

    outputs = []
    for pid in range(num_partitions):
        part = partitioned.filter(expr=f"_pid == {pid}").drop_columns(["_pid"])
        keys = [str(k) for k in part.select_columns([key_col]).to_pandas()[key_col]]
        fp = _fingerprint(keys)
        if checkpoint.is_complete(pid, fp):
            if counters is not None:
                m = checkpoint.load_manifest(pid)
                counters[pid] = {"rows_in": len(keys), "rows_out": m["row_count"], "skipped": True}
            outputs.append(ray.data.from_arrow(checkpoint.read_partition(pid)))
            continue
        result = stage_fn(part)
        tables = [b for b in result.iter_batches(batch_format="pyarrow")]
        table = (
            pa.concat_tables(tables, promote_options="permissive")
            if tables
            else pa.table({})
        )
        checkpoint.write_partition(pid, table, fp)
        if counters is not None:
            counters[pid] = {"rows_in": len(keys), "rows_out": table.num_rows, "skipped": False}
        outputs.append(ray.data.from_arrow(table))

    out = outputs[0]
    for o in outputs[1:]:
        out = out.union(o)
    return out
