"""Per-partition checkpoint manifests + resume (north-rule requirement).

Layout:
  run_dir/
    <stage>/
      partition=<pid>/part.parquet      # written atomically (tmp + rename)
      manifest/<pid>.json               # {partition_id, input_fingerprint,
                                        #  row_count, status, run_id}

Semantics (the reference's --resume-from anti-join,
ConcurrentRunner.ts:194-236, at partition granularity):
  1. every input row hashes to a partition pid = stable_hash(key) % P;
  2. each partition's input fingerprint is computed DISTRIBUTED (an
     order-insensitive commutative sum of per-key hashes — block order never
     invalidates a completed partition);
  3. partitions whose manifest says COMPLETE with a matching fingerprint are
     skipped; all incomplete partitions run in ONE Ray execution (not one
     per partition — that would serialize the cluster);
  4. stage outputs are split by pid and each partition publishes atomically
     (tmp file + rename, then manifest), so a kill mid-stage loses at most
     the unpublished partitions.

Requirement on ``stage_fn``: its output rows must carry ``key_col`` (so
outputs can be attributed to their input partition).
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data
from ray.data.aggregate import Sum

from ..functions.normalize import stable_hash32

_M1 = 1_000_003
_M2 = 999_983


def partition_of(key: str, num_partitions: int) -> int:
    return stable_hash32(key) % num_partitions


def _key_hashes(key: str) -> tuple[int, int]:
    h = stable_hash32("fp:" + key)
    return h % _M1, h % _M2


class StageCheckpoint:
    """Manifest + partition-file bookkeeping for one stage of one run."""

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
            and os.path.isdir(self._part_dir(pid))
        )

    def partition_files(self, pid: int) -> list[str]:
        part_dir = self._part_dir(pid)
        if not os.path.isdir(part_dir):
            return []
        return sorted(
            os.path.join(part_dir, f) for f in os.listdir(part_dir) if f.endswith(".parquet")
        )

    def read_partition(self, pid: int) -> pa.Table:
        files = self.partition_files(pid)
        if not files:
            return pa.table({})
        return pa.concat_tables([pq.read_table(f) for f in files], promote_options="permissive")

    def completed_partitions(self) -> list[int]:
        return [
            pid
            for pid in range(self.num_partitions)
            if (m := self.load_manifest(pid)) and m.get("status") == "COMPLETE"
        ]


def compute_fingerprints(
    input_ds: ray.data.Dataset, key_col: str, num_partitions: int
) -> dict[int, str]:
    """Distributed order-insensitive per-partition input fingerprints:
    per-batch partial (pid, sum h1, sum h2, count) → tiny groupby."""

    def _partial(batch: pa.Table) -> pa.Table:
        acc: dict[int, list[int]] = {}
        for k in batch[key_col].to_pylist():
            key = str(k)
            pid = partition_of(key, num_partitions)
            h1, h2 = _key_hashes(key)
            slot = acc.setdefault(pid, [0, 0, 0])
            slot[0] += h1
            slot[1] += h2
            slot[2] += 1
        return pa.table(
            {
                "pid": pa.array(list(acc.keys()), pa.int32()),
                "s1": pa.array([v[0] for v in acc.values()], pa.int64()),
                "s2": pa.array([v[1] for v in acc.values()], pa.int64()),
                "n": pa.array([v[2] for v in acc.values()], pa.int64()),
            }
        )

    agg = (
        input_ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("pid")
        .aggregate(Sum("s1", alias_name="s1"), Sum("s2", alias_name="s2"), Sum("n", alias_name="n"))
        .to_pandas()
    )
    return {
        int(r.pid): f"{int(r.s1):x}-{int(r.s2):x}-{int(r.n)}" for r in agg.itertuples()
    }


def run_stage_checkpointed(
    input_ds: ray.data.Dataset,
    key_col: str,
    stage_fn,
    checkpoint: StageCheckpoint,
    counters: dict | None = None,
    out_key_col: str | None = None,
) -> ray.data.Dataset:
    """Run ``stage_fn(sub_ds) -> Dataset`` over the hash-partitioned input,
    skipping COMPLETE partitions, executing ALL incomplete partitions in one
    Ray pass, publishing each partition atomically. Returns the union of the
    checkpointed partition outputs (the durable source of truth).

    ``key_col`` partitions + fingerprints the INPUT; ``out_key_col`` (default
    key_col) attributes OUTPUT rows to partitions — it must hash-partition
    identically (e.g. the output carries the originating conv_id under a
    different column name)."""
    out_key_col = out_key_col or key_col
    num_partitions = checkpoint.num_partitions
    input_ds = input_ds.materialize()

    fingerprints = compute_fingerprints(input_ds, key_col, num_partitions)
    complete = {
        pid for pid, fp in fingerprints.items() if checkpoint.is_complete(pid, fp)
    }
    incomplete = [pid for pid in fingerprints if pid not in complete]

    if counters is not None:
        for pid in complete:
            m = checkpoint.load_manifest(pid)
            counters[pid] = {"rows_out": m["row_count"], "skipped": True}

    if incomplete:
        incomplete_set = set(incomplete)

        def _only_incomplete(batch: pa.Table) -> pa.Table:
            mask = pa.array(
                [
                    partition_of(str(k), num_partitions) in incomplete_set
                    for k in batch[key_col].to_pylist()
                ]
            )
            return batch.filter(mask)

        sub = input_ds.map_batches(_only_incomplete, batch_format="pyarrow")
        result = stage_fn(sub)

        # DISTRIBUTED publish: workers write a partitioned staging dir; the
        # driver only renames directories (atomic promote) + writes manifests
        import shutil

        staging = os.path.join(checkpoint.stage_dir, "staging")
        shutil.rmtree(staging, ignore_errors=True)

        def _with_pid(batch: pa.Table) -> pa.Table:
            pids = [partition_of(str(k), num_partitions) for k in batch[out_key_col].to_pylist()]
            return batch.append_column("_pid", pa.array(pids, pa.int32()))

        result.map_batches(_with_pid, batch_format="pyarrow").write_parquet(
            staging, partition_cols=["_pid"]
        )

        for pid in incomplete:
            src = os.path.join(staging, f"_pid={pid}")
            part_dir = checkpoint._part_dir(pid)
            shutil.rmtree(part_dir, ignore_errors=True)
            if os.path.exists(src):
                # atomic promote: rename the staged directory into place —
                # no data passes through the driver
                os.replace(src, part_dir)
                row_count = sum(
                    pq.read_metadata(os.path.join(part_dir, f)).num_rows
                    for f in os.listdir(part_dir)
                    if f.endswith(".parquet")
                )
            else:
                os.makedirs(part_dir, exist_ok=True)
                row_count = 0
            manifest = {
                "stage": checkpoint.stage,
                "partition_id": pid,
                "input_fingerprint": fingerprints[pid],
                "row_count": row_count,
                "status": "COMPLETE",
                "run_id": checkpoint.run_id,
            }
            mtmp = checkpoint._manifest_path(pid) + ".tmp"
            with open(mtmp, "w") as f:
                json.dump(manifest, f)
            os.replace(mtmp, checkpoint._manifest_path(pid))
            if counters is not None:
                counters[pid] = {"rows_out": row_count, "skipped": False}
        shutil.rmtree(staging, ignore_errors=True)

    paths: list[str] = []
    for pid in sorted(fingerprints):
        paths.extend(checkpoint.partition_files(pid))
    if not paths:
        return ray.data.from_arrow(pa.table({out_key_col: pa.array([], pa.string())}))
    out = ray.data.read_parquet(paths)
    if "_pid" in (out.schema().names or []):
        out = out.drop_columns(["_pid"])
    return out
