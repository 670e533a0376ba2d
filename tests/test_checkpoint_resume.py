"""Checkpoint/resume tests (north-rule): kill after stage k → rerun skips
completed partitions, final table byte-identical, no recompute."""

import pyarrow as pa
import pytest

import ray.data as rd

from decisions_knowledge_graph_data_ray.state.manifest import (
    StageCheckpoint,
    partition_of,
    run_stage_checkpointed,
)


def _input_ds():
    rows = [{"conv_id": f"C{i:03d}", "value": i} for i in range(40)]
    return rd.from_arrow(pa.Table.from_pylist(rows))


def _double_stage(calls):
    def stage(ds):
        calls.append(1)

        def f(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return batch.append_column("doubled", pc.multiply(batch["value"], 2))

        return ds.map_batches(f, batch_format="pyarrow")

    return stage


def test_checkpoint_write_and_resume_skips_completed(ray_session, tmp_path):
    run_dir = str(tmp_path / "run")
    calls: list[int] = []
    cp = StageCheckpoint(run_dir, "double", num_partitions=4)
    out1 = run_stage_checkpointed(_input_ds(), "conv_id", _double_stage(calls), cp)
    df1 = out1.to_pandas().sort_values("conv_id").reset_index(drop=True)
    assert len(df1) == 40
    assert calls.count(1) == 1  # ONE Ray pass over all incomplete partitions
    assert sorted(cp.completed_partitions()) == [0, 1, 2, 3]

    # resume: same input → all partitions skipped, identical output
    calls2: list[int] = []
    cp2 = StageCheckpoint(run_dir, "double", num_partitions=4)
    counters: dict = {}
    out2 = run_stage_checkpointed(_input_ds(), "conv_id", _double_stage(calls2), cp2, counters)
    df2 = out2.to_pandas().sort_values("conv_id").reset_index(drop=True)
    assert calls2 == []  # ZERO recompute
    assert all(c["skipped"] for c in counters.values())
    assert df1.equals(df2)


def test_partial_failure_resume(ray_session, tmp_path):
    """Simulate a kill after 2 of 4 partitions: delete 2 manifests, rerun →
    only the missing partitions recompute."""
    run_dir = str(tmp_path / "run")
    calls: list[int] = []
    cp = StageCheckpoint(run_dir, "double", num_partitions=4)
    run_stage_checkpointed(_input_ds(), "conv_id", _double_stage(calls), cp)

    import os

    os.remove(cp._manifest_path(1))
    os.remove(cp._manifest_path(3))

    calls2: list[int] = []
    out = run_stage_checkpointed(_input_ds(), "conv_id", _double_stage(calls2), cp)
    assert calls2.count(1) == 1  # one pass, over ONLY the two killed partitions
    assert len(out.to_pandas()) == 40


def test_changed_input_invalidates_fingerprint(ray_session, tmp_path):
    run_dir = str(tmp_path / "run")
    cp = StageCheckpoint(run_dir, "double", num_partitions=2)
    calls: list[int] = []
    run_stage_checkpointed(_input_ds(), "conv_id", _double_stage(calls), cp)

    # different input rows → fingerprints differ → recompute
    rows = [{"conv_id": f"C{i:03d}", "value": i} for i in range(41)]
    changed = rd.from_arrow(pa.Table.from_pylist(rows))
    calls2: list[int] = []
    run_stage_checkpointed(changed, "conv_id", _double_stage(calls2), cp)
    assert calls2.count(1) >= 1


def test_partition_of_stable():
    assert partition_of("CONV:BE:000001", 16) == partition_of("CONV:BE:000001", 16)
    assert 0 <= partition_of("x", 7) < 7
