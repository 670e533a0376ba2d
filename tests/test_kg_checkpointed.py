"""Kill-and-resume e2e: the checkpointed flagship pipeline resumes without
recomputation and produces the same triples as the streaming pipeline."""

import ray.data as rd


def _triples_set(ds):
    out = set()
    for b in ds.iter_batches(batch_format="pyarrow"):
        for r in b.to_pylist():
            out.add((r["subj"], r["pred"], r["obj"]))
    return out


def test_checkpointed_matches_streaming_and_resumes(ray_session, tiny_transcripts, tmp_path):
    from decisions_knowledge_graph_data_ray.pipelines.kg import (
        run_kg_pipeline,
        run_kg_pipeline_checkpointed,
    )

    run_dir = str(tmp_path / "run")
    ds = rd.from_arrow(tiny_transcripts)

    res1 = run_kg_pipeline_checkpointed(ds, run_dir, num_partitions=4)
    t1 = _triples_set(res1["triples"])
    assert all(not c["skipped"] for c in res1["counters"]["assemble"].values())

    # streaming pipeline agrees
    streaming = _triples_set(run_kg_pipeline(rd.from_arrow(tiny_transcripts))["triples"])
    assert t1 == streaming

    # resume: same input → every stage partition skipped, same output
    res2 = run_kg_pipeline_checkpointed(rd.from_arrow(tiny_transcripts), run_dir, num_partitions=4)
    for stage in ("assemble", "extract", "fused"):
        assert res2["counters"][stage], stage
        assert all(c["skipped"] for c in res2["counters"][stage].values()), stage
    assert _triples_set(res2["triples"]) == t1


def test_checkpointed_partial_kill_resume(ray_session, tiny_transcripts, tmp_path):
    """Simulate a kill after the assemble stage: only later stages run on
    resume; assemble partitions are all skipped."""
    import os
    import shutil

    from decisions_knowledge_graph_data_ray.pipelines.kg import run_kg_pipeline_checkpointed

    run_dir = str(tmp_path / "run")
    ds = rd.from_arrow(tiny_transcripts)
    res1 = run_kg_pipeline_checkpointed(ds, run_dir, num_partitions=4)
    t1 = _triples_set(res1["triples"])

    # "kill" = lose the extract + fused checkpoints, keep assemble
    shutil.rmtree(os.path.join(run_dir, "extract"))
    shutil.rmtree(os.path.join(run_dir, "fused"))

    res2 = run_kg_pipeline_checkpointed(rd.from_arrow(tiny_transcripts), run_dir, num_partitions=4)
    assert all(c["skipped"] for c in res2["counters"]["assemble"].values())
    assert all(not c["skipped"] for c in res2["counters"]["extract"].values())
    assert _triples_set(res2["triples"]) == t1
