"""`python -m decisions_knowledge_graph_data_ray.job` — the ray-job-submit
entrypoint: end-to-end run, sharded output layout, summary contract, and
checkpointed rerun skipping every finished partition."""

from __future__ import annotations

import json

import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def transcripts_file(tmp_path_factory, tiny_transcripts):
    path = tmp_path_factory.mktemp("job_in") / "transcripts.parquet"
    pq.write_table(tiny_transcripts, path)
    return str(path)


def _run(argv):
    from decisions_knowledge_graph_data_ray.job import main

    return main(argv)


def test_job_end_to_end(ray_session, tmp_path, transcripts_file):
    out = tmp_path / "out"
    summary = _run(
        [
            "--input", transcripts_file,
            "--output", str(out),
            "--triple-shards", "4",
        ]
    )
    assert summary["rows"]["triples"] > 0
    assert summary["rows"]["links"] > 0
    assert summary["mode"] == "streamed"
    # sharded resumable layout: shard directories, identity as a column
    shard_dirs = sorted(p.name for p in (out / "triples").iterdir() if p.is_dir())
    assert shard_dirs and all(d.startswith("shard=") for d in shard_dirs)
    # the written triples match the summary count and carry the full schema
    import ray.data as rd

    triples = rd.read_parquet(str(out / "triples"))
    assert triples.count() == summary["rows"]["triples"]
    assert {"subj", "pred", "obj", "conv_id", "score"} <= set(triples.schema().names)
    # the summary artifact mirrors the printed JSON
    on_disk = json.loads((out / "summary.json").read_text())
    assert on_disk["rows"] == summary["rows"]


def test_job_checkpointed_rerun_skips(ray_session, tmp_path, transcripts_file):
    out1, out2 = tmp_path / "o1", tmp_path / "o2"
    state = tmp_path / "state"
    argv = [
        "--input", transcripts_file,
        "--checkpoint-dir", str(state),
        "--num-partitions", "4",
        "--triple-shards", "2",
    ]
    first = _run(["--output", str(out1), *argv])
    assert first["mode"] == "checkpointed"
    assert all(st["computed"] > 0 for st in first["partitions"].values())

    second = _run(["--output", str(out2), *argv])
    # same input + state dir → every partition of every stage skips
    assert all(st["computed"] == 0 for st in second["partitions"].values())
    assert all(st["skipped"] == 4 for st in second["partitions"].values())
    assert second["rows"]["triples"] == first["rows"]["triples"]
    assert second["rows"]["links"] == first["rows"]["links"]


def test_job_flag_plumbing():
    from decisions_knowledge_graph_data_ray.job import _parse_concurrency, build_parser

    assert _parse_concurrency("auto") == "auto"
    assert _parse_concurrency("6") == 6
    assert _parse_concurrency("2,8") == (2, 8)
    args = build_parser().parse_args(
        ["--input", "i", "--output", "o", "--mode", "barrier",
         "--extract-concurrency", "2,8", "--link-concurrency", "3"]
    )
    assert args.mode == "barrier"
    assert _parse_concurrency(args.extract_concurrency) == (2, 8)
    assert _parse_concurrency(args.link_concurrency) == 3
