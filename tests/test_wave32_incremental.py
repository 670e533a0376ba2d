"""Wave-32: incremental KG maintenance equals the full-corpus run."""

import hashlib

import pyarrow as pa


def _split_ds(ts, delta: bool):
    def _f(batch: pa.Table) -> pa.Table:
        mask = [
            (int(hashlib.md5(c.encode()).hexdigest()[:8], 16) % 4 == 3) == delta
            for c in batch["conv_id"].to_pylist()
        ]
        return batch.filter(pa.array(mask, pa.bool_()))

    return ts.map_batches(_f, batch_format="pyarrow")


def test_incremental_matches_full_run(ray_session, tiny_transcripts):
    import ray.data as rd

    from decisions_knowledge_graph_data_ray.pipelines.kg import (
        KGConfig,
        build_index_ref,
        run_kg_incremental,
        run_kg_pipeline,
    )

    ts = rd.from_arrow(tiny_transcripts)
    idx = build_index_ref()
    cfg = KGConfig(materialize_extractions=True)

    full = (
        run_kg_pipeline(ts, index_ref=idx, config=cfg)["triples"]
        .to_pandas()
        .sort_values(["subj", "pred", "obj"])
        .reset_index(drop=True)
    )
    inc = (
        run_kg_incremental(
            _split_ds(ts, False), _split_ds(ts, True), index_ref=idx, config=cfg
        )["triples"]
        .to_pandas()
        .sort_values(["subj", "pred", "obj"])
        .reset_index(drop=True)
    )
    assert len(full) > 0
    import pandas as pd

    pd.testing.assert_frame_equal(inc[full.columns], full)


def test_incremental_empty_delta(ray_session, tiny_transcripts):
    """An empty delta must be a no-op: result == base-only run."""
    import ray.data as rd

    from decisions_knowledge_graph_data_ray.pipelines.kg import (
        KGConfig,
        build_index_ref,
        run_kg_incremental,
        run_kg_pipeline,
    )

    ts = rd.from_arrow(tiny_transcripts)
    idx = build_index_ref()
    cfg = KGConfig(materialize_extractions=True)
    empty = ts.filter(expr="turn_idx < 0")

    inc = (
        run_kg_incremental(ts, empty, index_ref=idx, config=cfg)["triples"]
        .to_pandas()
        .sort_values(["subj", "pred", "obj"])
        .reset_index(drop=True)
    )
    full = (
        run_kg_pipeline(ts, index_ref=idx, config=cfg)["triples"]
        .to_pandas()
        .sort_values(["subj", "pred", "obj"])
        .reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(inc[full.columns], full)
