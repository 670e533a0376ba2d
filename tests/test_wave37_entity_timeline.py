"""Wave-37: per-entity citation timeline over the constructed graph."""

import pyarrow as pa
import ray.data as rd


def test_entity_timeline_shape_and_invariants(ray_session, tiny_transcripts):
    from ray.data.aggregate import Count, Max, Min

    from decisions_knowledge_graph_data_ray.pipelines.kg import (
        KGConfig,
        run_kg_pipeline,
    )
    from decisions_knowledge_graph_data_ray.stages.graph import distinct_pairs

    ts = rd.from_arrow(tiny_transcripts)
    res = run_kg_pipeline(ts, config=KGConfig(materialize_extractions=True))

    def _resolved(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.and_(
            pc.equal(batch["kind"], "decision"), pc.is_valid(batch["matched_entity"])
        )
        return batch.filter(mask).select(["matched_entity", "conv_id"])

    dec = res["links"].map_batches(_resolved, batch_format="pyarrow")

    def _us(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "conv_id": batch["conv_id"],
                "ts_us": batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
            }
        )

    conv_start = (
        ts.select_columns(["conv_id", "ts"])
        .map_batches(_us, batch_format="pyarrow")
        .groupby("conv_id")
        .aggregate(Min("ts_us", alias_name="conv_ts"))
    )
    out = (
        distinct_pairs(dec, ["matched_entity", "conv_id"])
        .join(conv_start, join_type="inner", on=("conv_id",), num_partitions=4)
        .groupby("matched_entity")
        .aggregate(
            Count(alias_name="n_citing_convs"),
            Min("conv_ts", alias_name="first_cited_us"),
            Max("conv_ts", alias_name="last_cited_us"),
        )
        .to_pandas()
    )
    assert len(out) > 0
    assert (out["n_citing_convs"] >= 1).all()
    assert (out["first_cited_us"] <= out["last_cited_us"]).all()
    assert out["matched_entity"].str.startswith("ECLI:").all()
    # distinct-conv counting: no entity can cite more convs than exist
    assert out["n_citing_convs"].max() <= rd.from_arrow(tiny_transcripts).to_pandas()[
        "conv_id"
    ].nunique()
