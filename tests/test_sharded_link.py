"""Sharded entity linking (the index-too-big-for-broadcast scale path):
exact equivalence with the broadcast fused path, shard routing, and
bounded actor-side shard caching."""

import pandas as pd
import ray.data as rd

from decisions_knowledge_graph_data_ray.pipelines.kg import (
    KGConfig,
    build_index_ref,
    run_kg_pipeline,
)
from decisions_knowledge_graph_data_ray.sources.transcripts import (
    generate_transcripts_table,
    get_world,
)
from decisions_knowledge_graph_data_ray.stages.assemble import assemble_documents_salted
from decisions_knowledge_graph_data_ray.stages.extract import extract_documents
from decisions_knowledge_graph_data_ray.stages.sharded_link import (
    ShardedLinkerActor,
    build_shard_refs,
    explode_mentions,
    link_mentions_sharded,
)


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[["conv_id", "mention_internal_id", "kind", "method", "matched_entity", "score"]]
    return df.sort_values(["conv_id", "mention_internal_id", "kind"]).reset_index(drop=True)


def test_sharded_links_equal_broadcast_links(ray_session):
    """Every mention's candidate space lives inside its shard ⇒ sharded
    linking must produce EXACTLY the broadcast path's links."""
    transcripts = rd.from_arrow(generate_transcripts_table(60))

    broadcast = run_kg_pipeline(
        transcripts,
        index_ref=build_index_ref(),
        config=KGConfig(extract_concurrency=(1, 2), link_concurrency=(1, 2)),
    )["links"].to_pandas()

    docs = assemble_documents_salted(rd.from_arrow(generate_transcripts_table(60)))
    extractions = extract_documents(docs, concurrency=(1, 2))
    shard_refs = build_shard_refs(get_world(), n_shards=4)
    sharded = link_mentions_sharded(
        extractions, shard_refs, n_shards=4, concurrency=(1, 2)
    ).to_pandas()

    a, b = _norm(broadcast), _norm(sharded)
    assert len(a) == len(b) and len(a) > 0
    pd.testing.assert_frame_equal(a, b)


def test_mentions_route_to_correct_shard_space(ray_session):
    docs = assemble_documents_salted(rd.from_arrow(generate_transcripts_table(30)))
    extractions = extract_documents(docs, concurrency=(1, 2))
    m = explode_mentions(extractions, n_shards=4).to_pandas()
    assert len(m) > 0
    # date-space shards [0,4) for standard/code/decision; article space [4,8)
    dated = m[m["kind"].isin(["provision_standard", "provision_code", "decision"])]
    nodate = m[m["kind"] == "provision_no_date"]
    assert dated["shard"].between(0, 3).all()
    if len(nodate):
        assert nodate["shard"].between(4, 7).all()


def test_actor_shard_cache_is_bounded(ray_session):
    import pyarrow as pa

    refs = build_shard_refs(get_world(), n_shards=4)
    actor = ShardedLinkerActor(refs, max_cached=2)
    # touch 4 distinct shards via minimal decision mentions (null date → NO_MATCH path)
    for shard in range(4):
        batch = pa.Table.from_pylist(
            [
                {
                    "conv_id": "C", "mention_internal_id": f"DEC-C-{shard:03d}",
                    "kind": "decision", "shard": shard, "decision_date": "",
                    "provision_number": "", "provision_number_key": "",
                    "parent_act_name": "", "parent_act_type": "", "parent_act_date": "",
                    "ecli": "", "court_name": "", "date": "", "case_number": "",
                    "snippet": "",
                }
            ]
        )
        actor(batch)
    assert len(actor._cache) <= 2  # LRU evicted — bounded actor memory
