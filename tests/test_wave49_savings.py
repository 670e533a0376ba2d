"""Wave-49: boilerplate cost-avoidance summary arithmetic."""

import ray.data as rd


def test_boilerplate_savings_fraction(ray_session):
    from ray.data.aggregate import Sum

    import pyarrow as pa
    import ray

    from decisions_knowledge_graph_data_ray.stages.transcript_prep import (
        _text_keys,
        boilerplate_key_counts,
    )

    rows = []
    for c in range(6):  # "SYS" in 6 convs → boilerplate at min_convs=5
        rows.append({"conv_id": f"C{c}", "text": "SYS boilerplate line"})
        rows.append({"conv_id": f"C{c}", "text": f"unique content {c}"})
    ds = rd.from_items(rows).repartition(2)
    hot = boilerplate_key_counts(ds, min_convs=5)
    keys = set()
    for blk in hot.select_columns(["tkey"]).iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        keys.update(blk["tkey"].to_pylist())
    keys_ref = ray.put(keys)

    def _per_turn(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from decisions_knowledge_graph_data_ray.stages.broadcast import (
            broadcast_cache,
        )

        k = broadcast_cache(keys_ref)
        tk = _text_keys(batch["text"]).to_pylist()
        boiler = [1 if t in k else 0 for t in tk]
        tlen = pc.cast(pc.utf8_length(batch["text"]), pa.int64())
        return pa.table(
            {
                "one": pa.array([1] * len(tk), pa.int64()),
                "boiler": pa.array(boiler, pa.int64()),
                "tlen": tlen,
                "blen": pa.array(
                    [l if b else 0 for l, b in zip(tlen.to_pylist(), boiler)],
                    pa.int64(),
                ),
            }
        )

    agg = ds.select_columns(["text"]).map_batches(
        _per_turn, batch_format="pyarrow"
    ).aggregate(
        Sum("one", alias_name="n_turns"),
        Sum("boiler", alias_name="n_boilerplate"),
        Sum("tlen", alias_name="total_chars"),
        Sum("blen", alias_name="boiler_chars"),
    )
    assert agg["n_turns"] == 12
    assert agg["n_boilerplate"] == 6
    assert agg["boiler_chars"] == 6 * len("SYS boilerplate line")
    assert 0 < agg["boiler_chars"] / agg["total_chars"] < 1
