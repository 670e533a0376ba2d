"""Wave-27 operator tests: JSON field histogram, MAD robust outliers."""

import pandas as pd
import ray.data as rd


def test_json_field_histogram(ray_session):
    from decisions_knowledge_graph_data_ray.stages.diagnostics import (
        json_field_histogram,
    )

    rows = [
        {"g": "a", "props": '{"k": 5}'},
        {"g": "a", "props": '{"k": 7}'},
        {"g": "a", "props": '{"k": 15}'},
        {"g": "b", "props": '{"k": 0}'},
        {"g": "b", "props": None},  # null json -> dropped
        {"g": "b", "props": "not json"},  # invalid -> dropped
        {"g": "b", "props": '{"other": 1}'},  # missing field -> dropped
    ]
    out = (
        json_field_histogram(rd.from_items(rows).repartition(3), "props", "k", "g")
        .to_pandas()
        .sort_values(["g", "bucket"])
        .reset_index(drop=True)
    )
    want = pd.DataFrame(
        {"g": ["a", "a", "b"], "bucket": [0, 1, 0], "n": [2, 1, 1]}
    )
    pd.testing.assert_frame_equal(out, want, check_dtype=False)


def test_mad_outliers_flags(ray_session):
    from decisions_knowledge_graph_data_ray.stages.diagnostics import mad_outliers

    # group x: values 1..9 plus a wild 100 -> median 5.5-ish? discrete:
    # 10 values, ceil(0.5*10)=5th sorted -> 5; devs |v-5| sorted:
    # 0,1,1,2,2,3,3,4,4,95 -> MAD = 5th = 2; outlier iff dev > 6
    rows = [
        {"event_id": i, "g": "x", "value": float(v)}
        for i, v in enumerate([1, 2, 3, 4, 5, 6, 7, 8, 9, 100])
    ]
    out = (
        mad_outliers(rd.from_items(rows).repartition(4), "value", "g", "event_id")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert list(out.columns) == ["event_id", "g", "vq", "dev", "is_outlier"]
    assert list(out["vq"]) == [100, 200, 300, 400, 500, 600, 700, 800, 900, 10000]
    # med = 500, MAD = 200 -> outlier iff dev > 600
    flagged = set(out[out["is_outlier"]]["event_id"])
    assert flagged == {9}
    # robustness: the wild value did not drag the median
    assert out["dev"].iloc[4] == 0


def test_mad_partition_invariance(ray_session):
    from decisions_knowledge_graph_data_ray.stages.diagnostics import mad_outliers

    rows = [
        {"event_id": i, "g": f"g{i % 3}", "value": (i * 7 % 23) / 3.0}
        for i in range(120)
    ]
    outs = []
    for nb in (1, 8):
        outs.append(
            mad_outliers(rd.from_items(rows).repartition(nb), "value", "g", "event_id")
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])
