"""Wave-33 operator tests: z-order layout assignment, seasonal outliers."""

import datetime as dt

import numpy as np
import ray.data as rd


def test_zorder_interleave_and_partition(ray_session):
    from decisions_knowledge_graph_data_ray.stages.reshape import zorder_assign

    rows = [
        {"rid": 0, "x": 0b0011, "y": 0b0101},
        {"rid": 1, "x": 0, "y": 0},
        {"rid": 2, "x": 0b1111, "y": 0b1111},
        {"rid": 3, "x": 1, "y": 0},
    ]
    out = (
        zorder_assign(rd.from_items(rows).repartition(2), "x", "y", "rid",
                      num_partitions=2, bits=4)
        .to_pandas()
        .set_index("rid")
        .sort_index()
    )
    # interleave x→even bits, y→odd bits: x=0011,y=0101 → 0b00100111 = 39
    assert out.loc[0, "zcode"] == 0b00100111
    assert out.loc[1, "zcode"] == 0
    assert out.loc[2, "zcode"] == 0b11111111
    assert out.loc[3, "zcode"] == 1
    # rank-based range partition: 2 partitions over 4 rows → lower half 0
    assert out.sort_values("zcode")["part_id"].tolist() == [0, 0, 1, 1]


def test_zorder_locality_property(ray_session):
    """Points close in BOTH dims land in the same partition more often
    than a single-dim range split would allow for the other dim."""
    from decisions_knowledge_graph_data_ray.stages.reshape import zorder_assign

    rng = np.random.default_rng(2)
    rows = [
        {"rid": i, "x": int(v[0]), "y": int(v[1])}
        for i, v in enumerate(rng.integers(0, 256, size=(512, 2)))
    ]
    out = zorder_assign(
        rd.from_items(rows), "x", "y", "rid", num_partitions=8, bits=8
    ).to_pandas()
    assert out["part_id"].nunique() == 8
    # partitions are zcode ranges: max zcode of part p < min of part p+1
    g = out.groupby("part_id")["zcode"]
    lows, highs = g.min(), g.max()
    for p in range(7):
        assert highs[p] <= lows[p + 1]


def test_seasonal_outliers_flags_by_slot(ray_session):
    from decisions_knowledge_graph_data_ray.stages.diagnostics import (
        seasonal_outliers,
    )

    base = dt.datetime(2026, 1, 5, 9, 0)  # a Monday 09:00
    rows = []
    for i in range(20):  # Monday-9am slot: tight around 10.0
        rows.append(
            {"event_id": i, "g": "a", "value": 10.0 + (i % 3) * 0.01,
             "ts": base + dt.timedelta(days=7 * (i // 3))}
        )
    rows.append({"event_id": 99, "g": "a", "value": 50.0, "ts": base})  # spike
    # different slot (Tuesday): its own baseline, 50.0 is normal there
    tue = dt.datetime(2026, 1, 6, 9, 0)
    for i in range(100, 110):
        rows.append({"event_id": i, "g": "a", "value": 50.0 + (i % 2),
                     "ts": tue + dt.timedelta(days=7 * (i - 100))})
    out = (
        seasonal_outliers(rd.from_items(rows).repartition(3), "value", "g",
                          "ts", "event_id")
        .to_pandas()
        .set_index("event_id")
    )
    assert bool(out.loc[99, "is_outlier"])  # spike vs Monday baseline
    assert not out.loc[[i for i in range(100, 110)], "is_outlier"].any()
    assert not out.loc[[i for i in range(20)], "is_outlier"].any()
