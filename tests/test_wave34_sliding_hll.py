"""Wave-34: sliding-window HLL distinct users."""

import datetime as dt

import ray.data as rd


def test_sliding_hll_window_merge(ray_session):
    from decisions_knowledge_graph_data_ray.stages.cardinality import (
        sliding_hll_distinct,
    )

    t0 = dt.datetime(2026, 3, 2, 0, 0)
    rows = []
    # hour 0: users 1..10; hour 5: users 11..15; hour 40: user 99
    for u in range(1, 11):
        rows.append({"user_id": u, "ts": t0})
    for u in range(11, 16):
        rows.append({"user_id": u, "ts": t0 + dt.timedelta(hours=5)})
    rows.append({"user_id": 99, "ts": t0 + dt.timedelta(hours=40)})

    out = (
        sliding_hll_distinct(
            rd.from_items(rows).repartition(3), "user_id", "ts", window_hours=24
        )
        .to_pandas()
        .set_index("whour")
        .sort_index()
    )
    base = out.index.min()
    # window ending at hour 5 covers hours 0 and 5 → ~15 distinct
    est_5 = out.loc[base + 5, "hll_estimate"]
    assert 10 <= est_5 <= 22
    # window ending at hour 0 covers only hour 0 → ~10 distinct
    est_0 = out.loc[base, "hll_estimate"]
    assert 6 <= est_0 <= 15
    assert est_5 > est_0
    # hour 29+ windows no longer include hour 5 contributors; hour 40's
    # window sees only user 99
    assert out.loc[base + 40, "n_nonzero"] == 1
    # windows are emitted for every register's reach up to the max hour
    assert out.index.max() == base + 40


def test_sliding_hll_register_merge_is_max(ray_session):
    """The same user in two covered hours must not inflate the window."""
    from decisions_knowledge_graph_data_ray.stages.cardinality import (
        sliding_hll_distinct,
    )

    t0 = dt.datetime(2026, 3, 2, 0, 0)
    rows = [
        {"user_id": 7, "ts": t0},
        {"user_id": 7, "ts": t0 + dt.timedelta(hours=3)},
    ]
    out = (
        sliding_hll_distinct(rd.from_items(rows), "user_id", "ts", window_hours=24)
        .to_pandas()
        .set_index("whour")
    )
    assert (out["n_nonzero"] == 1).all()
    assert out["sum_rho"].nunique() == 1  # identical registers everywhere
