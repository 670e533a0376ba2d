"""Wave-48: DAU/WAU stickiness."""

import datetime as dt

import ray.data as rd


def test_stickiness_known_window(ray_session):
    from __ray_entry__ import _events_stickiness  # noqa: F401 — shape doc

    import pyarrow as pa
    from ray.data.aggregate import Count

    from decisions_knowledge_graph_data_ray.stages.graph import distinct_pairs

    # day 0: users {1,2}; day 1: {2,3}; day 8: {9}
    t0 = dt.datetime(2026, 2, 2)
    rows = []
    for u in (1, 2):
        rows.append({"user_id": u, "ts": t0})
        rows.append({"user_id": u, "ts": t0})  # dup events same day
    for u in (2, 3):
        rows.append({"user_id": u, "ts": t0 + dt.timedelta(days=1)})
    rows.append({"user_id": 9, "ts": t0 + dt.timedelta(days=8)})
    ev = rd.from_items(rows)

    def _day(batch: pa.Table) -> pa.Table:
        import numpy as np

        us = np.asarray(
            batch["ts"].cast(pa.timestamp("us")).cast(pa.int64()), dtype=np.int64
        )
        return pa.table(
            {"user_id": batch["user_id"], "day": pa.array(us // 86_400_000_000, pa.int64())}
        )

    du = distinct_pairs(ev.map_batches(_day, batch_format="pyarrow"), ["day", "user_id"]).materialize()
    max_day = du.max("day")
    base = du.min("day")

    def _windows(batch: pa.Table) -> pa.Table:
        ds_, us_ = batch["day"].to_pylist(), batch["user_id"].to_pylist()
        wd, wu = [], []
        for d, u in zip(ds_, us_):
            for o in range(7):
                if d + o <= max_day:
                    wd.append(d + o)
                    wu.append(u)
        return pa.table(
            {"wday": pa.array(wd, pa.int64()), "user_id": pa.array(wu, pa.int64())}
        )

    wau = (
        distinct_pairs(du.map_batches(_windows, batch_format="pyarrow"), ["wday", "user_id"])
        .groupby("wday")
        .aggregate(Count(alias_name="wau"))
        .to_pandas()
        .set_index("wday")
    )
    # window ending day1 covers days 0..1 → users {1,2,3}
    assert wau.loc[base + 1, "wau"] == 3
    # window ending day6 still covers day 0 and 1 → 3
    assert wau.loc[base + 6, "wau"] == 3
    # window ending day7 covers days 1..7 → {2,3}
    assert wau.loc[base + 7, "wau"] == 2
    # window ending day8 covers days 2..8 → {9}
    assert wau.loc[base + 8, "wau"] == 1
