"""Wave-25 operator tests: time-weighted average, last-touch attribution."""

import datetime as dt

import pandas as pd
import ray.data as rd


def _ts(s: int):
    return dt.datetime(2026, 1, 1) + dt.timedelta(seconds=s)


def test_twap_hand_computed(ray_session):
    from decisions_knowledge_graph_data_ray.stages.windows import time_weighted_average

    # user 1: value 10 holds 2s, value 20 holds 8s -> twap = (20+160)/10 = 18
    # user 2: single event -> span 0 -> dropped
    rows = [
        {"user_id": 1, "event_id": 1, "ts": _ts(0), "value": 10.0},
        {"user_id": 1, "event_id": 2, "ts": _ts(2), "value": 20.0},
        {"user_id": 1, "event_id": 3, "ts": _ts(10), "value": 99.0},
        {"user_id": 2, "event_id": 4, "ts": _ts(5), "value": 7.0},
    ]
    out = (
        time_weighted_average(rd.from_items(rows))
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    assert list(out["user_id"]) == [1]
    r = out.iloc[0]
    assert r["n_events"] == 3
    assert r["span_us"] == 10_000_000
    assert abs(r["twap"] - 18.0) < 1e-12


def test_twap_tie_order_and_partition_invariance(ray_session):
    from decisions_knowledge_graph_data_ray.stages.windows import time_weighted_average

    rows = []
    eid = 0
    for u in range(5):
        for s in [0, 3, 3, 7, 20, 21]:  # duplicate ts -> event_id tie-break
            eid += 1
            rows.append(
                {"user_id": u, "event_id": eid, "ts": _ts(s), "value": float(eid % 7)}
            )
    outs = []
    for nb in (1, 6):
        outs.append(
            time_weighted_average(rd.from_items(rows).repartition(nb))
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs[0], outs[1])
    # brute force user 0
    g = sorted(rows[:6], key=lambda r: (r["ts"], r["event_id"]))
    num = sum(
        g[i]["value"] * (g[i + 1]["ts"] - g[i]["ts"]).total_seconds() * 1e6
        for i in range(5)
    )
    span = (g[-1]["ts"] - g[0]["ts"]).total_seconds() * 1e6
    assert abs(outs[0].iloc[0]["twap"] - num / span) < 1e-9


def test_attribution_channels(ray_session, tmp_path):
    from decisions_knowledge_graph_data_ray.pipelines.relational import (
        q_events_attribution,
    )

    rows = [
        # purchase 1: click 1h before -> click
        {"event_id": 1, "ts": _ts(0), "user_id": 1, "event_type": "click", "value": 0.0},
        {"event_id": 2, "ts": _ts(3600), "user_id": 1, "event_type": "purchase", "value": 10.0},
        # purchase 2: view 2 days before -> outside 24h window -> direct
        {"event_id": 3, "ts": _ts(0), "user_id": 2, "event_type": "view", "value": 0.0},
        {"event_id": 4, "ts": _ts(2 * 86400), "user_id": 2, "event_type": "purchase", "value": 5.0},
        # purchase 3: no touch at all -> direct
        {"event_id": 5, "ts": _ts(50), "user_id": 3, "event_type": "purchase", "value": 2.0},
        # purchase 4: view then later click -> click (last touch)
        {"event_id": 6, "ts": _ts(0), "user_id": 4, "event_type": "view", "value": 0.0},
        {"event_id": 7, "ts": _ts(100), "user_id": 4, "event_type": "click", "value": 0.0},
        {"event_id": 8, "ts": _ts(200), "user_id": 4, "event_type": "purchase", "value": 1.0},
    ]
    df = pd.DataFrame(rows)
    df["ts"] = pd.to_datetime(df["ts"]).astype("datetime64[us]")
    path = tmp_path / "events.parquet"
    df.to_parquet(path)

    out = q_events_attribution(str(tmp_path))
    got = {r["channel"]: (r["n_conversions"], r["total_value"]) for _, r in out.iterrows()}
    assert got == {"click": (2, 11.0), "direct": (2, 7.0)}
