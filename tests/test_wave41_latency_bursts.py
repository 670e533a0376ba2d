"""Wave-41: tool latency stats, hourly burst detection."""

import datetime as dt

import ray.data as rd


def test_tool_latency_gaps(ray_session):
    from decisions_knowledge_graph_data_ray.stages.transcript_prep import (
        tool_latency_stats,
    )

    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)

    def turn(conv, idx, tool, secs):
        return {
            "conv_id": conv,
            "turn_idx": idx,
            "tool": tool,
            "ts": t0 + dt.timedelta(seconds=secs),
        }

    rows = [
        turn("c1", 0, "", 0),
        turn("c1", 1, "search", 10),  # gap to next = 5s
        turn("c1", 2, "", 15),
        turn("c1", 3, "search", 20),  # gap = 2s
        turn("c1", 4, "", 22),
        turn("c2", 0, "db", 0),  # gap = 7s
        turn("c2", 1, "", 7),
        turn("c2", 2, "db", 9),  # last turn invokes a tool → dropped
    ]
    out = (
        tool_latency_stats(rd.from_items(rows).repartition(2))
        .to_pandas()
        .set_index("tool")
        .sort_index()
    )
    assert out.loc["search", "n_calls"] == 2
    assert out.loc["search", "total_us"] == 7_000_000
    assert out.loc["search", "max_us"] == 5_000_000
    assert out.loc["search", "mean_us"] == 3_500_000.0
    assert out.loc["db", "n_calls"] == 1  # trailing call has no response
    assert out.loc["db", "total_us"] == 7_000_000


def test_burst_hours_flags_spike_only(ray_session):
    from decisions_knowledge_graph_data_ray.stages.diagnostics import burst_hours

    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)
    rows = []
    # 30 quiet hours with 10 events each, one hour with 100
    for h in range(30):
        for i in range(10):
            rows.append({"g": "a", "ts": t0 + dt.timedelta(hours=h, seconds=i)})
    for i in range(100):
        rows.append({"g": "a", "ts": t0 + dt.timedelta(hours=30, seconds=i)})
    out = (
        burst_hours(rd.from_items(rows).repartition(4), "g", "ts")
        .to_pandas()
        .sort_values("ehour")
        .reset_index(drop=True)
    )
    assert out["is_burst"].sum() == 1
    assert bool(out.iloc[-1]["is_burst"])  # the spike hour
    assert out.iloc[-1]["c"] == 100
