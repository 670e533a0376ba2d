"""Wave-43: citation-age histogram inputs, inter-arrival burstiness."""

import datetime as dt
import math

import ray.data as rd


def test_interarrival_cv_regular_vs_bursty(ray_session):
    """Regular gaps → cv 0; bursty gaps → cv > 1."""
    from __ray_entry__ import _events_interarrival  # query fn reads parquet

    # exercise the map_groups path directly via a tiny in-memory dataset
    import numpy as np
    import pandas as pd

    t0 = dt.datetime(2026, 1, 1)
    rows = []
    # user 1: perfectly regular 60s gaps
    for i in range(10):
        rows.append({"user_id": 1, "event_id": i, "ts": t0 + dt.timedelta(seconds=60 * i)})
    # user 2: bursts — nine 1s gaps then one 10000s gap
    s = 0
    for i in range(10):
        rows.append({"user_id": 2, "event_id": 100 + i, "ts": t0 + dt.timedelta(seconds=s)})
        s += 1 if i < 9 else 10000
    rows.append({"user_id": 2, "event_id": 110, "ts": t0 + dt.timedelta(seconds=s)})
    # user 3: single event → dropped
    rows.append({"user_id": 3, "event_id": 200, "ts": t0})

    ev = rd.from_items(rows)

    def _gaps(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        us = g["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        if len(us) < 2:
            return pd.DataFrame({"user_id": [], "n_gaps": [], "s": [], "ss": []})
        gap = [int(x) // 1_000_000 for x in (us[1:] - us[:-1])]
        return pd.DataFrame(
            {
                "user_id": [int(g["user_id"].iloc[0])],
                "n_gaps": [len(gap)],
                "s": [sum(gap)],
                "ss": [sum(x * x for x in gap)],
            }
        )

    parts = (
        ev.groupby("user_id").map_groups(_gaps, batch_format="pandas").to_pandas()
    )
    parts = parts.set_index("user_id")
    assert 3 not in parts.index
    n, s, ss = (int(parts.loc[1, c]) for c in ("n_gaps", "s", "ss"))
    cv1 = math.sqrt(float(n * ss - s * s)) / s
    assert cv1 == 0.0
    n, s, ss = (int(parts.loc[2, c]) for c in ("n_gaps", "s", "ss"))
    cv2 = math.sqrt(float(n * ss - s * s)) / s
    assert cv2 > 1.5


def test_citation_age_year_parse():
    """The ECLI year field the age derives from is field 4."""
    e = "ECLI:BE:CASS:2019:ARR.20190101.1"
    assert int(e.split(":")[3]) == 2019
