"""Unit tests: as-of join, hopping-window aggregate, exact cosine pairs,
exact prefix-filtered Jaccard join — each checked against a tiny serial
reference computation."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ts(s: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


@pytest.fixture()
def rd(ray_session):
    import ray.data

    return ray.data


class TestAsofJoin:
    def test_backward_asof_matches_pandas(self, rd):
        from decisions_knowledge_graph_data_ray.stages.windows import asof_join

        rng = np.random.RandomState(7)
        n_l, n_r = 400, 300
        left = pd.DataFrame(
            {
                "lid": np.arange(n_l, dtype=np.int64),
                "ts": [_ts(int(x)) for x in rng.randint(0, 10_000, n_l)],
                "key": rng.randint(0, 12, n_l).astype(np.int64),
                "lval": rng.rand(n_l),
            }
        )
        right = pd.DataFrame(
            {
                "rid": np.arange(n_r, dtype=np.int64),
                "ts": [_ts(int(x)) for x in rng.randint(0, 10_000, n_r)],
                "key": rng.randint(0, 12, n_r).astype(np.int64),
                "rval": rng.rand(n_r),
            }
        ).drop_duplicates(["key", "ts"])

        got = (
            asof_join(
                rd.from_pandas(left).repartition(7),
                rd.from_pandas(right).repartition(5),
                on="ts",
                by="key",
                right_columns=["rid", "rval"],
            )
            .to_pandas()
            .sort_values("lid")
            .reset_index(drop=True)
        )

        want = pd.merge_asof(
            left.sort_values("ts", kind="stable"),
            right.sort_values("ts", kind="stable")[["key", "ts", "rid", "rval"]].rename(
                columns={"rid": "rid_r", "rval": "rval_r"}
            ),
            on="ts",
            by="key",
            direction="backward",
        ).sort_values("lid").reset_index(drop=True)

        assert len(got) == len(left)
        # int64 left columns must survive the null-padded union inside the
        # merge (pandas would otherwise promote them to float64).
        assert got["lid"].dtype.kind == "i"
        assert got["key"].dtype.kind == "i"
        pd.testing.assert_series_equal(
            got["rid_r"].astype("float64"), want["rid_r"].astype("float64"), check_names=False
        )
        pd.testing.assert_series_equal(
            got["rval_r"].fillna(-1).round(9), want["rval_r"].fillna(-1).round(9), check_names=False
        )

    def test_left_rows_without_match_survive(self, rd):
        from decisions_knowledge_graph_data_ray.stages.windows import asof_join

        left = pd.DataFrame(
            {"lid": [1, 2], "ts": [_ts(10), _ts(20)], "key": [1, 2], "lval": [0.5, 0.6]}
        )
        right = pd.DataFrame({"ts": [_ts(15)], "key": [1], "rval": [9.0]})
        got = (
            asof_join(rd.from_pandas(left), rd.from_pandas(right), on="ts", by="key",
                      right_columns=["rval"])
            .to_pandas()
            .sort_values("lid")
        )
        assert len(got) == 2
        assert got["rval_r"].isna().all()  # t=10 is before t=15; key 2 has no right rows


class TestHoppingWindow:
    def test_counts_match_serial(self, rd):
        from decisions_knowledge_graph_data_ray.stages.windows import hopping_window_count

        rng = np.random.RandomState(3)
        n = 2000
        df = pd.DataFrame(
            {
                "ts": [_ts(int(x)) for x in rng.randint(0, 50_000, n)],
                "g": rng.choice(["a", "b"], n),
                "v": rng.rand(n),
            }
        )
        size_s, hop_s = 3600, 900
        got = (
            hopping_window_count(
                rd.from_pandas(df).repartition(5), "ts", size_s, hop_s,
                group_col="g", value_col="v",
            )
            .to_pandas()
            .sort_values(["window_start", "g"])
            .reset_index(drop=True)
        )

        # serial reference: row belongs to window w iff w <= ts < w + size
        rows = []
        for _, r in df.iterrows():
            e = int(r["ts"].timestamp())
            last = (e // hop_s) * hop_s
            for k in range(size_s // hop_s):
                rows.append(
                    {
                        "window_start": dt.datetime.utcfromtimestamp(last - k * hop_s),
                        "g": r["g"],
                        "v": r["v"],
                    }
                )
        ref = (
            pd.DataFrame(rows)
            .groupby(["window_start", "g"], as_index=False)
            .agg(n=("v", "size"), value_sum=("v", "sum"))
            .sort_values(["window_start", "g"])
            .reset_index(drop=True)
        )
        assert len(got) == len(ref)
        assert (got["n"].to_numpy() == ref["n"].to_numpy()).all()
        np.testing.assert_allclose(got["value_sum"].to_numpy(), ref["value_sum"].to_numpy(), rtol=1e-9)

    def test_every_row_in_k_windows(self, rd):
        from decisions_knowledge_graph_data_ray.stages.windows import hopping_window_count

        df = pd.DataFrame({"ts": [_ts(0), _ts(1000)]})
        out = hopping_window_count(rd.from_pandas(df), "ts", 3600, 900).to_pandas()
        assert out["n"].sum() == 2 * 4  # each row counted in size/hop windows


class TestExactPairs:
    def test_cosine_pairs_match_numpy(self, rd):
        from decisions_knowledge_graph_data_ray.stages.similarity import cosine_pairs_exact

        rng = np.random.RandomState(11)
        m = rng.rand(120, 16)
        m[50] = m[10] * 1.7  # planted exact-direction duplicate
        m[77] = m[20] + 0.01 * rng.rand(16)  # planted near-duplicate
        tbl = pa.table(
            {
                "vec_id": pa.array(np.arange(120), pa.int64()),
                "embedding": pa.array([list(map(float, r)) for r in m],
                                      pa.list_(pa.float32())),
            }
        )
        got = (
            cosine_pairs_exact(rd.from_arrow(tbl).repartition(4), threshold=0.99)
            .to_pandas()
            .sort_values(["src_id", "dst_id"])
            .reset_index(drop=True)
        )

        mf = np.asarray(tbl["embedding"].to_pylist(), dtype=np.float64)
        mn = mf / np.linalg.norm(mf, axis=1, keepdims=True)
        sims = np.round(mn @ mn.T, 6)
        iu, ju = np.triu_indices(len(mn), k=1)
        keep = sims[iu, ju] >= 0.99
        ref = pd.DataFrame(
            {"src_id": iu[keep], "dst_id": ju[keep], "cosine": sims[iu, ju][keep]}
        )
        assert (10, 50) in set(zip(got["src_id"], got["dst_id"]))
        assert len(got) == len(ref)
        np.testing.assert_array_equal(got["src_id"].to_numpy(), ref["src_id"].to_numpy())
        np.testing.assert_allclose(got["cosine"].to_numpy(), ref["cosine"].to_numpy())

    def test_jaccard_join_equals_bruteforce(self, rd):
        from decisions_knowledge_graph_data_ray.stages.dedup import (
            _char_ngrams,
            jaccard_similarity_join,
        )

        base = (
            "le tribunal examine la demande et statue sur les frais de justice "
            "après avoir entendu les parties en leurs moyens"
        )
        texts = [base]
        # near-dups: small edits; far docs: distinct content
        texts.append(base.replace("demande", "requête"))
        texts.append(base.replace("frais", "dépens").replace("moyens", "arguments"))
        texts += [
            f"document totalement différent numéro {i} avec un contenu distinct {i * 31}"
            for i in range(40)
        ]
        df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})

        got = (
            jaccard_similarity_join(rd.from_pandas(df).repartition(4), threshold=0.7)
            .to_pandas()
            .sort_values(["src_id", "dst_id"])
            .reset_index(drop=True)
        )

        ref_rows = []
        for i in range(len(texts)):
            for j in range(i + 1, len(texts)):
                a, b = _char_ngrams(texts[i], 5), _char_ngrams(texts[j], 5)
                inter = len(a & b)
                jac = round(inter / (len(a) + len(b) - inter), 6)
                if jac >= 0.7:
                    ref_rows.append((i, j, jac))
        assert len(ref_rows) >= 2  # the planted near-dups
        assert list(map(tuple, got[["src_id", "dst_id", "jaccard"]].to_numpy())) == [
            (float(a), float(b), c) for a, b, c in ref_rows
        ]


def test_interval_join_keyed_matches_bruteforce(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from decisions_knowledge_graph_data_ray.stages.windows import interval_join

    rng = np.random.RandomState(7)
    n_pts, n_itv = 400, 60
    pts = pd.DataFrame(
        {
            "pid": np.arange(n_pts, dtype=np.int64),
            "t": rng.randint(0, 1000, n_pts).astype(np.int64),
            "key": rng.randint(0, 9, n_pts).astype(np.int64),
            "v": rng.rand(n_pts),
        }
    )
    s = rng.randint(0, 950, n_itv).astype(np.int64)
    itv = pd.DataFrame(
        {
            "iid": np.arange(n_itv, dtype=np.int64),
            "key": rng.randint(0, 9, n_itv).astype(np.int64),
            "s": s,
            "e": s + rng.randint(1, 80, n_itv).astype(np.int64),
        }
    )
    got = interval_join(
        rd.from_pandas(pts), rd.from_pandas(itv),
        on="t", start="s", end="e", interval_columns=["iid"], by="key",
        num_buckets=4,
    ).to_pandas()

    want = pts.merge(itv, on="key")
    want = want[(want.t >= want.s) & (want.t < want.e)]
    want_pairs = set(zip(want.pid, want.iid))
    got_pairs = set(zip(got.pid, got.iid_i))
    assert got_pairs == want_pairs
    assert len(got) == len(want)  # no duplicate pairs
    # payload columns survive with correct dtypes
    assert str(got["pid"].dtype).lower().startswith("int")
    assert str(got["iid_i"].dtype).lower().startswith("int")


def test_interval_join_keyless_band_matches_bruteforce(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from decisions_knowledge_graph_data_ray.stages.windows import interval_join

    rng = np.random.RandomState(11)
    n_pts, n_itv = 300, 40
    pts = pd.DataFrame(
        {
            "pid": np.arange(n_pts, dtype=np.int64),
            "t": rng.randint(0, 5000, n_pts).astype(np.int64),
        }
    )
    s = rng.randint(0, 4800, n_itv).astype(np.int64)
    itv = pd.DataFrame(
        {
            "iid": np.arange(n_itv, dtype=np.int64),
            "s": s,
            "e": s + rng.randint(1, 400, n_itv).astype(np.int64),
        }
    )
    got = interval_join(
        rd.from_pandas(pts), rd.from_pandas(itv),
        on="t", start="s", end="e", interval_columns=["iid"], by=None,
        bucket_width_us=128,  # interval replication across ~1-4 buckets
    ).to_pandas()

    want = pts.assign(k=0).merge(itv.assign(k=0), on="k")
    want = want[(want.t >= want.s) & (want.t < want.e)]
    assert set(zip(got.pid, got.iid_i)) == set(zip(want.pid, want.iid))
    assert len(got) == len(want)  # replication never duplicates a pair


def test_interval_join_half_open_boundaries(ray_session):
    import pandas as pd
    import ray.data as rd

    from decisions_knowledge_graph_data_ray.stages.windows import interval_join

    pts = pd.DataFrame({"pid": [1, 2, 3], "t": [10, 20, 15], "key": [0, 0, 0]})
    itv = pd.DataFrame({"iid": [7], "key": [0], "s": [10], "e": [20]})
    got = interval_join(
        rd.from_pandas(pts), rd.from_pandas(itv),
        on="t", start="s", end="e", interval_columns=["iid"], by="key",
    ).to_pandas()
    # start inclusive (t=10 in), end exclusive (t=20 out)
    assert sorted(got.pid.tolist()) == [1, 3]


def test_cosine_pairs_exact_refuses_above_cap(ray_session):
    """Above max_rows the exact self-join refuses with a pointer to the LSH
    scale path instead of broadcasting an O(N*D) matrix and OOMing."""
    import numpy as np
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from decisions_knowledge_graph_data_ray.stages.similarity import cosine_pairs_exact

    rng = np.random.default_rng(3)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(50), pa.int64()),
            "embedding": pa.array(rng.normal(size=(50, 8)).tolist()),
        }
    )
    ds = rd.from_arrow(tbl)
    with pytest.raises(ValueError, match="embedding_dup_pairs"):
        cosine_pairs_exact(ds, max_rows=10)
    # below the cap it still runs
    out = cosine_pairs_exact(ds, threshold=0.99, max_rows=50).to_pandas()
    assert (out["src_id"] < out["dst_id"]).all() if len(out) else True


def test_events_funnel_ordered_semantics(ray_session, tmp_path):
    """Funnel stages respect event ORDER: a click before the first view
    doesn't count; ties at the same ts break by event_id."""
    import pandas as pd

    from decisions_knowledge_graph_data_ray.pipelines.relational import q_events_funnel

    t0 = pd.Timestamp("2026-01-01 00:00:00")
    rows = [
        # user 1: click BEFORE view -> only reaches stage 1 (view)
        dict(event_id=1, ts=t0, user_id=1, event_type="click", value=0.0, props=""),
        dict(event_id=2, ts=t0 + pd.Timedelta("1min"), user_id=1, event_type="view", value=0.0, props=""),
        # user 2: full funnel, with the click tied at the view's ts but a
        # LATER event_id (counts: (ts, event_id) order)
        dict(event_id=3, ts=t0, user_id=2, event_type="view", value=0.0, props=""),
        dict(event_id=4, ts=t0, user_id=2, event_type="click", value=0.0, props=""),
        dict(event_id=5, ts=t0 + pd.Timedelta("2min"), user_id=2, event_type="purchase", value=0.0, props=""),
        # user 3: no view at all -> stage 0
        dict(event_id=6, ts=t0, user_id=3, event_type="purchase", value=0.0, props=""),
    ]
    pd.DataFrame(rows).to_parquet(tmp_path / "events.parquet", index=False)
    out = q_events_funnel(str(tmp_path)).set_index("user_id")["funnel_stage"]
    assert out.to_dict() == {1: 1, 2: 3, 3: 0}


def test_events_retention_cohorts(ray_session, tmp_path):
    """Cohort = first-activity hour; a user counts once per distinct
    active hour offset (repeat events within an hour don't double count)."""
    import pandas as pd

    from decisions_knowledge_graph_data_ray.pipelines.relational import q_events_retention

    h = pd.Timestamp("2026-01-01 10:00:00")
    rows = [
        # user 1: cohort 10:00, active at offsets 0 (twice) and 2
        dict(event_id=1, ts=h + pd.Timedelta("5min"), user_id=1, event_type="view", value=0.0, props=""),
        dict(event_id=2, ts=h + pd.Timedelta("20min"), user_id=1, event_type="view", value=0.0, props=""),
        dict(event_id=3, ts=h + pd.Timedelta("2h5min"), user_id=1, event_type="view", value=0.0, props=""),
        # user 2: same cohort, offset 0 only
        dict(event_id=4, ts=h + pd.Timedelta("30min"), user_id=2, event_type="view", value=0.0, props=""),
        # user 3: later cohort 11:00, offset 1
        dict(event_id=5, ts=h + pd.Timedelta("1h"), user_id=3, event_type="view", value=0.0, props=""),
        dict(event_id=6, ts=h + pd.Timedelta("2h"), user_id=3, event_type="view", value=0.0, props=""),
    ]
    pd.DataFrame(rows).to_parquet(tmp_path / "events.parquet", index=False)
    out = q_events_retention(str(tmp_path))
    got = {(str(r.cohort_hour), r.offset_hours): r.n_users for r in out.itertuples()}
    assert got == {
        ("2026-01-01 10:00:00", 0): 2,
        ("2026-01-01 10:00:00", 2): 1,
        ("2026-01-01 11:00:00", 0): 1,
        ("2026-01-01 11:00:00", 1): 1,
    }


class TestDebounce:
    def test_greedy_kept_state_not_lag(self, rd):
        """Events at t=0,5,9,12 with gap 10: greedy keeps 0 and 12 (9 is
        <10 after KEPT 0; 12 is >=10 after 0). A lag()-based rule would
        instead drop 12 (only 3s after 9) — pinning the kept-state
        semantics."""
        from decisions_knowledge_graph_data_ray.stages.windows import debounce_events

        rows = [
            {"event_id": i, "user_id": 1, "ts": _ts(t)}
            for i, t in enumerate([0, 5, 9, 12])
        ]
        ds = rd.from_arrow(pa.Table.from_pylist(rows))
        out = (
            debounce_events(ds, min_gap_s=10, keys=("user_id",))
            .to_pandas()
            .sort_values("event_id")
        )
        assert out["event_id"].tolist() == [0, 3]

    def test_per_key_isolation_and_partition_invariance(self, rd):
        from decisions_knowledge_graph_data_ray.stages.windows import debounce_events

        rows = []
        eid = 0
        for u in range(6):
            for t in range(0, 100, 7):  # 7s cadence per user
                rows.append({"event_id": eid, "user_id": u, "ts": _ts(t)})
                eid += 1
        ds = rd.from_arrow(pa.Table.from_pylist(rows))
        out = (
            debounce_events(ds, min_gap_s=20, keys=("user_id",))
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        # greedy with 7s cadence and 20s gap keeps t=0,21,42,63,84 per user
        per_user = out.groupby("user_id").size()
        assert (per_user == 5).all()
        out2 = (
            debounce_events(ds.repartition(7), min_gap_s=20, keys=("user_id",))
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(out, out2)


class TestEventTransitions:
    def test_counts_match_serial(self, rd):
        from collections import Counter

        from decisions_knowledge_graph_data_ray.stages.windows import event_transitions

        types = ["a", "b", "c"]
        rows = []
        eid = 0
        for u in range(5):
            for t in range(12):
                rows.append(
                    {
                        "event_id": eid,
                        "user_id": u,
                        "ts": _ts(t * 10 + u),
                        "event_type": types[(u + t * t) % 3],
                    }
                )
                eid += 1
        ds = rd.from_arrow(pa.Table.from_pylist(rows))
        out = (
            event_transitions(ds)
            .to_pandas()
            .sort_values(["src_type", "dst_type"])
            .reset_index(drop=True)
        )
        # serial truth
        want: Counter = Counter()
        df = pd.DataFrame(rows).sort_values(["ts", "event_id"])
        for _, g in df.groupby("user_id"):
            t = g["event_type"].tolist()
            want.update(zip(t[:-1], t[1:]))
        got = {(r.src_type, r.dst_type): r.n for r in out.itertuples()}
        assert got == dict(want)
        # partition-invariant
        out2 = (
            event_transitions(ds.repartition(7))
            .to_pandas()
            .sort_values(["src_type", "dst_type"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(out, out2)
