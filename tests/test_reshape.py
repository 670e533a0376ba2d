"""Reshape operators (pivot, stratified head) vs pandas brute force."""

import numpy as np
import pandas as pd
import ray.data as rd

from decisions_knowledge_graph_data_ray.stages.reshape import pivot_counts, stratified_head


def _events(n=2000, seed=3):
    rng = np.random.RandomState(seed)
    return pd.DataFrame(
        {
            "user_id": rng.randint(0, 40, n).astype(np.int64),
            "event_type": rng.choice(["a", "b", "c", "zz"], n),  # zz = out of set
            "v": rng.rand(n),
        }
    )


def test_pivot_counts_matches_bruteforce(ray_session):
    df = _events()
    cats = ["a", "b", "c"]
    got = (
        pivot_counts(rd.from_pandas(df), "user_id", "event_type", cats)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    want = (
        df[df.event_type.isin(cats)]
        .pivot_table(index="user_id", columns="event_type", values="v",
                     aggfunc="count", fill_value=0)
        .reindex(columns=cats, fill_value=0)
        .astype("int64")
        .reset_index()
        .rename(columns={c: f"n_{c}" for c in cats})
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    want.columns.name = None
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)


def test_pivot_counts_out_of_set_rows_ignored(ray_session):
    df = pd.DataFrame({"user_id": [1, 1, 2], "event_type": ["zz", "a", "zz"]})
    got = pivot_counts(rd.from_pandas(df), "user_id", "event_type", ["a", "b"]).to_pandas()
    # user 2 has only out-of-set rows -> absent; user 1 counted for 'a' only
    assert got.user_id.tolist() == [1]
    assert got.n_a.tolist() == [1] and got.n_b.tolist() == [0]


def test_stratified_head_matches_bruteforce(ray_session):
    rng = np.random.RandomState(5)
    df = pd.DataFrame(
        {
            "s": rng.choice(["x", "y", "z"], 500),
            "oid": rng.permutation(500).astype(np.int64),
            "payload": rng.rand(500),
        }
    )
    got = (
        stratified_head(rd.from_pandas(df), stratum_col="s", order_col="oid", k=7)
        .to_pandas()
        .sort_values(["s", "oid"])
        .reset_index(drop=True)
    )
    want = (
        df.sort_values(["s", "oid"], kind="stable")
        .groupby("s", sort=True)
        .head(7)
        .sort_values(["s", "oid"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["s", "oid", "payload"]], want[["s", "oid", "payload"]])


def test_unpivot_roundtrips_pivot(ray_session):
    df = _events(seed=9)
    cats = ["a", "b", "c"]
    wide = pivot_counts(rd.from_pandas(df), "user_id", "event_type", cats)
    from decisions_knowledge_graph_data_ray.stages.reshape import unpivot

    long = (
        unpivot(wide, key_cols=["user_id"], value_cols=[f"n_{c}" for c in cats],
                var_name="event_type", value_name="n")
        .to_pandas()
    )
    long["event_type"] = long["event_type"].str.removeprefix("n_")
    got = (
        long[long.n > 0]
        .sort_values(["user_id", "event_type"])
        .reset_index(drop=True)
    )
    want = (
        df[df.event_type.isin(cats)]
        .groupby(["user_id", "event_type"], as_index=False)
        .size()
        .rename(columns={"size": "n"})
        .sort_values(["user_id", "event_type"])
        .reset_index(drop=True)
    )
    assert got.user_id.tolist() == want.user_id.tolist()
    assert got.event_type.tolist() == want.event_type.tolist()
    assert got.n.astype(int).tolist() == want.n.astype(int).tolist()


def test_unpivot_mixed_types_and_empty_blocks(ray_session):
    """value_cols with heterogeneous dtypes promote to one unified type, and
    zero-row blocks carry the same explicit schema (no null-typed columns)."""
    import pyarrow as pa

    from decisions_knowledge_graph_data_ray.stages.reshape import unpivot

    t = pa.table(
        {
            "id": pa.array([1, 2, 3], pa.int64()),
            "a": pa.array([1, 2, 3], pa.int32()),
            "b": pa.array([0.5, None, 2.5], pa.float64()),
        }
    )
    ds = rd.from_arrow(t).repartition(6)  # forces some empty blocks
    long = unpivot(ds, key_cols=["id"], value_cols=["a", "b"])
    schema = long.schema()
    assert schema.base_schema.field("value").type == pa.float64()
    out = long.to_pandas().sort_values(["id", "variable"]).reset_index(drop=True)
    assert out["value"].tolist()[:3] == [1.0, 0.5, 2.0]
    assert pd.isna(out["value"][3])  # b's null survives promotion
    assert len(out) == 6
    # row-major interleave preserved: each id has its a then b value
    assert out.loc[0, "variable"] == "a" and out.loc[1, "variable"] == "b"
