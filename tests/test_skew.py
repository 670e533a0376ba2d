"""stages/skew: reusable combiner-first aggregate + salted two-phase map_groups."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from decisions_knowledge_graph_data_ray.stages.skew import combiner_aggregate, salted_map_groups


def _skewed_frame(n=20_000, seed=0):
    rng = np.random.default_rng(seed)
    # 60% of rows share one hot key — the shape salting exists for
    keys = np.where(rng.random(n) < 0.6, "hot", rng.integers(0, 40, n).astype(str))
    vals = rng.normal(10.0, 3.0, n)
    vals[rng.random(n) < 0.05] = np.nan
    return pd.DataFrame({"k": keys, "v": vals, "id": np.arange(n, dtype=np.int64)})


def test_combiner_aggregate_matches_pandas(ray_session):
    df = _skewed_frame()
    ds = rd.from_pandas(df).repartition(11)
    out = (
        combiner_aggregate(
            ds,
            ["k"],
            {
                "n": ("count", None),
                "sum_v": ("sum", "v"),
                "min_v": ("min", "v"),
                "max_v": ("max", "v"),
                "mean_v": ("mean", "v"),
            },
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    exp = (
        df.groupby("k")
        .agg(
            n=("v", "size"),
            sum_v=("v", "sum"),
            min_v=("v", "min"),
            max_v=("v", "max"),
            mean_v=("v", "mean"),
        )
        .reset_index()
        .sort_values("k")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out[exp.columns], exp, check_dtype=False, rtol=1e-9)


def test_combiner_aggregate_rejects_unknown_op(ray_session):
    ds = rd.from_pandas(pd.DataFrame({"k": ["a"], "v": [1.0]}))
    with pytest.raises(ValueError, match="unknown op"):
        combiner_aggregate(ds, ["k"], {"x": ("median", "v")})


def test_salted_map_groups_matches_direct_and_is_layout_invariant(ray_session):
    # group fns are local closures: cloudpickle ships them by VALUE, so Ray
    # workers don't need to import this test module
    def _partial(g):
        return pd.DataFrame(
            {
                "k": [g["k"].iloc[0]],
                "_salt": [g["_salt"].iloc[0]],
                "ids": [",".join(map(str, sorted(g["id"].tolist())))],
            }
        )

    def _merge(g):
        ids = sorted(int(x) for part in g["ids"] for x in part.split(","))
        return pd.DataFrame(
            {"k": [g["k"].iloc[0]], "n_ids": [len(ids)], "first": [ids[0]], "last": [ids[-1]]}
        )

    df = _skewed_frame(n=3_000, seed=1)[["k", "id"]]
    exp = (
        df.groupby("k")
        .agg(n_ids=("id", "size"), first=("id", "min"), last=("id", "max"))
        .reset_index()
        .sort_values("k")
        .reset_index(drop=True)
    )
    outs = []
    for parts in (3, 9):  # same result at any input partitioning
        ds = rd.from_pandas(df).repartition(parts)
        out = (
            salted_map_groups(ds, ["k"], _partial, _merge, salt_col="id", n_salts=8)
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(out[exp.columns], exp, check_dtype=False)
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_salted_map_groups_spreads_hot_key():
    # the hot key must actually land on >1 salt (the point of the salt):
    # same hash the stage applies, checked without a Ray session
    import pyarrow as pa

    from decisions_knowledge_graph_data_ray.functions.hashing import bucket_ids

    df = _skewed_frame(n=3_000, seed=2)[["k", "id"]]
    tbl = pa.Table.from_pandas(df)
    salts = bucket_ids(tbl["id"], 8, seed=7).to_numpy()
    hot_salts = set(salts[(df["k"] == "hot").to_numpy()])
    assert len(hot_salts) > 1
