"""Direct tests for the portable bucketed hash join (sparse-key safe)."""

import pyarrow as pa

import ray.data as rd

from decisions_knowledge_graph_data_ray.stages.joins import hash_bucket_join


def _ds(rows, schema=None):
    return rd.from_arrow(pa.Table.from_pylist(rows, schema=schema))


def test_inner_join_basic(ray_session):
    left = _ds([{"k": "a", "x": 1}, {"k": "b", "x": 2}, {"k": "c", "x": 3}])
    right = _ds([{"k": "a", "y": 10}, {"k": "c", "y": 30}, {"k": "z", "y": 99}])
    out = hash_bucket_join(left, right, on="k", output_columns=["k", "x", "y"]).to_pandas()
    got = {(r.k, r.x, r.y) for r in out.itertuples()}
    assert got == {("a", 1, 10), ("c", 3, 30)}


def test_left_outer_pads_missing(ray_session):
    left = _ds([{"k": "a", "x": 1}, {"k": "b", "x": 2}])
    right = _ds([{"k": "a", "y": 10}])
    out = hash_bucket_join(
        left, right, on="k", output_columns=["k", "x", "y"], how="left_outer"
    ).to_pandas()
    assert len(out) == 2
    row_b = out[out["k"] == "b"].iloc[0]
    assert row_b["y"] is None or row_b["y"] != row_b["y"]  # None or NaN


def test_full_outer_keeps_both_sides(ray_session):
    left = _ds([{"k": "a", "x": 1}, {"k": "b", "x": 2}])
    right = _ds([{"k": "b", "y": 20}, {"k": "z", "y": 99}])
    out = hash_bucket_join(
        left, right, on="k", output_columns=["k", "x", "y"], how="full_outer"
    ).to_pandas()
    # Arrow coalesces the right key into the left key's column
    got = {(r.k, None if r.x != r.x else r.x, None if r.y != r.y else r.y)
           for r in out.itertuples()}
    assert got == {("a", 1, None), ("b", 2, 20), ("z", None, 99)}


def test_right_outer_and_right_anti(ray_session):
    left = _ds([{"k": "a", "x": 1}])
    right = _ds([{"rk": "a", "y": 10}, {"rk": "z", "y": 99}])
    out = hash_bucket_join(
        left, right, on="k", right_on="rk",
        output_columns=["rk", "x", "y"], how="right_outer",
    ).to_pandas()
    got = {(r.rk, None if r.x != r.x else r.x, r.y) for r in out.itertuples()}
    assert got == {("a", 1, 10), ("z", None, 99)}

    anti = hash_bucket_join(
        left, right, on="k", right_on="rk",
        output_columns=["rk", "y"], how="right_anti",
    ).to_pandas()
    assert {(r.rk, r.y) for r in anti.itertuples()} == {("z", 99)}


def test_different_key_names(ray_session):
    left = _ds([{"src_id": 1, "v": "l1"}])
    right = _ds([{"doc_id": 1, "t": "r1"}])
    out = hash_bucket_join(
        left, right, on="src_id", right_on="doc_id", output_columns=["src_id", "v", "t"]
    ).to_pandas()
    assert out.to_dict("records") == [{"src_id": 1, "v": "l1", "t": "r1"}]


def test_sparse_keys_many_buckets(ray_session):
    """The exact case Ray's built-in join crashes on: far fewer keys than
    buckets (most buckets empty on one or both sides)."""
    left = _ds([{"k": "only", "x": 7}])
    right = _ds([{"k": "only", "y": 8}])
    out = hash_bucket_join(
        left, right, on="k", output_columns=["k", "x", "y"], num_buckets=64
    ).to_pandas()
    assert out.to_dict("records") == [{"k": "only", "x": 7, "y": 8}]


def test_one_to_many(ray_session):
    left = _ds([{"k": "a", "x": 1}])
    right = _ds([{"k": "a", "y": i} for i in range(5)])
    out = hash_bucket_join(left, right, on="k", output_columns=["k", "x", "y"]).to_pandas()
    assert len(out) == 5 and sorted(out["y"]) == [0, 1, 2, 3, 4]


def test_orders_priority_revenue_join_path_matches_broadcast(ray_session, monkeypatch):
    """The unbounded-dimension fallback (bucketed join + partial aggregate)
    must be result-identical to the broadcast path."""
    import os

    from decisions_knowledge_graph_data_ray.pipelines import relational

    sf_dir = os.environ.get("GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    broadcast = relational.q_orders_priority_revenue(sf_dir)
    monkeypatch.setattr(relational, "DIM_BROADCAST_MAX_KEYS", 0)
    joined = relational.q_orders_priority_revenue(sf_dir)
    assert broadcast.to_dict("records") == joined.to_dict("records")
