"""stages/graph.py: node degrees, co-citation pairs, k-hop BFS — each
checked against a serial brute force on small synthetic graphs."""

from __future__ import annotations

import itertools

import pandas as pd
import pytest


def _edges_ds(rows):
    import ray.data as rd

    return rd.from_items([{"conv_id": g, "ecli": n} for g, n in rows])


EDGES = [
    ("D1", "E1"), ("D1", "E2"), ("D1", "E2"),  # duplicate citation
    ("D2", "E1"), ("D2", "E3"),
    ("D3", "E1"),
    ("D4", "E2"), ("D4", "E3"), ("D4", "E4"),
]


def test_node_degrees(ray_session):
    from decisions_knowledge_graph_data_ray.stages.graph import node_degrees

    got = (
        node_degrees(_edges_ds(EDGES), node_col="ecli", group_col="conv_id")
        .to_pandas()
        .sort_values("ecli")
        .reset_index(drop=True)
    )
    df = pd.DataFrame(EDGES, columns=["conv_id", "ecli"])
    want = (
        df.groupby("ecli")
        .agg(n_edges=("conv_id", "size"), n_groups=("conv_id", "nunique"))
        .reset_index()
    )
    pd.testing.assert_frame_equal(
        got, want.astype({"n_edges": "int64", "n_groups": "int64"}), check_dtype=False
    )


def test_top_nodes(ray_session):
    from decisions_knowledge_graph_data_ray.stages.graph import node_degrees, top_nodes

    deg = node_degrees(_edges_ds(EDGES), node_col="ecli", group_col="conv_id")
    top = top_nodes(deg, "ecli", k=2)
    # E1 and E2 both have 3 edges; ties break ascending by node
    assert list(top["ecli"]) == ["E1", "E2"]
    assert list(top["n_edges"]) == [3, 3]


def test_cocitation_pairs(ray_session):
    from decisions_knowledge_graph_data_ray.stages.graph import cocitation_pairs

    got = (
        cocitation_pairs(_edges_ds(EDGES), group_col="conv_id", node_col="ecli")
        .to_pandas()
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    # brute force over distinct (group, node)
    df = pd.DataFrame(EDGES, columns=["g", "n"]).drop_duplicates()
    counts: dict = {}
    for _, grp in df.groupby("g"):
        for a, b in itertools.combinations(sorted(grp["n"].unique()), 2):
            counts[(a, b)] = counts.get((a, b), 0) + 1
    want = (
        pd.DataFrame(
            [{"src": a, "dst": b, "n_groups": c} for (a, b), c in counts.items()]
        )
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.parametrize("k,expect", [
    (1, {"A": 0, "B": 1, "C": 1}),
    (2, {"A": 0, "B": 1, "C": 1, "D": 2}),
    (3, {"A": 0, "B": 1, "C": 1, "D": 2, "E": 3}),
    # k beyond the graph's diameter: the early-exit break fires
    (9, {"A": 0, "B": 1, "C": 1, "D": 2, "E": 3}),
])
def test_k_hop_directed(ray_session, k, expect):
    import ray.data as rd

    from decisions_knowledge_graph_data_ray.stages.graph import k_hop

    edges = rd.from_items(
        [
            {"src": s, "dst": d}
            for s, d in [("A", "B"), ("A", "C"), ("B", "D"), ("C", "D"), ("D", "E"), ("E", "A")]
        ]
    )
    got = k_hop(edges, ["A"], k).to_pandas()
    assert dict(zip(got["node"], got["hop"])) == expect


def test_k_hop_undirected_via_symmetrize(ray_session):
    import ray.data as rd

    from decisions_knowledge_graph_data_ray.stages.graph import k_hop

    pairs = [("X", "Y"), ("Y", "Z")]
    edges = rd.from_items(
        [{"src": a, "dst": b} for a, b in pairs] + [{"src": b, "dst": a} for a, b in pairs]
    )
    got = k_hop(edges, ["Z"], 2).to_pandas()
    assert dict(zip(got["node"], got["hop"])) == {"Z": 0, "Y": 1, "X": 2}


def test_k_hop_multi_matches_per_seed_k_hop(ray_session):
    # one multi-source BFS must equal len(seeds) independent k_hop runs
    import ray.data as rd

    from decisions_knowledge_graph_data_ray.stages.graph import k_hop, k_hop_multi

    pairs = [
        ("A", "B"), ("A", "C"), ("B", "D"), ("C", "D"), ("D", "E"),
        ("E", "A"), ("F", "G"),  # F/G: a separate component
    ]
    edges = rd.from_items([{"src": s, "dst": d} for s, d in pairs])
    seeds = ["A", "D", "F"]
    got = k_hop_multi(edges, seeds, k=3).to_pandas()
    for seed in seeds:
        want = k_hop(edges, [seed], k=3).to_pandas()
        mine = got[got["seed"] == seed]
        assert dict(zip(mine["node"], mine["hop"])) == dict(zip(want["node"], want["hop"])), seed


def test_k_hop_multi_duplicate_and_unreachable_seeds(ray_session):
    import ray.data as rd

    from decisions_knowledge_graph_data_ray.stages.graph import k_hop_multi

    edges = rd.from_items([{"src": "A", "dst": "B"}])
    got = k_hop_multi(edges, ["A", "A", "Z"], k=2).to_pandas()
    a = got[got["seed"] == "A"]
    z = got[got["seed"] == "Z"]
    assert dict(zip(a["node"], a["hop"])) == {"A": 0, "B": 1}
    # unreachable seed: only its own hop-0 row
    assert dict(zip(z["node"], z["hop"])) == {"Z": 0}


def test_citation_edges(ray_session):
    import ray.data as rd

    from decisions_knowledge_graph_data_ray.stages.graph import citation_edges

    extractions = rd.from_items(
        [
            {"conv_id": "C1", "cited_decisions": [{"ecli": "E1"}, {"ecli": None}, {"ecli": "E2"}]},
            {"conv_id": "C2", "cited_decisions": []},
            {"conv_id": "C3", "cited_decisions": None},
        ]
    )
    got = citation_edges(extractions).to_pandas().sort_values("ecli").reset_index(drop=True)
    assert list(got["conv_id"]) == ["C1", "C1"]
    assert list(got["ecli"]) == ["E1", "E2"]


def test_pagerank_matches_power_iteration(ray_session):
    import numpy as np
    import ray.data as rd

    from decisions_knowledge_graph_data_ray.stages.graph import pagerank, symmetrize

    pairs = [("A", "B"), ("B", "C"), ("A", "C"), ("C", "D")]
    edges = symmetrize(
        rd.from_items([{"src": a, "dst": b} for a, b in pairs])
    ).materialize()
    got = (
        pagerank(edges, iterations=10)
        .to_pandas()
        .sort_values("node")
        .reset_index(drop=True)
    )
    sym = pairs + [(b, a) for a, b in pairs]
    nodes = sorted({n for e in sym for n in e})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n)
    for s, _ in sym:
        deg[idx[s]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(10):
        nr = np.full(n, (1.0 - 0.85) / n)
        for s, d in sym:
            nr[idx[d]] += 0.85 * r[idx[s]] / deg[idx[s]]
        r = nr
    assert list(got["node"]) == nodes
    assert np.allclose(got["score"].to_numpy(), r, atol=1e-12)
    # symmetric graph has no dangling nodes: total mass is conserved
    assert abs(got["score"].sum() - 1.0) < 1e-9


def test_pagerank_empty(ray_session):
    import ray.data as rd

    from decisions_knowledge_graph_data_ray.stages.graph import pagerank

    import pyarrow as pa

    empty = rd.from_arrow(pa.table({"src": pa.array([], pa.string()), "dst": pa.array([], pa.string())}))
    assert pagerank(empty, iterations=3).count() == 0


def test_triangle_counts(ray_session):
    import itertools as it

    import ray.data as rd

    from decisions_knowledge_graph_data_ray.stages.graph import triangle_counts

    # K4 on A-D (4 triangles, each node in 3) + a pendant edge + a
    # triangle-free path X-Y-Z
    k4 = [tuple(sorted(p)) for p in it.combinations(["A", "B", "C", "D"], 2)]
    pairs = k4 + [("D", "P"), ("X", "Y"), ("Y", "Z")]
    ds = rd.from_items([{"src": a, "dst": b} for a, b in pairs]).materialize()
    got = triangle_counts(ds).to_pandas().sort_values("node").reset_index(drop=True)
    assert dict(zip(got["node"], got["n_triangles"])) == {"A": 3, "B": 3, "C": 3, "D": 3}


def test_triangle_counts_empty_and_no_triangles(ray_session):
    import ray.data as rd

    from decisions_knowledge_graph_data_ray.stages.graph import triangle_counts

    path = rd.from_items([{"src": "X", "dst": "Y"}, {"src": "Y", "dst": "Z"}]).materialize()
    assert triangle_counts(path).count() == 0


def test_distinct_pairs(ray_session):
    import ray.data as rd

    from decisions_knowledge_graph_data_ray.stages.graph import distinct_pairs

    ds = rd.from_items(
        [{"a": "x", "b": "1"}, {"a": "x", "b": "1"}, {"a": "x", "b": "2"}, {"a": "y", "b": "1"}]
    )
    got = distinct_pairs(ds, ["a", "b"]).to_pandas()
    assert sorted(map(tuple, got.values.tolist())) == [("x", "1"), ("x", "2"), ("y", "1")]


def test_hits_bipartite_ranking(ray_session):
    import ray.data as rd

    from decisions_knowledge_graph_data_ray.stages.graph import hits

    # docs A,B,C cite decisions e1,e2,e3: e1 cited by all three, e2 by A+B,
    # e3 by A only -> authority e1 > e2 > e3; A cites the most/best -> top hub
    edges = [
        ("A", "e1"), ("A", "e2"), ("A", "e3"),
        ("B", "e1"), ("B", "e2"),
        ("C", "e1"),
    ]
    ds = rd.from_items([{"src": s, "dst": d} for s, d in edges]).materialize()
    out = hits(ds, iterations=10).to_pandas()
    auth = out[out.role == "authority"].set_index("node")["score"]
    hub = out[out.role == "hub"].set_index("node")["score"]
    assert auth["e1"] > auth["e2"] > auth["e3"] > 0
    assert hub["A"] > hub["B"] > hub["C"] > 0
    # each side is L1-normalized
    assert abs(auth.sum() - 1.0) < 1e-12 and abs(hub.sum() - 1.0) < 1e-12


def test_hits_empty(ray_session):
    import ray.data as rd

    from decisions_knowledge_graph_data_ray.stages.graph import hits

    empty = rd.from_items([{"src": "a", "dst": "b"}]).filter(lambda r: False).materialize()
    assert hits(empty, iterations=2).count() == 0
