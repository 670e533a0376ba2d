"""Wave-23 operator tests: link prediction (Adamic-Adar + neighbor
Jaccard), label-propagation communities."""

import math
from collections import Counter, defaultdict

import pandas as pd
import ray.data as rd


def _adj(pairs):
    nbrs = defaultdict(set)
    for a, b in pairs:
        nbrs[a].add(b)
        nbrs[b].add(a)
    return nbrs


def _brute_link_prediction(pairs):
    nbrs = _adj(pairs)
    edge_set = set(pairs)
    rows = []
    nodes = sorted(nbrs)
    for i, u in enumerate(nodes):
        for v in nodes[i + 1 :]:
            if (u, v) in edge_set:
                continue
            common = sorted(nbrs[u] & nbrs[v])
            if not common:
                continue
            union = len(nbrs[u] | nbrs[v])
            aa = sum(1.0 / math.log(float(len(nbrs[z]))) for z in common)
            rows.append(
                {
                    "src": u,
                    "dst": v,
                    "n_common": len(common),
                    "n_union": union,
                    "jaccard": float(len(common)) / float(union),
                    "aa_score": aa,
                }
            )
    return pd.DataFrame(rows)


def _run_lp(pairs):
    from decisions_knowledge_graph_data_ray.stages.graph import link_prediction_scores

    ds = rd.from_items([{"src": a, "dst": b} for a, b in pairs]).materialize()
    cols = ["src", "dst", "n_common", "n_union", "jaccard", "aa_score"]
    out = link_prediction_scores(ds).to_pandas()
    if out.empty:  # empty join results drop the schema (joins.py contract)
        return pd.DataFrame(columns=cols)
    return out[cols].sort_values(["src", "dst"]).reset_index(drop=True)


def test_link_prediction_path(ray_session):
    # path a-b-c: only candidate (a, c) via z=b (deg 2)
    out = _run_lp([("a", "b"), ("b", "c")])
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["src"], r["dst"]) == ("a", "c")
    assert r["n_common"] == 1 and r["n_union"] == 1
    assert r["jaccard"] == 1.0
    assert abs(r["aa_score"] - 1.0 / math.log(2.0)) < 1e-12


def test_link_prediction_excludes_existing_edges(ray_session):
    # triangle a-b-c: all pairs adjacent -> no candidates
    out = _run_lp([("a", "b"), ("a", "c"), ("b", "c")])
    assert len(out) == 0


def test_link_prediction_matches_brute_force(ray_session):
    # deterministic pseudo-random graph on 30 nodes
    nodes = [f"n{i:02d}" for i in range(30)]
    pairs = []
    for i in range(30):
        for j in range(i + 1, 30):
            if (i * 7 + j * 13) % 11 == 0:
                pairs.append((nodes[i], nodes[j]))
    got = _run_lp(pairs)
    want = (
        _brute_link_prediction(pairs)
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def _brute_lpa(pairs, iterations):
    nbrs = _adj(pairs)
    labels = {n: n for n in nbrs}
    for _ in range(iterations):
        new = {}
        for n in nbrs:
            votes = Counter(labels[m] for m in nbrs[n])
            best = min(votes, key=lambda l: (-votes[l], l))
            new[n] = best
        labels = new
    return labels


def test_label_propagation_two_cliques(ray_session):
    from decisions_knowledge_graph_data_ray.stages.graph import label_propagation

    clique1 = [("a", "b"), ("a", "c"), ("b", "c")]
    clique2 = [("x", "y"), ("x", "z"), ("y", "z")]
    ds = rd.from_items(
        [{"src": a, "dst": b} for a, b in clique1 + clique2]
    ).materialize()
    out = label_propagation(ds, iterations=5).to_pandas()
    got = dict(zip(out["node"], out["community"]))
    want = _brute_lpa(clique1 + clique2, 5)
    assert got == want
    # the two cliques never share a label
    assert {got["a"], got["b"], got["c"]} & {got["x"], got["y"], got["z"]} == set()


def test_label_propagation_matches_brute_force(ray_session):
    from decisions_knowledge_graph_data_ray.stages.graph import label_propagation

    nodes = [f"n{i:02d}" for i in range(24)]
    pairs = []
    for i in range(24):
        for j in range(i + 1, 24):
            if (i * 5 + j * 3) % 7 == 0:
                pairs.append((nodes[i], nodes[j]))
    ds = (
        rd.from_items([{"src": a, "dst": b} for a, b in pairs])
        .repartition(5)
        .materialize()
    )
    out = label_propagation(ds, iterations=4).to_pandas()
    got = dict(zip(out["node"], out["community"]))
    assert got == _brute_lpa(pairs, 4)
