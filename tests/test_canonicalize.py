"""Connected-components: driver union-find vs distributed label propagation
must produce identical labels (component minimum)."""

import pyarrow as pa

import ray.data as rd

from decisions_knowledge_graph_data_ray.stages.canonicalize import (
    canonical_triples,
    connected_components,
)


def _edges(pairs):
    return rd.from_arrow(
        pa.table(
            {"src": [a for a, _ in pairs], "dst": [b for _, b in pairs]},
            schema=pa.schema([("src", pa.string()), ("dst", pa.string())]),
        )
    )


PAIRS = [
    ("m1", "ENT:x"), ("m2", "ENT:x"),          # star
    ("m3", "ENT:y"),                            # single link
    ("a", "b"), ("b", "c"), ("c", "d"),         # chain (diameter 3)
    ("z1", "z2"),
]

EXPECTED = {
    "m1": "ENT:x", "m2": "ENT:x", "ENT:x": "ENT:x",
    "m3": "ENT:y", "ENT:y": "ENT:y",
    "a": "a", "b": "a", "c": "a", "d": "a",
    "z1": "z1", "z2": "z1",
}
# labels are the lexicographic component minimum
EXPECTED = {k: min(v2 for k2, v2 in EXPECTED.items() if v2 == EXPECTED[k]) for k, v in EXPECTED.items()}


def _labels_of(ds):
    df = ds.to_pandas()
    return dict(zip(df["node"], df["label"]))


def test_driver_path(ray_session):
    got = _labels_of(connected_components(_edges(PAIRS)))
    assert got == {
        "m1": "ENT:x", "m2": "ENT:x", "ENT:x": "ENT:x",
        "m3": "ENT:y", "ENT:y": "ENT:y",
        "a": "a", "b": "a", "c": "a", "d": "a",
        "z1": "z1", "z2": "z1",
    }


def test_distributed_path_matches_driver(ray_session):
    driver = _labels_of(connected_components(_edges(PAIRS)))
    dist = _labels_of(connected_components(_edges(PAIRS), driver_threshold=0))
    assert driver == dist


def test_distributed_long_chain(ray_session):
    # chain longer than one round's reach — exercises iteration
    chain = [(f"n{i:02d}", f"n{i+1:02d}") for i in range(6)]
    dist = _labels_of(connected_components(_edges(chain), driver_threshold=0))
    assert set(dist.values()) == {"n00"}


def test_canonical_triples(ray_session):
    labels = connected_components(_edges([("m1", "ENT:x")]))
    out = canonical_triples(labels).to_pandas()
    # ENT:x is the non-root (m1 > ENT:x? 'E' < 'm' → root is ENT:x)
    assert set(out["pred"]) <= {"canonical_rep"}
    nonroots = set(out["subj"])
    assert nonroots == {"m1"}
    assert set(out["obj"]) == {"ENT:x"}
