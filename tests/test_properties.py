"""Property-based tests (hypothesis) for the invariants the engine's
correctness rests on, plus seeded randomized equivalence checks for the
distributed join against a serial reference.

- per-turn text equality: assemble ∘ explode == identity for ANY turn
  ordering and newline-free text (the north-rule invariant)
- MinHash: est_jaccard(sig(a), sig(a)) == 1; banding collides on equal
  signatures; est roughly tracks true Jaccard
- extraction ids: ART-/DEC- sequences are 1..n dense and deterministic
- outcome classification is closed over the enum
- hash_bucket_join == pandas merge on randomized key distributions
  (sparse keys, dup keys, empty sides)
"""

import string

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from decisions_knowledge_graph_data_ray.functions import sketches as S
from decisions_knowledge_graph_data_ray.functions.document import (
    assemble_document,
    explode_text,
)
from decisions_knowledge_graph_data_ray.functions.parties import (
    VALID_OUTCOMES,
    classify_outcome,
)

_TEXT = st.text(
    alphabet=string.ascii_letters + string.digits + " .,;:'-éàû",
    min_size=0,
    max_size=80,
).map(lambda s: s.replace("\n", " "))

_ROLE = st.sampled_from(["user", "assistant", "tool"])


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(_ROLE, _TEXT), min_size=1, max_size=20), st.randoms())
def test_assemble_explode_roundtrip_any_order(turns, rnd):
    idxs = list(range(len(turns)))
    rnd.shuffle(idxs)  # arbitrary physical order — the sort must restore it
    doc = assemble_document(
        "C1",
        [idxs[i] for i in range(len(turns))],
        [turns[idxs[i]][0] for i in range(len(turns))],
        [turns[idxs[i]][1] for i in range(len(turns))],
    )
    back = explode_text(doc["text"])
    # roundtrip: (role, text) in turn_idx order
    want = [turns[i] for i in sorted(idxs, key=lambda j: idxs[j])]
    # reconstruct expected by the same idx mapping the assembler saw
    order = sorted(range(len(turns)), key=lambda i: idxs[i])
    want = [(turns[idxs[i]][0], turns[idxs[i]][1]) for i in order]
    assert back == want


_WORDS = st.lists(
    st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=8), min_size=3, max_size=30
).map(" ".join)


@settings(max_examples=50, deadline=None)
@given(_WORDS)
def test_minhash_self_similarity(text):
    sig = S.minhash_signature(text)
    assert S.estimated_jaccard(sig, sig) == 1.0
    bands_a = S.minhash_bands(sig)
    bands_b = S.minhash_bands(S.minhash_signature(text))
    assert bands_a == bands_b  # deterministic across calls


@settings(max_examples=50, deadline=None)
@given(st.text(alphabet=string.ascii_lowercase + " ", min_size=30, max_size=200))
def test_minhash_tracks_true_jaccard(text):
    # append a disjoint suffix: estimated jaccard must drop below 1
    other = text + " zzz qqq www eee rrr ttt yyy uuu iii ooo"
    est = S.estimated_jaccard(S.minhash_signature(text), S.minhash_signature(other))
    true = S.ngram_jaccard(text, other)
    assert 0.0 <= est <= 1.0
    assert abs(est - true) < 0.45  # 128 permutations → loose but real bound


@settings(max_examples=100, deadline=None)
@given(_TEXT)
def test_outcome_always_in_closed_set(text):
    assert classify_outcome(text) in VALID_OUTCOMES


@settings(max_examples=30, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.integers(min_value=0, max_value=10_000))
def test_extraction_ids_dense_and_deterministic(seed):
    from decisions_knowledge_graph_data_ray.functions.document import extract_document
    from decisions_knowledge_graph_data_ray.sources.transcripts import (
        get_world,
        render_turn_text,
    )

    w = get_world()
    text = "\n".join(
        f"assistant: {render_turn_text(seed % 997, t, w)}" for t in range(6)
    )
    rec1 = extract_document({"conv_id": "CX", "text": text, "self_ecli": ""})
    rec2 = extract_document({"conv_id": "CX", "text": text, "self_ecli": ""})
    assert rec1 == rec2  # fully deterministic
    provs = rec1["cited_provisions"]
    assert [p["provision_seq"] for p in provs] == list(range(1, len(provs) + 1))
    decs = rec1["cited_decisions"]
    assert [d["decision_seq"] for d in decs] == list(range(1, len(decs) + 1))
    teaches = rec1["legal_teachings"]
    assert [t["teaching_seq"] for t in teaches] == list(range(1, len(teaches) + 1))


def test_hash_bucket_join_matches_pandas_merge(ray_session):
    """Randomized (seeded) equivalence: bucketed distributed join == serial
    pandas merge under sparse/dup/empty key distributions."""
    import random

    import pyarrow as pa
    import ray.data as rd

    from decisions_knowledge_graph_data_ray.stages.joins import hash_bucket_join

    for seed in range(8):
        rnd = random.Random(seed)
        n_l, n_r = rnd.randint(0, 40), rnd.randint(0, 40)
        key_space = rnd.randint(1, 15)
        left = pd.DataFrame(
            {
                "k": [rnd.randint(0, key_space) for _ in range(n_l)],
                "v": [f"L{i}" for i in range(n_l)],
            }
        )
        right = pd.DataFrame(
            {
                "k2": [rnd.randint(0, key_space) for _ in range(n_r)],
                "w": [f"R{i}" for i in range(n_r)],
            }
        )
        for how, pd_how in (("inner", "inner"), ("left_outer", "left")):
            got = hash_bucket_join(
                rd.from_arrow(pa.Table.from_pandas(left)),
                rd.from_arrow(pa.Table.from_pandas(right)),
                on="k",
                right_on="k2",
                output_columns=["k", "v", "w"],
                how=how,
                num_buckets=4,
                left_schema=pa.schema([("k", pa.int64()), ("v", pa.string())]),
                right_schema=pa.schema([("k2", pa.int64()), ("w", pa.string())]),
            ).to_pandas()
            want = left.merge(right, left_on="k", right_on="k2", how=pd_how)[
                ["k", "v", "w"]
            ]
            # empty result ⇒ Ray returns a schema-less empty Dataset
            got = got.reindex(columns=["k", "v", "w"])
            got_s = sorted(map(tuple, got.fillna("∅").itertuples(index=False)))
            want_s = sorted(map(tuple, want.fillna("∅").itertuples(index=False)))
            assert got_s == want_s, f"seed={seed} how={how}"
        # anti + semi vs pandas equivalents
        anti = hash_bucket_join(
            rd.from_arrow(pa.Table.from_pandas(left)),
            rd.from_arrow(pa.Table.from_pandas(right)),
            on="k", right_on="k2", output_columns=["k", "v"], how="left_anti",
            num_buckets=4,
            left_schema=pa.schema([("k", pa.int64()), ("v", pa.string())]),
            right_schema=pa.schema([("k2", pa.int64()), ("w", pa.string())]),
        ).to_pandas().reindex(columns=["k", "v"])
        want_anti = left[~left["k"].isin(set(right["k2"]))]
        assert sorted(anti["v"].dropna()) == sorted(want_anti["v"]), f"seed={seed} anti"
