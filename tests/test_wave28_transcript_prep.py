"""Wave-28 operator tests: transcript boilerplate dedup, conv quality."""

import pandas as pd
import ray.data as rd


def _toy_transcripts():
    rows = []
    # "SYS" boilerplate text appears in 6 conversations; "RARE" in 2.
    for c in range(6):
        rows.append(
            {"conv_id": f"C{c}", "turn_idx": 0, "text": "SYS: you are an agent"}
        )
        rows.append(
            {
                "conv_id": f"C{c}",
                "turn_idx": 1,
                "text": f"unique content {c} about article 12 of the code",
            }
        )
    rows.append({"conv_id": "C0", "turn_idx": 2, "text": "RARE shared line"})
    rows.append({"conv_id": "C1", "turn_idx": 2, "text": "RARE shared line"})
    # conversation with no citation trigger and mostly boilerplate
    rows.append({"conv_id": "C6", "turn_idx": 0, "text": "SYS: you are an agent"})
    rows.append({"conv_id": "C6", "turn_idx": 1, "text": "plain chatter"})
    return rows


def test_boilerplate_turns_broadcast(ray_session):
    from decisions_knowledge_graph_data_ray.stages.transcript_prep import (
        boilerplate_turns,
    )

    ds = rd.from_items(_toy_transcripts()).repartition(3)
    out = (
        boilerplate_turns(ds, min_convs=5)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    # SYS line (7 convs) flagged everywhere; RARE (2 convs) and unique not.
    flagged = out[out["is_boilerplate"]]
    assert set(flagged["conv_id"]) == {f"C{c}" for c in range(7)}
    assert (flagged["turn_idx"] == 0).all()
    assert len(out) == len(_toy_transcripts())


def test_boilerplate_turns_join_fallback_matches_broadcast(ray_session):
    from decisions_knowledge_graph_data_ray.stages.transcript_prep import (
        boilerplate_turns,
    )

    ds = rd.from_items(_toy_transcripts()).repartition(3)
    a = (
        boilerplate_turns(ds, min_convs=2)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    b = (
        boilerplate_turns(ds, min_convs=2, broadcast_max=0)  # force the join path
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        a, b[a.columns].astype(a.dtypes.to_dict()), check_dtype=False
    )
    # min_convs=2 also catches the RARE line
    assert bool(a[(a.conv_id == "C0") & (a.turn_idx == 2)]["is_boilerplate"].iloc[0])


def test_conv_quality_verdicts(ray_session):
    from decisions_knowledge_graph_data_ray.stages.transcript_prep import conv_quality

    ds = rd.from_items(_toy_transcripts()).repartition(2)
    out = (
        conv_quality(ds, min_convs=5, min_turns=2)
        .to_pandas()
        .set_index("conv_id")
        .sort_index()
    )
    # C0/C1: 3 turns, 1 cite turn, 1 boilerplate (ratio 1/3 <= 1/2) -> keep
    assert bool(out.loc["C0", "keep"]) and bool(out.loc["C1", "keep"])
    assert out.loc["C0", "n_cite_turns"] == 1
    assert out.loc["C0", "n_boilerplate"] == 1
    # C6: no citation trigger, 1/2 boilerplate -> keep requires cite -> drop
    assert not bool(out.loc["C6", "keep"])
    # mean_len is exact integer-sum / count
    texts = [r["text"] for r in _toy_transcripts() if r["conv_id"] == "C6"]
    assert out.loc["C6", "mean_len"] == sum(len(t) for t in texts) / len(texts)


def test_conv_quality_refuses_unbounded_broadcast(ray_session):
    import pytest

    from decisions_knowledge_graph_data_ray.stages.transcript_prep import conv_quality

    ds = rd.from_items(_toy_transcripts())
    with pytest.raises(ValueError, match="broadcast_max"):
        conv_quality(ds, min_convs=1, broadcast_max=1).materialize()
