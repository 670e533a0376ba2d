"""Wave-44: Cohen's kappa arithmetic, split-leakage composition."""


def test_kappa_integer_formula():
    """κ = (diag·N − Σ row·col)/(N² − Σ row·col) equals the textbook
    (po − pe)/(1 − pe) on a known confusion matrix."""
    # rows = truth, cols = pred:  [[20, 5], [10, 15]]
    n = 50
    diag = 35
    rows = {"a": 25, "b": 25}
    cols = {"a": 30, "b": 20}
    src = sum(rows[l] * cols[l] for l in rows)
    kappa = (diag * n - src) / (n * n - src)
    po = diag / n
    pe = src / (n * n)
    assert abs(kappa - (po - pe) / (1 - pe)) < 1e-15
    assert 0 < kappa < 1


def test_split_leakage_pair_normalization(ray_session):
    """Pair split labels normalize to (min, max) so direction never
    duplicates cells."""
    import pyarrow as pa
    import ray.data as rd
    from ray.data.aggregate import Count

    from decisions_knowledge_graph_data_ray.stages.prep import split_of

    # fabricate a pair table and flag with real split_of
    ids = list(range(40))
    splits = {i: split_of(i) for i in ids}
    # pick one id from 'train' and one from 'test' if available
    by = {}
    for i, s in splits.items():
        by.setdefault(s, []).append(i)
    assert "train" in by and len(by["train"]) >= 2
    other = "test" if "test" in by else "val"
    a, b = by["train"][0], by[other][0]
    pairs = rd.from_items(
        [
            {"src_id": a, "dst_id": b},
            {"src_id": b, "dst_id": a},  # reversed direction
            {"src_id": by["train"][0], "dst_id": by["train"][1]},
        ]
    )

    def _splits(batch: pa.Table) -> pa.Table:
        sa, sb = [], []
        for s, d in zip(batch["src_id"].to_pylist(), batch["dst_id"].to_pylist()):
            x, y = split_of(s), split_of(d)
            sa.append(min(x, y))
            sb.append(max(x, y))
        return pa.table(
            {"split_a": pa.array(sa, pa.string()), "split_b": pa.array(sb, pa.string())}
        )

    out = (
        pairs.map_batches(_splits, batch_format="pyarrow")
        .groupby(["split_a", "split_b"])
        .aggregate(Count(alias_name="n_pairs"))
        .to_pandas()
        .set_index(["split_a", "split_b"])
    )
    cross = tuple(sorted(["train", other]))
    assert out.loc[cross, "n_pairs"] == 2  # both directions, one cell
    assert out.loc[("train", "train"), "n_pairs"] == 1
