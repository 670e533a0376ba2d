"""Wave-46: component/cluster size histograms."""

import pyarrow as pa
import ray.data as rd


def _sizes_histogram(labels):
    from ray.data.aggregate import Count, Sum

    def _size_partial(batch: pa.Table) -> pa.Table:
        out = pa.TableGroupBy(batch.select(["label"]), "label").aggregate(
            [([], "count_all")]
        )
        return out.rename_columns(["label", "n"])

    sizes = (
        labels.map_batches(_size_partial, batch_format="pyarrow")
        .groupby("label")
        .aggregate(Sum("n", alias_name="size"))
    )
    return (
        sizes.groupby("size")
        .aggregate(Count(alias_name="n_components"))
        .to_pandas()
        .sort_values("size")
        .reset_index(drop=True)
    )


def test_component_size_histogram(ray_session):
    from decisions_knowledge_graph_data_ray.stages.canonicalize import (
        connected_components,
    )

    # components: {a,b,c} (path), {d,e}, {f,g} → sizes 3,2,2
    edges = rd.from_items(
        [
            {"src": "a", "dst": "b"},
            {"src": "b", "dst": "c"},
            {"src": "d", "dst": "e"},
            {"src": "f", "dst": "g"},
        ]
    ).repartition(2)
    labels = connected_components(edges)
    out = _sizes_histogram(labels)
    got = dict(zip(out["size"], out["n_components"]))
    assert got == {2: 2, 3: 1}


def test_component_size_histogram_distributed_path(ray_session):
    """driver_threshold=0 forces label propagation — identical histogram."""
    from decisions_knowledge_graph_data_ray.stages.canonicalize import (
        connected_components,
    )

    edges = rd.from_items(
        [{"src": str(i), "dst": str(i + 1)} for i in range(0, 30, 3)]
        + [{"src": str(i), "dst": str(i + 2)} for i in range(0, 30, 3)]
    )
    a = _sizes_histogram(connected_components(edges))
    b = _sizes_histogram(connected_components(edges, driver_threshold=0))
    assert a.equals(b)
