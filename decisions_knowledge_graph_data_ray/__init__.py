"""decisions_knowledge_graph_data_ray — a Ray-Data-native knowledge-graph
construction engine.

Rebuilds, from scratch and Ray-Data-first, the query/data-processing
capabilities of the reference system ``shaharzep/decisions-knowledge-graph-data``
(a single-process Node.js KG-construction pipeline over Belgian court
decisions): deterministic mention/reference extraction, schema-validated
structured extraction, entity linking with alias fast paths, canonicalization,
and deduplicated (subj, pred, obj) graph materialization — expressed as
``ray.data.Dataset`` pipelines (``map_batches`` over Arrow batches, actor
pools for stateful linking stages, groupby/aggregate for the wide steps).

Layout:
    functions/  pure deterministic logic shared by the Ray stages AND the
                serial oracle (normalizers, regex extractors, scoring)
    sources/    input readers + the deterministic synthetic transcript /
                entity-table generators
    stages/     Ray Data stage implementations (assemble, detect, extract,
                link, canonicalize, dedup, similarity, text stats, ...)
    pipelines/  end-to-end pipeline compositions + the serial oracle
    state/      checkpoint manifest / resume layer
"""

__version__ = "0.1.0"
