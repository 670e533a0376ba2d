"""Flagship KG-construction pipeline (Ray-Data-first composition).

    read_parquet(transcripts)
      → assemble (salted two-phase groupby(conv_id), explicit turn_idx sort)
      → extract  (actor pool, schema-validated, failures routed)
      → link + emit triples (actor pool holding the broadcast LinkerIndex)
      → canonicalize (distributed min-label propagation over candidate pairs)
      → dedup triples (combiner + hash groupby)
      → write_parquet / return

The fused link+triple stage is materialized ONCE (it is small: ids + preds,
no document text) and then split into triples/links/edges views, so the
heavy upstream (read → assemble → extract) streams exactly one pass.
"""

from __future__ import annotations

from dataclasses import dataclass

import ray
import ray.data

from ..functions.linking import LinkerIndex
from ..sources.transcripts import get_world, transcripts_path
from ..stages.assemble import (
    assemble_documents,
    assemble_documents_hot_aware,
    assemble_documents_salted,
)
from ..stages.canonicalize import canonical_triples, connected_components
from ..stages.extract import extract_documents
from ..stages.triples import LinkTripleActor, dedup_triples, fused_failures, split_fused


@dataclass
class KGConfig:
    # "auto" (default) sizes the pools from the live cluster CPU count at
    # run time (see _resolve_pools); explicit int/(min,max) tuples override.
    # Two fixed-size pools whose combined size exceeds the cluster CPU count
    # would deadlock the streaming executor.
    extract_concurrency: int | tuple | str = "auto"
    link_concurrency: int | tuple | str = "auto"
    extract_batch_size: int = 64
    link_batch_size: int = 128
    # "hot_aware" (default): one shuffle for normal conversations, salted
    # two-phase only for heavy hitters; "salted": two-phase for everything;
    # "single": plain single-phase (no skew protection)
    assembly: str = "hot_aware"
    salted_assembly: bool = True  # kept for back-compat; assembly wins
    cc_num_partitions: int = 8
    # candidate-pair edge count below which exact union-find runs on the
    # driver (ids only); larger graphs use distributed label propagation
    cc_driver_threshold: int = 2_000_000
    # False (the scale default since round 4): stream assemble→extract→link
    # in ONE pipelined plan — the whole corpus text crosses the object store
    # exactly once and is never spilled whole at a barrier, which is the
    # 100-TB shape. Requires pools sized to SHARE the cluster; "auto" gives
    # bounded autoscaling bands (extract 25-50%, link 12.5-25% of CPUs) so
    # the assembly shuffle keeps slots while pools ramp (with two near-full
    # pools the streamed plan instead crawls >10x, measured r3).
    # Failures surface from the fused table (table='failures') in the same
    # pass — no re-execution to read them.
    # True: stage barriers — materialize docs before the extract pool exists
    # and extractions before the link pool. Slightly faster single-node
    # (eagerly-created near-full pools otherwise starve the assembly
    # shuffle), and what bench.py uses for the headline; at scale the
    # barrier spills the whole corpus text to the object store.
    materialize_extractions: bool = False
    # repartition assembled docs to this many blocks before the extract pool
    # (None = keep the assembly cogroup's natural block count)
    fine_blocks: int | None = None


def _cluster_cpus() -> int:
    try:
        if ray.is_initialized():
            return int(ray.cluster_resources().get("CPU", 8))
    except Exception:  # noqa: BLE001 — sizing fallback only
        pass
    return 8


def _effective_materialize(config: "KGConfig") -> bool:
    """Streamed mode needs >= 4 CPUs: its plan holds TWO live actor pools
    (>= 1 actor each) plus shuffle/driver tasks concurrently; below that the
    streaming executor deadlocks on the combined-pool invariant. Barrier
    mode runs one pool at a time, so tiny clusters fall back to it."""
    return config.materialize_extractions or _cluster_cpus() < 4


def _resolve_pools(config: "KGConfig", materialize: bool) -> tuple:
    """Resolve "auto" pool sizes from the live cluster.

    Barrier mode: each stage runs alone after its materialize, so an
    autoscaling (1, cpus-2) pool may grow to near-full without starving
    anything. Streamed mode: extract and link run CONCURRENTLY with the
    assembly shuffle, so the pools get BOUNDED AUTOSCALING BANDS with
    asymmetric shares — extract (25%..50%), link (12.5%..25%), leaving
    >= 25% for shuffle/driver tasks even at full pool growth. The band
    replaces round 4's fixed 50/25 pools, which reserved 75% of the
    cluster before the assembly shuffle had produced a single block and
    cost 31% throughput at 16 CPUs (140.0s vs 97.2s barrier on the 4x
    corpus) and floored to 1 actor each at 4 CPUs. min = share/2 (not 1):
    a (1, max) band's ramp-up lag starved the pipelined plan in the r4
    measurement (38.3s vs 27.1s at sf0.1/32); pre-creating half the pool
    keeps the extract stage fed from the first assembled block while the
    shuffle still owns most of the cluster. Asymmetric because extraction
    is the heavier stage (A/B at sf0.1/32: extract-heavy splits read the
    same best wall with a far tighter tail than symmetric ones)."""
    cpus = _cluster_cpus()
    if materialize:
        ex_auto = ln_auto = (1, max(2, cpus - 2))
    else:
        ke = max(1, cpus // 2)
        kl = max(1, cpus // 4)
        ex_auto = (max(1, ke // 2), ke)
        ln_auto = (max(1, kl // 2), kl)
    ex = ex_auto if config.extract_concurrency == "auto" else config.extract_concurrency
    ln = ln_auto if config.link_concurrency == "auto" else config.link_concurrency
    return ex, ln


def _assembler(config: "KGConfig"):
    if config.assembly == "hot_aware":
        return assemble_documents_hot_aware
    if config.assembly == "salted" or config.salted_assembly:
        return assemble_documents_salted
    return assemble_documents


def build_index_ref(world: dict | None = None):
    """Build the LinkerIndex once on the driver and broadcast via ray.put."""
    world = world or get_world()
    idx = LinkerIndex.build(
        acts=world["acts"],
        articles=world["articles"],
        alias_popular=world["alias_popular"],
        code_families=world["code_families"],
        decisions=world["decisions"],
        missing_courts=world["missing_courts"],
    )
    return ray.put(idx)


def run_kg_pipeline(
    transcripts: ray.data.Dataset,
    index_ref=None,
    config: KGConfig | None = None,
) -> dict:
    """Full pipeline → dict of result Datasets:
    {'documents','extractions','failures','triples','links','labels'}.

    ``triples`` includes canonical_rep triples and is deduplicated.
    """
    config = config or KGConfig()
    if index_ref is None:
        index_ref = build_index_ref()
    docs, extractions, fused = _run_fused(transcripts, index_ref, config)

    triples, links, edges = split_fused(fused)

    labels = connected_components(
        edges,
        num_partitions=config.cc_num_partitions,
        driver_threshold=config.cc_driver_threshold,
    )
    all_triples = triples.union(canonical_triples(labels))
    final_triples = dedup_triples(all_triples)

    # failures come out of the MATERIALIZED fused table: in the streamed
    # plan, filtering `extractions` would re-run assemble+extract end to end
    failures = fused_failures(fused)

    return {
        "documents": docs,
        "extractions": extractions,
        "failures": failures,
        "triples": final_triples,
        "links": links,
        "labels": labels,
    }


def _run_fused(transcripts: ray.data.Dataset, index_ref, config: "KGConfig"):
    """assemble → extract → link+emit for ONE transcript batch, returning
    (docs, extractions, fused). The fused table (ids + preds, no text) is
    materialized; everything upstream streams one pass. This is the
    per-batch unit of work that incremental maintenance reuses."""
    materialize = _effective_materialize(config)
    extract_pool, link_pool = _resolve_pools(config, materialize)

    assemble = _assembler(config)
    docs = assemble(transcripts)
    if materialize:
        # barrier BEFORE the extract pool exists: Ray Data creates actor-pool
        # actors eagerly at min size, and a near-full pool reserves its CPUs
        # while the assembly shuffle is still running — measured at sf0.1 the
        # sort drops from 15-27s (starved to the 2 leftover CPUs) to ~2s when
        # it runs to completion first. The docs table is narrow (one row per
        # conversation) so the extra materialization is cheap.
        #
        # Optional repartition to finer blocks: actor-pool task granularity
        # is block granularity, and the assembly cogroup emits one block per
        # partition (~CPU count) — coarse blocks can make the extract/link
        # pools run in skewed waves. Off by default: the repartition's own
        # all-to-all cost exceeded the wave-balance win at sf0.1.
        if config.fine_blocks:
            docs = docs.repartition(config.fine_blocks)
        docs = docs.materialize()

    extractions = extract_documents(
        docs,
        concurrency=extract_pool,
        batch_size=config.extract_batch_size,
    )
    if materialize:
        # nested mention records, no document text — small; lets the
        # valid/failures branches and the link stage share one extract pass
        extractions = extractions.materialize()

    # LinkTripleActor skips invalid rows itself — no filter operator in this
    # stage's plan, so its actor pool may own the whole cluster
    fused = extractions.map_batches(
        LinkTripleActor,
        fn_constructor_kwargs={"index_ref": index_ref},
        batch_format="pyarrow",
        batch_size=config.link_batch_size,
        concurrency=link_pool,
    ).materialize()  # small (ids + preds only); upstream streams one pass
    return docs, extractions, fused


def run_kg_incremental(
    base_transcripts: ray.data.Dataset,
    delta_transcripts: ray.data.Dataset,
    index_ref=None,
    config: KGConfig | None = None,
) -> dict:
    """Incremental KG maintenance: a DELTA batch of new conversations joins
    an existing corpus WITHOUT re-extracting it.

    Extraction and linking are per-conversation against a broadcast index,
    so the base corpus's fused id-table is reusable as-is (in production it
    is loaded from the per-partition stage checkpoint, state/manifest.py —
    here recomputed via the same `_run_fused` unit); only the delta pays
    the expensive assemble→extract→link pass. Canonicalization is the one
    GLOBAL stage, so it re-runs over the MERGED id-only edge set (ids +
    preds, no text — cheap by construction) and cross-batch entity
    components merge correctly; dedup then collapses any triple emitted by
    both batches. The output is row-identical to running the full pipeline
    on base ∪ delta (asserted in tests and by the kg_incremental oracle,
    which is the full-corpus kg_triples SQL).

    100-TB shape: per-delta cost = extract(delta) + CC over the id-only
    edge union + triple dedup — the heavy text pass never re-runs.
    """
    config = config or KGConfig()
    if index_ref is None:
        index_ref = build_index_ref()
    _, _, fused_base = _run_fused(base_transcripts, index_ref, config)
    _, _, fused_delta = _run_fused(delta_transcripts, index_ref, config)
    fused = fused_base.union(fused_delta)

    triples, links, edges = split_fused(fused)
    labels = connected_components(
        edges,
        num_partitions=config.cc_num_partitions,
        driver_threshold=config.cc_driver_threshold,
    )
    final_triples = dedup_triples(triples.union(canonical_triples(labels)))
    return {
        "triples": final_triples,
        "links": links,
        "labels": labels,
        "failures": fused_failures(fused),
    }


def read_transcripts(sf_dir: str) -> ray.data.Dataset:
    """The deterministic synthetic transcript corpus scaled to an sf dir."""
    return ray.data.read_parquet(transcripts_path(sf_dir))


def run_for_sf_dir(sf_dir: str, config: KGConfig | None = None) -> dict:
    return run_kg_pipeline(read_transcripts(sf_dir), config=config)


def run_kg_pipeline_checkpointed(
    transcripts: ray.data.Dataset,
    run_dir: str,
    index_ref=None,
    config: KGConfig | None = None,
    num_partitions: int = 16,
    counters: dict | None = None,
) -> dict:
    """Checkpointed flagship pipeline: every heavy stage persists per-partition
    parquet + manifests under ``run_dir`` and a rerun (same input) skips
    completed partitions without recompute (north-rule resume semantics).

    Stages checkpointed (hash-partitioned by conv_id / part_key):
      assemble → extract → link+triples (fused). The cheap tail
      (canonicalize + dedup) recomputes from the fused checkpoint — it is
      seconds of work over id-only rows and keeping it live avoids
      checkpointing the label-propagation loop's intermediate state.
    """
    from ..state.manifest import StageCheckpoint, run_stage_checkpointed

    config = config or KGConfig()
    if index_ref is None:
        index_ref = build_index_ref()
    counters = counters if counters is not None else {}
    # checkpointed stages run one at a time (each persists before the next
    # starts), so barrier-style autoscaling pools are always safe here
    extract_pool, link_pool = _resolve_pools(config, materialize=True)

    assemble = _assembler(config)
    assemble_cp = StageCheckpoint(run_dir, "assemble", num_partitions)
    counters["assemble"] = {}
    docs = run_stage_checkpointed(
        transcripts, "conv_id", assemble, assemble_cp, counters["assemble"]
    )

    extract_cp = StageCheckpoint(run_dir, "extract", num_partitions)
    counters["extract"] = {}

    def _extract(ds):
        return extract_documents(
            ds,
            concurrency=extract_pool,
            batch_size=config.extract_batch_size,
        )

    extractions = run_stage_checkpointed(docs, "conv_id", _extract, extract_cp, counters["extract"])

    fused_cp = StageCheckpoint(run_dir, "fused", num_partitions)
    counters["fused"] = {}

    def _link(ds):
        # the actor skips invalid rows itself (single-operator plan)
        return ds.map_batches(
            LinkTripleActor,
            fn_constructor_kwargs={"index_ref": index_ref},
            batch_format="pyarrow",
            batch_size=config.link_batch_size,
            concurrency=link_pool,
        )

    fused = run_stage_checkpointed(
        extractions, "conv_id", _link, fused_cp, counters["fused"], out_key_col="part_key"
    )

    triples, links, edges = split_fused(fused)
    labels = connected_components(
        edges,
        num_partitions=config.cc_num_partitions,
        driver_threshold=config.cc_driver_threshold,
    )
    final_triples = dedup_triples(triples.union(canonical_triples(labels)))
    failures = fused_failures(fused)

    return {
        "documents": docs,
        "extractions": extractions,
        "failures": failures,
        "triples": final_triples,
        "links": links,
        "labels": labels,
        "counters": counters,
    }
