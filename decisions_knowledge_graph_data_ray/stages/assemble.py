"""Assembly stage: transcripts → assembled documents.

groupby(conv_id) with an EXPLICIT turn_idx sort inside the group preserves
the per-turn text-equality invariant (BASELINE.json north star; the analogue
of the reference reading an already-ordered markdown document).

Physical plan note: Ray's ``groupby(key).map_groups`` dispatches a Python
call per group — catastrophic for millions of small conversations. Both
implementations here therefore group by a HASH PARTITION of the key
(``pid = stable_hash(conv_id) % P``) and run ONE pandas groupby per
partition: the shuffle moves the same rows, but Python dispatch drops from
O(conversations) to O(partitions).

Two implementations:

- ``assemble_documents``: single-phase (one shuffle on pid).
- ``assemble_documents_salted`` (default in the flagship pipeline): two-phase
  salted aggregation for hot-conversation skew (SURVEY.md §7.4 hard part 2).
  Phase 1 partitions by hash(conv_id, salt) where salt = turn_idx //
  SALT_CHUNK — monotone in turn_idx, so per-salt partial documents
  concatenated in salt order reproduce the exact turn order. A conversation
  with millions of turns spreads across phase-1 partitions; phase 2 merges
  one small partial row per salt bucket.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray.data

from ..functions.document import assemble_text, derive_self_ecli
from ..functions.hashing import bucket_ids
from ..functions.normalize import length_category

SALT_CHUNK = 256


def _default_partitions() -> int:
    import ray as _ray

    cpus = int(_ray.cluster_resources().get("CPU", 8)) if _ray.is_initialized() else 8
    return max(16, cpus * 4)


# ``groupby(key, num_partitions=cpus)`` caps the cogroup's output-partition
# count at the CPU count (fewer, larger reduce partitions than Ray's
# default). NOTE (measured, round 2): under the default DataContext this is
# still the SORT-based shuffle — Ray only engages its hash-shuffle
# aggregator actors when ``DataContext.shuffle_strategy = HASH_SHUFFLE``,
# and enabling that here stalls the pipeline (>25 min vs 28 s at sf0.1):
# the long-lived aggregator actors contend for CPUs with the near-full
# extract/link actor pools. Measured on the 1.7M-turn corpus the capped
# partitioning wins: default 22.3s@4cpu → 10.4s@16cpu (eff 0.53); capped
# 25.6s → 9.7s (eff 0.66). Default on; ``DKG_ASSEMBLY_SHUFFLE=sort``
# reverts to Ray's default partition count.
def _hash_partitions() -> int | None:
    import os

    import ray as _ray

    if os.environ.get("DKG_ASSEMBLY_SHUFFLE", "hash") == "sort":
        return None
    if os.environ.get("DKG_ASSEMBLY_PARTS"):
        return int(os.environ["DKG_ASSEMBLY_PARTS"])
    cpus = int(_ray.cluster_resources().get("CPU", 8)) if _ray.is_initialized() else 8
    return max(2, min(cpus, 64))


def _grouped(ds: ray.data.Dataset, key: str):
    np_ = _hash_partitions()
    return ds.groupby(key, num_partitions=np_) if np_ else ds.groupby(key)


def _finalize(conv_id: str, text: str, n_turns: int) -> dict:
    return {
        "conv_id": conv_id,
        "text": text,
        "n_turns": n_turns,
        "text_len": len(text),
        "length_category": length_category(len(text)),
        "self_ecli": derive_self_ecli(text),
    }


def _add_pid(key_col: str, num_partitions: int):
    def f(batch: pa.Table) -> pa.Table:
        # vectorized hash of the key column only — never the text
        return batch.append_column("pid", bucket_ids(batch[key_col], num_partitions))

    return f


def _assemble_block(group: pd.DataFrame) -> pd.DataFrame:
    group = group.sort_values(["conv_id", "turn_idx"], kind="stable")
    recs = []
    for cid, g in group.groupby("conv_id", sort=False):
        recs.append(_finalize(cid, assemble_text(g["role"].tolist(), g["text"].tolist()), len(g)))
    return pd.DataFrame(
        recs, columns=["conv_id", "text", "n_turns", "text_len", "length_category", "self_ecli"]
    )


def assemble_documents(
    ds: ray.data.Dataset, num_partitions: int | None = None
) -> ray.data.Dataset:
    """Single-phase assembly (fine when no conversation is pathological)."""
    num_partitions = num_partitions or _default_partitions()
    ds = ds.select_columns(["conv_id", "turn_idx", "role", "text"])
    ds = ds.map_batches(_add_pid("conv_id", num_partitions), batch_format="pyarrow")
    return _grouped(ds, "pid").map_groups(_assemble_block, batch_format="pandas")


def _assemble_partials_block(group: pd.DataFrame) -> pd.DataFrame:
    group = group.sort_values(["conv_id", "salt", "turn_idx"], kind="stable")
    recs = []
    for (cid, salt), g in group.groupby(["conv_id", "salt"], sort=False):
        recs.append(
            {
                "conv_id": cid,
                "salt": int(salt),
                "part_text": assemble_text(g["role"].tolist(), g["text"].tolist()),
                "part_turns": len(g),
            }
        )
    return pd.DataFrame(recs, columns=["conv_id", "salt", "part_text", "part_turns"])


def _merge_partials_block(group: pd.DataFrame) -> pd.DataFrame:
    group = group.sort_values(["conv_id", "salt"], kind="stable")
    recs = []
    for cid, g in group.groupby("conv_id", sort=False):
        recs.append(
            _finalize(cid, "\n".join(g["part_text"].tolist()), int(g["part_turns"].sum()))
        )
    return pd.DataFrame(
        recs, columns=["conv_id", "text", "n_turns", "text_len", "length_category", "self_ecli"]
    )


def assemble_documents_salted(
    ds: ray.data.Dataset, num_partitions: int | None = None
) -> ray.data.Dataset:
    """Two-phase skew-safe assembly (salt = turn_idx // SALT_CHUNK)."""
    num_partitions = num_partitions or _default_partitions()
    ds = ds.select_columns(["conv_id", "turn_idx", "role", "text"])

    def _add_salt_pid(batch: pa.Table) -> pa.Table:
        import numpy as np

        salts = (batch["turn_idx"].to_numpy() // SALT_CHUNK).astype(np.int32)
        # (conv_id, salt) composite bucket, vectorized: hash conv_id once,
        # then mix the salt in with an odd multiplier
        conv_h = bucket_ids(batch["conv_id"], 1 << 30).to_numpy()
        pids = ((conv_h.astype(np.int64) + salts.astype(np.int64) * 2654435761) % num_partitions
                ).astype(np.int32)
        return batch.append_column("salt", pa.array(salts, pa.int32())).append_column(
            "pid", pa.array(pids, pa.int32())
        )

    phase1 = ds.map_batches(_add_salt_pid, batch_format="pyarrow")
    partials = _grouped(phase1, "pid").map_groups(_assemble_partials_block, batch_format="pandas")

    phase2 = partials.map_batches(_add_pid("conv_id", num_partitions), batch_format="pyarrow")
    return _grouped(phase2, "pid").map_groups(_merge_partials_block, batch_format="pandas")


# a conversation is "hot" (needs the salted two-phase path) only when its
# turn count would skew a single partition; everything below rides ONE
# shuffle. 4 chunks of salt granularity is comfortably past any normal doc.
HOT_TURN_THRESHOLD = 4 * SALT_CHUNK

_HOT_SET_CACHE: dict = {}


def assemble_documents_hot_aware(
    ds: ray.data.Dataset, num_partitions: int | None = None,
    hot_threshold: int = HOT_TURN_THRESHOLD,
) -> ray.data.Dataset:
    """Skew-aware assembly with MINIMAL text movement.

    ``assemble_documents_salted`` pays for hot-key safety on every row: the
    full turn text crosses TWO all-to-all sorts (phase-1 salted partials,
    phase-2 partial merge). But only heavy-hitter conversations need that —
    so first count turns per conversation (narrow (conv_id, n) rows, column-
    pruned read, combiner-first), then route:

    - normal conversations (the overwhelming mass): ONE shuffle straight to
      their hash partition, assembled in place — text moves once;
    - hot conversations (> ``hot_threshold`` turns): the salted two-phase
      path, whose phase-2 only re-shuffles the hot partials (tiny).

    The hot-id set collects on the driver — bounded by the number of heavy
    hitters by definition (a web-scale corpus has few conversations with
    >1024 turns; if yours has millions, raise ``hot_threshold``)."""
    num_partitions = num_partitions or _default_partitions()
    ds = ds.select_columns(["conv_id", "turn_idx", "role", "text"])

    def _partial_counts(batch: pa.Table) -> pa.Table:
        out = pa.TableGroupBy(batch.select(["conv_id"]), "conv_id").aggregate(
            [([], "count_all")]
        )
        # rename by NAME — aggregate's key/value column order has varied
        # across pyarrow versions
        remap = {"count_all": "n"}
        return out.rename_columns([remap.get(c, c) for c in out.column_names])

    def _sum_filter_hot(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        out = pa.TableGroupBy(group.select(["conv_id", "n"]), "conv_id").aggregate(
            [("n", "sum")]
        )
        remap = {"n_sum": "n"}
        out = out.rename_columns([remap.get(c, c) for c in out.column_names])
        return out.filter(pc.greater(out["n"], pa.scalar(hot_threshold))).select(
            ["conv_id", "n"]
        )

    # combiner-first counts + pid cogroup with a per-group Arrow sum — Ray's
    # generic single-key Aggregate measured 7s on 425k rows where this
    # cogroup takes ~1s (same pattern as dedup_triples)
    counts = (
        ds.select_columns(["conv_id"])
        .map_batches(_partial_counts, batch_format="pyarrow", batch_size=None)
        .map_batches(_add_pid("conv_id", num_partitions), batch_format="pyarrow")
        .groupby("pid", num_partitions=_hash_partitions())
        .map_groups(_sum_filter_hot, batch_format="pyarrow")
    )
    hot_ids = [r["conv_id"] for r in counts.take_all()]  # heavy hitters only

    if not hot_ids:
        return assemble_documents(ds, num_partitions)

    import ray as _ray

    hot_ref = _ray.put(pa.array(sorted(hot_ids), pa.string()))

    def _split(keep_hot: bool):
        def f(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            key = hot_ref.hex() if hasattr(hot_ref, "hex") else id(hot_ref)
            if key not in _HOT_SET_CACHE:  # fetched once per worker process
                _HOT_SET_CACHE[key] = _ray.get(hot_ref)
            hot_arr = _HOT_SET_CACHE[key]
            mask = pc.is_in(batch["conv_id"], value_set=hot_arr)
            return batch.filter(mask if keep_hot else pc.invert(mask))

        return f

    normal = assemble_documents(
        ds.map_batches(_split(False), batch_format="pyarrow"), num_partitions
    )
    hot = assemble_documents_salted(
        ds.map_batches(_split(True), batch_format="pyarrow"), num_partitions
    )
    return normal.union(hot)


def explode_documents(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Inverse of assembly: documents → (conv_id, turn_idx, role, text) rows.

    Used by the per-turn text-equality invariant test.
    """

    def _explode(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for conv_id, text in zip(batch["conv_id"], batch["text"]):
            for i, line in enumerate(text.split("\n")):
                role, _, turn_text = line.partition(": ")
                rows.append({"conv_id": conv_id, "turn_idx": i, "role": role, "text": turn_text})
        df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text"])
        df["turn_idx"] = df["turn_idx"].astype("int32")
        return df

    return docs.map_batches(_explode, batch_format="pandas")
