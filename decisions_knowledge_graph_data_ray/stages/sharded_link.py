"""Sharded entity linking: the scale path for when the canonical-entity
index outgrows broadcast.

The flagship pipeline broadcasts ONE LinkerIndex (ray.put, fetched once per
actor) — right while the index fits worker memory (the reference's own
shape: a ~100MB article cache, find-provision-entities/config.ts:10-12).
At 10^9 canonical entities that stops working. This module implements the
north-star alternative — "stateful entity-linking actors holding sharded
alias tables":

  - the index is SPLIT into per-shard slices stored once in the object
    store: date shards (acts + decisions keyed by their date — the
    standard-provision and cited-decision candidate spaces) and article
    shards (the inverted article→acts index — the no-date candidate
    space); small tables (popular aliases, code families + their member
    acts, missing courts) are replicated into every slice so the fast
    paths and the code-family path work anywhere;
  - mentions are EXPLODED one row per mention, routed by the shard their
    candidate generation needs (date hash / article hash), and sorted by
    shard so each actor-pool batch is shard-coherent;
  - actors fetch shard slices LAZILY from the object store and keep a
    bounded LRU of loaded slices (bounded actor memory — the property
    broadcast lacks).

Trade-off vs the fused path: sharded linking separates linking from triple
emission, so re-fusing per document costs one extra shuffle (groupby
conv_id downstream). Equivalence with the broadcast path is exact — every
mention's full candidate set lives inside its shard — and gated by
tests/test_sharded_link.py.
"""

from __future__ import annotations

from collections import OrderedDict

import pyarrow as pa

import ray
import ray.data

from ..functions.linking import (
    LinkerIndex,
    link_cited_decision,
    link_provision_code,
    link_provision_no_date,
    link_provision_standard,
    provision_bucket,
    top_match,
)
from ..functions.normalize import extract_date_from_ecli, stable_hash32

DEFAULT_N_SHARDS = 8
MAX_CACHED_SHARDS = 4


def _date_shard(date: str | None, n_shards: int) -> int:
    return stable_hash32(f"date:{date or ''}") % n_shards


def _article_shard(article_key: str | None, n_shards: int) -> int:
    return n_shards + stable_hash32(f"art:{article_key or ''}") % n_shards


def build_shard_refs(
    world: dict | None = None,
    n_shards: int = DEFAULT_N_SHARDS,
    *,
    acts_ds: ray.data.Dataset | None = None,
    articles_ds: ray.data.Dataset | None = None,
    decisions_ds: ray.data.Dataset | None = None,
):
    """Split the entity world into 2×n_shards LinkerIndex slices — built
    DISTRIBUTEDLY — and return an ObjectRef of {shard_id: (block_ref, row)}.

    The full LinkerIndex is never built on the driver (that was the round-2
    weak spot: this path exists precisely for indexes too big for one
    process). Flow, all Ray Data:

      1. entity rows → (shard, document_number) assignments:
         - acts route to their date shard;
         - article rows route their owning act to the article shard of
           their article number (the no-date candidate space);
         - replicated numbers (code-family members + popular-alias
           targets — a SMALL driver-side set) go to every shard;
      2. assignments (deduped via groupby) hash_bucket_join back to the
         act / article payload tables → (shard, kind, payload JSON) rows;
         decisions route directly to their date shard;
      3. ``groupby(shard).map_groups`` builds each slice's LinkerIndex
         inside the task that owns the group and emits one
         (shard, pickled-index) row.

    The driver touches only block REFS plus each block's tiny shard
    column (Arrow blocks are plasma-mapped zero-copy: the blob bytes are
    never copied onto the driver heap). Actors fetch + unpickle their
    shard's blob lazily.

    ``acts_ds``/``articles_ds``/``decisions_ds`` let real deployments feed
    parquet-backed Datasets; by default the world lists are lifted via
    ``from_items`` (small-scale/test path — the lists are already in
    driver memory in that case).
    """
    import json
    import pickle

    import ray.data as rd

    from .joins import hash_bucket_join

    world = world or {}
    small = {
        "alias_popular": world["alias_popular"],
        "code_families": world["code_families"],
        "missing_courts": world["missing_courts"],
    }
    # acts every shard must hold: code-family members + popular-alias targets
    replicated = sorted(
        {n for nums in small["code_families"].values() for n in nums}
        | set(small["alias_popular"].values())
    )

    def _json_ds(rows):
        # ONE Arrow block (from_items splits into hundreds of tiny blocks —
        # pure scheduling overhead at this size)
        return rd.from_arrow(
            pa.table(
                {"payload": pa.array(
                    [json.dumps(r, default=str, sort_keys=True) for r in rows], pa.string()
                )}
            )
        )

    if acts_ds is None:
        acts_ds = _json_ds(world["acts"])
    if articles_ds is None:
        articles_ds = _json_ds(world["articles"])
    if decisions_ds is None:
        decisions_ds = _json_ds(world["decisions"])

    _ASSIGN = pa.schema([("shard", pa.int32()), ("document_number", pa.string())])
    _PAY = pa.schema([("document_number", pa.string()), ("payload", pa.string())])
    _ROUTED = pa.schema(
        [("shard", pa.int32()), ("kind", pa.string()), ("payload", pa.string())]
    )

    def _act_assign(batch: pa.Table) -> pa.Table:
        shards, numbers = [], []
        for s in batch["payload"].to_pylist():
            a = json.loads(s)
            shards.append(_date_shard((a.get("dossier_number") or "")[:10], n_shards))
            numbers.append(a["document_number"])
        return pa.table({"shard": shards, "document_number": numbers}, schema=_ASSIGN)

    def _article_assign(batch: pa.Table) -> pa.Table:
        shards, numbers = [], []
        for s in batch["payload"].to_pylist():
            art = json.loads(s)
            shards.append(_article_shard(str(art["article_number"]), n_shards))
            numbers.append(art["document_number"])
        return pa.table({"shard": shards, "document_number": numbers}, schema=_ASSIGN)

    def _payload_keyed(kind: str):
        key = "document_number"

        def f(batch: pa.Table) -> pa.Table:
            numbers = [json.loads(s)[key] for s in batch["payload"].to_pylist()]
            return pa.table(
                {"document_number": numbers, "payload": batch["payload"]}, schema=_PAY
            )

        return f

    replicated_rows = [
        {"shard": sid, "document_number": n}
        for sid in range(2 * n_shards)
        for n in replicated
    ]
    from ..functions.hashing import bucket_ids

    def _pid(batch: pa.Table) -> pa.Table:
        return batch.append_column("pid", bucket_ids(batch["document_number"], 32))

    def _distinct(group: pa.Table) -> pa.Table:
        # vectorized distinct inside ONE partition (Arrow C++ hash groupby) —
        # per-(shard,doc) map_groups dispatch costs ~25ms/group in Ray
        out = pa.TableGroupBy(
            group.select(["shard", "document_number"]), ["shard", "document_number"]
        ).aggregate([])
        return out.select(["shard", "document_number"]).cast(_ASSIGN)

    assignments = (
        acts_ds.map_batches(_act_assign, batch_format="pyarrow")
        .union(articles_ds.map_batches(_article_assign, batch_format="pyarrow"))
        .union(rd.from_arrow(pa.Table.from_pylist(replicated_rows, schema=_ASSIGN)))
        .map_batches(_pid, batch_format="pyarrow")
        .groupby("pid")
        .map_groups(_distinct, batch_format="pyarrow")
        .materialize()  # consumed by TWO joins below — execute the dedup once
    )

    def _tag(kind: str):
        def f(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            return pa.table(
                {
                    "shard": batch["shard"].cast(pa.int32()),
                    "kind": pa.array([kind] * n, pa.string()),
                    "payload": batch["payload"],
                },
                schema=_ROUTED,
            )

        return f

    acts_routed = hash_bucket_join(
        assignments,
        acts_ds.map_batches(_payload_keyed("act"), batch_format="pyarrow"),
        on="document_number",
        output_columns=["shard", "document_number", "payload"],
        left_schema=_ASSIGN,
        right_schema=_PAY,
    ).map_batches(_tag("act"), batch_format="pyarrow")
    arts_routed = hash_bucket_join(
        assignments,
        articles_ds.map_batches(_payload_keyed("article"), batch_format="pyarrow"),
        on="document_number",
        output_columns=["shard", "document_number", "payload"],
        left_schema=_ASSIGN,
        right_schema=_PAY,
    ).map_batches(_tag("article"), batch_format="pyarrow")

    def _decision_route(batch: pa.Table) -> pa.Table:
        shards = [
            _date_shard(str(json.loads(s)["decision_date"])[:10], n_shards)
            for s in batch["payload"].to_pylist()
        ]
        return pa.table(
            {
                "shard": pa.array(shards, pa.int32()),
                "kind": pa.array(["decision"] * batch.num_rows, pa.string()),
                "payload": batch["payload"],
            },
            schema=_ROUTED,
        )

    decisions_routed = decisions_ds.map_batches(_decision_route, batch_format="pyarrow")

    def _build_slice(group: pa.Table) -> pa.Table:
        sid = group["shard"][0].as_py()
        acts, articles, decisions = [], [], []
        kinds = group["kind"].to_pylist()
        for kind, s in zip(kinds, group["payload"].to_pylist()):
            rec = json.loads(s)
            if kind == "act":
                acts.append(rec)
            elif kind == "article":
                articles.append(rec)
            else:
                decisions.append(rec)
        # deterministic build order (groups arrive in shuffle order)
        acts.sort(key=lambda a: a["document_number"])
        articles.sort(key=lambda a: (a["document_number"], str(a["article_number"])))
        decisions.sort(key=lambda d: (str(d["decision_date"]), d["decision_id"]))
        idx = LinkerIndex.build(
            acts=acts,
            articles=articles,
            alias_popular=small["alias_popular"],
            code_families=small["code_families"],
            decisions=decisions,
            missing_courts=small["missing_courts"],
        )
        return pa.table(
            {
                "shard": pa.array([sid], pa.int32()),
                "blob": pa.array([pickle.dumps(idx)], pa.binary()),
            }
        )

    slices = (
        acts_routed.union(arts_routed)
        .union(decisions_routed)
        .groupby("shard")
        .map_groups(_build_slice, batch_format="pyarrow")
        .materialize()
    )
    shard_map: dict[int, tuple] = {}
    for block_ref in slices.to_arrow_refs():
        tbl = ray.get(block_ref)  # plasma-mapped: blob bytes stay off-heap
        if tbl.num_rows == 0 or "shard" not in tbl.column_names:
            continue  # Ray emits schema-less zero-row blocks from map_groups
        for row, sid in enumerate(tbl["shard"].to_pylist()):
            shard_map[sid] = (block_ref, row)
    # article shards with no acts / date shards with no entities never form a
    # group — give them an empty slice so actor routing never KeyErrors
    empty_ref = None
    for sid in range(2 * n_shards):
        if sid not in shard_map:
            if empty_ref is None:
                empty = LinkerIndex.build(
                    acts=[], articles=[], decisions=[],
                    alias_popular=small["alias_popular"],
                    code_families=small["code_families"],
                    missing_courts=small["missing_courts"],
                )
                empty_ref = ray.put(
                    pa.table({"shard": pa.array([-1], pa.int32()),
                              "blob": pa.array([pickle.dumps(empty)], pa.binary())})
                )
            shard_map[sid] = (empty_ref, 0)
    return ray.put(shard_map)


_MENTIONS_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("mention_internal_id", pa.string()),
        ("kind", pa.string()),
        ("shard", pa.int32()),
        ("decision_date", pa.string()),  # citing doc's date (as-of cutoff)
        # provision payload
        ("provision_number", pa.string()),
        ("provision_number_key", pa.string()),
        ("parent_act_name", pa.string()),
        ("parent_act_type", pa.string()),
        ("parent_act_date", pa.string()),
        # decision payload
        ("ecli", pa.string()),
        ("court_name", pa.string()),
        ("date", pa.string()),
        ("case_number", pa.string()),
        ("snippet", pa.string()),
    ]
)


def explode_mentions(extractions: ray.data.Dataset, n_shards: int = DEFAULT_N_SHARDS) -> ray.data.Dataset:
    """Extraction records → one routed row per provision/decision mention."""

    def _explode(batch: pa.Table) -> pa.Table:
        rows = []
        for rec in batch.to_pylist():
            if rec.get("valid") is False:
                continue
            conv_id = rec["conv_id"]
            decision_date = extract_date_from_ecli(rec.get("self_ecli") or "") or ""
            for p in rec["cited_provisions"]:
                bucket = provision_bucket(p)
                if bucket == "standard":
                    shard = _date_shard(p.get("parent_act_date"), n_shards)
                elif bucket == "no_date":
                    shard = _article_shard(
                        p.get("provision_number_key") or p.get("provision_number"), n_shards
                    )
                else:  # code: family acts replicated everywhere — balance by name
                    shard = stable_hash32(f"code:{p.get('parent_act_name')}") % n_shards
                rows.append(
                    {
                        "conv_id": conv_id,
                        "mention_internal_id": p["internal_parent_act_id"],
                        "kind": f"provision_{bucket}",
                        "shard": shard,
                        "decision_date": decision_date,
                        "provision_number": p.get("provision_number") or "",
                        "provision_number_key": p.get("provision_number_key") or "",
                        "parent_act_name": p.get("parent_act_name") or "",
                        "parent_act_type": p.get("parent_act_type") or "",
                        "parent_act_date": p.get("parent_act_date") or "",
                        "ecli": "", "court_name": "", "date": "", "case_number": "",
                        "snippet": "",
                    }
                )
            for d in rec["cited_decisions"]:
                rows.append(
                    {
                        "conv_id": conv_id,
                        "mention_internal_id": d["internal_decision_id"],
                        "kind": "decision",
                        "shard": _date_shard(d.get("date"), n_shards),
                        "decision_date": decision_date,
                        "provision_number": "", "provision_number_key": "",
                        "parent_act_name": "", "parent_act_type": "",
                        "parent_act_date": "",
                        "ecli": d.get("ecli") or "",
                        "court_name": d.get("court_name") or "",
                        "date": d.get("date") or "",
                        "case_number": d.get("case_number") or "",
                        "snippet": d.get("snippet") or "",
                    }
                )
        return pa.Table.from_pylist(rows, schema=_MENTIONS_SCHEMA)

    return extractions.map_batches(_explode, batch_format="pyarrow")


class ShardedLinkerActor:
    """Linking actor with a bounded LRU of lazily-fetched index shards."""

    def __init__(self, shard_map_ref, max_cached: int = MAX_CACHED_SHARDS):
        # {shard_id: (block_ref, row)} — tiny; blobs stay in the object store
        self._shard_refs = ray.get(shard_map_ref)
        self._cache: OrderedDict[int, LinkerIndex] = OrderedDict()
        self._max_cached = max_cached

    def _index(self, shard: int) -> LinkerIndex:
        idx = self._cache.get(shard)
        if idx is None:
            import pickle

            entry = self._shard_refs[shard]
            if isinstance(entry, tuple):  # (arrow block ref, row) — pickled slice
                block_ref, row = entry
                tbl = ray.get(block_ref)  # zero-copy plasma map
                idx = pickle.loads(tbl["blob"][row].as_py())
            else:  # bare ref to a LinkerIndex (legacy / hand-built maps)
                idx = ray.get(entry)
            self._cache[shard] = idx
            if len(self._cache) > self._max_cached:
                self._cache.popitem(last=False)  # evict LRU — bounded memory
        else:
            self._cache.move_to_end(shard)
        return idx

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for m in batch.to_pylist():
            idx = self._index(m["shard"])
            decision_date = m["decision_date"] or None
            kind = m["kind"]
            if kind == "provision_standard":
                res = link_provision_standard(m, idx)
            elif kind == "provision_code":
                res = link_provision_code(m, idx, decision_date)
            elif kind == "provision_no_date":
                res = link_provision_no_date(m, idx, decision_date)
            else:
                res = link_cited_decision(
                    {**m, "ecli": m["ecli"] or None, "court_name": m["court_name"] or None,
                     "date": m["date"] or None, "case_number": m["case_number"] or None},
                    idx,
                )
            top = top_match(res["matches"])
            out.append(
                {
                    "conv_id": m["conv_id"],
                    "mention_internal_id": m["mention_internal_id"],
                    "kind": kind,
                    "method": res["method"],
                    "matched_entity": top["document_number"] if top else None,
                    "score": top["score"] if top else None,
                }
            )
        from .. import schemas

        return pa.Table.from_pylist(out, schema=schemas.LINKS_SCHEMA)


def link_mentions_sharded(
    extractions: ray.data.Dataset,
    shard_map_ref,
    n_shards: int = DEFAULT_N_SHARDS,
    concurrency: int | tuple = (1, 8),
    batch_size: int = 256,
) -> ray.data.Dataset:
    """Extractions → links via shard-routed actors.

    A hash-partition cogroup (the same pid-groupby pattern used by every
    other keyed stage) co-locates same-shard mentions so each batch touches
    one or two shards and the actor LRU stays warm — no global Sort
    barrier, no total order needed."""
    mentions = explode_mentions(extractions, n_shards)
    routed = mentions.groupby("shard").map_groups(lambda t: t, batch_format="pyarrow")
    return routed.map_batches(
        ShardedLinkerActor,
        fn_constructor_kwargs={"shard_map_ref": shard_map_ref},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
