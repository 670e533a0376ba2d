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


def build_shard_refs(world: dict, n_shards: int = DEFAULT_N_SHARDS):
    """Split the entity world into 2×n_shards LinkerIndex slices and ray.put
    each once. Returns an ObjectRef of {shard_id: slice_ref}."""
    full = LinkerIndex.build(
        acts=world["acts"],
        articles=world["articles"],
        alias_popular=world["alias_popular"],
        code_families=world["code_families"],
        decisions=world["decisions"],
        missing_courts=world["missing_courts"],
    )
    # acts every shard must hold: code-family members + popular-alias targets
    replicated_numbers = {n for nums in world["code_families"].values() for n in nums}
    replicated_numbers |= set(world["alias_popular"].values())

    acts_by_number = {a["document_number"]: a for a in world["acts"]}
    arts_by_number: dict[str, list[dict]] = {}
    for art in world["articles"]:
        arts_by_number.setdefault(art["document_number"], []).append(art)

    def slice_index(acts: list[dict], decisions: list[dict]) -> LinkerIndex:
        numbers = {a["document_number"] for a in acts} | replicated_numbers
        acts_full = [acts_by_number[n] for n in sorted(numbers) if n in acts_by_number]
        articles = [art for n in sorted(numbers) for art in arts_by_number.get(n, [])]
        return LinkerIndex.build(
            acts=acts_full,
            articles=articles,
            alias_popular=world["alias_popular"],
            code_families=world["code_families"],
            decisions=decisions,
            missing_courts=world["missing_courts"],
        )

    shard_map: dict[int, ray.ObjectRef] = {}
    for s in range(n_shards):
        acts = [
            a for a in world["acts"]
            if _date_shard((a.get("dossier_number") or "")[:10], n_shards) == s
        ]
        decisions = [
            d for d in world["decisions"]
            if _date_shard(str(d["decision_date"])[:10], n_shards) == s
        ]
        shard_map[s] = ray.put(slice_index(acts, decisions))
    for s in range(n_shards):
        sid = n_shards + s
        # article shard: all acts containing an article whose number hashes here
        numbers = {
            doc for art_no, docs in full.acts_by_article.items()
            if _article_shard(art_no, n_shards) == sid
            for doc in docs
        }
        acts = [acts_by_number[n] for n in sorted(numbers)]
        shard_map[sid] = ray.put(slice_index(acts, []))
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
        self._shard_refs = ray.get(shard_map_ref)  # {shard_id: ObjectRef} — tiny
        self._cache: OrderedDict[int, LinkerIndex] = OrderedDict()
        self._max_cached = max_cached

    def _index(self, shard: int) -> LinkerIndex:
        idx = self._cache.get(shard)
        if idx is None:
            idx = ray.get(self._shard_refs[shard])
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

    The sort co-locates same-shard mentions so each batch touches one or
    two shards and the actor LRU stays warm."""
    mentions = explode_mentions(extractions, n_shards)
    routed = mentions.sort("shard")
    return routed.map_batches(
        ShardedLinkerActor,
        fn_constructor_kwargs={"shard_map_ref": shard_map_ref},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
