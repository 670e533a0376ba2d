"""Transcript-corpus curation operators (pre-extraction filters).

At 10^12-turn scale the LLM-extraction pool is the expensive stage; these
operators decide WHAT reaches it — the transcript-side analogue of the
documents-table curation suite (stages/prep.py):

- boilerplate_turns: cross-conversation exact turn dedup (RefinedWeb /
  CCNet line-dedup transposed to agent transcripts): a turn text appearing
  in >= ``min_convs`` DISTINCT conversations is boilerplate (system
  prompts, canned tool banners, retry chatter). Shape: per-batch combiner
  distinct over (text-hash, conv) int/str pairs + pid-cogroup distinct
  (stages/graph.distinct_pairs — never a per-key group), one bounded
  groupby for the conv counts, then the hot-key set broadcasts back via
  ``ray.put`` (bounded by |distinct turn texts| / min_convs); above
  ``broadcast_max`` keys the flag pass switches to a hash_bucket_join —
  the same threshold-switched shape as minhash_lsh_pairs.
- conv_quality: per-conversation extraction-worthiness profile — turn
  count, citation-trigger turn count (vectorized RE2 via
  pyarrow.compute.match_substring_regex, the same regex family DuckDB
  runs), boilerplate count, mean turn length, and a composed keep/drop
  verdict (the gopher filter's transcript cousin). One fused per-turn map
  → per-conversation Sum/Count aggregates → pure verdict map; the only
  shuffle moves 4-int partial rows keyed by conv_id.

The extraction pipeline itself (pipelines/kg.py) stays unfiltered — these
are standalone curation passes a user composes in front of it, mirroring
how the reference repo gates batch submission on row-level preprocessing
(src/jobs: preprocessRow length gates) rather than inside the extractor.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Count, Sum

# RE2-compatible on BOTH sides (pyarrow.compute and DuckDB regexp_matches).
ECLI_TRIGGER = r"ECLI:[A-Z]{2}:[A-Z0-9]+:[0-9]{4}:[A-Z0-9.]+"
ARTICLE_TRIGGER = r"(?i)\b(artikel|article|art\.)\s+[0-9]"

# Above this many boilerplate keys the flag pass stops broadcasting and
# joins instead (each key is ~60 bytes in the set; 2M ≈ 120 MB/worker).
BOILERPLATE_BROADCAST_MAX = 2_000_000


def _text_keys(texts: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Stable 64-bit content key per turn text: md5 low 8 bytes
    little-endian, the sketches._shingle_hashes "md5/v2" rule (so a SQL
    twin can reproduce it from md5 hex if ever needed). Returned as int64
    (bit-cast) so the shuffle moves 8-byte ints, not turn text."""
    vals = texts.to_pylist()
    out = np.fromiter(
        (
            int.from_bytes(hashlib.md5((t or "").encode("utf-8")).digest()[:8], "little")
            for t in vals
        ),
        dtype=np.uint64,
        count=len(vals),
    )
    return pa.array(out.view(np.int64), pa.int64())


def boilerplate_key_counts(
    ts: ray.data.Dataset,
    text_col: str = "text",
    conv_col: str = "conv_id",
    min_convs: int = 5,
) -> ray.data.Dataset:
    """(tkey, n_convs) for every turn-text key appearing in >= ``min_convs``
    distinct conversations. Bounded by |corpus texts| / min_convs."""
    from .graph import distinct_pairs

    def _pairs(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"tkey": _text_keys(batch[text_col]), "conv": batch[conv_col]}
        )

    pairs = ts.select_columns([text_col, conv_col]).map_batches(
        _pairs, batch_format="pyarrow"
    )
    counts = distinct_pairs(pairs, ["tkey", "conv"]).groupby("tkey").aggregate(
        Count(alias_name="n_convs")
    )
    return counts.filter(expr=f"n_convs >= {min_convs}")


def boilerplate_turns(
    ts: ray.data.Dataset,
    text_col: str = "text",
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    min_convs: int = 5,
    broadcast_max: int = BOILERPLATE_BROADCAST_MAX,
) -> ray.data.Dataset:
    """Flag every turn whose exact text appears in >= ``min_convs``
    distinct conversations: (conv_id, turn_idx, is_boilerplate)."""
    hot = boilerplate_key_counts(ts, text_col, conv_col, min_convs)
    n_hot = hot.count()
    turns = ts.select_columns([conv_col, idx_col, text_col])

    if n_hot <= broadcast_max:
        keys: set[int] = set()
        for blk in hot.select_columns(["tkey"]).iter_batches(
            batch_format="pyarrow", batch_size=None
        ):
            keys.update(blk["tkey"].to_pylist())
        keys_ref = ray.put(keys)

        def _flag(batch: pa.Table) -> pa.Table:
            from .broadcast import broadcast_cache

            k = broadcast_cache(keys_ref)
            tk = _text_keys(batch[text_col]).to_pylist()
            return pa.table(
                {
                    conv_col: batch[conv_col],
                    idx_col: batch[idx_col],
                    "is_boilerplate": pa.array([t in k for t in tk], pa.bool_()),
                }
            )

        return turns.map_batches(_flag, batch_format="pyarrow")

    # Join fallback: the boilerplate key set itself is too big to ship
    # whole; flag via a bucketed left join on the int key instead.
    from .joins import hash_bucket_join

    def _with_key(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                conv_col: batch[conv_col],
                idx_col: batch[idx_col],
                "tkey": _text_keys(batch[text_col]),
            }
        )

    keyed = turns.map_batches(_with_key, batch_format="pyarrow")
    joined = hash_bucket_join(
        keyed,
        hot,
        on="tkey",
        how="left_outer",
        output_columns=[conv_col, idx_col, "n_convs"],
        right_schema=pa.schema([("tkey", pa.int64()), ("n_convs", pa.int64())]),
    )

    def _to_flag(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                conv_col: batch[conv_col],
                idx_col: batch[idx_col],
                "is_boilerplate": pc.is_valid(batch["n_convs"]),
            }
        )

    return joined.map_batches(_to_flag, batch_format="pyarrow")


def conv_quality(
    ts: ray.data.Dataset,
    text_col: str = "text",
    conv_col: str = "conv_id",
    min_convs: int = 5,
    min_turns: int = 3,
    broadcast_max: int = BOILERPLATE_BROADCAST_MAX,
) -> ray.data.Dataset:
    """Per-conversation extraction-worthiness profile.

    Output: (conv_id, n_turns, n_cite_turns, n_boilerplate, mean_len,
    keep). ``keep`` composes three integer-exact gates — at least
    ``min_turns`` turns, at least one citation-trigger turn, and
    boilerplate on at most half the turns (n_boilerplate * 2 <= n_turns;
    no float ratio, so the verdict is bit-reproducible).

    Shape: boilerplate key set collected once (guarded by
    ``broadcast_max`` — refuse rather than silently ship an unbounded
    set), then ONE fused per-turn map computes key membership + RE2
    trigger flags + utf8 length, feeding per-conversation Sum/Count
    aggregates; the shuffle moves one 4-int row per turn, never text.
    """
    hot = boilerplate_key_counts(ts, text_col, conv_col, min_convs)
    n_hot = hot.count()
    if n_hot > broadcast_max:
        raise ValueError(
            f"boilerplate key set ({n_hot}) exceeds broadcast_max "
            f"({broadcast_max}); raise min_convs or the cap"
        )
    keys: set[int] = set()
    for blk in hot.select_columns(["tkey"]).iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        keys.update(blk["tkey"].to_pylist())
    keys_ref = ray.put(keys)

    def _per_turn(batch: pa.Table) -> pa.Table:
        from .broadcast import broadcast_cache

        k = broadcast_cache(keys_ref)
        text = batch[text_col]
        cite = pc.or_(
            pc.match_substring_regex(text, ECLI_TRIGGER),
            pc.match_substring_regex(text, ARTICLE_TRIGGER),
        )
        tk = _text_keys(text).to_pylist()
        return pa.table(
            {
                conv_col: batch[conv_col],
                "cite_i": pc.cast(cite, pa.int64()),
                "boiler_i": pa.array(
                    [1 if t in k else 0 for t in tk], pa.int64()
                ),
                "tlen": pc.cast(pc.utf8_length(text), pa.int64()),
            }
        )

    agg = (
        ts.select_columns([conv_col, text_col])
        .map_batches(_per_turn, batch_format="pyarrow")
        .groupby(conv_col)
        .aggregate(
            Count(alias_name="n_turns"),
            Sum("cite_i", alias_name="n_cite_turns"),
            Sum("boiler_i", alias_name="n_boilerplate"),
            Sum("tlen", alias_name="sum_len"),
        )
    )

    def _verdict(batch: pa.Table) -> pa.Table:
        n = batch["n_turns"]
        cite = batch["n_cite_turns"]
        boiler = batch["n_boilerplate"]
        mean_len = pc.divide(
            pc.cast(batch["sum_len"], pa.float64()), pc.cast(n, pa.float64())
        )
        keep = pc.and_(
            pc.and_(
                pc.greater_equal(n, min_turns), pc.greater_equal(cite, 1)
            ),
            pc.less_equal(pc.multiply(boiler, 2), n),
        )
        return pa.table(
            {
                conv_col: batch[conv_col],
                "n_turns": n,
                "n_cite_turns": cite,
                "n_boilerplate": boiler,
                "mean_len": mean_len,
                "keep": keep,
            }
        )

    return agg.map_batches(_verdict, batch_format="pyarrow")


def tool_latency_stats(
    ts: ray.data.Dataset,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    tool_col: str = "tool",
    ts_col: str = "ts",
) -> ray.data.Dataset:
    """Per-tool response-latency profile over agent transcripts: for every
    turn that invokes a tool (non-empty ``tool``), the gap to the NEXT
    turn in the same conversation (turn_idx order) is that call's
    latency; aggregate ``(tool, n_calls, total_us, max_us, mean_us)``
    — the agent-telemetry readout that finds the slow tool in a
    10^12-turn corpus. Tool calls with no following turn are dropped
    (no response observed).

    Shape: ONE shuffle on conv_id; each conversation group emits at most
    |tools| partial rows (sum/count/max combined in the group), so the
    final groupby moves tool cells, never turns. mean_us is one exact
    int/int double division."""
    import numpy as np
    from ray.data.aggregate import Max, Sum

    def _gaps(g: "pd.DataFrame") -> "pd.DataFrame":  # noqa: F821
        import pandas as pd

        g = g.sort_values(idx_col)
        us = (
            g[ts_col]
            .to_numpy(dtype="datetime64[us]")
            .astype(np.int64)
        )
        tools = g[tool_col].to_numpy()
        gap = us[1:] - us[:-1]
        mask = np.array([bool(t) for t in tools[:-1]], dtype=bool)
        agg: dict = {}
        for t, d in zip(tools[:-1][mask], gap[mask]):
            s, n, mx = agg.get(t, (0, 0, 0))
            agg[t] = (s + int(d), n + 1, max(mx, int(d)))
        return pd.DataFrame(
            {
                "tool": list(agg),
                "s": [v[0] for v in agg.values()],
                "n": [v[1] for v in agg.values()],
                "mx": [v[2] for v in agg.values()],
            }
        )

    parts = (
        ts.select_columns([conv_col, idx_col, tool_col, ts_col])
        .groupby(conv_col)
        .map_groups(_gaps, batch_format="pandas")
        .groupby("tool")
        .aggregate(
            Sum("s", alias_name="total_us"),
            Sum("n", alias_name="n_calls"),
            Max("mx", alias_name="max_us"),
        )
    )

    def _mean(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "tool": batch["tool"],
                "n_calls": batch["n_calls"],
                "total_us": batch["total_us"],
                "max_us": batch["max_us"],
                "mean_us": pc.divide(
                    pc.cast(batch["total_us"], pa.float64()),
                    pc.cast(batch["n_calls"], pa.float64()),
                ),
            }
        )

    return parts.map_batches(_mean, batch_format="pyarrow")
