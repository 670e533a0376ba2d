"""Assembly stage: transcripts → assembled documents.

groupby(conv_id) with an EXPLICIT turn_idx sort inside the group preserves
the per-turn text-equality invariant (BASELINE.json north star; the analogue
of the reference reading an already-ordered markdown document).

Two implementations:

- ``assemble_documents``: single ``groupby("conv_id").map_groups``.
- ``assemble_documents_salted`` (default in the flagship pipeline): two-phase
  salted aggregation for hot-conversation skew (SURVEY.md §7.4 hard part 2).
  Phase 1 groups by (conv_id, salt) where salt = turn_idx // SALT_CHUNK —
  monotone in turn_idx, so per-salt partial documents concatenated in salt
  order reproduce the exact turn order. A single conversation with millions
  of turns therefore never lands on one reducer in phase 1; phase 2 only
  merges one small partial row per salt bucket.
"""

from __future__ import annotations

import pandas as pd
import pyarrow.compute as pc

import ray.data

from ..functions.document import assemble_text, derive_self_ecli
from ..functions.normalize import length_category

SALT_CHUNK = 256


def _finalize(conv_id: str, text: str, n_turns: int) -> dict:
    return {
        "conv_id": conv_id,
        "text": text,
        "n_turns": n_turns,
        "text_len": len(text),
        "length_category": length_category(len(text)),
        "self_ecli": derive_self_ecli(text),
    }


def _assemble_group(group: pd.DataFrame) -> pd.DataFrame:
    group = group.sort_values("turn_idx", kind="stable")
    rec = _finalize(
        group["conv_id"].iloc[0],
        assemble_text(group["role"].tolist(), group["text"].tolist()),
        len(group),
    )
    return pd.DataFrame([rec])


def assemble_documents(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Plain one-shuffle assembly (fine when no conversation is pathological)."""
    ds = ds.select_columns(["conv_id", "turn_idx", "role", "text"])
    return ds.groupby("conv_id").map_groups(_assemble_group, batch_format="pandas")


def _add_salt(batch):
    return batch.append_column("salt", pc.cast(pc.floor(pc.divide(batch["turn_idx"], SALT_CHUNK)), "int32"))


def _assemble_partial(group: pd.DataFrame) -> pd.DataFrame:
    group = group.sort_values("turn_idx", kind="stable")
    return pd.DataFrame(
        [
            {
                "conv_id": group["conv_id"].iloc[0],
                "salt": int(group["salt"].iloc[0]),
                "part_text": assemble_text(group["role"].tolist(), group["text"].tolist()),
                "part_turns": len(group),
            }
        ]
    )


def _assemble_merge(group: pd.DataFrame) -> pd.DataFrame:
    group = group.sort_values("salt", kind="stable")
    rec = _finalize(
        group["conv_id"].iloc[0],
        "\n".join(group["part_text"].tolist()),
        int(group["part_turns"].sum()),
    )
    return pd.DataFrame([rec])


def assemble_documents_salted(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Two-phase skew-safe assembly (salt = turn_idx // SALT_CHUNK)."""
    ds = ds.select_columns(["conv_id", "turn_idx", "role", "text"])
    ds = ds.map_batches(_add_salt, batch_format="pyarrow")
    partials = ds.groupby(["conv_id", "salt"]).map_groups(_assemble_partial, batch_format="pandas")
    return partials.groupby("conv_id").map_groups(_assemble_merge, batch_format="pandas")


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
