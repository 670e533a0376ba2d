"""Multimodal stages: opaque binary payload columns with typed metadata.

Images/audio/video are treated as ``binary`` columns + metadata columns
(media_type, width/height/duration, codec). The decode/feature kernels are
STUBBED (no image/audio libraries in this environment): ``DecodeImageActor``
raises NotImplementedError unless ``fake=True``, in which case it produces a
deterministic fake decode (hash-derived dimensions + a tiny feature vector)
so the Ray-side plumbing — schema, small batch size for wide binary rows,
actor signature, output layout — is real and tested.

Real deployment: swap ``_decode_real`` for PIL/libav calls; nothing else
changes.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),  # image/jpeg, audio/wav, ...
        ("payload", pa.binary()),
    ]
)


def make_fake_media_dataset(n: int = 64, payload_bytes: int = 4096) -> ray.data.Dataset:
    """Deterministic fake media table (payload = repeated blake2 stream)."""
    rows = []
    for i in range(n):
        seed = hashlib.blake2b(f"media-{i}".encode(), digest_size=32).digest()
        payload = (seed * (payload_bytes // 32 + 1))[:payload_bytes]
        rows.append(
            {
                "media_id": i,
                "media_type": ("image/jpeg", "audio/wav", "video/mp4")[i % 3],
                "payload": payload,
            }
        )
    return ray.data.from_arrow(pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA))


class DecodeImageActor:
    """Actor-pool decode stage. Small batches: payloads are wide rows."""

    def __init__(self, fake: bool = False):
        self._fake = fake

    def _decode_real(self, payload: bytes) -> dict:
        raise NotImplementedError(
            "image decode requires PIL/opencv — not available in this environment; "
            "construct with fake=True for the deterministic stub"
        )

    def _decode_fake(self, payload: bytes) -> dict:
        h = hashlib.blake2b(payload, digest_size=16).digest()
        width = 64 + h[0] % 192
        height = 64 + h[1] % 192
        feature = [b / 255.0 for b in h[2:10]]
        return {"width": width, "height": height, "feature": feature}

    def __call__(self, batch: pa.Table) -> pa.Table:
        decode = self._decode_fake if self._fake else self._decode_real
        metas = [decode(p) for p in batch["payload"].to_pylist()]
        return pa.table(
            {
                "media_id": batch["media_id"],
                "media_type": batch["media_type"],
                "width": pa.array([m["width"] for m in metas], pa.int32()),
                "height": pa.array([m["height"] for m in metas], pa.int32()),
                "feature": pa.array([m["feature"] for m in metas], pa.list_(pa.float32())),
            }
        )


def decode_media(
    media: ray.data.Dataset, fake: bool = False, concurrency: int | tuple = 2,
    batch_size: int = 16,
) -> ray.data.Dataset:
    """Decode/feature-extract stage: actor pool, small batches (binary rows)."""
    return media.map_batches(
        DecodeImageActor,
        fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
