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


def _fake_media_table(n: int = 64, payload_bytes: int = 4096) -> pa.Table:
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
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


def make_fake_media_dataset(n: int = 64, payload_bytes: int = 4096) -> ray.data.Dataset:
    """Deterministic fake media table (payload = repeated blake2 stream)."""
    return ray.data.from_arrow(_fake_media_table(n, payload_bytes))


def fake_media_path(n: int = 64, payload_bytes: int = 4096) -> str:
    """Persist (once, cached) the fake media table to parquet and return the
    path — lets the decode query and its DuckDB oracle read the SAME input
    (mirrors sources/transcripts.transcripts_path_for_n)."""
    import os

    import pyarrow.parquet as pq

    out_dir = f"/tmp/dkg_media/v1/n_{n}_{payload_bytes}"
    out_path = os.path.join(out_dir, "media.parquet")
    if not os.path.exists(out_path):
        os.makedirs(out_dir, exist_ok=True)
        tmp = out_path + ".tmp"
        pq.write_table(_fake_media_table(n, payload_bytes), tmp)
        os.replace(tmp, out_path)
    return out_path


class DecodeImageActor:
    """Actor-pool decode stage. Small batches: payloads are wide rows."""

    def __init__(self, fake: bool = False):
        self._fake = fake

    def _decode_real(self, payload: bytes) -> dict:
        # optional dependency: the real kernel activates when PIL is
        # installed; the engine's Ray plumbing (schema, batch size, actor
        # signature) is identical on both paths
        try:
            from PIL import Image  # noqa: PLC0415 — import-guarded optional dep
        except ImportError as e:
            raise NotImplementedError(
                "image decode requires PIL — not installed in this environment; "
                "construct with fake=True for the deterministic stub"
            ) from e
        import io

        img = Image.open(io.BytesIO(payload)).convert("L")
        width, height = img.size
        # 8-bin grayscale histogram, L1-normalized — a deterministic,
        # library-stable feature of the same shape the fake path emits
        hist = img.histogram()  # 256 bins
        bins = [sum(hist[i * 32:(i + 1) * 32]) for i in range(8)]
        total = max(1, sum(bins))
        return {"width": width, "height": height,
                "feature": [b / total for b in bins]}

    def _decode_fake(self, payload: bytes) -> dict:
        # keyed on the payload's LOWERCASE HEX string (not raw bytes) so the
        # DuckDB oracle — whose sha256 is VARCHAR-only — replicates the
        # kernel bit-for-bit: sha256(lower(hex(payload)))
        h = hashlib.sha256(payload.hex().encode()).digest()
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
    media: ray.data.Dataset, fake: bool = False, concurrency: int | tuple = (1, 2),
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


class ResizeImageActor:
    """Resize stage (images): actor pool, small batches. Real path stubbed
    (needs PIL); fake path emits a deterministic proportional payload so the
    output schema/size accounting is real."""

    def __init__(self, target_w: int = 128, target_h: int = 128, fake: bool = False):
        self._w, self._h, self._fake = target_w, target_h, fake

    def _resize_real(self, payload: bytes) -> bytes:
        try:
            from PIL import Image  # noqa: PLC0415 — import-guarded optional dep
        except ImportError as e:
            raise NotImplementedError(
                "image resize requires PIL — not installed in this environment; "
                "construct with fake=True for the deterministic stub"
            ) from e
        import io

        img = Image.open(io.BytesIO(payload))
        out = io.BytesIO()
        img.resize((self._w, self._h)).save(out, format="PNG")
        return out.getvalue()

    def _resize_fake(self, payload: bytes) -> bytes:
        out_len = max(32, self._w * self._h // 16)
        seed = hashlib.blake2b(payload, digest_size=32, person=b"resize").digest()
        return (seed * (out_len // 32 + 1))[:out_len]

    def __call__(self, batch: pa.Table) -> pa.Table:
        resize = self._resize_fake if self._fake else self._resize_real
        out = [resize(p) for p in batch["payload"].to_pylist()]
        n = batch.num_rows
        return pa.table(
            {
                "media_id": batch["media_id"],
                "media_type": batch["media_type"],
                "payload": pa.array(out, pa.binary()),
                "width": pa.array([self._w] * n, pa.int32()),
                "height": pa.array([self._h] * n, pa.int32()),
            }
        )


class FrameSampleActor:
    """Video frame sampling: one output row PER SAMPLED FRAME (explode with
    binary columns — the flat_map shape for video at scale). Fake duration
    and frame payloads are hash-derived; real path stubbed (needs libav)."""

    def __init__(self, every_s: float = 1.0, fake: bool = False):
        self._every = every_s
        self._fake = fake

    def _duration_fake(self, payload: bytes) -> float:
        # hex-string-keyed like _decode_fake so the DuckDB oracle can
        # replicate: sha256(lower(hex(payload)) || ':duration')
        h = hashlib.sha256((payload.hex() + ":duration").encode()).digest()
        return 1.0 + h[0] % 8  # 1..8 seconds

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self._fake:
            raise NotImplementedError(
                "video demux requires libav/ffmpeg — not available in this "
                "environment; construct with fake=True for the deterministic stub"
            )
        ids, idxs, tss, frames = [], [], [], []
        for media_id, payload in zip(batch["media_id"].to_pylist(), batch["payload"].to_pylist()):
            duration = self._duration_fake(payload)
            t, idx = 0.0, 0
            while t < duration:
                fh = hashlib.blake2b(
                    payload + idx.to_bytes(4, "little"), digest_size=32, person=b"frame"
                ).digest()
                ids.append(media_id)
                idxs.append(idx)
                tss.append(t)
                frames.append((fh * 8)[:256])
                idx += 1
                t += self._every
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(idxs, pa.int32()),
                "ts_s": pa.array(tss, pa.float64()),
                "frame_payload": pa.array(frames, pa.binary()),
            }
        )


class AudioFeatureActor:
    """Audio feature extraction (MFCC-shaped fixed-length vector). Fake
    derives 13 coefficients from hash windows; real path decodes via the
    optional soundfile dependency (import-guarded)."""

    N_COEFF = 13

    def __init__(self, fake: bool = False):
        self._fake = fake

    def _mfcc_real(self, payload: bytes) -> list[float]:
        """Real path (optional dep): decode WAV via soundfile, then a
        numpy log-spectral 13-vector (mean log-energy of 13 mel-spaced FFT
        bands — MFCC-shaped without a librosa dependency)."""
        try:
            import soundfile as sf  # noqa: PLC0415 — import-guarded optional dep
        except ImportError as e:
            raise NotImplementedError(
                "audio decode requires soundfile — not installed in this "
                "environment; construct with fake=True for the deterministic stub"
            ) from e
        import io

        import numpy as np

        data, rate = sf.read(io.BytesIO(payload), dtype="float64")
        if data.ndim > 1:
            data = data.mean(axis=1)
        spec = np.abs(np.fft.rfft(data)) ** 2
        edges = np.unique(
            np.geomspace(1, len(spec), self.N_COEFF + 1).astype(int)
        )
        bands = [
            float(np.log1p(spec[a:b].mean())) if b > a else 0.0
            for a, b in zip(edges[:-1], edges[1:])
        ]
        bands += [0.0] * (self.N_COEFF - len(bands))
        return bands[: self.N_COEFF]

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        if not self._fake:
            feats = [self._mfcc_real(p) for p in batch["payload"].to_pylist()]
        else:
            for payload in batch["payload"].to_pylist():
                h = hashlib.blake2b(payload, digest_size=self.N_COEFF, person=b"mfcc").digest()
                feats.append([b / 255.0 - 0.5 for b in h])
        return pa.table(
            {
                "media_id": batch["media_id"],
                "mfcc": pa.array(feats, pa.list_(pa.float32())),
            }
        )


def multimodal_pipeline(media: ray.data.Dataset, fake: bool = True) -> dict:
    """Route by media_type → per-modality actor-pool stages:
    images: decode → resize; video: frame-sample; audio: MFCC features.
    Returns the three result Datasets (callers union/join as needed)."""
    images = media.filter(expr="media_type == 'image/jpeg'")
    audio = media.filter(expr="media_type == 'audio/wav'")
    video = media.filter(expr="media_type == 'video/mp4'")
    decoded = decode_media(images, fake=fake)
    resized = images.map_batches(
        ResizeImageActor, fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow", batch_size=16, concurrency=(1, 2),
    )
    frames = video.map_batches(
        FrameSampleActor, fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow", batch_size=8, concurrency=(1, 2),
    )
    mfcc = audio.map_batches(
        AudioFeatureActor, fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow", batch_size=32, concurrency=(1, 2),
    )
    return {"decoded": decoded, "resized": resized, "frames": frames, "mfcc": mfcc}
