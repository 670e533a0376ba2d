"""Deduplication sketches: shingling, MinHash, SimHash, n-gram Jaccard.

Pure, deterministic, numpy-vectorized where it matters. The Ray stages in
``stages/dedup.py`` call these per batch; the serial oracle calls them per
document. All hashing is seed-stable (no Python builtin hash).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np

_WORD = re.compile(r"[a-z0-9]+")
_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)
_MERSENNE = (1 << 61) - 1


def content_hash(text: str) -> str:
    """Stable exact-dedup key: md5 hex of the raw text bytes.

    md5 so the DuckDB oracle can reproduce it (`md5(text)`).
    """
    return hashlib.md5(text.encode("utf-8")).hexdigest()


def word_shingles(text: str, k: int = 3) -> set[str]:
    """k-word shingles over lowercase alnum tokens; whole-doc if < k words."""
    words = _WORD.findall(text.lower())
    if len(words) < k:
        return {" ".join(words)} if words else set()
    return {" ".join(words[i : i + k]) for i in range(len(words) - k + 1)}


def _shingle_hashes(shingles: set[str]) -> np.ndarray:
    """Stable 64-bit hashes of each shingle: md5 low 8 bytes little-endian.

    md5 (not blake2b) so the DuckDB oracle can reproduce the value from
    `md5(s)` hex — the same reproducibility rule as content_hash. The
    downstream MinHash/SimHash math is then exactly portable to SQL.

    SIGNATURE VERSION "md5/v2" (since round 4; r1-r3 used blake2b —
    "blake2b/v1"). This is a BREAKING sketch-format change: signatures,
    near-dup pair sets and dedup keep-decisions computed before the switch
    are incompatible with newer ones; never compare or union persisted
    sketch tables across the version boundary (MIGRATION.md §10)."""
    if not shingles:
        return np.empty(0, dtype=np.uint64)
    return np.fromiter(
        (
            int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "little")
            for s in shingles
        ),
        dtype=np.uint64,
        count=len(shingles),
    )


# Fixed affine-permutation parameters for MinHash, derived from a seeded
# counter so every worker/process builds the identical family. Arithmetic is
# (a*x + b) mod 2^64 with odd a — a bijection on uint64, so min-wise hashing
# stays uniform while staying pure-numpy-fast (wraparound multiply).
def _minhash_params(num_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    a = np.empty(num_perm, dtype=np.uint64)
    b = np.empty(num_perm, dtype=np.uint64)
    for i in range(num_perm):
        da = hashlib.blake2b(f"minhash-a-{seed}-{i}".encode(), digest_size=8).digest()
        db = hashlib.blake2b(f"minhash-b-{seed}-{i}".encode(), digest_size=8).digest()
        a[i] = int.from_bytes(da, "little") | 1  # odd → bijective mod 2^64
        b[i] = int.from_bytes(db, "little")
    return a, b

_NUM_PERM = 128
_A, _B = _minhash_params(_NUM_PERM)


def minhash_signature(text: str, k: int = 3, num_perm: int = _NUM_PERM) -> np.ndarray:
    """num_perm-wide MinHash signature of the doc's k-word shingle set."""
    hashes = _shingle_hashes(word_shingles(text, k))
    if hashes.size == 0:
        return np.full(num_perm, _MASK64, dtype=np.uint64)
    with np.errstate(over="ignore"):
        prod = _A[:num_perm, None] * hashes[None, :] + _B[:num_perm, None]
    return prod.min(axis=1)


def minhash_bands(sig: np.ndarray, bands: int = 16) -> list[tuple[int, int]]:
    """LSH banding: [(band_id, band_hash64)] per band of the signature."""
    rows = len(sig) // bands
    out = []
    for b in range(bands):
        chunk = sig[b * rows : (b + 1) * rows].tobytes()
        h = int.from_bytes(hashlib.blake2b(chunk, digest_size=8).digest(), "little")
        out.append((b, h))
    return out


def simhash(text: str, k: int = 3) -> int:
    """64-bit SimHash over k-word shingle hashes (unweighted)."""
    hashes = _shingle_hashes(word_shingles(text, k))
    if hashes.size == 0:
        return 0
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.int64
    )
    counts = bits.sum(axis=0)
    vote = counts * 2 - hashes.size  # (+1 / -1 votes)
    return int(((vote > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def ngram_jaccard(a: str, b: str, k: int = 3) -> float:
    sa, sb = word_shingles(a, k), word_shingles(b, k)
    if not sa or not sb:
        return 1.0 if sa == sb else 0.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)


def estimated_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float(np.mean(sig_a == sig_b))
