"""Per-worker-process cache for ray.put broadcast objects.

Actor-pool stages cache broadcast objects in ``__init__`` (once per actor);
TASK-based ``map_batches`` functions have no init hook, so they cache here —
one ``ray.get`` per worker process, amortized over every batch that worker
handles, instead of one deserialization per batch.
"""

from __future__ import annotations

import ray

_CACHE: dict = {}


def broadcast_cache(ref):
    key = ref.hex() if hasattr(ref, "hex") else id(ref)
    if key not in _CACHE:
        _CACHE[key] = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
    return _CACHE[key]
