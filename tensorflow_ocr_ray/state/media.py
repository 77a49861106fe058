"""Media stores: resolve ``media_ref`` → payload bytes inside actor stages.

At 100 TB scale media payloads live in object storage keyed by ``media_ref``;
a decode actor fetches by key.  The store is constructed ONCE per actor
(in ``__init__``) from a small serializable spec dict, so no payload bytes
ever travel with the task graph.

Implementations:
- ``synthetic``  — deterministic rendered page per ref (fixtures/bench; the
                   "fetch" is a pure function, zero I/O)
- ``dir``        — one file per ref under a directory (stands in for an
                   object store; exercises the real I/O path)
"""

from __future__ import annotations

import os
from typing import Protocol


class MediaStore(Protocol):
    def get(self, ref: str) -> bytes: ...


class SyntheticMediaStore:
    def get(self, ref: str) -> bytes:
        from tensorflow_ocr_ray.fixtures import payload_for_ref

        return payload_for_ref(ref)


class DirMediaStore:
    def __init__(self, root: str):
        self.root = root

    def get(self, ref: str) -> bytes:
        safe = ref.replace("/", "_")
        with open(os.path.join(self.root, safe), "rb") as f:
            return f.read()

    @staticmethod
    def put(root: str, ref: str, payload: bytes) -> None:
        os.makedirs(root, exist_ok=True)
        safe = ref.replace("/", "_")
        with open(os.path.join(root, safe), "wb") as f:
            f.write(payload)


def make_media_store(spec: dict) -> MediaStore:
    kind = spec.get("kind", "synthetic")
    if kind == "synthetic":
        return SyntheticMediaStore()
    if kind == "dir":
        return DirMediaStore(spec["path"])
    raise ValueError(f"unknown media store kind {kind!r}")
