"""Font-index sources: how an actor obtains its warm FontIndex.

The reference loads the font database once per process (``readTuples``,
main/kd.c:645-724) and keeps the tree hot for the whole run.  Here the
equivalent artifact is resolved ONCE per actor in ``__init__`` from a small
spec dict:

- ``builtin``  — rebuild from the deterministic bitmap font (cheap, no bytes
                 shipped; used by fixtures/bench)
- ``ref``      — ``ray.put`` object-store handle created once on the driver
                 (the broadcast pattern for real font databases)
- ``parquet``  — a font table on shared storage
- ``data``     — a reference-format fixed-width ``.data`` file
"""

from __future__ import annotations

from tensorflow_ocr_ray.core.knn import FontIndex


def make_font_index(spec: dict) -> FontIndex:
    kind = spec.get("kind", "builtin")
    if kind == "builtin":
        from tensorflow_ocr_ray.fonts import get_font_index

        return get_font_index(
            spec.get("scale", 3), spec.get("alphabet", "latin")
        )
    if kind == "ref":
        import ray

        state = ray.get(spec["ref"])
        return FontIndex.from_state(state)
    if kind == "parquet":
        import pyarrow.parquet as pq
        import numpy as np

        t = pq.read_table(spec["path"])
        tuples = np.stack(
            [np.asarray(x, dtype=np.float32) for x in t["features"].to_pylist()]
        )
        return FontIndex(tuples, t["label"].to_pylist())
    if kind == "data":
        from tensorflow_ocr_ray.sources.fontdata import read_data_file

        return read_data_file(spec["path"])
    raise ValueError(f"unknown font source kind {kind!r}")
